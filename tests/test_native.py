"""Native C++ WAV loader vs scipy path."""

import os

import numpy as np
import pytest

from fixtures import make_wav_dataset
from speakerguard_tpu.utils import native
from speakerguard_tpu.utils.audio_io import read_wav, write_wav
from speakerguard_tpu.data.dataset import Dataset


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_num_samples(tmp_path, lib, rng):
    wav = (rng.standard_normal(1234) * 0.1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, wav)
    assert native.wav_num_samples(p) == 1234


def test_load_batch_matches_scipy(tmp_path, lib, rng):
    paths = []
    for i in range(4):
        wav = (rng.standard_normal(2000) * 0.2).astype(np.float32)
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, wav)
        paths.append(p)
    out = native.load_wav_batch(paths, 1500, [100] * 4, scale=1.0)
    assert out is not None and out.shape == (4, 1500)
    for i, p in enumerate(paths):
        want = read_wav(p)[100:1600]
        np.testing.assert_allclose(out[i], want, atol=1e-6)


def test_load_batch_pads(tmp_path, lib, rng):
    wav = (rng.standard_normal(500) * 0.2).astype(np.float32)
    p = str(tmp_path / "s.wav")
    write_wav(p, wav)
    out = native.load_wav_batch([p], 800, [0], scale=1.0)
    assert out.shape == (1, 800)
    assert np.all(out[0, 500:] == 0)
    np.testing.assert_allclose(out[0, :500], read_wav(p), atol=1e-6)


def test_dataset_native_path_matches(tmp_path, lib):
    rng = np.random.default_rng(3)
    root, name, spk_ids = make_wav_dataset(str(tmp_path), rng, n_spks=2,
                                           utts_per_spk=2, length=3000)
    ds_native = Dataset(spk_ids, root, name, wav_length=2000, seed=7)
    ds_scipy = Dataset(spk_ids, root, name, wav_length=2000, seed=7)
    b1 = list(ds_native.batches(4, use_native=True))
    b2 = list(ds_scipy.batches(4, use_native=False))
    assert b1[0][0].shape == b2[0][0].shape == (4, 1, 2000)
    np.testing.assert_array_equal(b1[0][1], b2[0][1])
    # same scale domain (origin)
    assert np.abs(b1[0][0]).max() > 2
    assert np.abs(b2[0][0]).max() > 2


def test_dataset_auto_download(tmp_path, monkeypatch, rng):
    """SPEAKERGUARD_DOWNLOAD=1 fetches + untars a named dataset (urllib
    mocked offline); default stays the actionable FileNotFoundError."""
    import io
    import tarfile
    import urllib.request
    from speakerguard_tpu.data import dataset as D

    # build a tarball that extracts to Spk10_test/spk0/a.wav
    src = tmp_path / "stage" / "Spk10_test" / "spk0"
    src.mkdir(parents=True)
    write_wav(str(src / "a.wav"),
              (rng.standard_normal(4000) * 0.1).astype(np.float32))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        tf.add(str(tmp_path / "stage" / "Spk10_test"), arcname="Spk10_test")

    def fake_gdrive(file_id, path, opener=None):
        assert file_id == D._GDRIVE_IDS["Spk10_test"]
        with open(path, "wb") as f:
            f.write(buf.getvalue())
        return path

    monkeypatch.setattr(D, "gdrive_download", fake_gdrive)
    root = str(tmp_path / "data")

    with pytest.raises(FileNotFoundError, match="SPEAKERGUARD_DOWNLOAD"):
        D.Dataset(["spk0"], root, "Spk10_test")

    monkeypatch.setenv("SPEAKERGUARD_DOWNLOAD", "1")
    ds = D.Dataset(["spk0"], root, "Spk10_test")
    assert len(ds) == 1
    wav, label = ds[0]
    assert label == 0 and wav.shape[0] == 1
