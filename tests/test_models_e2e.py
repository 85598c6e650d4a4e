"""End-to-end model tests: Kaldi-text parsing round trips, full iv/xv
pipelines on small random artifacts, flag-ladder consistency, decisions,
gradients, and the defended-model wrapper."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fixtures import make_small_iv_artifacts, make_wav_dataset

from speakerguard_tpu.utils import kaldi_io
from speakerguard_tpu.models.iv_plda import IvPlda, load_iv_plda_params
from speakerguard_tpu.models.xv_plda import XvPlda, random_xv_plda_params
from speakerguard_tpu.ops.kaldi_mfcc import MfccConfig


@pytest.fixture(scope="module")
def iv_artifacts(tmp_path_factory):
    rng = np.random.default_rng(5)
    tmpdir = tmp_path_factory.mktemp("ivmodel")
    paths, arrays = make_small_iv_artifacts(str(tmpdir), rng)
    return paths, arrays


def test_kaldi_parsers_roundtrip(iv_artifacts):
    paths, arrays = iv_artifacts
    g = kaldi_io.parse_fgmm_file(paths["gmm"])
    np.testing.assert_allclose(g["gconsts"], arrays["gconsts"], atol=1e-5)
    np.testing.assert_allclose(g["means_invcovars"], arrays["mic"],
                               atol=1e-5)
    np.testing.assert_allclose(g["invcovars"], arrays["invcov"], atol=1e-5)
    e = kaldi_io.parse_extractor_file(paths["extractor"])
    np.testing.assert_allclose(e["extractor_matrix"], arrays["m"],
                               atol=1e-5)
    np.testing.assert_allclose(e["sigma_inv"], arrays["sig"], atol=1e-5)
    assert float(e["offset"]) == 1.0
    p = kaldi_io.parse_plda_file(paths["plda"])
    np.testing.assert_allclose(p["mean"], arrays["pmean"], atol=1e-5)
    np.testing.assert_allclose(p["transform"], arrays["ptr"], atol=1e-5)
    np.testing.assert_allclose(p["psi"], arrays["psi"], atol=1e-5)
    np.testing.assert_allclose(kaldi_io.parse_mean_file(paths["mean"]),
                               arrays["emb_mean"], atol=1e-5)
    np.testing.assert_allclose(
        kaldi_io.parse_transform_mat_file(paths["transform"]),
        arrays["lda"], atol=1e-5)
    # cache file created and reused
    assert os.path.exists(paths["gmm"] + ".npz")
    g2 = kaldi_io.parse_fgmm_file(paths["gmm"])
    np.testing.assert_allclose(g2["gconsts"], g["gconsts"])


@pytest.fixture(scope="module")
def iv_model(iv_artifacts):
    paths, _ = iv_artifacts
    params = load_iv_plda_params(paths["gmm"], paths["extractor"],
                                 paths["plda"], paths["mean"],
                                 paths["transform"])
    # D=24 features: num_ceps=8 with order-2 deltas -> 24 dims
    model = IvPlda(params, mfcc_config=MfccConfig(num_ceps=8))
    rng = np.random.default_rng(1)
    enroll = rng.standard_normal((4, 8)).astype(np.float32)
    model.set_enrollment(["a", "b", "c", "d"], enroll)
    return model


def test_iv_plda_flag_ladder(iv_model, rng):
    wavs = jnp.asarray((rng.standard_normal((2, 8000)) * 5000
                        ).astype(np.float32))
    f1 = iv_model.compute_feat(wavs, flag=1)
    assert f1.shape[-1] == 8
    f2 = iv_model.comput_feat_from_feat(f1, 1, 2)
    assert f2.shape[-1] == 24
    f3 = iv_model.comput_feat_from_feat(f2, 2, 3)
    assert f3.shape == f2.shape
    # embeddings agree whichever level we enter at
    e0 = iv_model.embedding(wavs, flag=0)
    e1 = iv_model.embedding(f1, flag=1)
    e3 = iv_model.embedding(f3, flag=3)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e3), rtol=1e-4,
                               atol=1e-4)


def test_iv_plda_decisions_and_grad(iv_model, rng):
    wavs = jnp.asarray((rng.standard_normal((2, 8000)) * 5000
                        ).astype(np.float32))
    d, s = iv_model.make_decision(wavs)
    assert s.shape == (2, 4)
    assert np.asarray(d).shape == (2,)

    def f(w):
        return jnp.sum(iv_model.score(w))
    g = jax.grad(f)(wavs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_iv_plda_threshold_reject(iv_model, rng):
    wavs = jnp.asarray((rng.standard_normal((2, 8000)) * 5000
                        ).astype(np.float32))
    iv_model.threshold = 1e9
    d, _ = iv_model.make_decision(wavs)
    np.testing.assert_array_equal(np.asarray(d), [-1, -1])
    iv_model.threshold = float("-inf")


def test_xv_plda_pipeline(rng):
    params = random_xv_plda_params(np.random.default_rng(2))
    model = XvPlda(params)
    enroll = rng.standard_normal((3, 150)).astype(np.float32)
    model.set_enrollment(["a", "b", "c"], enroll)
    wavs = jnp.asarray((rng.standard_normal((2, 8000)) * 5000
                        ).astype(np.float32))
    d, s = model.make_decision(wavs)
    assert s.shape == (2, 3)
    f1 = model.compute_feat(wavs, flag=1)
    assert f1.shape[-1] == 30
    e1 = model.embedding(f1, flag=1)
    e0 = model.embedding(wavs, flag=0)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=1e-4,
                               atol=1e-4)

    g = jax.grad(lambda w: jnp.sum(model.score(w)))(wavs)
    assert np.isfinite(np.asarray(g)).all()


def test_defended_model_sequential_and_average(iv_model, rng):
    from speakerguard_tpu.models.defended import DefendedModel
    from speakerguard_tpu.defenses.registry import parser_defense

    wavs = jnp.asarray((rng.standard_normal((2, 8000)) * 5000
                        ).astype(np.float32))
    defense, _ = parser_defense(["QT", "FeCo"], ["512", "kmeans 0.5 L2"],
                                [0, 2], "sequential")
    dm = DefendedModel(iv_model, defense=defense, order="sequential")
    d, s = dm.make_decision(wavs, rng=jax.random.PRNGKey(0))
    assert s.shape == (2, 4)

    defense2, _ = parser_defense(["QT", "AS"], ["512", "3"], [0, 0],
                                 "average")
    dm2 = DefendedModel(iv_model, defense=defense2, order="average")
    d2, s2 = dm2.make_decision(wavs, rng=jax.random.PRNGKey(0))
    assert s2.shape == (2, 4)

    # no defense == base model
    dm3 = DefendedModel(iv_model)
    np.testing.assert_allclose(
        np.asarray(dm3.score(wavs)), np.asarray(iv_model.score(wavs)),
        rtol=1e-5)


def test_bpda_attack_through_qt_defense(rng):
    """White-box PGD through the non-differentiable QT defense via BPDA
    (straight-through) — the reference's flagship adaptive-attack combo."""
    from speakerguard_tpu.models.defended import DefendedModel
    from speakerguard_tpu.defenses.registry import parser_defense
    from speakerguard_tpu.attacks import PGD
    from test_attacks import ToyModel

    base = ToyModel()
    defense, _ = parser_defense(["QT"], ["512"], [0], "sequential")
    dm = DefendedModel(base, defense=defense, order="sequential")
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 4000)).astype(np.float32))
    y, _ = dm.make_decision(x)
    atk = PGD(dm, task="CSI", epsilon=0.05, step_size=0.01, max_iter=15)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert sum(success) >= 1
