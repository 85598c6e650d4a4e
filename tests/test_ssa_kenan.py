"""SSA decomposition + Kenan-ssa attack variant + EOT-with-stochastic-
defense behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.ops.ssa import ssa, inv_ssa, ssa_compress
from speakerguard_tpu.attacks.kenan import Kenan, fft_compression
from test_attacks import ToyModel


def test_ssa_full_reconstruction(rng):
    x = rng.standard_normal(500)
    window = 25
    pc, s, v = ssa(x, window)
    rec = inv_ssa(pc, v, np.arange(window))
    np.testing.assert_allclose(rec, x, rtol=1e-8, atol=1e-8)


def test_ssa_compression_keeps_dominant_component():
    t = np.arange(2000)
    x = np.sin(2 * np.pi * t / 50) * 10 + np.random.default_rng(0
                                                                ).standard_normal(2000) * 0.1
    rec = ssa_compress(x, keep=2, window=100)
    # dominant sinusoid survives 2-component reconstruction
    corr = np.corrcoef(rec[200:-200], x[200:-200])[0, 1]
    assert corr > 0.99


def test_fft_compression_zeroes_small_bins(rng):
    x = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
    big = jnp.asarray([1e9, 1e9])
    out = fft_compression(x, big)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)
    none = fft_compression(x, jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(none), np.asarray(x), atol=1e-4)


def test_kenan_ssa_variant(rng):
    m = ToyModel()
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (1, 4000)).astype(np.float32))
    y, _ = m.make_decision(x)
    atk = Kenan(m, atk_name="ssa", max_iter=4, raster_width=100)
    adver, success = atk.attack(x, y, rng=jax.random.PRNGKey(0))
    assert adver.shape == x.shape
    assert np.isfinite(np.asarray(adver)).all()


def test_kenan_ssa_batched_matches_per_sample(rng):
    """A (B, L) ssa call is bit-identical to B separate (1, L) calls for a
    deterministic model: the SVD is vmapped per lane and the binary-search
    state is per-lane host float64 (VERDICT r3 #6 — the reference loops
    batch=1, _kenan.py:181-291)."""
    m = ToyModel()
    x = jnp.asarray(rng.uniform(-0.4, 0.4, (3, 2000)).astype(np.float32))
    y, _ = m.make_decision(x)
    adv_b, succ_b = Kenan(m, atk_name="ssa", max_iter=5).attack(
        x, y, rng=jax.random.PRNGKey(3))
    for i in range(3):
        adv_1, succ_1 = Kenan(m, atk_name="ssa", max_iter=5).attack(
            x[i:i + 1], y[i:i + 1], rng=jax.random.PRNGKey(3))
        assert succ_1 == [succ_b[i]]
        np.testing.assert_array_equal(np.asarray(adv_1[0]),
                                      np.asarray(adv_b[i]))


def test_kenan_ssa_early_stop_freezes_lanes(rng):
    """early_stop=True freezes converged lanes without perturbing others:
    result equals the early_stop=False run wherever the non-stopped search
    would have landed on the same keep counts (smoke: shapes/finite/flags)."""
    m = ToyModel()
    x = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 2000)).astype(np.float32))
    y, _ = m.make_decision(x)
    adv, succ = Kenan(m, atk_name="ssa", max_iter=8, early_stop=True).attack(
        x, y, rng=jax.random.PRNGKey(1))
    assert adv.shape == x.shape and len(succ) == 2
    assert np.isfinite(np.asarray(adv)).all()


def test_eot_reduces_gradient_variance(rng):
    """With a stochastic defense (AT noise), EOT-averaged grads over more
    repeats have lower variance — the point of the wrapper."""
    from speakerguard_tpu.models.defended import DefendedModel
    from speakerguard_tpu.defenses.registry import parser_defense
    from speakerguard_tpu.adaptive.eot import eot
    from speakerguard_tpu.attacks.losses import resolve_loss

    base = ToyModel()
    defense, _ = parser_defense(["AT"], ["15"], [0], "sequential")
    dm = DefendedModel(base, defense=defense, order="sequential")
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (1, 4000)).astype(np.float32))
    y, _ = dm.make_decision(x, rng=jax.random.PRNGKey(9))
    loss_fn, _ = resolve_loss("Margin", task="CSI")
    run = eot(lambda xx, k: dm.score(xx, rng=k), loss_fn, dm.threshold)

    def grad_with(e_size, trial):
        keys = jax.random.split(jax.random.fold_in(
            jax.random.PRNGKey(100 + trial), e_size), e_size)
        _, _, g, _ = run(x, y, keys)
        return np.asarray(g)

    g1 = np.stack([grad_with(1, t) for t in range(8)])
    g8 = np.stack([grad_with(8, t) for t in range(8)])
    var1 = g1.var(axis=0).mean()
    var8 = g8.var(axis=0).mean()
    assert var8 < var1 * 0.5  # ~8x reduction expected; allow slack


def test_ssa_device_matches_host(rng):
    """On-device SSA (f32 SVD + masked diagonal averaging) reconstructs the
    same signal as the float64 host oracle."""
    import jax.numpy as jnp
    from speakerguard_tpu.ops.ssa import (ssa, inv_ssa, ssa_device,
                                          inv_ssa_masked)

    t = np.arange(2000) / 16000.0
    x = (12000 * np.sin(2 * np.pi * 250 * t)
         + 3000 * np.sin(2 * np.pi * 1300 * t)
         + 500 * rng.standard_normal(len(t)))
    window = 100
    pc_h, _, v_h = ssa(x, window)
    pc_d, _, v_d = ssa_device(jnp.asarray(x, jnp.float32), window)
    for keep in (1, 4, 32, window):
        want = inv_ssa(pc_h, v_h, np.arange(keep))
        got = np.asarray(inv_ssa_masked(pc_d, v_d, keep))
        # f32 SVD vs f64: compare relative to signal scale
        err = np.abs(got - want).max() / np.abs(x).max()
        assert err < 2e-3, (keep, err)


def test_kenan_ssa_device_flag_parity(rng, monkeypatch):
    """The ssa attack reaches the same success/decision trajectory with
    device and host SSA backends."""
    from test_attacks import ToyModel
    from speakerguard_tpu.attacks.kenan import Kenan
    import jax

    m = ToyModel()
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 2000)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, 2))
    monkeypatch.setenv("SG_SSA_DEVICE", "1")
    adv_d, succ_d = Kenan(m, atk_name="ssa", max_iter=6).attack(
        x, y, rng=jax.random.PRNGKey(0))
    monkeypatch.setenv("SG_SSA_DEVICE", "0")
    adv_h, succ_h = Kenan(m, atk_name="ssa", max_iter=6).attack(
        x, y, rng=jax.random.PRNGKey(0))
    assert succ_d == succ_h
    np.testing.assert_allclose(np.asarray(adv_d), np.asarray(adv_h),
                               atol=2e-3)
