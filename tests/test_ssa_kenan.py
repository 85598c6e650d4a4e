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
