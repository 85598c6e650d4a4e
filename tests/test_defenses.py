import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speakerguard_tpu.defenses import time_domain as TD
from speakerguard_tpu.defenses import frequency_domain as FD
from speakerguard_tpu.defenses.registry import parser_defense, lambda_defense
from speakerguard_tpu.ops.kmeans import kmeans_compress_batch
from speakerguard_tpu.ops.iir import fir_from_iir, apply_fir, lfilter_scan
from speakerguard_tpu.adaptive.bpda import bpda


def test_qt_quantizes_and_has_identity_grad(rng):
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 100)).astype(np.float32))
    y = TD.QT(x, param=128)
    vals = np.asarray(y) * 32768.0
    np.testing.assert_allclose(vals, np.round(vals / 128) * 128, atol=1e-2)
    g = jax.grad(lambda xx: jnp.sum(TD.QT(xx, 128)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)  # straight-through


def test_bdr_equals_qt():
    x = jnp.asarray(np.linspace(-0.5, 0.5, 50, dtype=np.float32)[None])
    np.testing.assert_allclose(np.asarray(TD.BDR(x, param=8)),
                               np.asarray(TD.QT(x, param=2 ** 8)))


def test_at_snr(rng):
    x = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32))
    y = TD.AT(x, param=25.0, rng=jax.random.PRNGKey(0))
    noise = np.asarray(y - x)
    snr = 10 * np.log10(np.sum(np.asarray(x) ** 2) / np.sum(noise ** 2))
    assert abs(snr - 25.0) < 1.0


def test_as_is_moving_average(rng):
    x = rng.standard_normal((1, 50)).astype(np.float32)
    y = np.asarray(TD.AS(jnp.asarray(x), param=3))
    xp = np.pad(x[0], (1, 1))
    want = np.array([xp[i:i + 3].mean() for i in range(50)])
    np.testing.assert_allclose(y[0], want, rtol=1e-5, atol=1e-6)


def test_ms_is_median(rng):
    x = rng.standard_normal((1, 50)).astype(np.float32)
    y = np.asarray(TD.MS(jnp.asarray(x), param=3))
    xp = np.pad(x[0], (1, 1))
    want = np.array([np.median(xp[i:i + 3]) for i in range(50)])
    np.testing.assert_allclose(y[0], want, rtol=1e-5, atol=1e-6)


def test_ds_roundtrip_preserves_band(rng):
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
    y = np.asarray(FD.DS(jnp.asarray(x), param=0.5))
    assert y.shape == x.shape
    # 1 kHz survives an 8 kHz round trip
    err = np.abs(y[0, 1000:-1000] - x[0, 1000:-1000]).max()
    assert err < 0.05


def test_fir_matches_scan_lfilter(rng):
    from scipy import signal as ssig
    b, a = ssig.butter(4, 0.3, btype="low", output="ba")
    x = rng.standard_normal((2, 400)).astype(np.float32)
    h = fir_from_iir(b, a)
    got = np.asarray(apply_fir(jnp.asarray(x), h))
    want = np.asarray(lfilter_scan(jnp.asarray(x), b, a))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    want_scipy = ssig.lfilter(b, a, x, axis=1)
    np.testing.assert_allclose(got, want_scipy, rtol=1e-3, atol=1e-4)


def test_lpf_attenuates_high_freq():
    t = np.arange(16000) / 16000
    lo = np.sin(2 * np.pi * 500 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 7000 * t).astype(np.float32)
    y = np.asarray(FD.LPF(jnp.asarray((lo + hi)[None]), param=6000, wp=4000))
    spec = np.abs(np.fft.rfft(y[0, 2000:]))
    freqs = np.fft.rfftfreq(len(y[0]) - 2000, 1 / 16000)
    p500 = spec[np.argmin(np.abs(freqs - 500))]
    p7000 = spec[np.argmin(np.abs(freqs - 7000))]
    assert p7000 < 0.02 * p500  # stopband >= ~40 dB down, passband intact


def test_kmeans_compress_shapes_and_grad(rng):
    feat = jnp.asarray(rng.standard_normal((2, 40, 6)).astype(np.float32))
    out = kmeans_compress_batch(feat, 0.5, jax.random.PRNGKey(0))
    assert out.shape == (2, 20, 6)
    g = jax.grad(lambda f: jnp.sum(
        kmeans_compress_batch(f, 0.5, jax.random.PRNGKey(0)) ** 2))(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_warped_kmeans(rng):
    from speakerguard_tpu.ops.kmeans import warped_kmeans_compress
    feat = jnp.asarray(rng.standard_normal((1, 30, 4)).astype(np.float32))
    out = warped_kmeans_compress(feat, 0.5, init="ts")
    assert out.shape == (1, 15, 4)


def test_bpda_substitute_grad():
    f = bpda(lambda x: jnp.round(x), lambda x: 2.0 * x)
    x = jnp.asarray([1.3, 2.7])
    np.testing.assert_allclose(np.asarray(f(x)), [1.0, 3.0])
    g = jax.grad(lambda xx: jnp.sum(f(xx)))(x)
    np.testing.assert_allclose(np.asarray(g), [2.0, 2.0])


def test_registry_parsing():
    defense, name = parser_defense(
        ["AT", "QT", "FeCo"], ["16", "512", "kmeans 0.2 L2"], [0, 0, 1],
        "sequential")
    assert len(defense) == 3
    assert name == "AT&16@0+QT&512@0+FeCo&kmeans#0_2#L2@1"
    f = lambda_defense("QT", ["512"])
    x = jnp.asarray(np.linspace(-0.5, 0.5, 10, dtype=np.float32)[None])
    assert f(x).shape == x.shape
