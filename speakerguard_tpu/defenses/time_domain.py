"""Time-domain input transformation defenses.

Re-design of reference defense/time_domain.py.  Every defense is a pure
function ``f(audio, rng=None) -> audio`` over (B, L) (or any wav shape) —
randomness is explicit PRNG, non-differentiable ops are BPDA-wrapped with an
identity substitute (straight-through), matching the reference's
BPDA(QT_Non_Diff, identity).
"""

import math

import jax
import jax.numpy as jnp

from speakerguard_tpu.adaptive.bpda import bpda
from speakerguard_tpu.utils.ranges import ABS_MAX


def _flatten_wav(audio):
    """Accept (T,), (B, T) or (B, 1, T); return ((B, T), restore_fn)."""
    shape = audio.shape
    if audio.ndim == 1:
        x = audio[None, :]
    elif audio.ndim == 3:
        x = audio[:, 0, :]
    else:
        x = audio
    return x, lambda y: y.reshape(shape)


def QT_Non_Diff(audio, param: int = 128, bits: int = 16):
    """Quantization: round to the nearest multiple of q in the int16 domain
    (reference time_domain.py:10-42)."""
    x, restore = _flatten_wav(audio)
    is_scale = jnp.logical_and(0.9 * jnp.max(x) <= 1.0,
                               0.9 * jnp.min(x) >= -1.0)
    scale = jnp.where(is_scale, ABS_MAX, 1.0)
    q = float(param)
    out = jnp.round(x * scale / q) * q / scale
    return restore(out)


import functools


@functools.lru_cache(maxsize=None)
def _qt_ste(param: int, bits: int):
    # close over the static params: custom_vjp operands must be arrays
    return bpda(lambda x: QT_Non_Diff(x, param, bits))


def QT(audio, param: int = 128, bits: int = 16, rng=None):
    return _qt_ste(int(param), int(bits))(audio)


def BDR(audio, param: int = 8, bits: int = 16, rng=None):
    """Bit-depth reduction == QT with q = 2^(bits - param)
    (reference time_domain.py:46-48)."""
    return QT(audio, param=2 ** (bits - param), bits=bits)


def AT(audio, param: float = 25.0, rng=None):
    """Additive Gaussian noise at `param` dB SNR (reference
    time_domain.py:50-70).  Requires an explicit PRNG key."""
    assert rng is not None, "AT is stochastic: pass rng"
    x, restore = _flatten_wav(audio)
    b, n = x.shape
    snr = 10.0 ** (param / 10.0)
    power_audio = jnp.sum((x / math.sqrt(n)) ** 2, axis=1, keepdims=True)
    power_noise = power_audio / snr
    noise = jax.random.normal(rng, (b, n), x.dtype) * jnp.sqrt(power_noise)
    return restore(x + noise)


def AS(audio, param: int = 3, rng=None):
    """Average smoothing: length-`param` moving average, zero-padded
    (reference time_domain.py:72-97)."""
    assert param % 2 == 1
    x, restore = _flatten_wav(audio)
    w = jnp.full((1, 1, param), 1.0 / param, x.dtype)
    pad = (param - 1) // 2
    y = jax.lax.conv_general_dilated(
        x[:, None, :], w, (1,), [(pad, pad)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST)[:, 0, :]
    return restore(y)


def MS(audio, param: int = 3, rng=None):
    """Median smoothing over a centered window, zero pad (reference
    time_domain.py:100-127)."""
    x, restore = _flatten_wav(audio)
    pad = (param - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    windows = jnp.stack([xp[:, i:i + x.shape[1]] for i in range(param)],
                        axis=-1)
    return restore(jnp.median(windows, axis=-1))
