"""Polyphase windowed-sinc resampling (torchaudio-compatible), batched.

Used by the DS (down-up resampling) defense (reference
defense/frequency_domain.py:8-31, torchaudio sinc interpolation).  The
polyphase kernel bank is a static numpy constant; the resample itself is one
strided conv — MXU/VPU friendly, differentiable.
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _sinc_kernels(orig_freq: int, new_freq: int,
                  lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """Kernel bank (new_freq, K) and half-width, for gcd-reduced freqs."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :]
    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq
         + idx / orig_freq) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2.0) ** 2
    t = t * math.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * (base_freq / orig_freq)
    return kernel.astype(np.float32), width


@functools.partial(jax.jit, static_argnames=("orig_freq", "new_freq"))
def resample(x: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """x: (B, L) -> (B, ceil(L * new/orig))."""
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    if orig == new:
        return x
    kernels, width = _sinc_kernels(orig, new)
    b, length = x.shape
    target_len = -(-length * new // orig)  # ceil
    xp = jnp.pad(x, ((0, 0), (width, width + orig)))[:, None, :]  # NCW
    # one conv with `new` output channels = polyphase branches
    w = jnp.asarray(kernels)[:, None, :]                          # OIK
    y = jax.lax.conv_general_dilated(
        xp, w, window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST)                      # (B,new,F)
    y = jnp.transpose(y, (0, 2, 1)).reshape(b, -1)                # interleave
    return y[:, :target_len]
