"""Frequency-domain input transformation defenses.

Re-design of reference defense/frequency_domain.py:
  * DS   — down-up sinc resampling (reference :8-31), one polyphase conv.
  * LPF / BPF — Butterworth filters designed host-side by scipy (static
    params) and applied on device as a truncated-impulse-response FIR
    convolution (see ops/iir.py), replacing the reference's CPU-only
    torch_lfilter per-sample loop (:33-112, native dep N1).
"""

import functools

from scipy import signal as ssig
import jax.numpy as jnp

from speakerguard_tpu.ops.resample import resample
from speakerguard_tpu.ops.iir import fir_from_iir, apply_fir
from speakerguard_tpu.utils.ranges import ABS_MAX
from speakerguard_tpu.defenses.time_domain import _flatten_wav


def DS(audio, param: float = 0.5, fs: int = 16000, rng=None):
    x, restore = _flatten_wav(audio)
    new_freq = int(fs * param)
    down = resample(x, fs, new_freq)
    up = resample(down, new_freq, fs)
    return restore(up[..., :x.shape[1]])


@functools.lru_cache(maxsize=None)
def _butter_fir(btype: str, wp, ws, gpass: float, gstop: float):
    n, wn = ssig.buttord(wp, ws, gpass, gstop, analog=False)
    b, a = ssig.butter(n, wn, btype=btype, analog=False, output="ba")
    return fir_from_iir(b, a)


def _clip_bounds(x, bits=16):
    is_scale = jnp.logical_and(0.9 * jnp.max(x) <= 1.0,
                               0.9 * jnp.min(x) >= -1.0)
    hi = jnp.where(is_scale, 1.0, ABS_MAX - 1.0)
    lo = jnp.where(is_scale, -1.0, -ABS_MAX)
    return lo, hi


def LPF(audio, param: float = 8000, wp: float = 4000, fs: int = 16000,
        gpass: float = 3, gstop: float = 40, rng=None):
    """Butterworth low-pass: passband wp Hz, stopband `param` Hz
    (reference :33-70)."""
    x, restore = _flatten_wav(audio)
    h = _butter_fir("low", 2 * wp / fs, 2 * param / fs, gpass, gstop)
    y = apply_fir(x, h)
    lo, hi = _clip_bounds(x)
    return restore(jnp.clip(y, lo, hi))


def BPF(audio, param=(50, 5000), wp=(300, 4000), fs: int = 16000,
        gpass: float = 3, gstop: float = 40, rng=None):
    """Butterworth band-pass (reference :72-112)."""
    x, restore = _flatten_wav(audio)
    h = _butter_fir("bandpass",
                    tuple(2 * w / fs for w in wp),
                    tuple(2 * s / fs for s in param), gpass, gstop)
    y = apply_fir(x, h)
    lo, hi = _clip_bounds(x)
    return restore(jnp.clip(y, lo, hi))
