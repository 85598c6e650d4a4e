"""AudioNet log-mel frontend, batched.

Re-implements the reference Preprocessor (model/_audionet/Preprocessor.py:
48-112): preemphasis 0.97 -> STFT(n_fft=1024, hop=160, win=800 periodic-hann,
center=True reflect) -> power spectrum -> 32-bin Slaney mel (librosa-style
filterbank, fmin=0, fmax=8000, slaney norm) -> 10*log10(clamp(., 1e-16)).

The mel filterbank is a static numpy constant (reference imported it from
librosa.filters.mel; we synthesize the identical matrix from the Slaney mel
scale definition).  Everything else is one batched gather + rfft + matmul.
"""

import functools
import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

EPSILON = 1e-16


@dataclass(frozen=True)
class LogMelConfig:
    sr: int = 16000
    n_mels: int = 32
    n_fft: int = 1024
    hop_length: int = 160
    win_length: int = 800
    preemphasis: float = 0.97
    fmin: float = 0.0
    fmax: float = 8000.0


AUDIONET_LOGMEL = LogMelConfig()


# --- Slaney mel scale (librosa htk=False) ---------------------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = math.log(6.4) / 27.0


def _hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(log_region,
                   _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
                   mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    return np.where(log_region,
                    _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)),
                    f)


def slaney_mel_banks(cfg: LogMelConfig) -> np.ndarray:
    """librosa.filters.mel-compatible matrix, shape (n_mels, 1 + n_fft//2)."""
    n_bins = 1 + cfg.n_fft // 2
    fftfreqs = np.linspace(0.0, cfg.sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(cfg.fmin), _hz_to_mel(cfg.fmax),
                          cfg.n_mels + 2)
    mel_f = _mel_to_hz(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:cfg.n_mels + 2] - mel_f[:cfg.n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _stft_window(cfg: LogMelConfig) -> np.ndarray:
    """Periodic hann of win_length, zero-padded centered to n_fft
    (torch.stft semantics)."""
    n = cfg.win_length
    w = 0.5 - 0.5 * np.cos(2.0 * math.pi * np.arange(n) / n)  # periodic hann
    pad_l = (cfg.n_fft - n) // 2
    pad_r = cfg.n_fft - n - pad_l
    return np.pad(w, (pad_l, pad_r)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def audionet_logmel(wav: jnp.ndarray, cfg: LogMelConfig = AUDIONET_LOGMEL,
                    precision=None) -> jnp.ndarray:
    """wav: (B, L) float32 in *scale* domain ([-1, 1]).  Returns (B, T, n_mels)
    log-mel features (note: reference returns (B, F, T); callers here use the
    framework-wide (B, T, F) layout)."""
    assert wav.ndim == 2
    x = wav[:, 1:] - cfg.preemphasis * wav[:, :-1]  # (B, L-1)
    b, length = x.shape

    half = cfg.n_fft // 2
    # torch.stft center=True reflect padding (true reflect, edge excluded);
    # scatter-free overlap-add backward via the shared framer
    from speakerguard_tpu.ops.kaldi_mfcc import _framer
    t = 1 + length // cfg.hop_length
    frames = _framer(length, t, cfg.n_fft, cfg.hop_length, half,
                     edge="reflect")(x)                  # (B, T, n_fft)

    from speakerguard_tpu.ops.kaldi_mfcc import _rfft_power, _WINDOWS
    key = ("stft_hann", cfg.win_length, cfg.n_fft)
    _WINDOWS.setdefault(key, lambda cfg=cfg: _stft_window(cfg))
    # HIGH (3-pass, ~1e-5 rel err) by default: this frontend feeds a CNN
    # classifier, not the Kaldi-parity chain — HIGHEST's 6 passes dominate
    # AudioNet's whole attack iteration at n_fft=1024.  `precision`
    # overrides for attack-gradient graphs (AudioNet._raw(fast=True) +
    # SG_DFT_FAST_PRECISION=default -> single-pass bf16; the DFT is 81 of
    # AudioNet's 87.7 fwd GFLOP/iter, see tools/flops.py)
    power = _rfft_power(cfg.n_fft, cfg.n_fft, window_key=key,
                        precision=(jax.lax.Precision.HIGH
                                   if precision is None else precision)
                        )(frames)

    mel = jnp.matmul(power, jnp.asarray(slaney_mel_banks(cfg)).T,
                     precision=jax.lax.Precision.HIGHEST)  # (B, T, n_mels)
    return 10.0 * jnp.log10(jnp.maximum(mel, EPSILON))
