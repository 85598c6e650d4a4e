"""Kaldi-compatible MFCC frontend, fully batched for TPU.

Replaces the reference's per-utterance torchaudio.compliance.kaldi.mfcc loop
(reference: model/iv_plda.py:197-245, model/xv_plda.py:107-156) with a single
batched XLA computation over (B, L) waveforms:

    frames (gather) -> dither -> dc-removal -> raw energy -> preemphasis
    -> povey window -> zero-pad to 512 -> rfft -> power -> mel fbank (matmul)
    -> log -> DCT-II ortho (matmul) -> cepstral lifter -> energy substitution

All per-frame work is expressed as dense (B, T, ...) tensor ops so XLA tiles
the matmuls (mel fbank, DCT) onto the MXU and fuses the elementwise chain.

Parameter set pinned to the reference configuration:
  sample_frequency=16000, frame_shift=10ms, frame_length=25ms,
  round_to_power_of_two -> padded window 512, snip_edges=False,
  preemphasis 0.97, remove_dc_offset, window_type='povey',
  num_mel_bins=30, low_freq=20, high_freq=7600, vtln off,
  use_energy=True (raw), energy_floor=0, cepstral_lifter=22,
  htk_compat=False;  num_ceps=24 (iv_plda) or 30 (xv_plda).

Dithering: the reference uses dither=1.0 (on int16-domain samples).  Dither
is only applied when an explicit PRNG key is given; pass ``rng=None`` for the
deterministic path used inside attacks (gradients through randn dither would
be zero anyway).
"""

import functools
import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

EPSILON = 1.1920928955078125e-07  # float32 eps, matches Kaldi's epsilon


@dataclass(frozen=True)
class MfccConfig:
    sample_frequency: int = 16000
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    dither: float = 1.0
    preemphasis_coefficient: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"
    blackman_coeff: float = 0.42
    snip_edges: bool = False
    num_mel_bins: int = 30
    low_freq: float = 20.0
    high_freq: float = 7600.0
    num_ceps: int = 24
    use_energy: bool = True
    energy_floor: float = 0.0
    raw_energy: bool = True
    cepstral_lifter: float = 22.0
    htk_compat: bool = False

    @property
    def window_size(self) -> int:
        return int(self.sample_frequency * self.frame_length_ms / 1000.0)

    @property
    def window_shift(self) -> int:
        return int(self.sample_frequency * self.frame_shift_ms / 1000.0)

    @property
    def padded_window_size(self) -> int:
        # round_to_power_of_two=True
        return 1 << (self.window_size - 1).bit_length()


IV_PLDA_MFCC = MfccConfig(num_ceps=24)
XV_PLDA_MFCC = MfccConfig(num_ceps=30)


def num_frames(num_samples: int, cfg: MfccConfig) -> int:
    if cfg.snip_edges:
        if num_samples < cfg.window_size:
            return 0
        return 1 + (num_samples - cfg.window_size) // cfg.window_shift
    return (num_samples + cfg.window_shift // 2) // cfg.window_shift


# ---------------------------------------------------------------------------
# static (trace-time) constants: window function, mel filterbank, DCT, lifter
# ---------------------------------------------------------------------------

def feature_window(cfg: MfccConfig) -> np.ndarray:
    n = cfg.window_size
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    if cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    elif cfg.window_type == "blackman":
        w = (cfg.blackman_coeff - 0.5 * np.cos(a * i)
             + (0.5 - cfg.blackman_coeff) * np.cos(2 * a * i))
    else:
        raise ValueError(f"unknown window type {cfg.window_type}")
    return w.astype(np.float32)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(cfg: MfccConfig) -> np.ndarray:
    """Kaldi triangular mel filterbank, shape (num_mel_bins, n_fft//2 + 1).

    The nyquist column is zero (Kaldi only uses bins 0..n_fft//2-1).
    """
    n_fft = cfg.padded_window_size
    num_fft_bins = n_fft // 2
    nyquist = 0.5 * cfg.sample_frequency
    high_freq = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    assert 0 <= cfg.low_freq < high_freq <= nyquist

    fft_bin_width = cfg.sample_frequency / n_fft
    mel_low = mel_scale(cfg.low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)

    bin_idx = np.arange(cfg.num_mel_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = mel_low + (bin_idx + 1.0) * mel_delta
    right_mel = mel_low + (bin_idx + 2.0) * mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)[None, :]
    mel = mel_scale(freqs)
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    banks = np.maximum(0.0, np.minimum(up_slope, down_slope))
    banks = np.concatenate(
        [banks, np.zeros((cfg.num_mel_bins, 1))], axis=1)  # zero nyquist col
    return banks.astype(np.float32)


def dct_matrix(cfg: MfccConfig) -> np.ndarray:
    """Orthonormal DCT-II matrix, shape (num_ceps, num_mel_bins)."""
    n = cfg.num_mel_bins
    k = np.arange(cfg.num_ceps, dtype=np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(math.pi / n * (j + 0.5) * k)
    m[0, :] = math.sqrt(1.0 / n)
    return m.astype(np.float32)


def lifter_coeffs(cfg: MfccConfig) -> np.ndarray:
    q = cfg.cepstral_lifter
    i = np.arange(cfg.num_ceps, dtype=np.float64)
    return (1.0 + 0.5 * q * np.sin(math.pi * i / q)).astype(np.float32)


# ---------------------------------------------------------------------------
# batched framing (snip_edges=False => symmetric edge padding)
# ---------------------------------------------------------------------------

def _frame_gather(wav, length, t, win, shift, pad):
    idx = (np.arange(t) * shift - pad)[:, None] + np.arange(win)[None, :]
    # symmetric reflection: -1 -> 0, -2 -> 1, L -> L-1, L+1 -> L-2
    idx = np.where(idx < 0, -idx - 1, idx)
    idx = np.where(idx >= length, 2 * length - 1 - idx, idx)
    assert (idx >= 0).all() and (idx < length).all(), "wav too short to frame"
    return jnp.take(wav, jnp.asarray(idx), axis=1)


@functools.lru_cache(maxsize=None)
def _framer(length: int, t: int, win: int, shift: int, pad: int,
            edge: str = "kaldi"):
    """Framing with a scatter-free backward.

    Autodiff of the framing gather is a scatter-add over the overlapping
    (B, T, win) cotangent — pathologically slow on TPU.  The custom VJP
    folds instead: tap chunks of width `shift` land on disjoint contiguous
    target ranges per frame, so the fold is ceil(win/shift) reshape-adds in
    "extended" coordinates, plus flip-adds for the two reflected edges.

    edge="kaldi":   -1 -> 0,  L -> L-1  (edge sample duplicated)
    edge="reflect": -1 -> 1,  L -> L-2  (true reflect, torch.stft center)
    """
    n_chunks = -(-win // shift)
    ext = (t - 1) * shift + win  # extended coords: e = orig_idx + pad

    def gather(wav):
        idx = (np.arange(t) * shift - pad)[:, None] \
            + np.arange(win)[None, :]
        if edge == "kaldi":
            idx = np.where(idx < 0, -idx - 1, idx)
            idx = np.where(idx >= length, 2 * length - 1 - idx, idx)
        else:
            idx = np.abs(idx)
            idx = np.where(idx >= length, 2 * (length - 1) - idx, idx)
        assert (idx >= 0).all() and (idx < length).all(), \
            "wav too short to frame"
        return jnp.take(wav, jnp.asarray(idx), axis=1)

    @jax.custom_vjp
    def frame(wav):
        return gather(wav)

    def fwd(wav):
        return frame(wav), None

    def bwd(_, cot):
        b = cot.shape[0]
        g_ext = jnp.zeros((b, ext + shift), cot.dtype)  # slack for padding
        for k1 in range(n_chunks):
            w = min(shift, win - k1 * shift)
            seg = cot[:, :, k1 * shift: k1 * shift + w]
            if w < shift:
                seg = jnp.pad(seg, ((0, 0), (0, 0), (0, shift - w)))
            g_ext = g_ext.at[:, k1 * shift: k1 * shift + t * shift].add(
                seg.reshape(b, t * shift))
        g_ext = g_ext[:, :ext]
        g = g_ext[:, pad: pad + length]
        right = ext - pad - length
        if edge == "kaldi":
            if pad > 0:    # e in [0, pad) -> orig pad-1-e
                g = g.at[:, :pad].add(g_ext[:, :pad][:, ::-1])
            if right > 0:  # e in [pad+L, ext) -> orig L-1-(e-pad-L)
                g = g.at[:, length - right:].add(
                    g_ext[:, pad + length:][:, ::-1])
        else:
            if pad > 0:    # e in [0, pad) -> orig pad-e  (no index 0)
                g = g.at[:, 1:pad + 1].add(g_ext[:, :pad][:, ::-1])
            if right > 0:  # e in [pad+L, ext) -> orig L-2-(e-pad-L)
                g = g.at[:, length - 1 - right: length - 1].add(
                    g_ext[:, pad + length:][:, ::-1])
        return (g,)

    frame.defvjp(fwd, bwd)
    return frame


def frame_signal(wav: jnp.ndarray, cfg: MfccConfig) -> jnp.ndarray:
    """(B, L) -> (B, T, window_size) frames.

    snip_edges=False: frame t covers original samples
    [t*shift + shift//2 - win//2, ...), out-of-range samples mirrored
    symmetrically (edge sample included), matching Kaldi/torchaudio.
    """
    b, length = wav.shape
    t = num_frames(length, cfg)
    win, shift = cfg.window_size, cfg.window_shift
    if cfg.snip_edges:
        starts = np.arange(t) * shift
        idx = starts[:, None] + np.arange(win)[None, :]
        return jnp.take(wav, jnp.asarray(idx), axis=1)
    pad = win // 2 - shift // 2
    return _framer(length, t, win, shift, pad)(wav)


# window registry for _rfft_power fusion: hashable key -> () -> np.ndarray
_WINDOWS: dict = {}


@functools.lru_cache(maxsize=None)
def _rfft_power(win: int, n_fft: int, preemph: float = 0.0,
                window_key=None, precision=None):
    """frames (..., win) -> power spectrum (..., n_fft//2+1), computed as
    two real-DFT MXU matmuls in BOTH directions (TPU FFTs are emulated and
    slow; measured: swapping the 512-pt rfft + irfft-backward for these
    matmuls took PGD-100 xv-PLDA from 96.4 to 158.0 utts/s).  Also
    sidesteps an XLA:CPU fft-thunk layout RET_CHECK that fires when the
    cotangent is vmapped over an EOT axis on a sharded mesh.

    When `preemph`/`window_key` are given, the (linear) preemphasis and
    window multiply are FUSED into the DFT matrices at f64 precompute time:
    M = DFT · diag(window) · P with P[j,j]=1, P[j,j-1]=-preemph (and
    P[0,0] = 1-preemph for Kaldi's duplicated first sample) — two fewer
    elementwise passes over the (B, T, win) frames in each direction.
    window_key must be a hashable spec resolvable by _WINDOWS."""
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[:, None]
    j = np.arange(win, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * k * j / n_fft
    cos_kj = np.cos(ang)   # (K, win)
    sin_kj = np.sin(ang)
    if preemph or window_key is not None:
        m = np.eye(win)
        if preemph:
            p = np.eye(win)
            p[np.arange(1, win), np.arange(win - 1)] = -preemph
            p[0, 0] = 1.0 - preemph
            m = p
        if window_key is not None:
            m = np.diag(_WINDOWS[window_key]().astype(np.float64)) @ m
        cos_kj = cos_kj @ m
        sin_kj = sin_kj @ m
    cos_kj = cos_kj.astype(np.float32)
    sin_kj = sin_kj.astype(np.float32)

    def _spectrum(frames):
        # real DFT as two MXU matmuls (default HIGHEST to keep Kaldi
        # parity; non-parity frontends like the AudioNet logmel pass HIGH):
        # TPU FFTs are emulated and slow; the matmuls are MXU-friendly
        hi = (precision if precision is not None
              else jax.lax.Precision.HIGHEST)
        re = jnp.matmul(frames, jnp.asarray(cos_kj).T, precision=hi)
        im = -jnp.matmul(frames, jnp.asarray(sin_kj).T, precision=hi)
        return re, im

    @jax.custom_vjp
    def rfft_power(frames):
        re, im = _spectrum(frames)
        return re ** 2 + im ** 2

    def fwd(frames):
        re, im = _spectrum(frames)
        return re ** 2 + im ** 2, (re, im)

    def bwd(res, cot):
        re, im = res
        # X_k = sum_j f_j (cos - i sin);  d|X_k|^2/df_j = 2(re_k c - im_k s)
        a = (cot * re) @ jnp.asarray(cos_kj)     # (..., win)
        b = (cot * im) @ jnp.asarray(sin_kj)
        return (2.0 * (a - b),)

    rfft_power.defvjp(fwd, bwd)
    return rfft_power


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def kaldi_mfcc(wav: jnp.ndarray, cfg: MfccConfig = IV_PLDA_MFCC,
               rng: jax.Array | None = None,
               precision=None) -> jnp.ndarray:
    """Batched Kaldi MFCC.  wav: (B, L) float32 in the *origin* (int16) domain.

    Returns (B, T, num_ceps).  `precision` overrides the DFT matmul
    precision (default HIGHEST for Kaldi parity; attack-gradient graphs
    pass HIGH — the frontend feeds sign() steps there, and the exact final
    evaluation re-runs at HIGHEST).
    """
    assert wav.ndim == 2, "expect (B, L)"
    frames = frame_signal(wav.astype(jnp.float32), cfg)  # (B, T, W)

    if rng is not None and cfg.dither != 0.0:
        frames = frames + cfg.dither * jax.random.normal(
            rng, frames.shape, dtype=frames.dtype)

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    if cfg.use_energy and cfg.raw_energy:
        log_energy = jnp.log(
            jnp.maximum(jnp.sum(frames * frames, axis=-1), EPSILON))

    if cfg.raw_energy or not cfg.use_energy:
        # preemphasis + window are linear: fused into the DFT matrices
        # (two fewer elementwise passes over (B, T, win) per direction)
        key = ("kaldi", cfg.window_type, cfg.window_size, cfg.blackman_coeff)
        _WINDOWS.setdefault(key, functools.partial(feature_window, cfg))
        power = _rfft_power(cfg.window_size, cfg.padded_window_size,
                            preemph=cfg.preemphasis_coefficient,
                            window_key=key, precision=precision)(frames)
    else:
        # non-raw energy needs the windowed frames themselves
        if cfg.preemphasis_coefficient != 0.0:
            first = frames[..., :1]
            shifted = jnp.concatenate([first, frames[..., :-1]], axis=-1)
            frames = frames - cfg.preemphasis_coefficient * shifted
        frames = frames * jnp.asarray(feature_window(cfg))
        log_energy = jnp.log(
            jnp.maximum(jnp.sum(frames * frames, axis=-1), EPSILON))
        power = _rfft_power(cfg.window_size, cfg.padded_window_size,
                            precision=precision)(frames)

    # tiny matmuls; full f32 precision is required for Kaldi parity and free
    mel = jnp.matmul(power, jnp.asarray(mel_banks(cfg)).T,
                     precision=jax.lax.Precision.HIGHEST)  # (B, T, n_mels)
    mel = jnp.log(jnp.maximum(mel, EPSILON))

    feat = jnp.matmul(mel, jnp.asarray(dct_matrix(cfg)).T,
                      precision=jax.lax.Precision.HIGHEST)  # (B, T, n_ceps)
    if cfg.cepstral_lifter != 0.0:
        feat = feat * jnp.asarray(lifter_coeffs(cfg))

    if cfg.use_energy:
        if cfg.energy_floor > 0.0:
            log_energy = jnp.maximum(
                log_energy, math.log(cfg.energy_floor))
        feat = feat.at[..., 0].set(log_energy)

    return feat
