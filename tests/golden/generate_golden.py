"""Golden-vector generator for the Kaldi feature frontend.

Independent float64 implementation written to follow the structure of
torchaudio.compliance.kaldi.mfcc — the exact code path the reference runs
(reference model/iv_plda.py:197-245 pins its parameters) — plus Kaldi's
delta (add-deltas) and sliding CMN definitions (reference
iv_plda.py:250-377).  Deliberately a third implementation, separate from
both the vectorized TPU frontend (speakerguard_tpu/ops/*) and the per-frame
test oracles (tests/oracles.py), and checked in as DATA so the frontend and
its tests cannot silently co-evolve.

Run `python tests/golden/generate_golden.py` to (re)create
kaldi_frontend_golden.npz.  Inputs are seeded; regeneration is
deterministic.
"""

import math
import os

import numpy as np

EPS = 1.1920928955078125e-07  # torch.finfo(float32).eps, used by torchaudio


# --------------------------- torchaudio.kaldi mfcc ------------------------

def _get_strided(wav, win, shift, snip_edges=False):
    """torchaudio _get_strided: symmetric-reflect pad then stride."""
    assert not snip_edges
    num_samples = len(wav)
    m = (num_samples + shift // 2) // shift
    pad = win // 2 - shift // 2
    # reflect WITH the edge sample duplicated (torch.flip-based padding)
    pad_left = wav[:pad][::-1]
    need_right = (m - 1) * shift + win - pad - num_samples
    pad_right = wav[num_samples - need_right:][::-1] if need_right > 0 \
        else np.empty(0)
    padded = np.concatenate([pad_left, wav, pad_right])
    frames = np.empty((m, win), np.float64)
    for t in range(m):
        frames[t] = padded[t * shift: t * shift + win]
    return frames


def _feature_window(win):
    i = np.arange(win, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2 * math.pi * i / (win - 1))) ** 0.85  # povey


def _mel_banks(num_bins, nfft, fs, low, high):
    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)
    bins = np.zeros((num_bins, nfft // 2 + 1))
    mel_low, mel_high = mel(low), mel(high)
    delta = (mel_high - mel_low) / (num_bins + 1)
    for b in range(num_bins):
        l, c, r = (mel_low + b * delta, mel_low + (b + 1) * delta,
                   mel_low + (b + 2) * delta)
        for k in range(nfft // 2):
            m = mel(k * fs / nfft)
            if l < m < r:
                bins[b, k] = ((m - l) / (c - l) if m <= c
                              else (r - m) / (r - c))
    return bins


def golden_mfcc(wav, num_ceps, num_mel_bins=30, fs=16000, low=20.0,
                high=7600.0, lifter_q=22.0):
    """float64 MFCC following torchaudio.compliance.kaldi.mfcc with the
    reference's pinned parameters and dither=0."""
    win, shift, nfft = 400, 160, 512
    frames = _get_strided(np.asarray(wav, np.float64), win, shift)
    frames = frames - frames.mean(axis=1, keepdims=True)  # remove_dc_offset
    energy = np.log(np.maximum((frames ** 2).sum(axis=1), EPS))  # raw energy
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - 0.97 * pre
    frames = frames * _feature_window(win)
    spec = np.fft.rfft(frames, n=nfft, axis=1)
    power = spec.real ** 2 + spec.imag ** 2
    mel = power @ _mel_banks(num_mel_bins, nfft, fs, low, high).T
    mel = np.log(np.maximum(mel, EPS))
    k = np.arange(num_ceps, dtype=np.float64)[:, None]
    j = np.arange(num_mel_bins, dtype=np.float64)[None, :]
    dct = np.sqrt(2.0 / num_mel_bins) * np.cos(
        math.pi / num_mel_bins * (j + 0.5) * k)
    dct[0, :] = math.sqrt(1.0 / num_mel_bins)
    feat = mel @ dct.T
    lift = 1.0 + 0.5 * lifter_q * np.sin(
        math.pi * np.arange(num_ceps) / lifter_q)
    feat = feat * lift
    feat[:, 0] = energy  # use_energy=True, energy_floor=0
    return feat


# ----------------------------- Kaldi deltas -------------------------------

def golden_delta(feat, window=3, order=2):
    """Kaldi add-deltas (reference iv_plda.py:278-295 get_scales)."""
    scales = [np.array([1.0])]
    for i in range(1, order + 1):
        prev = scales[i - 1]
        prev_off = (len(prev) - 1) // 2
        cur = np.zeros(len(prev) + 2 * window)
        norm = 0.0
        for j in range(-window, window + 1):
            norm += j * j
            for kk in range(-prev_off, prev_off + 1):
                cur[j + kk + prev_off + window] += j * prev[kk + prev_off]
        scales.append(cur / norm)
    t, f = feat.shape
    out = np.zeros((t, f * (order + 1)))
    for i, sc in enumerate(scales):
        off = (len(sc) - 1) // 2
        for ti in range(t):
            acc = np.zeros(f)
            for j in range(-off, off + 1):
                acc += sc[j + off] * feat[np.clip(ti + j, 0, t - 1)]
            out[ti, i * f:(i + 1) * f] = acc
    return out


# --------------------------- Kaldi sliding CMN -----------------------------

def golden_cmvn(feat, window=300):
    """Kaldi sliding-window CMN, center=True (reference iv_plda.py:296-377)."""
    t = feat.shape[0]
    out = np.empty_like(feat)
    for i in range(t):
        ws = i - window // 2
        we = ws + window
        if ws < 0:
            we -= ws
            ws = 0
        if we > t:
            ws -= we - t
            we = t
            ws = max(ws, 0)
        out[i] = feat[i] - feat[ws:we].mean(axis=0)
    return out


def main():
    rng = np.random.default_rng(20260816)
    t = np.arange(6400) / 16000.0
    inputs = {
        # white noise, int16 domain
        "noise": (rng.standard_normal(6400) * 8000.0),
        # harmonic sweep with silence head (exercises energy floor + edges)
        "sweep": np.concatenate([
            np.zeros(800),
            20000.0 * np.sin(2 * math.pi * (300 + 1200 * t[:5600]) * t[:5600]),
        ]),
        # speech-like AM harmonics
        "voiced": 12000.0 * (np.sin(2 * math.pi * 180 * t)
                             + 0.5 * np.sin(2 * math.pi * 360 * t))
        * (0.5 + 0.5 * np.sin(2 * math.pi * 4 * t)),
    }
    arrays = {}
    for name, wav in inputs.items():
        wav = wav.astype(np.float64)
        arrays[f"{name}_wav"] = wav.astype(np.float32)
        m24 = golden_mfcc(wav, num_ceps=24)
        m30 = golden_mfcc(wav, num_ceps=30)
        arrays[f"{name}_mfcc24"] = m24
        arrays[f"{name}_mfcc30"] = m30
        arrays[f"{name}_delta"] = golden_delta(m24)
        arrays[f"{name}_cmvn"] = golden_cmvn(arrays[f"{name}_delta"])
    out = os.path.join(os.path.dirname(__file__),
                       "kaldi_frontend_golden.npz")
    np.savez_compressed(out, **arrays)
    print(f"wrote {out}: {sorted(arrays)}")


if __name__ == "__main__":
    main()
