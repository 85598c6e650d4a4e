"""Slow, loop-based NumPy oracles for the Kaldi feature pipeline.

These are written as direct per-frame transcriptions of the Kaldi algorithm
definitions (feature-window.cc / mel-computations.cc / feat/*-functions),
deliberately structured differently from the vectorized TPU implementations
they validate, to catch vectorization/indexing bugs.
"""

import math

import numpy as np


def oracle_mfcc_single(wav: np.ndarray, num_ceps: int = 24,
                       num_mel_bins: int = 30, sample_freq: int = 16000,
                       frame_shift: int = 160, frame_length: int = 400,
                       preemph: float = 0.97, low_freq: float = 20.0,
                       high_freq: float = 7600.0, lifter: float = 22.0,
                       ) -> np.ndarray:
    """One utterance, per-frame loop; snip_edges=False; dither=0;
    remove_dc_offset; povey; raw energy replaces c0."""
    n = len(wav)
    n_fft = 512
    eps = np.finfo(np.float32).eps
    t = (n + frame_shift // 2) // frame_shift

    # window function
    i = np.arange(frame_length)
    povey = (0.5 - 0.5 * np.cos(2 * math.pi * i / (frame_length - 1))) ** 0.85

    # mel banks
    def mel(f):
        return 1127.0 * math.log(1.0 + f / 700.0)
    mel_low, mel_high = mel(low_freq), mel(high_freq)
    delta = (mel_high - mel_low) / (num_mel_bins + 1)
    banks = np.zeros((num_mel_bins, n_fft // 2 + 1))
    for b in range(num_mel_bins):
        left, center, right = (mel_low + b * delta, mel_low + (b + 1) * delta,
                               mel_low + (b + 2) * delta)
        for k in range(n_fft // 2):
            freq = k * sample_freq / n_fft
            m = mel(freq)
            if left < m < right:
                if m <= center:
                    banks[b, k] = (m - left) / (center - left)
                else:
                    banks[b, k] = (right - m) / (right - center)

    # dct
    dct = np.zeros((num_ceps, num_mel_bins))
    for r in range(num_ceps):
        for c in range(num_mel_bins):
            if r == 0:
                dct[r, c] = math.sqrt(1.0 / num_mel_bins)
            else:
                dct[r, c] = math.sqrt(2.0 / num_mel_bins) * math.cos(
                    math.pi / num_mel_bins * (c + 0.5) * r)

    lifter_c = np.array([1.0 + 0.5 * lifter * math.sin(math.pi * q / lifter)
                         for q in range(num_ceps)])

    feats = np.zeros((t, num_ceps))
    for fr in range(t):
        start = fr * frame_shift + frame_shift // 2 - frame_length // 2
        frame = np.empty(frame_length)
        for j in range(frame_length):
            s = start + j
            while s < 0 or s >= n:
                s = -s - 1 if s < 0 else 2 * n - 1 - s
            frame[j] = wav[s]
        frame = frame - frame.mean()
        log_energy = math.log(max((frame ** 2).sum(), eps))
        pre = frame.copy()
        pre[1:] -= preemph * frame[:-1]
        pre[0] -= preemph * frame[0]
        windowed = pre * povey
        spec = np.fft.rfft(windowed, n=n_fft)
        power = np.abs(spec) ** 2
        melE = np.log(np.maximum(banks @ power, eps))
        cep = (dct @ melE) * lifter_c
        cep[0] = log_energy
        feats[fr] = cep
    return feats


def oracle_delta_single(feat: np.ndarray, window: int = 3, order: int = 2
                        ) -> np.ndarray:
    """Per-frame loop transcription of Kaldi DeltaFeatures (replicate edges)."""
    t, f = feat.shape
    scales = [np.array([1.0])]
    for _ in range(order):
        prev = scales[-1]
        po = (len(prev) - 1) // 2
        cur = np.zeros(len(prev) + 2 * window)
        norm = 0.0
        for j in range(-window, window + 1):
            norm += j * j
            for k in range(-po, po + 1):
                cur[j + k + po + window] += j * prev[k + po]
        scales.append(cur / norm)
    out = np.zeros((t, f * (order + 1)))
    for i, s in enumerate(scales):
        mo = (len(s) - 1) // 2
        for fr in range(t):
            acc = np.zeros(f)
            for j in range(-mo, mo + 1):
                src = min(max(fr + j, 0), t - 1)
                acc += s[j + mo] * feat[src]
            out[fr, i * f:(i + 1) * f] = acc
    return out


def oracle_cmvn_single(feat: np.ndarray, cmn_window: int = 300,
                       center: bool = True) -> np.ndarray:
    """Per-frame loop transcription of Kaldi sliding-window CMN."""
    t, f = feat.shape
    out = feat.copy()
    for i in range(t):
        if center:
            ws = i - cmn_window // 2
            we = ws + cmn_window
        else:
            ws, we = 0, i + 1
        if ws < 0:
            we -= ws
            ws = 0
        if we > t:
            ws -= we - t
            we = t
            ws = max(ws, 0)
        out[i] -= feat[ws:we].mean(axis=0)
    return out
