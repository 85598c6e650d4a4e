"""Native numpy PESQ (ITU-T P.862 structure, P.862.2 wideband mapping).

Replaces the compiled `pesq` package dependency (reference
metric/metric.py:44-48) for the adversarial-audio use case: reference and
degraded signals are the same utterance plus a small perturbation — equal
length, zero (or near-zero) delay, no transcoding time warps.

Implemented from the P.862 specification:

  * level alignment to a fixed internal power in the speech band
  * 100 Hz high-pass input filter (P.862.2 wideband input characteristic)
  * crude delay estimation by frame-energy cross-correlation
  * 32 ms Hann frames, 50% overlap, power spectra binned into 49 Bark
    bands (Schroeder scale, uniform in Bark over 0..8 kHz)
  * partial frequency-response compensation of the reference and
    short-term gain compensation of the degraded signal
  * Zwicker intensity->loudness with band-dependent exponent and absolute
    hearing threshold (Terhardt curve)
  * center-clipped (0.25 min) loudness-difference disturbance, asymmetric
    disturbance via the (deg/ref)^1.2 band-power ratio gated at [3, 12]
  * per-frame pseudo-Lp (p=2 symmetric / p=1 asymmetric) with Bark-width
    weights, low-reference-power frame emphasis, 45 cap
  * L6 over 20-frame "syllables" (step 10), L2 across syllables
  * raw = 4.5 - 0.1 d_symm - 0.0309 d_asym, mapped to MOS-LQO by the
    P.862.2 logistic y = 0.999 + 4/(1 + exp(-1.3669 x + 3.8224))

CONFORMANCE CAVEATS (documented, deliberate): the ITU reference implements
utterance splitting with per-utterance fine alignment and bad-interval
re-decoding, and ships fitted per-band tables; this implementation uses a
single crude alignment (exact for perturbation-style degradations) and
derives band tables from the published formulas.  Identical signals score
the exact wideband ceiling 4.644 (raw 4.5 through the P.862.2 map), and
scores degrade monotonically with perturbation size; absolute values on
transcoded/time-warped material may deviate from the ITU implementation.
"""

import numpy as np
from scipy import signal as ssig

FS = 16000
FRAME = 512          # 32 ms
HOP = 256
NB = 49              # Bark bands (wideband)
# power-density calibration: P.862's published Sp_16k (6.910853e-6) applies
# to its own FFT/band normalization; ours differs, so the density scale was
# re-fitted so the speech+AWGN MOS curve tracks published P.862.2 behavior
# (~4.5 @ 40 dB SNR, ~3.3 @ 30, ~2.1 @ 20, ~1.5 @ 10)
SP = 6.910853e-8
SL = 1.866055e-1     # loudness calibration (P.862 16k value)


def _bark(f):
    return 7.0 * np.arcsinh(np.asarray(f, np.float64) / 650.0)


def _bark_inv(z):
    return 650.0 * np.sinh(np.asarray(z, np.float64) / 7.0)


class _Tables:
    """Per-band constants, built once."""

    def __init__(self):
        z_edges = np.linspace(_bark(0.0), _bark(FS / 2), NB + 1)
        self.width_bark = np.diff(z_edges)                      # (NB,)
        self.centre_bark = 0.5 * (z_edges[:-1] + z_edges[1:])
        f_edges = _bark_inv(z_edges)
        self.width_hz = np.diff(f_edges)
        centre_hz = 0.5 * (f_edges[:-1] + f_edges[1:])
        self.centre_hz = centre_hz

        # fft-bin -> band assignment (bin 0 = DC excluded from bands)
        freqs = np.arange(FRAME // 2 + 1) * (FS / FRAME)
        self.band_of_bin = np.clip(
            np.searchsorted(f_edges, freqs, side="right") - 1, 0, NB - 1)
        self.bins_per_band = np.maximum(
            np.bincount(self.band_of_bin[1:], minlength=NB), 1)

        # absolute hearing threshold (Terhardt 1979), dB SPL -> internal
        # power units.  Internal calibration: active speech is levelled to
        # 1e7 power =~ 79 dB SPL, so 0 dB SPL =~ 10^(7 - 7.9) power units.
        khz = np.clip(centre_hz, 20.0, None) / 1000.0
        thr_db = (3.64 * khz ** -0.8
                  - 6.5 * np.exp(-0.6 * (khz - 3.3) ** 2)
                  + 1e-3 * khz ** 4)
        thr_db = np.clip(thr_db, -10.0, 90.0)
        self.abs_thresh = 10.0 ** ((thr_db - 9.0) / 10.0)

        # band-dependent Zwicker exponent modifier (P.862: low bands get
        # h = 6/(z+2) capped at 2, compressed by ^0.15)
        h = np.where(self.centre_bark < 4.0,
                     6.0 / (self.centre_bark + 2.0), 1.0)
        h = np.minimum(h, 2.0) ** 0.15
        self.zwicker_exp = 0.23 * h


_T = _Tables()


def _level_align(x):
    """Scale so mean power over the 350-3250 Hz band of the active part is
    the internal target 1e7 (P.862 fixed level alignment)."""
    spec = np.fft.rfft(x)
    freqs = np.arange(len(spec)) * (FS / len(x))
    band = (freqs >= 350.0) & (freqs <= 3250.0)
    band_power = (np.abs(spec[band]) ** 2).sum() / len(x) ** 2 * 2.0
    active = max(np.mean(x ** 2), 1e-20)
    # power of the in-band signal per sample
    p = max(band_power, 1e-6 * active, 1e-20)
    return x * np.sqrt(1.0e7 / p)


def _input_filter(x):
    """P.862.2 wideband input characteristic: 100 Hz high-pass."""
    sos = ssig.butter(4, 100.0 / (FS / 2), "highpass", output="sos")
    return ssig.sosfilt(sos, x)


def _crude_align(ref, deg):
    """Integer-sample delay of deg relative to ref via cross-correlation of
    4 ms frame-energy envelopes; shift deg to align (zero-pad)."""
    flen = 64
    n = min(len(ref), len(deg)) // flen * flen
    er = (ref[:n].reshape(-1, flen) ** 2).sum(1)
    ed = (deg[:n].reshape(-1, flen) ** 2).sum(1)
    er = np.log1p(er)
    ed = np.log1p(ed)
    corr = ssig.correlate(ed - ed.mean(), er - er.mean(), mode="full")
    delay_frames = int(np.argmax(corr)) - (len(er) - 1)
    delay = delay_frames * flen
    if delay > 0:
        deg = deg[delay:]
    elif delay < 0:
        deg = np.concatenate([np.zeros(-delay), deg])
    m = min(len(ref), len(deg))
    return ref[:m], deg[:m]


def _pitch_power_densities(x):
    """(T, NB) Bark-band power densities of 32 ms Hann frames."""
    n_frames = (len(x) - FRAME) // HOP + 1
    if n_frames <= 0:
        return np.zeros((0, NB))
    idx = (np.arange(n_frames) * HOP)[:, None] + np.arange(FRAME)[None, :]
    w = np.hanning(FRAME)
    spec = np.fft.rfft(x[idx] * w, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2)
    power[:, 0] = 0.0  # exclude DC
    bands = np.zeros((n_frames, NB))
    np.add.at(bands.T, _T.band_of_bin, power.T)
    # normalize by bins per band and scale to pitch-power-density units
    return bands / _T.bins_per_band * _T.width_hz * SP


def _loudness(ppd):
    """Zwicker intensity -> loudness, (T, NB) -> (T, NB)."""
    p0 = _T.abs_thresh[None, :]
    g = _T.zwicker_exp[None, :]
    loud = (SL * (p0 / 0.5) ** g
            * ((0.5 + 0.5 * ppd / p0) ** g - 1.0))
    return np.where(ppd > p0, loud, 0.0)


def _pseudo_lp(d, p):
    """P.862 pseudo-Lp over bands with Bark-width weights, (T, NB)->(T,)."""
    w = _T.width_bark[None, :]
    tot = _T.width_bark.sum()
    return (np.sum((np.abs(d) * w) ** p, axis=1) / tot) ** (1.0 / p) * tot


def _lpq_time(frame_d, p_syll=6.0, p_time=2.0, syll=20, step=10):
    """L6 over 20-frame syllables (step 10), then L2 over syllables."""
    t = len(frame_d)
    if t == 0:
        return 0.0
    vals = []
    for s in range(0, max(t - syll, 0) + 1, step):
        seg = frame_d[s:s + syll]
        vals.append((np.mean(seg ** p_syll)) ** (1.0 / p_syll))
    if not vals:
        vals = [(np.mean(frame_d ** p_syll)) ** (1.0 / p_syll)]
    v = np.asarray(vals)
    return float((np.mean(v ** p_time)) ** (1.0 / p_time))


def pesq_wb(ref, deg):
    """Wideband PESQ MOS-LQO for 16 kHz float signals in [-1, 1).

    Follows the P.862 perceptual model + P.862.2 output mapping (see module
    docstring for conformance caveats)."""
    ref = np.asarray(ref, np.float64).flatten() * 32768.0
    deg = np.asarray(deg, np.float64).flatten() * 32768.0
    if len(ref) < 2 * FRAME or len(deg) < 2 * FRAME:
        raise ValueError("signals too short for PESQ (need >= 64 ms)")

    ref = _input_filter(_level_align(ref))
    deg = _input_filter(_level_align(deg))
    ref, deg = _crude_align(ref, deg)

    ppd_ref = _pitch_power_densities(ref)
    ppd_deg = _pitch_power_densities(deg)
    t = min(len(ppd_ref), len(ppd_deg))
    if t == 0:
        raise ValueError("no frames")
    ppd_ref, ppd_deg = ppd_ref[:t], ppd_deg[:t]

    frame_pow_ref = ppd_ref.sum(1)
    frame_pow_deg = ppd_deg.sum(1)
    active = frame_pow_ref > 1e4  # speech-active frames
    if not active.any():
        active = np.ones(t, bool)

    # partial frequency-response compensation (applied to the reference)
    mean_ref = ppd_ref[active].mean(0)
    mean_deg = ppd_deg[active].mean(0)
    band_ratio = np.clip((mean_deg + 1000.0) / (mean_ref + 1000.0),
                         0.01, 100.0)
    ppd_ref_eq = ppd_ref * band_ratio[None, :]

    # short-term gain compensation (applied to the degraded signal)
    raw_gain = ((frame_pow_ref + 5e3) / (frame_pow_deg + 5e3))
    gain = np.empty_like(raw_gain)
    h = 1.0
    for i in range(t):
        h = 0.8 * h + 0.2 * raw_gain[i]
        gain[i] = np.clip(h, 3e-4, 5.0)
    ppd_deg_eq = ppd_deg * gain[:, None]

    loud_ref = _loudness(ppd_ref_eq)
    loud_deg = _loudness(ppd_deg_eq)

    # center-clipped disturbance
    d = loud_deg - loud_ref
    m = 0.25 * np.minimum(loud_deg, loud_ref)
    d = np.sign(d) * np.maximum(np.abs(d) - m, 0.0)

    # asymmetric disturbance
    r = ((ppd_deg_eq + 50.0) / (ppd_ref_eq + 50.0)) ** 1.2
    r = np.where(r < 3.0, 0.0, np.minimum(r, 12.0))
    da = d * r

    frame_d = _pseudo_lp(d, 2.0)
    frame_da = _pseudo_lp(da, 1.0)

    # emphasize low-reference-power frames, cap at 45
    emph = ((frame_pow_ref + 1e5) / 1e7) ** 0.04
    frame_d = np.minimum(frame_d / emph, 45.0)
    frame_da = np.minimum(frame_da / emph, 45.0)

    d_symm = _lpq_time(frame_d)
    d_asym = _lpq_time(frame_da)

    raw = 4.5 - 0.1 * d_symm - 0.0309 * d_asym
    # P.862.2 wideband mapping to MOS-LQO
    return float(0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224)))
