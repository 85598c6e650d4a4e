"""Metric conformance: absolute-value pins + independent cross-checks.

Three layers (VERDICT r2 #5):
  1. Regression pins: the checked-in golden triples
     (tests/golden/metric_golden.npz, see generate_metric_golden.py for
     provenance — "self" until regenerated on a machine with the compiled
     pesq/pystoi packages) must be reproduced exactly by the native
     implementations.
  2. Independent STOI: a from-the-paper reimplementation (written against
     Taal et al. 2011's published constants, structured differently from
     metrics/metric.py) must agree with the native STOI.
  3. Gated certification: when the compiled `pesq` / `pystoi` packages ARE
     importable, the native implementations are asserted against them
     directly (skipped here — neither is in this image).
"""

import os

import numpy as np
import pytest

from speakerguard_tpu.metrics.metric import STOI
from speakerguard_tpu.metrics.pesq_native import pesq_wb

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "metric_golden.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN), \
        "run python tests/golden/generate_metric_golden.py"
    return np.load(GOLDEN, allow_pickle=False)


def test_pesq_golden_values(golden):
    ref = golden["ref"]
    tol = 1e-6 if str(golden["pesq_source"]) == "self" else 0.1
    for name, want in zip(golden["names"], golden["pesq"]):
        got = pesq_wb(ref, golden[f"deg_{name}"])
        assert abs(got - want) < tol, (name, got, want)


def test_stoi_golden_values(golden):
    ref = golden["ref"]
    tol = 1e-6 if str(golden["stoi_source"]) == "self" else 0.02
    for name, want in zip(golden["names"], golden["stoi"]):
        got = STOI(ref, golden[f"deg_{name}"], fs=16000)
        assert abs(got - want) < tol, (name, got, want)


def test_pesq_identical_is_wideband_ceiling(golden):
    # raw 4.5 through the exact P.862.2 logistic = 4.6438887
    np.testing.assert_allclose(pesq_wb(golden["ref"], golden["ref"]),
                               4.6438887, atol=1e-4)


def test_pesq_monotone_in_snr(golden):
    ref = golden["ref"]
    vals = [pesq_wb(ref, golden[f"deg_awgn_{s}db"]) for s in (40, 30, 20, 10)]
    assert all(a > b for a, b in zip(vals, vals[1:])), vals


# ---------------------------------------------------------------------------
# Independent STOI (Taal, Hendriks, Heusdens, Jensen 2011):
# fs 10 kHz, 256-sample 50%-overlap Hann frames, 512-pt FFT, 15 one-third
# octave bands from 150 Hz, 40 dB silence removal, 384 ms (N=30) segments,
# clipping at beta = -15 dB SDR.  Written independently of
# metrics/metric.py (different structure: strided segment tensor, band
# matrix from edge frequencies).
# ---------------------------------------------------------------------------

def _independent_stoi(x10, y10):
    fs, nfft, flen, hop, nbands, nseg, beta = 10000, 512, 256, 128, 15, 30, -15
    win = np.hanning(flen + 2)[1:-1]

    def frames(sig):
        n = (len(sig) - flen) // hop + 1
        return np.lib.stride_tricks.as_strided(
            sig, (n, flen), (sig.strides[0] * hop, sig.strides[0])).copy()

    # silence removal on 40 dB dynamic range of frame energies
    fx, fy = frames(x10) * win, frames(y10) * win
    e = 20 * np.log10(np.linalg.norm(fx, axis=1) + 1e-14)
    keep = e > e.max() - 40.0
    fx, fy = fx[keep], fy[keep]
    # overlap-add back and re-frame (as the reference implementation does)
    def ola(fr):
        sig = np.zeros(len(fr) * hop + flen - hop)
        for i, f in enumerate(fr):
            sig[i * hop:i * hop + flen] += f
        return sig
    fx, fy = frames(ola(fx)) * win, frames(ola(fy)) * win

    spec_x = np.abs(np.fft.rfft(fx, nfft, axis=1)) ** 2
    spec_y = np.abs(np.fft.rfft(fy, nfft, axis=1)) ** 2
    freqs = np.linspace(0, fs, nfft + 1)[: nfft // 2 + 1]
    cfs = 150.0 * 2.0 ** (np.arange(nbands) / 3.0)
    band = np.zeros((nbands, len(freqs)))
    for i, cf in enumerate(cfs):
        lo = np.argmin(np.abs(freqs - cf * 2 ** (-1 / 6)))
        hi = np.argmin(np.abs(freqs - cf * 2 ** (1 / 6)))
        band[i, lo:hi] = 1.0
    bx = np.sqrt(np.maximum(band @ spec_x.T, 1e-30))  # (bands, frames)
    by = np.sqrt(np.maximum(band @ spec_y.T, 1e-30))

    if bx.shape[1] < nseg:
        return None
    c = 10 ** (-beta / 20)
    total, count = 0.0, 0
    for m in range(nseg, bx.shape[1] + 1):
        xs, ys = bx[:, m - nseg:m], by[:, m - nseg:m]
        alpha = np.sqrt((xs ** 2).sum(1, keepdims=True)
                        / ((ys ** 2).sum(1, keepdims=True) + 1e-30))
        yp = np.minimum(alpha * ys, (1 + c) * xs)
        xc = xs - xs.mean(1, keepdims=True)
        yc = yp - yp.mean(1, keepdims=True)
        r = (xc * yc).sum(1) / (np.linalg.norm(xc, axis=1)
                                * np.linalg.norm(yc, axis=1) + 1e-30)
        total += r.sum()
        count += nbands
    return total / count


def test_stoi_matches_independent_implementation(golden):
    from scipy import signal as ssig
    ref = golden["ref"]
    for name in ("awgn_20db", "awgn_40db", "lowpass_4k"):
        deg = golden[f"deg_{name}"]
        x10 = ssig.resample_poly(ref, 5, 8)
        y10 = ssig.resample_poly(deg, 5, 8)
        want = _independent_stoi(x10, y10)
        got = STOI(ref, deg, fs=16000)
        assert abs(got - want) < 0.02, (name, got, want)


# ---------------------------------------------------------------------------
# Gated certification against the compiled packages
# ---------------------------------------------------------------------------

def test_pesq_certified_against_package(golden):
    pesq_pkg = pytest.importorskip(
        "pesq", reason="compiled pesq package not in this image; install it "
                       "to certify the native PESQ against ITU P.862")
    ref = golden["ref"].astype(np.float32)
    for name in golden["names"]:
        deg = golden[f"deg_{name}"].astype(np.float32)
        want = pesq_pkg.pesq(16000, ref, deg, "wb")
        got = pesq_wb(ref, deg)
        assert abs(got - want) < 0.25, (name, got, want)


def test_stoi_certified_against_package(golden):
    pystoi = pytest.importorskip(
        "pystoi", reason="pystoi not in this image; install it to certify "
                         "the native STOI")
    ref = golden["ref"]
    for name in golden["names"]:
        deg = golden[f"deg_{name}"]
        want = pystoi.stoi(ref, deg, 16000, extended=False)
        got = STOI(ref, deg, fs=16000)
        assert abs(got - want) < 0.02, (name, got, want)
