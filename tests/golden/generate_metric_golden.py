"""Generate golden (ref, deg) -> (PESQ, STOI) triples for the native
metric implementations.

Run from the repo root:  python tests/golden/generate_metric_golden.py

Writes tests/golden/metric_golden.npz containing deterministic synthetic
signal pairs plus the metric values.  Provenance is recorded per metric:

  * "certified": the compiled `pesq` package / `pystoi` were importable at
    generation time and THEIR scores are stored — the regression test then
    pins the native implementations against the certified reference values.
  * "native-dual": the packages were absent (this environment has neither,
    and no network to fetch the ITU P.862 conformance vectors), so the
    NATIVE implementation's scores are stored — but only after the
    independently-written second implementation (tests/test_metric_golden
    ._independent_pesq / _independent_stoi) agreed within the stated
    tolerance at generation time; the independent values are stored
    alongside.  That pins absolute values as a regression anchor,
    cross-validated across two implementations, but is NOT ITU conformance
    — regenerate on a machine with `pip install pesq pystoi` to upgrade
    provenance without touching the tests.

Signals are speech-like (AM-modulated harmonic stacks with pauses) so the
silence-removal / syllable machinery of both metrics is exercised.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

FS = 16000


def speech_like(rng, seconds=3.0, f0=110.0):
    """Harmonic stack with AM 'syllables' and silent pauses + noise floor."""
    t = np.arange(int(FS * seconds)) / FS
    sig = np.zeros_like(t)
    for h in range(1, 12):
        sig += np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi)) / h
    syllable = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t - np.pi / 2))
    pauses = (np.sin(2 * np.pi * 0.7 * t) > -0.4).astype(float)
    sig = sig * syllable * pauses
    sig += 0.001 * rng.standard_normal(len(t))
    return (0.3 * sig / np.max(np.abs(sig))).astype(np.float64)


def degradations(rng, x):
    """Named degradations spanning the SNR range the framework reports."""
    out = {}
    for snr_db in (40, 30, 20, 10):
        p_sig = np.mean(x ** 2)
        noise = rng.standard_normal(len(x))
        noise *= np.sqrt(p_sig / np.mean(noise ** 2) / (10 ** (snr_db / 10)))
        out[f"awgn_{snr_db}db"] = x + noise
    # adversarial-style bounded perturbation (epsilon = 0.002 of full scale)
    out["linf_0.002"] = x + rng.uniform(-0.002, 0.002, len(x))
    # quantization (QT defense, q=512 on int16 scale)
    out["quant_q512"] = np.round(x * 32768 / 512) * 512 / 32768
    # lowpass (DS defense flavor)
    from scipy import signal as ssig
    b, a = ssig.butter(6, 4000 / (FS / 2))
    out["lowpass_4k"] = ssig.lfilter(b, a, x)
    return out


def main():
    from speakerguard_tpu.metrics.metric import PESQ, STOI
    from speakerguard_tpu.metrics.pesq_native import pesq_wb

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".."))
    from test_metric_golden import _independent_pesq, _independent_stoi

    try:
        from pesq import pesq as pkg_pesq  # noqa: F401
        pesq_source = "certified"
    except ImportError:
        pkg_pesq = None
        pesq_source = "native-dual"
    try:
        from pystoi import stoi as pkg_stoi  # noqa: F401
        stoi_source = "certified"
    except ImportError:
        pkg_stoi = None
        stoi_source = "native-dual"

    rng = np.random.default_rng(2026)
    ref = speech_like(rng)
    degs = degradations(rng, ref)

    from scipy import signal as ssig2
    names, pesqs, stois, pesqs_ind, stois_ind = [], [], [], [], []
    for name, deg in sorted(degs.items()):
        if pkg_pesq is not None:
            p = float(pkg_pesq(FS, ref.astype(np.float32),
                               deg.astype(np.float32), "wb"))
        else:
            p = float(pesq_wb(ref, deg))
        if pkg_stoi is not None:
            s = float(pkg_stoi(ref, deg, FS, extended=False))
        else:
            s = float(STOI(ref, deg, fs=FS))
        # dual-native cross-validation at generation time
        p_ind = float(_independent_pesq(ref, deg))
        s_ind = _independent_stoi(ssig2.resample_poly(ref, 5, 8),
                                  ssig2.resample_poly(deg, 5, 8))
        assert abs(p - p_ind) < 0.25, (name, p, p_ind)
        assert s_ind is None or abs(s - s_ind) < 0.02, (name, s, s_ind)
        names.append(name)
        pesqs.append(p)
        stois.append(s)
        pesqs_ind.append(p_ind)
        stois_ind.append(s_ind if s_ind is not None else np.nan)
        print(f"{name:14s} PESQ={p:.4f} (ind {p_ind:.4f}, {pesq_source})  "
              f"STOI={s:.4f} (ind {s_ind:.4f}, {stoi_source})")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "metric_golden.npz")
    np.savez_compressed(
        out, ref=ref, names=np.array(names),
        pesq=np.array(pesqs), stoi=np.array(stois),
        pesq_independent=np.array(pesqs_ind),
        stoi_independent=np.array(stois_ind),
        pesq_source=pesq_source, stoi_source=stoi_source,
        **{f"deg_{n}": d for n, d in degs.items()})
    print("wrote", out)


if __name__ == "__main__":
    main()
