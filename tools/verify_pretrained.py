"""Gated parity harness against the reference's REAL pretrained artifacts.

This environment ships no network access and no pretrained checkpoints, so
true-system parity (EER / threshold / CSI accuracy on the actual Kaldi
UBM/T-matrix/PLDA and the xvecTDNN checkpoint) cannot be asserted in CI.
This tool makes it a ready-to-run check instead of an open TODO:

    SPEAKERGUARD_PRETRAINED=/path/to/pre-trained-models \
        python tools/verify_pretrained.py -data_root ./data \
        [-expected expected.json] [-systems iv_plda xv_plda]

Artifact layout is the reference's (reference attackMain.py:40-49; download
links reference README.md:66-74):

    <dir>/iv_plda/{final_ubm.txt,final_ie.txt,plda.txt,mean.vec,transform.txt}
    <dir>/xv_plda/{xvecTDNN_origin.ckpt,plda.txt,mean.vec,transform.txt}

and -data_root must contain Spk10_enroll / Spk10_test / Spk10_imposter.

For each system present the harness runs enroll -> set_threshold through
the real CLIs and prints the SV/OSI thresholds + EERs, OSI IER and CSI-E
accuracy.  With -expected (a JSON of numbers produced by the REFERENCE
code path on the same artifacts: `python set_threshold.py ...`, reference
set_threshold.py:110-126), it asserts agreement within tolerances and
exits nonzero on mismatch.

expected.json shape (any subset of keys per system):
    {"iv_plda": {"sv_threshold": 2.46, "sv_eer": 0.0, "osi_threshold": ...,
                 "osi_eer": ..., "osi_ier": ..., "csi_acc": 100.0},
     "xv_plda": {...}}

Tolerances: thresholds 0.05 absolute (score-grid resolution of the sweep),
EER/IER/ACC 1e-6 (they are exact count ratios over the same data).
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD_TOL = 0.05
RATE_TOL = 1e-6

IV_FILES = ("final_ubm.txt", "final_ie.txt", "plda.txt", "mean.vec",
            "transform.txt")
XV_FILES = ("xvecTDNN_origin.ckpt", "plda.txt", "mean.vec", "transform.txt")


def _system_args(system, pre_dir, model_dir, data_root):
    d = os.path.join(pre_dir, system)
    if system == "iv_plda":
        argv = ["-root", data_root, "iv_plda",
                "-gmm", os.path.join(d, "final_ubm.txt"),
                "-extractor", os.path.join(d, "final_ie.txt"),
                "-plda", os.path.join(d, "plda.txt"),
                "-mean", os.path.join(d, "mean.vec"),
                "-transform", os.path.join(d, "transform.txt")]
    else:
        argv = ["-root", data_root, "xv_plda",
                "-extractor", os.path.join(d, "xvecTDNN_origin.ckpt"),
                "-plda", os.path.join(d, "plda.txt"),
                "-mean", os.path.join(d, "mean.vec"),
                "-transform", os.path.join(d, "transform.txt")]
    return argv


def verify_system(system, pre_dir, data_root, expected=None,
                  model_dir=None):
    """enroll -> set_threshold for one system; returns (results, failures)."""
    from speakerguard_tpu.cli import enroll, set_threshold

    model_dir = model_dir or tempfile.mkdtemp(prefix=f"sg_verify_{system}_")
    enroll_argv = (["-model_dir", model_dir]
                   + _system_args(system, pre_dir, model_dir, data_root))
    eargs = enroll.parse_args(enroll_argv)
    enroll.main(eargs)

    targs = set_threshold.parse_args(
        _system_args(system, pre_dir, model_dir, data_root))
    targs.model_file = os.path.join(model_dir, system,
                                    f"speaker_model_{system}")
    results = set_threshold.main(targs)

    failures = []
    if expected:
        for key, want in expected.items():
            got = results.get(key)
            tol = THRESHOLD_TOL if key.endswith("threshold") else RATE_TOL
            if got is None or abs(got - want) > tol:
                failures.append(f"{system}.{key}: got {got}, reference "
                                f"value {want} (tol {tol})")
    return results, failures


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-dir", default=os.environ.get("SPEAKERGUARD_PRETRAINED"))
    ap.add_argument("-data_root", default="./data")
    ap.add_argument("-expected", default=None,
                    help="JSON of reference-produced numbers to assert")
    ap.add_argument("-systems", nargs="+", default=None)
    args = ap.parse_args(argv)

    if not args.dir:
        print("SPEAKERGUARD_PRETRAINED not set and -dir not given; nothing "
              "to verify.  Download the reference artifacts (reference "
              "README.md:66-74) and re-run.")
        return 2

    expected = {}
    if args.expected:
        with open(args.expected) as f:
            expected = json.load(f)

    systems = args.systems
    if systems is None:
        systems = []
        if all(os.path.exists(os.path.join(args.dir, "iv_plda", f))
               for f in IV_FILES):
            systems.append("iv_plda")
        if all(os.path.exists(os.path.join(args.dir, "xv_plda", f))
               for f in XV_FILES):
            systems.append("xv_plda")
    if not systems:
        print(f"no complete system artifact sets found under {args.dir}")
        return 2

    all_failures = []
    for system in systems:
        print(f"===== verifying {system} from {args.dir} =====")
        results, failures = verify_system(system, args.dir, args.data_root,
                                          expected.get(system))
        print(f"{system}: {json.dumps(results, sort_keys=True)}")
        all_failures += failures

    if all_failures:
        print("PARITY FAILURES:")
        for f in all_failures:
            print(" ", f)
        return 1
    print("parity verification "
          + ("PASSED" if expected else "ran (no expected values given — "
             "record the reference numbers in expected.json to assert)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
