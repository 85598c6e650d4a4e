"""Real-pretrained-artifact parity (gated) + harness validation on a
random-weight stand-in exported through the SAME file formats.

The true Kaldi UBM / T-matrix / PLDA and xvecTDNN checkpoint are not
available in this environment (no network; download links in reference
README.md:66-74), so the real-system EER/threshold parity check is a gated,
ready-to-run test: point SPEAKERGUARD_PRETRAINED at the reference's
pre-trained-models dir (and SPEAKERGUARD_DATA at a dir with
Spk10_enroll/test/imposter) to run it.

The stand-in test proves the harness itself end to end: random weights are
exported through the reference Kaldi text formats, the harness runs
enroll -> set_threshold through the real CLIs, and the printed
threshold/EER/ACC are asserted against a same-weights torch
re-implementation of the reference pipeline + an iterative transcription
of the reference's EER sweep (reference set_threshold.py:22-47).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from fixtures import make_small_iv_artifacts, make_wav_dataset


@pytest.mark.skipif(
    not os.environ.get("SPEAKERGUARD_PRETRAINED"),
    reason="reference pretrained artifacts not available in this "
           "environment; set SPEAKERGUARD_PRETRAINED (+ optionally "
           "SPEAKERGUARD_DATA, SPEAKERGUARD_EXPECTED) to run real-system "
           "EER/threshold parity (download links: reference README.md:66-74)")
def test_real_pretrained_parity():
    import verify_pretrained
    rc = verify_pretrained.main(
        ["-data_root", os.environ.get("SPEAKERGUARD_DATA", "./data")]
        + (["-expected", os.environ["SPEAKERGUARD_EXPECTED"]]
           if os.environ.get("SPEAKERGUARD_EXPECTED") else []))
    assert rc == 0


def _reference_eer_sweep(score_target, score_untarget):
    """Iterative transcription of reference set_threshold.py:22-47."""
    final_threshold, min_difference = 0.0, np.inf
    final_far = final_frr = 0.0
    for cand in score_target:
        frr = sum(1 for s in score_target if s < cand) * 100 / len(
            score_target)
        far = sum(1 for s in score_untarget if s >= cand) * 100 / len(
            score_untarget)
        if abs(frr - far) < min_difference:
            min_difference = abs(frr - far)
            final_threshold, final_frr, final_far = cand, frr, far
    return final_threshold, final_frr, final_far


def test_harness_on_random_standin(tmp_path):
    torch = pytest.importorskip("torch")
    import verify_pretrained
    from test_parity_torch import _TorchIv
    from speakerguard_tpu.models.iv_plda import load_iv_plda_params
    from speakerguard_tpu.utils.kaldi_io import parse_enroll_model_file
    from speakerguard_tpu.utils.audio_io import read_wav

    rng = np.random.default_rng(23)
    # artifact dir in the reference layout; d=72 = 24 ceps x 3 matches the
    # default MFCC config (and the torch reference frontend's 24 ceps)
    pre_dir = str(tmp_path)
    iv_dir = os.path.join(pre_dir, "iv_plda")
    os.makedirs(iv_dir)
    # the fixture writers already use the reference file names
    # (final_ubm.txt / final_ie.txt / plda.txt / mean.vec / transform.txt)
    make_small_iv_artifacts(iv_dir, rng, c=8, d=72, iv=16, r=8)

    data_root = os.path.join(pre_dir, "data")
    os.makedirs(data_root, exist_ok=True)
    for name, spks, upp in [("Spk10_enroll", 3, 2), ("Spk10_test", 3, 2),
                            ("Spk10_imposter", 2, 1)]:
        make_wav_dataset(data_root, rng, name=name, n_spks=spks,
                         utts_per_spk=upp, length=8000)
    import shutil
    imp = os.path.join(data_root, "Spk10_imposter")
    for i, d in enumerate(sorted(os.listdir(imp))):
        shutil.move(os.path.join(imp, d), os.path.join(imp, f"imp{i}"))

    model_dir = os.path.join(pre_dir, "model_file")
    results, failures = verify_pretrained.verify_system(
        "iv_plda", pre_dir, data_root, model_dir=model_dir)
    assert not failures

    # ---- same-weights torch reference pipeline -> expected numbers ----
    params = load_iv_plda_params(
        os.path.join(iv_dir, "final_ubm.txt"),
        os.path.join(iv_dir, "final_ie.txt"),
        os.path.join(iv_dir, "plda.txt"),
        os.path.join(iv_dir, "mean.vec"),
        os.path.join(iv_dir, "transform.txt"))
    _, spk_ids, _, _, embs = parse_enroll_model_file(
        os.path.join(model_dir, "iv_plda", "speaker_model_iv_plda"))
    ref = _TorchIv(params, np.asarray(embs))

    def torch_scores(wav_dir):
        out = []
        for spk in sorted(os.listdir(wav_dir)):
            sdir = os.path.join(wav_dir, spk)
            if not os.path.isdir(sdir):
                continue
            for name in sorted(os.listdir(sdir)):
                wav = read_wav(os.path.join(sdir, name)) * (2.0 ** 15)
                s = ref.score_one(torch.tensor(wav)).detach().numpy()
                out.append((spk, s))
        return out

    test_scores = torch_scores(os.path.join(data_root, "Spk10_test"))
    imp_scores = torch_scores(os.path.join(data_root, "Spk10_imposter"))

    sv_t, sv_u, osi_t, osi_u = [], [], [], []
    acc = 0
    for spk, s in test_scores:
        t = spk_ids.index(spk)
        sv_t.append(s[t])
        sv_u += [v for i, v in enumerate(s) if i != t]
        if int(np.argmax(s)) == t:
            acc += 1
            osi_t.append(s[t])
    for _, s in imp_scores:
        sv_u += list(s)
        osi_u.append(float(np.max(s)))

    thr_sv, frr, far = _reference_eer_sweep(sv_t, sv_u)
    assert abs(results["sv_threshold"] - thr_sv) < 0.05
    assert abs(results["sv_eer"] - max(frr, far)) < 1e-6
    thr_osi, frr, far = _reference_eer_sweep(osi_t, osi_u)
    assert abs(results["osi_threshold"] - thr_osi) < 0.05
    assert abs(results["osi_eer"] - max(frr, far)) < 1e-6
    assert abs(results["csi_acc"] - acc * 100 / len(test_scores)) < 1e-6
