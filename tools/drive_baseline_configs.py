"""Drive the five BASELINE.json configs end-to-end on the real chip through
the CLIs (the exact surface the reference exposes), in the synthetic world
(no pretrained artifacts in this environment).

Re-run after any change to the attack CLI path — r2 shipped a domain-
scaling bug here that unit tests missed; these drives are the regression
evidence.  Prints one RESULT line per config and a final JSON summary.

Run: timeout 3000 python -u tools/drive_baseline_configs.py [workdir]
"""

import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_world(base):
    import numpy as np
    from fixtures import make_small_iv_artifacts, make_wav_dataset
    rng = np.random.default_rng(42)
    os.makedirs(base, exist_ok=True)
    make_small_iv_artifacts(base, rng)
    for name, spks, upp in [("Spk10_enroll", 3, 2), ("Spk10_test", 3, 2),
                            ("Spk10_imposter", 2, 1)]:
        make_wav_dataset(os.path.join(base, "data"), rng, name=name,
                         n_spks=spks, utts_per_spk=upp, length=8000)
    imp = os.path.join(base, "data", "Spk10_imposter")
    for i, d in enumerate(sorted(os.listdir(imp))):
        shutil.move(os.path.join(imp, d), os.path.join(imp, f"imp{i}"))
    # AudioNet checkpoint (torch state dict) + label encoder
    import torch
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_networks import TorchAudioNet
    torch.manual_seed(3)
    net = TorchAudioNet(num_class=3)
    torch.save(net.state_dict(), os.path.join(base, "audionet.ckpt"))
    with open(os.path.join(base, "label_enc.txt"), "w") as f:
        for i in range(3):
            f.write(f"'spk{i}' {i}\n")


def torch_fgsm_success(base, data, epsilon):
    """Independent torch FGSM on the exact config-1 inputs: same ckpt,
    same Dataset iteration (labels/crop/normalize), same epsilon/loss —
    the tests/test_parity_torch.py harness applied to the drive world.
    Returns the torch success rate in percent."""
    import numpy as np
    import torch
    import torch.nn.functional as F
    from test_networks import TorchAudioNet
    from test_parity_torch import _torch_logmel
    from speakerguard_tpu.models.audionet import parse_label_encoder
    from speakerguard_tpu.data.dataset import Dataset

    spk_ids = parse_label_encoder(os.path.join(base, "label_enc.txt"))
    net = TorchAudioNet(num_class=len(spk_ids)).eval()
    net.load_state_dict(torch.load(os.path.join(base, "audionet.ckpt")))
    dataset = Dataset(spk_ids, data, "Spk10_test", normalize=True,
                      return_file_name=True, wav_length=8000)
    n_succ, n_tot = 0, 0
    for origin, true, names in dataset.batches(2):
        for w, lab in zip(np.asarray(origin, np.float32), true):
            xb = torch.tensor(w.reshape(-1)).requires_grad_()
            yb = torch.tensor([int(lab)], dtype=torch.long)
            loss = F.cross_entropy(net(_torch_logmel(xb)[None]), yb)
            loss.backward()
            adv = torch.clamp(xb.detach() + epsilon * torch.sign(xb.grad),
                              -1.0, 1.0)
            with torch.no_grad():
                dec = int(net(_torch_logmel(adv)[None]).argmax())
            n_succ += int(dec != int(lab))
            n_tot += 1
    return 100.0 * n_succ / n_tot


def run(argv, log):
    t0 = time.time()
    with open(log, "w") as f:
        p = subprocess.run([sys.executable, "-u", "-m"] + argv, stdout=f,
                           stderr=subprocess.STDOUT, cwd=REPO, timeout=2400)
    out = open(log).read()
    return p.returncode, out, time.time() - t0


def success_rate(out):
    m = re.search(r"success rate: ([0-9.]+)", out)
    return float(m.group(1)) if m else None


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sg_drive"
    if os.path.exists(base):
        shutil.rmtree(base)
    build_world(base)
    data = os.path.join(base, "data")
    iv = ["iv_plda", "-gmm", f"{base}/final_ubm.txt", "-extractor",
          f"{base}/final_ie.txt", "-plda", f"{base}/plda.txt", "-mean",
          f"{base}/mean.vec", "-transform", f"{base}/transform.txt"]
    results = {}

    # enrollment prerequisites for the iv configs
    rc, out, dt = run(["speakerguard_tpu.cli.enroll", "-model_dir",
                       f"{base}/model_file", "-root", data] + iv,
                      f"{base}/enroll.log")
    assert rc == 0, out[-2000:]
    model_file = f"{base}/model_file/iv_plda/speaker_model_iv_plda"
    rc, out, dt = run(["speakerguard_tpu.cli.set_threshold", "-root", data]
                      + iv + ["-model_file", model_file],
                      f"{base}/thr.log")
    assert rc == 0, out[-2000:]
    thr = float(re.search(r"SV, result ---> threshold: ([-0-9.]+)",
                          out).group(1))
    print(f"[setup] enroll + set_threshold ok (SV threshold {thr})")

    common = ["-root", data, "-name", "Spk10_test", "-batch_size", "2",
              "-wav_length", "8000"]

    # 1. FGSM on AudioNet CSI-NE
    rc, out, dt = run(
        ["speakerguard_tpu.cli.attack_main"] + common
        + ["-des", f"{base}/adv_fgsm_audionet", "audionet_csine",
           "-extractor", f"{base}/audionet.ckpt", "-label_encoder",
           f"{base}/label_enc.txt", "FGSM", "-epsilon", "0.01"],
        f"{base}/c1.log")
    results["1_fgsm_audionet"] = {"rc": rc, "success": success_rate(out),
                                  "secs": round(dt, 1)}
    # same-weights torch cross-check (VERDICT r3 #7): run the identical
    # FGSM configuration on the SAME wavs/labels/ckpt through an
    # independent torch stack (tests/test_parity_torch.py harness) and
    # require the same success rate — anchors the drive's FGSM number
    # the way configs 2-5 are anchored by threshold/ASR agreement
    t_succ = torch_fgsm_success(base, data, epsilon=0.01)
    ours = results["1_fgsm_audionet"]["success"]
    results["1_fgsm_audionet"]["torch_success"] = round(t_succ, 6)
    results["1_fgsm_audionet"]["torch_success_match"] = (
        ours is not None and abs(t_succ - ours) < 1e-3)
    print("RESULT 1 FGSM/AudioNet:", results["1_fgsm_audionet"])

    # 2. PGD-100 xv-PLDA is bench.py's domain (random full-size weights);
    # here drive PGD-10 on iv through the CLI for the artifact path
    rc, out, dt = run(
        ["speakerguard_tpu.cli.attack_main"] + common
        + ["-des", f"{base}/adv_pgd"] + iv
        + ["-model_file", model_file, "PGD", "-max_iter", "10",
           "-epsilon", "0.002"],
        f"{base}/c2.log")
    results["2_pgd_iv_cli"] = {"rc": rc, "success": success_rate(out),
                               "secs": round(dt, 1)}
    print("RESULT 2 PGD/iv CLI:", results["2_pgd_iv_cli"])

    # 3a. CW2 on iv-PLDA CSI
    rc, out, dt = run(
        ["speakerguard_tpu.cli.attack_main"] + common
        + ["-des", f"{base}/adv_cw2"] + iv
        + ["-model_file", model_file, "CW2", "-max_iter", "60",
           "-binary_search_steps", "3", "-initial_const", "0.01"],
        f"{base}/c3a.log")
    results["3a_cw2_iv"] = {"rc": rc, "success": success_rate(out),
                            "secs": round(dt, 1)}
    print("RESULT 3a CW2/iv:", results["3a_cw2_iv"])

    # 3b. CWinf on iv-PLDA SV (threshold from set_threshold)
    rc, out, dt = run(
        ["speakerguard_tpu.cli.attack_main", "-task", "SV", "-threshold",
         str(thr)] + common + ["-des", f"{base}/adv_cwinf"] + iv
        + ["-model_file", model_file, "CWinf", "-max_iter", "10",
           "-epsilon", "0.005", "-step_size", "0.001"],
        f"{base}/c3b.log")
    results["3b_cwinf_iv_sv"] = {"rc": rc, "success": success_rate(out),
                                 "secs": round(dt, 1)}
    print("RESULT 3b CWinf/iv SV:", results["3b_cwinf_iv_sv"])

    # 4. FAKEBOB on OSI with on-device threshold estimation.  Pass ALL
    # imposter wavs: estimation skips any the model already accepts
    # (reference FAKEBOB.py:280-295 semantics) — in the tiny synthetic
    # world an imposter can score above the EER threshold by chance, and
    # a single-wav list would then leave nothing usable.
    imp_wavs = []
    for spk in sorted(os.listdir(os.path.join(data, "Spk10_imposter"))):
        d = os.path.join(data, "Spk10_imposter", spk)
        if os.path.isdir(d):
            imp_wavs += [os.path.join(d, f) for f in sorted(os.listdir(d))]
    rc, out, dt = run(
        ["speakerguard_tpu.cli.attack_main", "-task", "OSI", "-threshold",
         str(thr), "-thresh_est_wav_path"] + imp_wavs + common
        + ["-des", f"{base}/adv_fakebob"] + iv
        + ["-model_file", model_file, "FAKEBOB", "-max_iter", "60",
           "-epsilon", "0.01", "-samples", "10", "-samples_batch", "10",
           "-max_lr", "0.01"],
        f"{base}/c4.log")
    est = re.search(r"Estimated threshold: ([-0-9.]+)", out)
    results["4_fakebob_osi"] = {
        "rc": rc, "success": success_rate(out), "secs": round(dt, 1),
        "estimated_threshold": float(est.group(1)) if est else None,
        "true_threshold": thr}
    print("RESULT 4 FAKEBOB/OSI:", results["4_fakebob_osi"])

    # 5. BPDA+EOT PGD vs defended model (QT straight-through + FeCo)
    rc, out, dt = run(
        ["speakerguard_tpu.cli.attack_main", "-defense", "QT", "FeCo",
         "-defense_param", "512", "kmeans 0.2 L2", "-defense_flag", "0", "1",
         "-EOT_size", "2", "-EOT_batch_size", "2"] + common
        + ["-des", f"{base}/adv_bpda"] + iv
        + ["-model_file", model_file, "PGD", "-max_iter", "10",
           "-epsilon", "0.01", "-step_size", "0.002"],
        f"{base}/c5.log")
    results["5_bpda_eot_defended"] = {"rc": rc, "success": success_rate(out),
                                      "secs": round(dt, 1)}
    print("RESULT 5 BPDA+EOT/defended:", results["5_bpda_eot_defended"])

    # epsilon-ball + amplitude audit over every generated wav
    from speakerguard_tpu.utils.audio_io import read_wav
    import numpy as np
    audits = {}
    for tag, eps in [("adv_fgsm_audionet", 0.01), ("adv_pgd", 0.002),
                     ("adv_cwinf", 0.005), ("adv_fakebob", 0.01),
                     ("adv_bpda", 0.01)]:
        worst, amp_ok = 0.0, True
        for r, _, fs in os.walk(os.path.join(base, tag)):
            for f in fs:
                if not f.endswith(".wav"):
                    continue
                name = os.path.splitext(f)[0]
                orig = read_wav(os.path.join(
                    data, "Spk10_test", name.split("-")[0], f))
                adv = read_wav(os.path.join(r, f))
                worst = max(worst, float(np.max(np.abs(adv - orig))))
                if np.max(np.abs(adv)) < np.max(np.abs(orig)) - eps - 0.001:
                    amp_ok = False
        audits[tag] = {"worst_linf": round(worst, 6),
                       "eps_plus_quant": round(eps + 2 / 32768, 6),
                       "in_ball": worst <= eps + 2 / 32768 + 1e-9,
                       "amplitude_ok": amp_ok}
        print(f"AUDIT {tag}: {audits[tag]}")

    summary = {"results": results, "audits": audits}
    out_name = os.environ.get("DRIVE_OUT", "DRIVE_r04.json")
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY", json.dumps(summary))


if __name__ == "__main__":
    main()
