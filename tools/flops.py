"""Analytic FLOP/byte accounting per attack-iteration stage (VERDICT r3 #2).

Counts the logical FLOPs (multiply-add = 2 FLOPs) and the dominant HBM
bytes of one PGD iteration (forward + input-gradient backward) for the
iv-PLDA and xv-PLDA chains at bench shapes, from the model dimensions the
code actually uses.  Combine with measured per-stage times to get achieved
TFLOP/s and MFU; `python tools/flops.py [batch [wav_len]]` prints the
table that ARCHITECTURE.md's MFU section embeds.

Precision notes folded into the table:
  * a Precision.HIGH matmul = 3 bf16 MXU passes (x3 the logical FLOPs of
    hardware work), DEFAULT/fast = 1 pass, HIGHEST = 6 passes;
  * memory-bound stages (augmentation gathers, CMVN, elementwise) are
    listed with bytes instead of FLOPs — their cost model is HBM traffic.
"""

import sys

sys.path.insert(0, "/root/repo")


def gflops_table(batch=128, wav_len=48000, topk=0, topk_amortize_iters=100):
    """topk > 0: the iv chain's GMM loglike/stats and i-vector quad/linear
    stages run in the selected K-subspace (shared selection, see
    gmm.make_topk_context) — their FLOPs scale by K/C — plus one full-C
    selection pass per attack run amortized over topk_amortize_iters
    iterations.  topk=0 (or >= C) is the dense path."""
    from speakerguard_tpu.ops.kaldi_mfcc import (IV_PLDA_MFCC, XV_PLDA_MFCC,
                                                 MfccConfig)
    from speakerguard_tpu.models.tdnn import TDNN_SPEC

    B = batch
    rows = []

    def add(chain, stage, gf_fwd, gf_bwd, note=""):
        rows.append((chain, stage, gf_fwd, gf_bwd, note))

    # ---------------- shared MFCC frontend (DFT matmuls) -----------------
    def frontend(cfg: MfccConfig, chain, passes_note):
        T = 1 + (wav_len - cfg.window_size) // cfg.window_shift
        nfft = cfg.padded_window_size
        nbin = nfft // 2 + 1
        # spectrum: (B*T, nfft) @ (nfft, 2*nbin) real+imag DFT matmul
        dft = 2 * B * T * nfft * 2 * nbin / 1e9
        mel = 2 * B * T * nbin * cfg.num_mel_bins / 1e9
        dct = 2 * B * T * cfg.num_mel_bins * cfg.num_ceps / 1e9
        # backward: same matmul shapes transposed (custom VJP)
        add(chain, f"frontend DFT(T={T},nfft={nfft})", dft, dft,
            passes_note)
        add(chain, "frontend mel+dct", mel + dct, mel + dct, "HIGH=3x")
        return T

    # ============================ iv-PLDA =================================
    cfg = IV_PLDA_MFCC
    T = frontend(cfg, "iv", "fast path HIGH=3x fwd, bwd HIGH")
    D = 3 * cfg.num_ceps          # 24 ceps x (base+delta+delta2) = 72
    C = 2048
    P = D * (D + 1) // 2          # 2628 packed quadratic lanes
    F = D + P                     # 2700 augmented features
    IV = 600
    PIV = IV * (IV + 1) // 2      # 180300 packed quad lanes

    # shared top-K Gaussian selection (SG_GMM_TOPK): the four C-scaled
    # stages evaluate K components; one full-C ranking pass per run
    # amortizes over the run's iterations
    K = C if not topk or topk >= C else topk
    sel_note = "" if K == C else f" topK={K}"

    aug_bytes = B * T * F * 2 * 3 / 1e9  # bf16 gather+mul traffic, GB
    add("iv", f"GMM aug (B,T,{F})", 0.0, 0.0,
        f"memory-bound ~{aug_bytes:.2f} GB bf16/dir")
    loglike = 2 * B * T * F * K / 1e9
    add("iv", f"GMM loglike ({F}x{K})", loglike, loglike,
        "fast bf16 1-pass; THE dominant matmul" + sel_note)
    if K != C:
        sel_pass = (2 * B * T * F * C + 6 * B * T * C) / 1e9
        add("iv", f"topK selection pass (/{topk_amortize_iters} iters)",
            sel_pass / topk_amortize_iters, 0.0,
            "one full-C loglike+softmax per run, amortized")
    stats = (2 * B * T * K * D) / 1e9
    softmax = 6 * B * T * K / 1e9
    add("iv", "softmax+stats (btk,btd->bkd)", stats + softmax,
        2 * stats + softmax, "fused custom VJP, bf16 residuals" + sel_note)
    quad = 2 * B * K * PIV / 1e9
    add("iv", f"quad contract ({K}x{PIV})", quad, quad,
        "fast bf16 1-pass" + sel_note)
    linear = 2 * B * K * IV * D / 1e9
    add("iv", "linear (kid,bkd->bi)", linear, linear, "fast bf16" + sel_note)
    chol = B * IV ** 3 / 3 / 1e9
    add("iv", f"cholesky ({IV}^3/3)", chol, 0.0,
        "Pallas R^T R; bwd reuses factor")
    tri = 4 * B * IV ** 2 / 1e9  # 2 solves fwd, 2 bwd
    add("iv", "triangular solves", tri, tri, "ops/trsv.py blocks")
    add("iv", "PLDA + lennorm", 2 * B * 150 * IV / 1e9,
        2 * B * 150 * IV / 1e9, "small")

    # ============================ xv-PLDA =================================
    cfg = XV_PLDA_MFCC
    T = frontend(cfg, "xv", "fast HIGH=3x (SG_DFT_FAST_PRECISION)")
    cin = cfg.num_ceps
    t = T
    conv_total_f = 0.0
    for (k, dil, cout) in TDNN_SPEC:
        t_out = t - (k - 1) * dil
        conv_total_f += 2 * B * t_out * k * cin * cout / 1e9
        cin, t = cout, t_out
    add("xv", f"TDNN convs (T'={t})", conv_total_f, conv_total_f,
        "DEFAULT bf16 1-pass; bwd = conv-transpose, same FLOPs")
    fc = 2 * B * (3000 * 512) / 1e9
    add("xv", "stats pool + fc1", fc, fc, "small")
    add("xv", "LDA + PLDA", 2 * B * 150 * 513 / 1e9,
        2 * B * 150 * 513 / 1e9, "small")

    # ============================ AudioNet ================================
    # logmel frontend: 1024-pt DFT matmuls at HIGH (see ops/logmel.py),
    # hop 160 -> T ~= wav_len/160
    T = wav_len // 160 + 1
    nfft, nbin, nmel = 1024, 513, 32
    dft = 2 * B * T * nfft * 2 * nbin / 1e9
    add("audionet", f"logmel DFT(T={T},nfft={nfft})", dft, dft, "HIGH=3x")
    from speakerguard_tpu.models.audionet import CONV_SPEC
    t = T - 0  # conv1 2D 5x5 pad 2 preserves T
    conv_f = 2 * B * T * nmel * 25 / 1e9  # 2D prefilter, 1 channel
    for (cin, cout, k, pad, pool) in CONV_SPEC:
        t_out = t + 2 * pad - (k - 1)
        conv_f += 2 * B * t_out * k * cin * cout / 1e9
        t = t_out // 2 if pool else t_out
    add("audionet", "conv stack", conv_f, conv_f,
        "DEFAULT bf16; NOT matmul-bound — frontend+elementwise dominate, "
        "which is why no audionet fast path exists")
    return rows


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    wav_len = int(sys.argv[2]) if len(sys.argv) > 2 else 48000
    rows = gflops_table(batch, wav_len)
    print(f"# per-PGD-iteration GFLOPs at batch={batch}, wav_len={wav_len}")
    print(f"{'chain':4s} {'stage':34s} {'fwd_GF':>9s} {'bwd_GF':>9s}  note")
    tot = {}
    for chain, stage, gf, gb, note in rows:
        print(f"{chain:4s} {stage:34s} {gf:9.1f} {gb:9.1f}  {note}")
        a, b = tot.get(chain, (0.0, 0.0))
        tot[chain] = (a + gf, b + gb)
    for chain, (a, b) in tot.items():
        per_utt = (a + b) / batch
        print(f"{chain:4s} TOTAL fwd={a:.1f} bwd={b:.1f} "
              f"sum={a + b:.1f} GFLOP/iter  ({per_utt:.2f} GFLOP/utt-iter)")


if __name__ == "__main__":
    main()
