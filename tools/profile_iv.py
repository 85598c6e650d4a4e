"""CAVEAT (r3): this tool uses EAGER per-dispatch timing, which on this
tunnel is dispatch-artifact-dominated and can even be served without real
execution (void probes). Prefer tools/inscan.py differential-n probes and
cross-check against bench.py e2e deltas; keep this tool for relative
stage ordering only.

Stage attribution for the iv-PLDA PGD hot path on the real chip.

Times grad (wrt the wav) of progressively longer pipeline prefixes;
consecutive differences attribute cost to each stage:

    frontend  = wav -> MFCC -> delta -> CMVN
    gmm       = + Baum-Welch zeroth/first stats
    ivector   = + i-vector extraction (quad contraction + SPD solve)
    plda      = + LDA/length-norm/PLDA scoring

Pitfalls this script avoids (learned the hard way):
  * prefix losses are RANDOM-WEIGHTED sums — a plain sum(stats) loss
    collapses (sum_c softmax = 1) and XLA dead-code-eliminates the GMM;
  * per-rep inputs are distinct pre-staged device buffers, so the axon
    tunnel cannot serve a cached (executable, args) execution and the
    timed loop contains no eager dispatches;
  * grad L2 norms are printed — a ~0 norm means the prefix collapsed.

Run: python -u tools/profile_iv.py
Env: PROF_BATCH (128), PROF_WAV_LEN (48000), PROF_REPS (5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.utils.compile_cache import enable as enable_cache
from speakerguard_tpu.models.iv_plda import (
    random_iv_plda_params, embedding_from_cmvn, scores_from_emb)
from speakerguard_tpu.models import gmm as gmm_mod
from speakerguard_tpu.models import ivector as iv_mod
from speakerguard_tpu.ops.kaldi_mfcc import kaldi_mfcc, IV_PLDA_MFCC
from speakerguard_tpu.ops.delta import add_delta
from speakerguard_tpu.ops.cmvn import sliding_cmvn


def time_grad(name, fn, xs, params, reps, batch, verbose=True):
    g = jax.jit(jax.grad(fn))
    out = g(xs[-1], params)            # compile
    jax.block_until_ready(out)
    gn = float(jnp.linalg.norm(out))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = g(xs[i], params)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    if verbose:
        print(f"{name:12s} {dt * 1000:8.1f} ms/iter "
              f"({batch / dt:7.1f} utts/s at this prefix)  |grad|={gn:.3e}  "
              f"reps_ms={[round(t * 1e3, 1) for t in times]}", flush=True)
    return dt


def main():
    enable_cache()
    rng = np.random.default_rng(0)
    batch = int(os.environ.get("PROF_BATCH", "128"))
    wav_len = int(os.environ.get("PROF_WAV_LEN", "48000"))
    reps = int(os.environ.get("PROF_REPS", "5"))

    params = random_iv_plda_params(rng)
    enroll = jnp.asarray(rng.standard_normal((10, 200)).astype(np.float32))
    # generate waveforms on device (tunnel uploads run <1 MB/s)
    gen = jax.jit(lambda k: jax.random.uniform(
        k, (batch, wav_len), jnp.float32, -0.3, 0.3))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(reps + 1)]
    jax.block_until_ready(xs)

    # fixed random weights: keep every prefix's gradient non-degenerate
    d = params.fgmm.dim
    c = params.fgmm.num_gaussians
    w_feat = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    w_z = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    w_f = jnp.asarray(rng.standard_normal((c, d)).astype(np.float32))
    w_iv = jnp.asarray(
        rng.standard_normal(params.extractor.ivector_dim).astype(np.float32))

    def frontend(wav):
        return sliding_cmvn(add_delta(kaldi_mfcc(wav, IV_PLDA_MFCC)))

    def upto_frontend(wav, p):
        f = frontend(wav)
        # t-varying weight: CMVN output sums to ~0 over t, so a t-constant
        # weight makes the loss (and gradient) collapse to zero
        tw = jnp.arange(f.shape[1], dtype=f.dtype)[None, :, None]
        return jnp.sum(f * w_feat * jnp.cos(tw))

    def upto_gmm(wav, p):
        z, f = gmm_mod.zeroth_first_stats(p.fgmm, frontend(wav))
        return jnp.sum(z * w_z) + jnp.sum(f * w_f)

    def upto_ivector(wav, p):
        z, f = gmm_mod.zeroth_first_stats(p.fgmm, frontend(wav))
        return jnp.sum(iv_mod.extract_ivectors(p.extractor, z, f) * w_iv)

    def full(wav, p):
        emb = embedding_from_cmvn(p, frontend(wav))
        return jnp.sum(scores_from_emb(p, emb, enroll))

    def dispatch_floor(wav, p):
        # trivial non-DCE-able graph: measures the fixed per-call dispatch
        # cost through the tunnel.  Attack loops run 100 iters inside one
        # jitted scan, so e2e per-iter cost ≈ stage sums WITHOUT this floor.
        return jnp.sum(wav * wav) * 1e-6

    stages = [("dispatch", dispatch_floor),
              ("frontend", upto_frontend), ("(+)gmm", upto_gmm),
              ("(+)ivector", upto_ivector), ("(+)plda", full)]

    results = {}
    for name, fn in stages:
        results[name] = time_grad(name, fn, xs, params, reps, batch)

    prev = 0.0
    print("\nstage deltas (fwd+bwd cost attributable to each stage):")
    for n, _ in stages:
        print(f"  {n:12s} {(results[n] - prev) * 1000:8.1f} ms")
        prev = results[n]


if __name__ == "__main__":
    main()
