"""CAVEAT (r3): this tool uses EAGER per-dispatch timing, which on this
tunnel is dispatch-artifact-dominated and can even be served without real
execution (void probes). Prefer tools/inscan.py differential-n probes and
cross-check against bench.py e2e deltas; keep this tool for relative
stage ordering only.

Stage attribution for the xv-PLDA PGD hot path on the real chip.

Same method and pitfall-avoidance as profile_iv.py (random-weighted prefix
losses so no prefix collapses under XLA DCE; pre-staged distinct inputs so
the tunnel cannot serve cached executions; grad norms printed).

Run: python -u tools/profile_xv.py
Env: PROF_BATCH (128), PROF_WAV_LEN (48000), PROF_REPS (5).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from speakerguard_tpu.utils.compile_cache import enable as enable_cache
from speakerguard_tpu.models.xv_plda import (
    random_xv_plda_params, process_emb)
from speakerguard_tpu.models import plda as plda_mod
from speakerguard_tpu.models.tdnn import tdnn_embedding
from speakerguard_tpu.ops.kaldi_mfcc import kaldi_mfcc, XV_PLDA_MFCC
from speakerguard_tpu.ops.cmvn import sliding_cmvn
from tools.profile_iv import time_grad
import jax


def main():
    enable_cache()
    rng = np.random.default_rng(0)
    batch = int(os.environ.get("PROF_BATCH", "128"))
    wav_len = int(os.environ.get("PROF_WAV_LEN", "48000"))
    reps = int(os.environ.get("PROF_REPS", "5"))

    params = random_xv_plda_params(rng)
    enroll = jnp.asarray(rng.standard_normal((10, 150)).astype(np.float32))
    gen = jax.jit(lambda k: jax.random.uniform(
        k, (batch, wav_len), jnp.float32, -0.3, 0.3))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(reps + 1)]
    jax.block_until_ready(xs)

    w_feat = jnp.asarray(rng.standard_normal(30).astype(np.float32))
    w_emb = jnp.asarray(rng.standard_normal(512).astype(np.float32))

    def upto_mfcc(wav, p):
        return jnp.sum(kaldi_mfcc(wav, XV_PLDA_MFCC) * w_feat)

    def upto_cmvn(wav, p):
        f = sliding_cmvn(kaldi_mfcc(wav, XV_PLDA_MFCC))
        # t-varying weight: CMVN output sums to ~0 over t with a constant
        # weight, collapsing the gradient
        tw = jnp.arange(f.shape[1], dtype=f.dtype)[None, :, None]
        return jnp.sum(f * w_feat * jnp.cos(tw))

    def upto_tdnn(wav, p):
        feats = sliding_cmvn(kaldi_mfcc(wav, XV_PLDA_MFCC))
        return jnp.sum(tdnn_embedding(p.tdnn, feats) * w_emb)

    def full(wav, p):
        feats = sliding_cmvn(kaldi_mfcc(wav, XV_PLDA_MFCC))
        emb = process_emb(p, tdnn_embedding(p.tdnn, feats))
        return jnp.sum(plda_mod.llr_scores(p.plda, enroll, emb,
                                           num_examples=1))

    def dispatch_floor(wav, p):
        return jnp.sum(wav * wav) * 1e-6

    stages = [("dispatch", dispatch_floor),
              ("mfcc", upto_mfcc), ("(+)cmvn", upto_cmvn),
              ("(+)tdnn", upto_tdnn), ("(+)plda", full)]

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
