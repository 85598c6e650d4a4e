"""CAVEAT (r3): this tool uses EAGER per-dispatch timing, which on this
tunnel is dispatch-artifact-dominated and can even be served without real
execution (void probes). Prefer tools/inscan.py differential-n probes and
cross-check against bench.py e2e deltas; keep this tool for relative
stage ordering only.

Finer stage attribution INSIDE the Kaldi MFCC frontend (iv config).

Prefixes: framing(+dc+energy) -> +rfft_power -> full mfcc (mel/log/dct/
lifter/energy-sub) -> +delta -> +cmvn.  Same pitfall-avoidance as
profile_iv.py (weighted losses, pre-staged inputs, grad norms).

Run: python -u tools/profile_frontend.py
Env: PROF_BATCH (128), PROF_WAV_LEN (48000), PROF_REPS (5).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.utils.compile_cache import enable as enable_cache
from speakerguard_tpu.ops import kaldi_mfcc as km
from speakerguard_tpu.ops.delta import add_delta
from speakerguard_tpu.ops.cmvn import sliding_cmvn
from tools.profile_iv import time_grad

CFG = km.IV_PLDA_MFCC


def _frames_dc(wav):
    frames = km.frame_signal(wav.astype(jnp.float32), CFG)
    return frames - jnp.mean(frames, axis=-1, keepdims=True)


def _power(frames):
    key = ("kaldi", CFG.window_type, CFG.window_size, CFG.blackman_coeff)
    km._WINDOWS.setdefault(key, functools.partial(km.feature_window, CFG))
    return km._rfft_power(CFG.window_size, CFG.padded_window_size,
                          preemph=CFG.preemphasis_coefficient,
                          window_key=key)(frames)


def main():
    enable_cache()
    rng = np.random.default_rng(0)
    batch = int(os.environ.get("PROF_BATCH", "128"))
    wav_len = int(os.environ.get("PROF_WAV_LEN", "48000"))
    reps = int(os.environ.get("PROF_REPS", "5"))

    gen = jax.jit(lambda k: jax.random.uniform(
        k, (batch, wav_len), jnp.float32, -0.3, 0.3))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(reps + 1)]
    jax.block_until_ready(xs)

    w_win = jnp.asarray(
        rng.standard_normal(CFG.window_size).astype(np.float32))
    w_k = jnp.asarray(rng.standard_normal(
        CFG.padded_window_size // 2 + 1).astype(np.float32))
    w_c = jnp.asarray(rng.standard_normal(CFG.num_ceps).astype(np.float32))
    w_d = jnp.asarray(
        rng.standard_normal(CFG.num_ceps * 3).astype(np.float32))

    def upto_frames(wav, p):
        return jnp.sum(_frames_dc(wav) * w_win)

    def upto_power(wav, p):
        return jnp.sum(_power(_frames_dc(wav)) * w_k)

    def upto_mfcc(wav, p):
        return jnp.sum(km.kaldi_mfcc(wav, CFG) * w_c)

    def upto_delta(wav, p):
        return jnp.sum(add_delta(km.kaldi_mfcc(wav, CFG)) * w_d)

    def upto_cmvn(wav, p):
        return jnp.sum(sliding_cmvn(add_delta(km.kaldi_mfcc(wav, CFG))) * w_d)

    stages = [("frames+dc", upto_frames), ("(+)power", upto_power),
              ("(+)meldct", upto_mfcc), ("(+)delta", upto_delta),
              ("(+)cmvn", upto_cmvn)]

    results = {}
    for name, fn in stages:
        results[name] = time_grad(name, fn, xs, None, reps, batch)

    prev = 0.0
    print("\nstage deltas (fwd+bwd cost attributable to each stage):")
    for n, _ in stages:
        print(f"  {n:12s} {(results[n] - prev) * 1000:8.1f} ms")
        prev = results[n]


if __name__ == "__main__":
    main()
