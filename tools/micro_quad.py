"""CAVEAT (r3): eager per-dispatch timing — dispatch-artifact-dominated
on this tunnel and occasionally served without real execution (void
probes). Prefer tools/inscan.py; cross-check against bench.py e2e.

Microbenchmark: i-vector quad contraction variants + SPD solve cost.

The (B, C) x (C, P=IV(IV+1)/2) contraction that assembles the posterior
precision L is the HBM-dominant op of i-vector extraction (quad is 1.48 GB
packed f32).  Candidates:

  f32_high   : current — f32 operands, Precision.HIGH (3-pass)
  f32_default: f32 operands, single bf16 pass (fast, ~4e-3 rel err)
  bf16_split : quad pre-split into bf16 hi + bf16 lo; 3-term product
               hi@hi + hi@lo + lo@hi  (~1e-5 rel err, reads 3x0.74 GB)
  bf16_pure  : quad and zeroth cast to bf16, single pass

Each timed as grad wrt zeroth (fwd+bwd, like the attack path), distinct
pre-staged inputs per rep.  Errors vs a f64 host oracle.

Run: python -u tools/micro_quad.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.utils.compile_cache import enable as enable_cache


def split_bf16(a_f32):
    hi = a_f32.astype(jnp.bfloat16)
    lo = (a_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def main():
    enable_cache()
    rng = np.random.default_rng(0)
    b, c, ivd = 128, 2048, 600
    p = ivd * (ivd + 1) // 2
    reps = 5

    # generate the big tensor ON DEVICE — a 1.48 GB host->device transfer
    # through the axon tunnel takes tens of minutes
    quad = jax.jit(lambda k: jax.random.normal(k, (c, p), jnp.float32))(
        jax.random.PRNGKey(0))
    zs = [jnp.asarray((50.0 * rng.dirichlet(np.ones(c), b)).astype(np.float32))
          for _ in range(reps + 1)]
    w = jnp.asarray(rng.standard_normal((b, p)).astype(np.float32))
    jax.block_until_ready((quad, zs, w))

    qhi, qlo = jax.jit(split_bf16)(quad)
    jax.block_until_ready((qhi, qlo))

    def f32_high(z, q=quad):
        return jnp.einsum("bc,cp->bp", z, q, precision=jax.lax.Precision.HIGH)

    def f32_default(z, q=quad):
        return jnp.einsum("bc,cp->bp", z, q,
                          precision=jax.lax.Precision.DEFAULT)

    def bf16_split(z):
        zhi, zlo = split_bf16(z)
        dot = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dot(zhi, qhi) + dot(zhi, qlo) + dot(zlo, qhi)

    def bf16_pure(z):
        return jax.lax.dot_general(
            z.astype(jnp.bfloat16), qhi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # f64 oracle on host for error readout (first SLICE_P columns only —
    # pulling the full 1.48 GB through the tunnel is minutes)
    slice_p = 4096
    z0 = np.asarray(zs[0], np.float64)
    q_slice = np.asarray(quad[:, :slice_p], np.float64)
    oracle = z0 @ q_slice
    onorm = np.abs(oracle).max()

    for name, fn in [("f32_high", f32_high), ("f32_default", f32_default),
                     ("bf16_split", bf16_split), ("bf16_pure", bf16_pure)]:
        g = jax.jit(jax.grad(lambda z: jnp.sum(fn(z) * w)))
        fwd = jax.jit(fn)
        out = fwd(zs[0]); jax.block_until_ready(out)
        err = np.abs(np.asarray(out[:, :slice_p], np.float64)
                     - oracle).max() / onorm
        gout = g(zs[-1]); jax.block_until_ready(gout)
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            gout = g(zs[i])
            jax.block_until_ready(gout)
            times.append(time.perf_counter() - t0)
        times_f = []
        for i in range(reps):
            t0 = time.perf_counter()
            out = fwd(zs[i])
            jax.block_until_ready(out)
            times_f.append(time.perf_counter() - t0)
        print(f"{name:12s} fwd {np.median(times_f)*1e3:7.1f} ms   "
              f"fwd+bwd {np.median(times)*1e3:7.1f} ms   rel_err {err:.2e}",
              flush=True)

    # SPD assemble+solve cost alone (unpack + cholesky + cho_solve, fwd+bwd)
    from speakerguard_tpu.models.ivector import spd_solve, _sym_unpack
    rhs = jnp.asarray(rng.standard_normal((b, ivd)).astype(np.float32))
    lps = [jnp.asarray(rng.standard_normal((b, p)).astype(np.float32) * 0.01)
           for _ in range(reps + 1)]
    jax.block_until_ready(lps)

    def solve_from_packed(lp):
        l_mat = _sym_unpack(ivd)(lp * 1e-3)
        l_mat = jnp.einsum("bij,bkj->bik", l_mat, l_mat) \
            + jnp.eye(ivd, dtype=lp.dtype)  # SPD-ify for the bench
        return jnp.sum(spd_solve(l_mat, rhs))

    g = jax.jit(jax.grad(solve_from_packed))
    out = g(lps[-1]); jax.block_until_ready(out)
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = g(lps[i])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"unpack+SPDify+cholesky-solve fwd+bwd {np.median(times)*1e3:7.1f} ms"
          f"  (includes an extra (B,{ivd},{ivd}) matmul from SPD-ify)",
          flush=True)


if __name__ == "__main__":
    main()
