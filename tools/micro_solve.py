"""CAVEAT (r3): eager per-dispatch timing — dispatch-artifact-dominated
on this tunnel and occasionally served without real execution (void
probes). Prefer tools/inscan.py; cross-check against bench.py e2e.

Microbenchmark SPD-solve strategies for the i-vector system
(B=128, N=600) on the real chip.

  spd_solve   : current — cholesky + cho_solve per RHS (fwd) + cho_solve
                (bwd).  Each cho_solve is 2 single-RHS TriangularSolves =
                sequential column sweeps.
  chol_only   : jnp.linalg.cholesky forward alone (no grad).
  inv_solve   : cholesky + ONE TriangularSolve against a batched identity
                (blocked inversion, matmul-rich) + matvecs; bwd reuses the
                inverse factor -> zero additional triangular work.

All data generated on device; everything threaded as jit args.

Run: python -u tools/micro_solve.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.utils.compile_cache import enable as enable_cache
from speakerguard_tpu.models.ivector import spd_solve


def timed(label, fn, args_list, reps):
    out = fn(*args_list[-1])
    jax.block_until_ready(out)
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args_list[i])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{label:14s} {float(np.median(times))*1e3:8.1f} ms  "
          f"reps_ms={[round(t*1e3,1) for t in times]}", flush=True)
    return out


def _inv_apply(linv, v):
    y = jnp.einsum("bij,bj->bi", linv, v)
    return jnp.einsum("bji,bj->bi", linv, y)


@jax.custom_vjp
def inv_solve(l_mat, rhs):
    chol = jnp.linalg.cholesky(l_mat)
    n = l_mat.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=l_mat.dtype), l_mat.shape)
    linv = jax.lax.linalg.triangular_solve(
        chol, eye, left_side=True, lower=True)
    return _inv_apply(linv, rhs)


def _inv_solve_fwd(l_mat, rhs):
    chol = jnp.linalg.cholesky(l_mat)
    n = l_mat.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=l_mat.dtype), l_mat.shape)
    linv = jax.lax.linalg.triangular_solve(
        chol, eye, left_side=True, lower=True)
    x = _inv_apply(linv, rhs)
    return x, (linv, x)


def _inv_solve_bwd(res, g):
    linv, x = res
    u = _inv_apply(linv, g)       # IFT: same inverse factor, matvecs only
    return -jnp.einsum("bi,bj->bij", u, x), u


inv_solve.defvjp(_inv_solve_fwd, _inv_solve_bwd)


def main():
    enable_cache()
    reps = int(os.environ.get("PROF_REPS", "5"))
    b, n = 128, 600
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(k):
        ka, kb = jax.random.split(k)
        a = jax.random.normal(ka, (b, n, n), jnp.float32) * 0.1
        l_mat = jnp.einsum("bij,bkj->bik", a, a) + 300.0 * jnp.eye(n)
        rhs = jax.random.normal(kb, (b, n), jnp.float32)
        w = jax.random.normal(kb, (n,), jnp.float32)
        return l_mat, rhs, w

    data = [gen(jax.random.fold_in(key, i)) for i in range(reps + 1)]
    jax.block_until_ready(data)

    # error cross-check on one instance
    l0, r0, _ = data[0]
    x_ref = np.linalg.solve(np.asarray(l0, np.float64),
                            np.asarray(r0, np.float64)[..., None])[..., 0]
    x_inv = np.asarray(jax.jit(inv_solve)(l0, r0), np.float64)
    x_cur = np.asarray(jax.jit(spd_solve)(l0, r0), np.float64)
    print(f"rel err: inv_solve {np.abs(x_inv - x_ref).max() / np.abs(x_ref).max():.2e}"
          f"  spd_solve {np.abs(x_cur - x_ref).max() / np.abs(x_ref).max():.2e}",
          flush=True)

    chol_fn = jax.jit(jnp.linalg.cholesky)
    timed("chol_only", chol_fn, [(d[0],) for d in data], reps)

    if jax.default_backend() == "tpu":
        from speakerguard_tpu.ops.pallas_chol import cholesky_rt
        rp = np.asarray(jax.jit(cholesky_rt)(l0), np.float64)
        want = np.linalg.cholesky(
            np.asarray(l0, np.float64)).transpose(0, 2, 1)
        print(f"pallas chol rel err {np.abs(rp - want).max() / np.abs(want).max():.2e}",
              flush=True)
        timed("pallas_chol", jax.jit(cholesky_rt),
              [(d[0],) for d in data], reps)

    g_cur = jax.jit(jax.grad(
        lambda l_mat, rhs, w: jnp.sum(spd_solve(l_mat, rhs) * w)))
    timed("spd_solve g", g_cur, data, reps)

    g_inv = jax.jit(jax.grad(
        lambda l_mat, rhs, w: jnp.sum(inv_solve(l_mat, rhs) * w)))
    timed("inv_solve g", g_inv, data, reps)


if __name__ == "__main__":
    main()
