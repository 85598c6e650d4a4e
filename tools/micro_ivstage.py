"""Attribute the i-vector extraction stage's cost (contraction vs unpack vs
Cholesky solve) on the real chip, at bench shapes (B=128, C=2048, IV=600).

Probes (each timed as jitted fwd+bwd with distinct pre-staged inputs):

  contract : l_packed = zeroth @ quad_packed               (1.48 GB read)
  unpack   : + packed -> full symmetric (B, 600, 600) + I
  solve    : + Cholesky spd_solve against a fixed rhs
  extract  : the real extract_ivectors (adds the `linear` einsum)

Hard-won rules observed here:
  * all multi-MB arrays are generated ON DEVICE (tunnel uploads <1 MB/s);
  * every big array is threaded as an explicit jit argument — a closure
    constant is inlined into the HLO payload and a 1.48 GB literal kills
    the remote compile service (broken pipe).

Run: python -u tools/micro_ivstage.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.utils.compile_cache import enable as enable_cache
from speakerguard_tpu.models import ivector as iv_mod
from speakerguard_tpu.models.gmm import HOT_PRECISION


def main():
    enable_cache()
    rng = np.random.default_rng(0)
    b, c, d, ivd = 128, 2048, 72, 600
    p = ivd * (ivd + 1) // 2
    reps = int(os.environ.get("PROF_REPS", "5"))

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    @jax.jit
    def gen(k1, k2):
        m = jax.random.normal(k1, (c, d, ivd), jnp.float32) * 0.05
        a = jax.random.normal(k2, (c, d, d), jnp.float32) * 0.1
        s = jnp.einsum("cij,ckj->cik", a, a) + jnp.eye(d)
        return m, s

    m, s = gen(k1, k2)
    params = iv_mod.build_extractor(m, s, 1.0)
    jax.block_until_ready(params)

    @jax.jit
    def gen_data(k):
        ka, kb, kc, kd = jax.random.split(k, 4)
        z = 300.0 * jax.nn.softmax(jax.random.normal(ka, (b, c)))
        first = jax.random.normal(kb, (b, c, d), jnp.float32)
        w_p = jax.random.normal(kc, (b, p), jnp.float32)
        rhs = jax.random.normal(kd, (b, ivd), jnp.float32)
        return z, first, w_p, rhs

    zs = []
    for i in range(reps + 1):
        z, first, w_p, rhs = gen_data(jax.random.fold_in(key, 100 + i))
        zs.append(z)
    w_iv = jnp.asarray(rng.standard_normal(ivd).astype(np.float32))
    jax.block_until_ready((zs, first, w_p, rhs, w_iv))

    def contract(z, params):
        return jnp.einsum("bc,cp->bp", z, params.quad_packed,
                          precision=HOT_PRECISION)

    def upto_contract(z, params, first, w_p, rhs):
        return jnp.sum(contract(z, params) * w_p)

    def upto_unpack(z, params, first, w_p, rhs):
        l_mat = iv_mod._sym_unpack(ivd)(contract(z, params)) + jnp.eye(ivd)
        tw = jnp.arange(ivd, dtype=jnp.float32)
        return jnp.sum(l_mat * w_iv[None, :, None] * jnp.cos(tw)[None, None])

    def upto_solve(z, params, first, w_p, rhs):
        l_mat = iv_mod._sym_unpack(ivd)(contract(z, params)) + jnp.eye(ivd)
        return jnp.sum(iv_mod.spd_solve(l_mat, rhs) * w_iv)

    def extract(z, params, first, w_p, rhs):
        return jnp.sum(iv_mod.extract_ivectors(params, z, first) * w_iv)

    # full-symmetric alternative: einsum over the (C, IV, IV) tensor (2x
    # the HBM bytes, but no unpack gather at all).  quad_full is THREADED
    # as an arg — a 2.95 GB closure constant kills the remote compiler.
    quad_full = jax.jit(lambda qp: iv_mod._sym_unpack(ivd)(qp))(
        params.quad_packed)
    jax.block_until_ready(quad_full)

    def upto_solve_full(z, qf, first, w_p, rhs):
        l_mat = jnp.einsum("bc,cij->bij", z, qf,
                           precision=HOT_PRECISION) + jnp.eye(ivd)
        return jnp.sum(iv_mod.spd_solve(l_mat, rhs) * w_iv)

    stages = [("contract", upto_contract), ("(+)unpack", upto_unpack),
              ("(+)solve", upto_solve),
              ("solve_full", upto_solve_full, quad_full),
              ("extract", extract)]
    for entry in stages:
        name, fn = entry[0], entry[1]
        p_arg = entry[2] if len(entry) > 2 else params
        g = jax.jit(jax.grad(fn))
        out = g(zs[-1], p_arg, first, w_p, rhs)
        jax.block_until_ready(out)
        gn = float(jnp.linalg.norm(out))
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            out = g(zs[i], p_arg, first, w_p, rhs)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(f"{name:12s} {dt * 1000:8.1f} ms  |grad|={gn:.3e}  "
              f"reps_ms={[round(t * 1e3, 1) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
