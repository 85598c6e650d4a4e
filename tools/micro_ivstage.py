"""Attribute the i-vector extraction stage's cost (contraction vs unpack vs
Cholesky solve vs linear) on the real chip, at bench shapes
(B=128, C=2048, IV=600), fast attack path.

IN-SCAN timing (tools/inscan.py): fwd+grad of pipeline prefixes, N reps
inside one jitted scan with key-folded inputs — eager per-dispatch probes
on this stack are dispatch-artifact-dominated (see ARCHITECTURE).

Hard-won rules observed here:
  * all multi-MB arrays are generated ON DEVICE (tunnel uploads <1 MB/s);
  * every big array is threaded as an explicit jit argument (inscan's
    `params=`) — a closure-captured device array is INLINED into the HLO
    payload on this stack and the 738 MB packed quad kills the remote
    compile service (broken pipe; reconfirmed r3).

Run: python -u tools/micro_ivstage.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.utils.compile_cache import enable as enable_cache
from speakerguard_tpu.models import ivector as iv_mod
from tools.inscan import time_scan


def main():
    enable_cache()
    b, c, d, ivd = 128, 2048, 72, 600
    p = ivd * (ivd + 1) // 2
    key = jax.random.PRNGKey(7)

    # params on device; quad small so unpack + 40 I stays SPD
    qp = jax.jit(lambda k: (0.005 * jax.random.normal(k, (c, p)))
                 .astype(jnp.bfloat16))(key)
    pj = jax.jit(lambda k: (0.02 * jax.random.normal(k, (c, ivd, d)))
                 .astype(jnp.bfloat16))(jax.random.fold_in(key, 1))
    jax.block_until_ready((qp, pj))
    unpack = iv_mod._sym_unpack(ivd)
    eye = np.eye(ivd, dtype=np.float32) * 40.0

    def gen(k):
        z = jax.nn.softplus(jax.random.normal(k, (b, c))) * 3.0
        f = 0.3 * jax.random.normal(jax.random.fold_in(k, 1), (b, c, d))
        return z, f

    def contract(z, f, qp, pj):
        return jnp.sum(iv_mod._quad_contract_fast(z, qp)) * 1e-6

    def unpack_p(z, f, qp, pj):
        lm = unpack(iv_mod._quad_contract_fast(z, qp)) + jnp.asarray(eye)
        return jnp.sum(lm) * 1e-6

    def solve_p(z, f, qp, pj):
        lm = unpack(iv_mod._quad_contract_fast(z, qp)) + jnp.asarray(eye)
        lin = jnp.einsum("cid,bcd->bi", pj, f.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        x = iv_mod.spd_solve(lm, lin)
        return jnp.sum(x ** 2) * 1e-3

    def probe(body):
        gfn = jax.grad(body, argnums=(0, 1))

        def step(k, qp_, pj_):
            z, f = gen(k)
            gz, gf = gfn(z, f, qp_, pj_)
            return jnp.sum(gz ** 2) + jnp.sum(gf ** 2)
        return time_scan(step, params=(qp, pj))

    for name, body in [("contract", contract), ("(+)unpack", unpack_p),
                       ("(+)solve", solve_p)]:
        print(f"{name:10s} {probe(body):8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
