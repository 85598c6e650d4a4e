"""Attribute the GMM-stats stage cost (loglike vs softmax vs stats) on the
real chip at bench shapes (B=128, T=298, C=2048, D=72).

Probes (jitted grad wrt feats, distinct pre-staged on-device inputs):

  dispatch : trivial graph — the fixed per-call tunnel floor
  loglike  : component_loglike only
  softmax  : + posteriors
  stats    : + zeroth/first sums (the real stage output)

Env: SG_GMM_PALLAS selects the forward path as in production.
Run: python -u tools/micro_gmm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.utils.compile_cache import enable as enable_cache
from speakerguard_tpu.models import gmm as gmm_mod


def main():
    enable_cache()
    rng = np.random.default_rng(0)
    b, t, c, d = 128, 298, 2048, 72
    reps = int(os.environ.get("PROF_REPS", "5"))

    params = gmm_mod.random_gmm(rng, c, d)
    key = jax.random.PRNGKey(0)
    gen = jax.jit(lambda k: 0.3 * jax.random.normal(k, (b, t, d), jnp.float32))
    xs = [gen(jax.random.fold_in(key, i)) for i in range(reps + 1)]
    w_c = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    w_z = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    w_f = jnp.asarray(rng.standard_normal((c, d)).astype(np.float32))
    jax.block_until_ready((xs, w_c, w_z, w_f))

    def dispatch(f, p):
        return jnp.sum(f * f) * 1e-6

    def loglike(f, p):
        return jnp.sum(gmm_mod.component_loglike(p, f) * w_c)

    def softmax(f, p):
        return jnp.sum(gmm_mod.posteriors(p, f) * w_c)

    def stats(f, p):
        z, fs = gmm_mod.zeroth_first_stats(p, f)
        return jnp.sum(z * w_z) + jnp.sum(fs * w_f)

    results = {}
    for name, fn in [("dispatch", dispatch), ("loglike", loglike),
                     ("(+)softmax", softmax), ("(+)stats", stats)]:
        g = jax.jit(jax.grad(fn))
        out = g(xs[-1], params); jax.block_until_ready(out)
        gn = float(jnp.linalg.norm(out))
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            out = g(xs[i], params)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[name] = dt
        print(f"{name:12s} {dt * 1e3:8.1f} ms  |grad|={gn:.3e}  "
              f"reps_ms={[round(x * 1e3, 1) for x in times]}", flush=True)


if __name__ == "__main__":
    main()
