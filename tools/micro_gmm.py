"""Attribute the GMM-stats stage cost (aug vs loglike vs softmax vs stats)
on the real chip at bench shapes (B=128, T=298, C=2048, D=72), fast path.

IN-SCAN timing (tools/inscan.py): each probe is fwd+grad of a pipeline
prefix, N reps inside one jitted scan with key-folded inputs — eager
per-dispatch probes on this stack are dispatch-artifact-dominated and
hid a 3.7x augmentation win in r3 (see ARCHITECTURE perf notes).

Env: SG_GMM_STATS_PALLAS / SG_GMM_PALLAS select paths as in production;
SG_PROBE_FAST=0 probes the exact path instead of the attack fast path.
Run: python -u tools/micro_gmm.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.utils.compile_cache import enable as enable_cache
from speakerguard_tpu.models import gmm as gmm_mod
from tools.inscan import time_grad_body


def main():
    enable_cache()
    rng = np.random.default_rng(0)
    b, t, c, d = 128, 298, 2048, 72
    fast = os.environ.get("SG_PROBE_FAST", "1") == "1"

    params = gmm_mod.random_gmm(rng, c, d)
    w_c = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    w_z = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    w_f = jnp.asarray(rng.standard_normal((c, d)).astype(np.float32))
    w_p = jnp.asarray(
        rng.standard_normal(d + d * (d + 1) // 2).astype(np.float32))
    jax.block_until_ready((w_c, w_z, w_f, w_p))

    def gen(k):
        return 0.3 * jax.random.normal(k, (b, t, d), jnp.float32)

    def aug_only(f, p):
        dt = gmm_mod.fast_dot_dtype() if fast else jnp.float32
        aug = gmm_mod._augment(f.astype(dt), d)
        return jnp.sum(aug.astype(jnp.float32) * w_p) * 1e-6

    def loglike(f, p):
        return jnp.sum(
            gmm_mod.component_loglike(p, f, fast=fast) * w_c) * 1e-6

    def softmax(f, p):
        return jnp.sum(gmm_mod.posteriors(p, f, fast=fast) * w_c)

    def stats(f, p):
        z, fs = gmm_mod.zeroth_first_stats(p, f, fast=fast)
        return jnp.sum(z * w_z) * 1e-3 + jnp.sum(fs * w_f) * 1e-3

    print(f"fast={fast}  (per-rep fwd+grad, in-scan)")
    for name, fn in [("aug-only", aug_only), ("loglike", loglike),
                     ("(+)softmax", softmax), ("(+)stats", stats)]:
        ms = time_grad_body(fn, gen, params=(params,))
        print(f"{name:12s} {ms:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
