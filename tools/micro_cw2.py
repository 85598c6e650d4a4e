"""Locate the per-iteration cost gap between CW2 and PGD on xv-PLDA.

Each probe is a 50-iteration lax.scan over a body variant, jitted with
params threaded; reported as ms/iter (same-session comparison).

Run: python -u tools/micro_cw2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speakerguard_tpu.utils.compile_cache import enable as enable_cache
from speakerguard_tpu.models.xv_plda import XvPlda, random_xv_plda_params
from speakerguard_tpu.attacks.losses import margin_loss, resolve_loss
from speakerguard_tpu.models.base import decide

ITERS = 50


def main():
    enable_cache()
    rng = np.random.default_rng(0)
    b, wav_len = 128, 48000
    model = XvPlda(random_xv_plda_params(rng))
    enroll = jnp.asarray(rng.standard_normal((10, 150)).astype(np.float32))
    model.set_enrollment([str(i) for i in range(10)], enroll)
    params = model.jit_params()

    gen = jax.jit(lambda k: jax.random.uniform(
        k, (b, wav_len), jnp.float32, -0.3, 0.3))
    key = jax.random.PRNGKey(0)
    xs = [gen(jax.random.fold_in(key, i)) for i in range(4)]
    y = jnp.asarray(rng.integers(0, 10, b))
    jax.block_until_ready(xs)

    opt = optax.adam(1e-2)
    entropy_loss, _ = resolve_loss(loss_name="Entropy", targeted=False, task="CSI", threshold=None, clip_max=False)

    def cw2_losses(modifier, x_atanh, x, k, params):
        input_x = jnp.tanh(modifier + x_atanh)
        scores = model.score(input_x, rng=k, params=params)
        l1 = margin_loss(scores, y, task="CSI", targeted=False,
                         confidence=0.0, threshold=None, clip_max=True)
        l2 = jnp.sum(jnp.square(input_x - x), axis=-1)
        return jnp.sum(10.0 * l1 + l2), (l1, l2, scores, input_x)

    def pgd_like(x, params):
        # the PGD body shape: value_and_grad of entropy loss + sign step
        def body(xx, k):
            def loss(w):
                s = model.score(w, rng=k, params=params)
                return jnp.sum(entropy_loss(s, y)), s
            (l, s), g = jax.value_and_grad(loss, has_aux=True)(xx)
            return jnp.clip(xx + 4e-4 * jnp.sign(g), -1, 1), None
        keys = jax.random.split(jax.random.PRNGKey(1), ITERS)
        out, _ = jax.lax.scan(body, x, keys)
        return out

    def cw2_full(x, params):
        x_atanh = jnp.arctanh(x * 0.999999)
        mod0 = jnp.zeros_like(x)

        def body(carry, k):
            mod, ostate, bl2, bsc, gx = carry
            g, (l1, l2, scores, input_x) = jax.grad(
                cw2_losses, has_aux=True)(mod, x_atanh, x, k, params)
            dec, _ = decide(scores, model.threshold)
            upd, ostate = opt.update(g, ostate, mod)
            mod = mod + upd
            hit = l1 <= 0
            better = jnp.logical_and(hit, l2 < bl2)
            bl2 = jnp.where(better, l2, bl2)
            bsc = jnp.where(better, dec, bsc)
            gx = jnp.where(better[:, None], input_x, gx)
            return (mod, ostate, bl2, bsc, gx), None
        keys = jax.random.split(jax.random.PRNGKey(1), ITERS)
        init = (mod0, opt.init(mod0), jnp.full((b,), jnp.inf),
                jnp.full((b,), -2, jnp.int32), x)
        (mod, *_), _ = jax.lax.scan(body, init, keys)
        return mod

    def cw2_nobest(x, params):
        x_atanh = jnp.arctanh(x * 0.999999)
        mod0 = jnp.zeros_like(x)

        def body(carry, k):
            mod, ostate = carry
            g, _ = jax.grad(cw2_losses, has_aux=True)(
                mod, x_atanh, x, k, params)
            upd, ostate = opt.update(g, ostate, mod)
            return (mod + upd, ostate), None
        keys = jax.random.split(jax.random.PRNGKey(1), ITERS)
        (mod, _), _ = jax.lax.scan(body, (mod0, opt.init(mod0)), keys)
        return mod

    def cw2_sgd(x, params):
        x_atanh = jnp.arctanh(x * 0.999999)
        mod0 = jnp.zeros_like(x)

        def body(mod, k):
            g, _ = jax.grad(cw2_losses, has_aux=True)(
                mod, x_atanh, x, k, params)
            return mod - 1e-2 * g, None
        keys = jax.random.split(jax.random.PRNGKey(1), ITERS)
        mod, _ = jax.lax.scan(body, mod0, keys)
        return mod

    for name, fn in [("pgd_like", pgd_like), ("cw2_sgd", cw2_sgd),
                     ("cw2_nobest", cw2_nobest), ("cw2_full", cw2_full)]:
        f = jax.jit(fn)
        out = f(xs[-1], params); jax.block_until_ready(out)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = f(xs[i], params)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) / ITERS
        print(f"{name:12s} {dt * 1e3:7.2f} ms/iter "
              f"reps_s={[round(t, 2) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
