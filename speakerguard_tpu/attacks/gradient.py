"""White-box gradient attacks: FGSM, PGD, CW-inf — one scan engine.

Re-design of reference attack/FGSM.py / PGD.py / CWinf.py: the reference's
`attack_batch` Python loop (FGSM.py:38-70) with per-iteration
`.cpu().numpy()` syncs becomes a single `lax.scan` whose body does an
EOT-averaged value-and-grad and the signed step + clip.  Random restarts
(PGD.py:54-77) are a `lax.scan` over restart keys inside the same jit —
one compilation, one dispatch, single-restart peak memory — with the
best-batch-success-rate selection done on device.

Class relationships preserved: FGSM == PGD with max_iter=1, step=epsilon,
global clip bounds; CWinf == PGD with Margin loss forced.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.attacks.base import Attack, normalize_wav_input
from speakerguard_tpu.attacks.losses import (resolve_loss, majority_vote,
                                             compare)
from speakerguard_tpu.adaptive.eot import eot, eot_no_grad


class PGD(Attack):

    def __init__(self, model, task="CSI", epsilon=0.002, step_size=0.0004,
                 max_iter=10, num_random_init=0, loss="Entropy",
                 targeted=False, batch_size=None, EOT_size=1,
                 EOT_batch_size=1, verbose=0, mesh=None):
        # batch_size: optional memory knob chunking the input like the
        # reference's attack() loops; None (default) = whole input in one
        # compiled batch (the TPU-right default; dataset-level batching
        # happens in the CLI loader)
        # mesh: optional jax.sharding.Mesh with a 'data' axis — the attack
        # batch shards across chips, params replicate, and the whole scan
        # runs DP with zero collectives (per-sample math end to end)
        self.batch_size = batch_size
        self.mesh = mesh
        self.model = model
        self.task = task
        self.epsilon = epsilon
        self.step_size = step_size
        self.max_iter = max_iter
        self.num_random_init = num_random_init
        self.targeted = targeted
        self.verbose = verbose
        self.EOT_size = max(1, EOT_size)
        self.EOT_batch_size = max(1, EOT_batch_size)
        assert self.EOT_size % self.EOT_batch_size == 0, \
            "EOT size should be divisible by EOT batch size"

        self.threshold = None
        if task in ("SV", "OSI"):
            self.threshold = model.threshold
        self.loss_fn, self.grad_sign = resolve_loss(
            loss_name=loss, targeted=targeted, task=task,
            threshold=self.threshold, clip_max=False)

        self._run, self._run_restarts = self._make_run()

    def _make_run(self):
        step_size, grad_sign, max_iter = (self.step_size, self.grad_sign,
                                          self.max_iter)
        model = self.model

        def single(params, x, y, rng, do_init_noise):
            """One restart: bounds, optional init noise, the iteration scan,
            final eval — all inside ONE jit (eager ops outside jit cost
            ~50ms dispatch each on a tunneled device).
            params: model pytree (traced for GB-scale models, None for
            MB-scale where closure constants are faster)."""
            # The iteration scan needs gradients for sign() steps only, so
            # it runs the model's fast attack-gradient path (bf16 weight
            # copies on iv_plda; identity elsewhere).  The FINAL evaluation
            # that determines success stays on the exact path.
            # Per-run fast-path context (e.g. iv_plda's frozen top-K
            # Gaussian selection under SG_GMM_TOPK): one exact-shape pass
            # on the clean input, constants carried into the scan.
            ctx = model.fast_context(x, params=params)  # dither-free
            ctx_kw = {} if ctx is None else {"fast_ctx": ctx}
            score_fast = lambda xx, key: model.score(  # noqa: E731
                xx, rng=key, params=params, fast=True, **ctx_kw)
            score_exact = lambda xx, key: model.score(  # noqa: E731
                xx, rng=key, params=params)
            eot_run = eot(score_fast, self.loss_fn, model.threshold,
                          self.EOT_batch_size)
            eot_ng = eot_no_grad(score_exact, self.loss_fn, model.threshold)

            lower, upper = self._bounds(x)
            init_key, loop_key = jax.random.split(rng)
            x0 = x
            if do_init_noise:
                # the reference does NOT clip the init point; the first
                # step's gradient is taken at x+noise and clipping happens
                # after stepping (PGD.py:59-61 + FGSM.py:65-68)
                x0 = x + jax.random.uniform(init_key, x.shape, x.dtype,
                                            -self.epsilon, self.epsilon)
            keys = jax.random.split(
                loop_key, (max_iter + 1) * self.EOT_size
            ).reshape(max_iter + 1, self.EOT_size, 2)

            def body(xx, keys_i):
                scores, loss, grad, _ = eot_run(xx, y, keys_i)
                xx = xx + step_size * jnp.sign(grad) * grad_sign
                xx = jnp.clip(xx, lower, upper)
                return xx, loss

            x_adv, losses = jax.lax.scan(body, x0, keys[:-1])
            # final no-grad evaluation with a single EOT repeat
            # (reference FGSM.py:44-47)
            scores, loss, decisions = eot_ng(x_adv, y, keys[-1:][:, 0])
            predict = majority_vote(decisions, scores.shape[-1])
            return x_adv, predict, loss

        def run_restarts(params, x, y, rng, n_restarts):
            """num_random_init restarts as a lax.scan INSIDE the jit: one
            compilation, one dispatch, peak memory of a single restart, and
            the best-whole-batch-success-rate selection (reference
            PGD.py:54-77, strict '>' keeps the earliest restart on ties)
            happens on device."""
            def body(best, key):
                x_adv, predict, loss = single(params, x, y, key, True)
                success = compare(y, predict, self.targeted)
                rate = jnp.mean(success.astype(jnp.float32))
                best_rate, best_x, best_pred = best
                take = rate > best_rate
                best = (jnp.where(take, rate, best_rate),
                        jnp.where(take, x_adv, best_x),
                        jnp.where(take, predict, best_pred))
                return best, loss
            init = (jnp.float32(-1.0), jnp.zeros_like(x),
                    jnp.zeros_like(y))
            keys = jax.random.split(rng, n_restarts)
            (_, best_x, best_pred), _ = jax.lax.scan(body, init, keys)
            return best_x, best_pred

        return (jax.jit(single, static_argnames=("do_init_noise",)),
                jax.jit(run_restarts, static_argnames=("n_restarts",)))

    def _bounds(self, x):
        lower = jnp.clip(x - self.epsilon, -1.0)
        upper = jnp.clip(x + self.epsilon, None, 1.0)
        return lower, upper

    def attack(self, x, y, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x, restore = normalize_wav_input(x)
        y = jnp.asarray(y)
        if self.batch_size and self.batch_size < x.shape[0]:
            adver, success = self.run_batched(self._attack_whole, x, y, rng,
                                              self.batch_size)
            return restore(adver), success
        adver, success = self._attack_whole(x, y, rng)
        return restore(adver), success

    def _attack_whole(self, x, y, rng):
        x, y = self.shard_inputs(x, y)
        params = self.replicate_params(self.model.jit_params())
        if self.num_random_init > 1:
            adver_x, predict = self._run_restarts(params, x, y, rng,
                                                  self.num_random_init)
        else:
            adver_x, predict, _ = self._run(params, x, y, rng,
                                            self.num_random_init > 0)
        success = self.compare(y, predict, self.targeted)
        return adver_x, success


class FGSM(PGD):

    def __init__(self, model, task="CSI", epsilon=0.002, loss="Entropy",
                 targeted=False, batch_size=None, EOT_size=1,
                 EOT_batch_size=1, verbose=0, mesh=None):
        super().__init__(model, task=task, epsilon=epsilon,
                         step_size=epsilon, max_iter=1, num_random_init=0,
                         loss=loss, targeted=targeted, batch_size=batch_size,
                         EOT_size=EOT_size, EOT_batch_size=EOT_batch_size,
                         verbose=verbose, mesh=mesh)

    def _bounds(self, x):
        # FGSM clips to the global audio range, not an epsilon ball
        # (reference FGSM.py:74-81)
        return (jnp.full_like(x, -1.0), jnp.full_like(x, 1.0))


class CWinf(PGD):

    def __init__(self, model, task="CSI", epsilon=0.002, step_size=0.0004,
                 max_iter=10, num_random_init=0, loss="Margin",
                 targeted=False, batch_size=None, EOT_size=1,
                 EOT_batch_size=1, verbose=0, mesh=None):
        super().__init__(model, task=task, epsilon=epsilon,
                         step_size=step_size, max_iter=max_iter,
                         num_random_init=num_random_init, loss="Margin",
                         targeted=targeted, batch_size=batch_size,
                         EOT_size=EOT_size, EOT_batch_size=EOT_batch_size,
                         verbose=verbose, mesh=mesh)
