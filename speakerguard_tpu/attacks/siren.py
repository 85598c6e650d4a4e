"""SirenAttack — black-box particle swarm optimization attack.

Re-design of reference attack/SirenAttack.py: the particle axis is a real
array axis folded into the model batch (one evaluation for all B x P
particles), the per-epoch inner loop is a jitted `lax.scan` with per-sample
active masks replacing the host-side `delete_found` tensor rebuilds
(SirenAttack.py:191-232), and the epoch loop — particle re-init keeping
the best (:66-79) plus the epoch-plateau abort (:138-144) — runs inside
ONE jitted `lax.while_loop` (r5; the host loop, kept for verbose mode,
paid a tunnel dispatch per epoch at a reference default of 300 epochs).

PSO dynamics preserved: inertia annealed w, c1/c2 cognitive/social terms
with fresh uniform r1/r2 each iteration, velocity bounds +-|upper-lower|,
two-level early abort (:138-144, :176-181).

SG_BLACKBOX_FAST routes the particle evaluations through the models' bf16
fast path with an exact-path final re-evaluation of the returned
candidates (see attacks/base.blackbox_fast_active).
"""

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.attacks.base import (Attack, blackbox_fast_active,
                                           normalize_wav_input)
from speakerguard_tpu.attacks.losses import margin_loss, majority_vote
from speakerguard_tpu.adaptive.eot import eot_no_grad


class SirenAttack(Attack):

    def __init__(self, model, threshold=None, task="CSI", targeted=False,
                 confidence=0.0, epsilon=0.002, max_epoch=300, max_iter=30,
                 c1=1.4961, c2=1.4961, n_particles=25, w_init=0.9,
                 w_end=0.1, batch_size=None, EOT_size=1, EOT_batch_size=1,
                 verbose=0, abort_early=True, abort_early_iter=10,
                 abort_early_epoch=10, mesh=None):
        # batch_size: memory knob chunking the utterance axis (None = whole
        # input); the particle axis multiplies memory by n_particles
        # mesh: optional Mesh with a 'data' axis — batch (and the particle
        # axis folded into it) shards across chips, params replicate
        self.batch_size = batch_size
        self.mesh = mesh
        self.model = model
        self.threshold = threshold
        self.task = task
        self.targeted = targeted
        self.confidence = confidence
        self.epsilon = epsilon
        self.max_epoch = max_epoch
        self.max_iter = max_iter
        self.c1, self.c2 = c1, c2
        self.n_particles = n_particles
        self.w_init, self.w_end = w_init, w_end
        self.EOT_size = max(1, EOT_size)
        self.verbose = verbose
        self.abort_early = abort_early
        self.abort_early_iter = abort_early_iter
        self.abort_early_epoch = abort_early_epoch
        self._epoch_fn = {}  # keyed by the SG_BLACKBOX_FAST knob
        self._run_fn = {}    # device-resident epoch loop, same keying
        self._exact_eval = None

    def _loss_fn(self):
        def fn(scores, label):
            return margin_loss(scores, label, task=self.task,
                               targeted=self.targeted,
                               confidence=self.confidence,
                               threshold=self.threshold, clip_max=False)
        return fn

    def _make_epoch(self):
        p = self.n_particles
        c1, c2 = self.c1, self.c2
        w_init, w_end, max_iter = self.w_init, self.w_end, self.max_iter
        abort_early, abort_iter = self.abort_early, self.abort_early_iter
        use_fast = blackbox_fast_active()

        def epoch(params, x, y, lower, upper, pbest_locations, pbests,
                  gbest_loc, gbests, gbest_pred, active, rng):
            # SG_BLACKBOX_FAST: the B×P particle evaluations per iteration
            # run the model's bf16 fast forward (fast_ctx from the clean
            # input, valid inside the distortion ball); the final success
            # vector is re-verified on the exact path in _attack_whole
            score_kw = {}
            exact_fn = None
            if use_fast:
                ctx = self.model.fast_context(x, params=params)
                score_kw = (dict(fast=True) if ctx is None
                            else dict(fast=True, fast_ctx=ctx))
                # exact-retirement guard (like fakebob's exact-drop
                # guard): a lane may only freeze as "solved" if the
                # EXACT model confirms its gbest candidate's loss < 0 —
                # bf16 fast losses crossing zero on marginal lanes must
                # not lock in failures.  lax.cond-gated: the exact
                # forward only runs on iterations where a lane newly
                # crosses (1×B forwards vs the P×B particle evaluation).
                exact_fn = eot_no_grad(
                    lambda xx, kk: self.model.score(xx, rng=kk,
                                                    params=params),
                    self._loss_fn(), self.model.threshold)
            score_fn = lambda xx, kk: self.model.score(  # noqa: E731
                xx, rng=kk, params=params, **score_kw)
            eot_fn = eot_no_grad(score_fn, self._loss_fn(),
                                 self.model.threshold)
            b, length = x.shape
            v_upper = jnp.abs(upper - lower)
            vkey, lkey = jax.random.split(rng)
            velocities = jax.random.uniform(
                vkey, (b, p, length), x.dtype, -v_upper[:, None, :],
                v_upper[:, None, :])
            locations = pbest_locations

            def body(carry, it):
                (locations, velocities, pbest_locations, pbests, gbest_loc,
                 gbests, gbest_pred, active, prev_gbest, cont) = carry
                key = jax.random.fold_in(lkey, it)
                k_eot, k1, k2 = jax.random.split(key, 3)

                eval_x = (locations + x[:, None, :]).reshape(b * p, length)
                eval_y = jnp.repeat(y, p)
                eot_keys = jax.random.split(k_eot, self.EOT_size)
                scores, loss, decisions = eot_fn(eval_x, eval_y, eot_keys)
                num_classes = scores.shape[-1]
                predict = majority_vote(decisions, num_classes
                                        ).reshape(b, p)
                loss = loss.reshape(b, p)

                do = jnp.logical_and(cont, active)[:, None]
                upd = jnp.logical_and(do, loss < pbests)
                pbests = jnp.where(upd, loss, pbests)
                pbest_locations = jnp.where(upd[..., None], locations,
                                            pbest_locations)

                best_idx = jnp.argmin(pbests, axis=1)
                best_val = jnp.take_along_axis(pbests, best_idx[:, None],
                                               1)[:, 0]
                better = jnp.logical_and(do[:, 0], best_val < gbests)
                gbests = jnp.where(better, best_val, gbests)
                gbest_loc = jnp.where(
                    better[:, None],
                    jnp.take_along_axis(pbest_locations,
                                        best_idx[:, None, None], 1)[:, 0],
                    gbest_loc)
                gbest_pred = jnp.where(
                    better, jnp.take_along_axis(predict, best_idx[:, None],
                                                1)[:, 0], gbest_pred)

                # inner early abort on mean gbest plateau
                check = jnp.logical_and(abort_early,
                                        (it + 1) % abort_iter == 0)
                plateau = jnp.mean(gbests) > 0.9999 * jnp.mean(prev_gbest)
                cont = jnp.where(jnp.logical_and(check, plateau), False,
                                 cont)
                prev_gbest = jnp.where(check, gbests, prev_gbest)

                newly = jnp.logical_and(active, gbests < 0)
                if exact_fn is not None:
                    ekeys = jax.random.split(
                        jax.random.fold_in(lkey, 0x7e57 + it),
                        self.EOT_size)
                    ex_loss = jax.lax.cond(
                        jnp.any(newly),
                        lambda gl: exact_fn(gl + x, y, ekeys)[1],
                        lambda gl: jnp.zeros_like(gbests),
                        gbest_loc)
                    newly = jnp.logical_and(newly, ex_loss < 0)
                active = jnp.logical_and(active, jnp.logical_not(newly))
                cont = jnp.logical_and(cont, jnp.any(active))

                w = (w_init - w_end) * (max_iter - it - 1) / max_iter + w_end
                r1 = jax.random.uniform(k1, (b, p, length)) + 1e-5
                r2 = jax.random.uniform(k2, (b, p, length)) + 1e-5
                velocities_new = (w * velocities
                                  + c1 * r1 * (pbest_locations - locations)
                                  + c2 * r2 * (gbest_loc[:, None, :]
                                               - locations))
                locations_new = jnp.clip(locations + velocities_new,
                                         lower[:, None, :],
                                         upper[:, None, :])
                step_ok = jnp.logical_and(do, it < max_iter)[..., None]
                velocities = jnp.where(step_ok, velocities_new, velocities)
                locations = jnp.where(step_ok, locations_new, locations)

                return (locations, velocities, pbest_locations, pbests,
                        gbest_loc, gbests, gbest_pred, active, prev_gbest,
                        cont), None

            init = (locations, velocities, pbest_locations, pbests,
                    gbest_loc, gbests, gbest_pred, active, gbests,
                    jnp.asarray(True))
            carry, _ = jax.lax.scan(body, init, jnp.arange(max_iter + 1))
            (_, _, pbest_locations, pbests, gbest_loc, gbests, gbest_pred,
             active, _, _) = carry
            return pbest_locations, pbests, gbest_loc, gbests, gbest_pred, \
                active

        return epoch

    def _make_run(self):
        """Device-resident epoch loop (r5): the host epoch loop pays one
        tunnel dispatch per epoch (~0.3 s each; the reference default is
        max_epoch=300, SirenAttack.py:30), so the whole re-init /
        epoch-plateau-abort logic (:66-79, :138-144) moves inside ONE
        jitted lax.while_loop over epochs.  Bit-identical to the host
        loop: the PRNG fold structure is reproduced exactly — the
        epoch-0 (b,p,L) init draw and the keep-best (b,p-1,L) re-init
        draw both derive from the same ikey (jax.random is deterministic
        in (key, shape), so drawing both and selecting matches whichever
        branch the host would have taken); pinned by the eager PSO
        oracle test (tests/test_attacks.py)."""
        p = self.n_particles
        max_epoch, abort_early = self.max_epoch, self.abort_early
        abort_epoch = self.abort_early_epoch
        epoch_core = self._make_epoch()

        def run(params, x, y, lower, upper, rng):
            b, length = x.shape

            def cond(c):
                return jnp.logical_and(
                    jnp.logical_and(c["epoch"] < max_epoch, c["cont"]),
                    jnp.any(c["active"]))

            def body(c):
                epoch = c["epoch"]
                ekey = jax.random.fold_in(rng, epoch)
                ikey, ekey2 = jax.random.split(ekey)
                fresh_full = jax.random.uniform(
                    ikey, (b, p, length), x.dtype, lower[:, None, :],
                    upper[:, None, :])
                best_idx = jnp.argmin(c["pbests"], axis=1)
                best_loc = jnp.take_along_axis(
                    c["pbest_locations"], best_idx[:, None, None], 1)
                best_val = jnp.take_along_axis(c["pbests"],
                                               best_idx[:, None], 1)
                fresh = jax.random.uniform(
                    ikey, (b, p - 1, length), x.dtype, lower[:, None, :],
                    upper[:, None, :])
                keep_loc = jnp.concatenate([best_loc, fresh], axis=1)
                keep_val = jnp.concatenate(
                    [best_val,
                     jnp.full((b, p - 1), jnp.inf, jnp.float32)], axis=1)
                first = epoch == 0
                pbest_locations = jnp.where(first, fresh_full, keep_loc)
                pbests = jnp.where(
                    first, jnp.full((b, p), jnp.inf, jnp.float32),
                    keep_val)

                (pbest_locations, pbests, gbest_loc, gbests, gbest_pred,
                 active) = epoch_core(params, x, y, lower, upper,
                                      pbest_locations, pbests,
                                      c["gbest_loc"], c["gbests"],
                                      c["gbest_pred"], c["active"], ekey2)

                check = jnp.logical_and(abort_early,
                                        (epoch + 1) % abort_epoch == 0)
                plateau = jnp.mean(gbests) > 0.9999 * jnp.mean(
                    c["prev_gbest_epoch"])
                cont = jnp.logical_not(jnp.logical_and(check, plateau))
                prev = jnp.where(check, gbests, c["prev_gbest_epoch"])
                return dict(epoch=epoch + 1,
                            pbest_locations=pbest_locations,
                            pbests=pbests, gbest_loc=gbest_loc,
                            gbests=gbests, gbest_pred=gbest_pred,
                            active=active, prev_gbest_epoch=prev,
                            cont=cont)

            init = dict(
                epoch=jnp.asarray(0),
                pbest_locations=jnp.zeros((b, p, length), x.dtype),
                pbests=jnp.full((b, p), jnp.inf, jnp.float32),
                gbest_loc=jnp.zeros((b, length), x.dtype),
                gbests=jnp.full((b,), jnp.inf, jnp.float32),
                gbest_pred=jnp.full((b,), -2, jnp.int32),
                active=jnp.ones((b,), bool),
                prev_gbest_epoch=jnp.full((b,), jnp.inf, jnp.float32),
                cont=jnp.asarray(True))
            final = jax.lax.while_loop(cond, body, init)
            # final["epoch"] = epochs actually executed (each runs the
            # full masked max_iter+1 inner scan) — bench MFU divisor
            return final["gbest_loc"], final["gbests"], final["epoch"]

        return run

    def attack(self, x, y, rng=None):
        if self.task in ("SV", "OSI") and self.threshold is None:
            raise RuntimeError(
                f"black-box attack on {self.task} requires a threshold; "
                "estimate it with FAKEBOB")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x, restore = normalize_wav_input(x)
        y = jnp.asarray(y)
        # honor the batch_size memory knob (the particle axis multiplies
        # memory by n_particles, so chunking the utterance axis matters)
        if self.batch_size and self.batch_size < x.shape[0]:
            adver_x, success = self.run_batched(self._attack_whole, x, y,
                                                rng, self.batch_size)
        else:
            adver_x, success = self._attack_whole(x, y, rng)
        return restore(adver_x), success

    def _attack_whole(self, x, y, rng):
        x, y = self.shard_inputs(x, y)
        params = self.replicate_params(self.model.jit_params())
        b, length = x.shape
        p = self.n_particles
        # distortion bounds (SirenAttack.py:251-252)
        lower = jnp.clip(-1.0 - x, -self.epsilon)
        upper = jnp.clip(1.0 - x, None, self.epsilon)

        fast_key = int(blackbox_fast_active())
        if not self.verbose:
            # default path: ONE dispatch for the whole attack (the host
            # epoch loop below costs a tunnel round-trip per epoch; the
            # reference default is 300 epochs).  Bit-identical semantics
            # — see _make_run.
            if fast_key not in self._run_fn:
                self._run_fn[fast_key] = jax.jit(self._make_run())
            gbest_loc, gbests, epochs = self._run_fn[fast_key](
                params, x, y, lower, upper, rng)
            self.last_executed_epochs = int(epochs)
            return self._finalize(params, x, y, gbest_loc, gbests, rng)

        # verbose: host epoch loop, prints per-epoch gbests
        if fast_key not in self._epoch_fn:
            self._epoch_fn[fast_key] = jax.jit(self._make_epoch())
        epoch_fn = self._epoch_fn[fast_key]

        gbest_loc = jnp.zeros((b, length), x.dtype)
        gbests = jnp.full((b,), jnp.inf, jnp.float32)
        gbest_pred = jnp.full((b,), -2, jnp.int32)
        active = jnp.ones((b,), bool)
        prev_gbest_epoch = gbests

        for epoch in range(self.max_epoch):
            ekey = jax.random.fold_in(rng, epoch)
            ikey, ekey2 = jax.random.split(ekey)
            if epoch == 0:
                pbest_locations = jax.random.uniform(
                    ikey, (b, p, length), x.dtype, lower[:, None, :],
                    upper[:, None, :])
                pbests = jnp.full((b, p), jnp.inf, jnp.float32)
            else:
                best_idx = jnp.argmin(pbests, axis=1)
                best_loc = jnp.take_along_axis(
                    pbest_locations, best_idx[:, None, None], 1)
                best_val = jnp.take_along_axis(pbests, best_idx[:, None], 1)
                fresh = jax.random.uniform(
                    ikey, (b, p - 1, length), x.dtype, lower[:, None, :],
                    upper[:, None, :])
                pbest_locations = jnp.concatenate([best_loc, fresh], axis=1)
                pbests = jnp.concatenate(
                    [best_val, jnp.full((b, p - 1), jnp.inf, jnp.float32)],
                    axis=1)

            (pbest_locations, pbests, gbest_loc, gbests, gbest_pred,
             active) = epoch_fn(params, x, y, lower, upper,
                                      pbest_locations, pbests, gbest_loc,
                                      gbests, gbest_pred, active, ekey2)
            self.last_executed_epochs = epoch + 1

            if not bool(jnp.any(active)):
                break
            if self.abort_early and (epoch + 1) % self.abort_early_epoch == 0:
                if float(jnp.mean(gbests)) > 0.9999 * float(
                        jnp.mean(prev_gbest_epoch)):
                    break
                prev_gbest_epoch = gbests
            if self.verbose:
                print(f"siren epoch {epoch}: gbests="
                      f"{np.asarray(gbests).tolist()}")

        return self._finalize(params, x, y, gbest_loc, gbests, rng)

    def _finalize(self, params, x, y, gbest_loc, gbests, rng):
        adver_x = gbest_loc + x
        if blackbox_fast_active():
            # verified success: the loop's gbests are bf16 fast-path
            # losses under SG_BLACKBOX_FAST — re-evaluate the returned
            # candidates once on the exact path (PGD/CW2 convention)
            if self._exact_eval is None:
                def exact_loss(params, ax, y, keys):
                    fn = eot_no_grad(
                        lambda xx, kk: self.model.score(xx, rng=kk,
                                                        params=params),
                        self._loss_fn(), self.model.threshold)
                    _, loss, _ = fn(ax, y, keys)
                    return loss
                self._exact_eval = jax.jit(exact_loss)
            ekeys = jax.random.split(jax.random.fold_in(rng, 0x5eed),
                                     self.EOT_size)
            gbests = self._exact_eval(params, adver_x, y, ekeys)
        success = (np.asarray(gbests) < 0).tolist()
        return adver_x, success
