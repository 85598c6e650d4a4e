"""Carlini-Wagner L2 attack.

Re-design of reference attack/CW2.py: tanh box reparameterization, Adam on
the modifier (optax), loss = c * margin + ||delta||^2, 9-step binary search
over c, early stop on loss plateau, per-sample best tracking.

The inner optimization runs as a `lax.while_loop` over SCAN CHUNKS of
stop_early_iter iterations: early stop only flips the continue flag at
chunk boundaries, so per-chunk cond checks are semantically exact, and the
chunk body runs at scan speed (~7 ms/iter on-chip for xv-PLDA batch 128,
vs ~15-18 for a per-iteration data-dependent while_loop, whose every step
serializes against its cond).  Best-so-far tracking and the binary-search
global best both live on device; the host sees only (B,) decisions and the
scalar c updates per search step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speakerguard_tpu.attacks.base import Attack, normalize_wav_input
from speakerguard_tpu.attacks.losses import margin_loss
from speakerguard_tpu.models.base import decide

ATANH_CLIP = 0.999999


@jax.jit
def _merge_best(step_best, global_best):
    """Per-sample min-L2 merge of one binary-search step's best into the
    running global best — on device (l2, decision, audio)."""
    s_l2, s_score, s_x = step_best
    g_l2, g_score, g_x = global_best
    improved = s_l2 < g_l2
    return (jnp.where(improved, s_l2, g_l2),
            jnp.where(improved, s_score, g_score),
            jnp.where(improved[:, None], s_x, g_x))


class CW2(Attack):

    def __init__(self, model, task="CSI", targeted=False, confidence=0.0,
                 initial_const=1e-3, binary_search_steps=9, max_iter=10000,
                 stop_early=True, stop_early_iter=1000, lr=1e-2,
                 batch_size=None, verbose=0, mesh=None):
        # batch_size: memory knob chunking the input like the reference's
        # attack() loop; None = whole input in one compiled batch
        # mesh: optional Mesh with a 'data' axis — batch shards over chips,
        # params replicate; the inner Adam loop is per-sample math so it
        # runs DP with zero collectives (same contract as PGD)
        self.batch_size = batch_size
        self.mesh = mesh
        self.model = model
        self.task = task
        self.targeted = targeted
        self.confidence = confidence
        self.initial_const = initial_const
        self.binary_search_steps = binary_search_steps
        self.max_iter = max_iter
        self.stop_early = stop_early
        self.stop_early_iter = stop_early_iter
        self.lr = lr
        self.verbose = verbose

        self.threshold = None
        if task in ("SV", "OSI"):
            self.threshold = model.threshold

        # SG_CW2_FAST=1 (r4 experiment): the inner Adam loop scores through
        # the model's bf16 fast attack-gradient path (like PGD); the
        # returned best audio is then re-verified against the EXACT model
        # in attack_batch, so reported success is always victim-verified.
        # Read once at construction (the jitted inner is built here).
        import os
        self._fast = os.environ.get("SG_CW2_FAST", "0") == "1"
        # SG_CW2_TOPK=1: let the fast inner loop also use iv_plda's frozen
        # top-K selection — aggressive speed/ASR trade, see _make_inner
        self._fast_topk = os.environ.get("SG_CW2_TOPK", "0") == "1"
        self._opt = optax.adam(lr)
        self._inner = jax.jit(self._make_inner())

    def _loss1(self, scores, y):
        return margin_loss(scores, y, task=self.task, targeted=self.targeted,
                           confidence=self.confidence,
                           threshold=self.threshold, clip_max=True)

    def _make_inner(self):
        model, opt = self.model, self._opt
        max_iter, stop_early = self.max_iter, self.stop_early
        stop_early_iter = self.stop_early_iter

        def run(params, x, y, const, rng):
            b = x.shape[0]
            x_atanh = jnp.arctanh(x * ATANH_CLIP)
            # per-run fast-path context (iv_plda's frozen top-K Gaussian
            # selection, r5): computed on the clean input like PGD
            # (gradient.py:79-85) — but OFF by default even under
            # SG_CW2_FAST: CW2's L2 perturbations aren't eps-ball-bounded
            # and the frozen selection degrades success (chip r5 @512:
            # topk256 11.9 utts/s ASR 92.6 vs no-topk 7.7 ASR 99.8 vs
            # exact 5.46 ASR 100, measurements/r05_blackbox_ab_log.txt).
            # SG_CW2_TOPK=1 opts into the aggressive trade; the returned
            # best audio is always re-verified against the EXACT model.
            ctx_kw = {}
            if self._fast and self._fast_topk:
                ctx = model.fast_context(x, params=params)
                if ctx is not None:
                    ctx_kw = {"fast_ctx": ctx}

            def losses(modifier, key):
                input_x = jnp.tanh(modifier + x_atanh)
                scores = model.score(input_x, rng=key, params=params,
                                     fast=self._fast, **ctx_kw)
                l1 = self._loss1(scores, y)
                l2 = jnp.sum(jnp.square(input_x - x), axis=-1)
                return jnp.sum(const * l1 + l2), (l1, l2, scores, input_x)

            def cond(carry):
                n_iter, _, _, _, _, _, _, _, cont = carry
                return jnp.logical_and(n_iter <= max_iter, cont)

            def body(carry):
                (n_iter, modifier, opt_state, best_l2, best_score, gbest,
                 prev_loss, _, cont) = carry
                key = jax.random.fold_in(rng, n_iter)
                grads, (l1, l2, scores, input_x) = jax.grad(
                    losses, has_aux=True)(modifier, key)
                decisions, _ = decide(scores, model.threshold)

                # `cont` gate: scan chunks may run iterations the original
                # per-step while_loop would never reach (past max_iter, or
                # past an early stop mid-chunk) — those must be exact
                # no-ops
                active = cont
                do_step = jnp.logical_and(n_iter < max_iter, active)
                updates, new_opt_state = opt.update(grads, opt_state,
                                                    modifier)
                modifier = jnp.where(do_step, modifier + updates, modifier)
                opt_state = jax.tree.map(
                    lambda new, old: jnp.where(do_step, new, old),
                    new_opt_state, opt_state)

                hit = jnp.logical_and(
                    l1 <= 0, jnp.logical_and(n_iter <= max_iter, active))
                better = jnp.logical_and(hit, l2 < best_l2)
                best_l2 = jnp.where(better, l2, best_l2)
                best_score = jnp.where(better, decisions, best_score)
                g_l2, g_score, g_x = gbest
                g_better = jnp.logical_and(hit, l2 < g_l2)
                gbest = (jnp.where(g_better, l2, g_l2),
                         jnp.where(g_better, decisions, g_score),
                         jnp.where(g_better[:, None], input_x, g_x))

                loss_mean = jnp.mean(const * l1 + l2)
                check = jnp.logical_and(
                    stop_early,
                    jnp.logical_and(n_iter % stop_early_iter == 0, active))
                cont = jnp.where(
                    jnp.logical_and(check, loss_mean > 0.9999 * prev_loss),
                    False, cont)
                prev_loss = jnp.where(check, loss_mean, prev_loss)
                return (n_iter + 1, modifier, opt_state, best_l2, best_score,
                        gbest, prev_loss, loss_mean, cont)

            modifier0 = jnp.zeros_like(x)
            init = (0, modifier0, opt.init(modifier0),
                    jnp.full((b,), jnp.inf), jnp.full((b,), -2, jnp.int32),
                    (jnp.full((b,), jnp.inf), jnp.full((b,), -2, jnp.int32),
                     x),
                    jnp.inf, jnp.inf, True)
            # while-of-scan-chunks: early stop only flips `cont` every
            # stop_early_iter iterations, so checking the while cond once
            # per scan CHUNK is semantically exact — and the chunk body
            # runs at scan speed (~7 ms/iter on-chip for xv-PLDA) where a
            # per-iteration data-dependent while_loop costs ~15-18 (each
            # step serializes against its cond evaluation)
            chunk = min(stop_early_iter, max_iter + 1) if stop_early \
                else max_iter + 1

            def chunk_body(carry):
                out, _ = jax.lax.scan(lambda c, _: (body(c), None), carry,
                                      None, length=chunk)
                return out

            (_, _, _, best_l2, best_score, gbest, _, _, _) = \
                jax.lax.while_loop(cond, chunk_body, init)
            return best_l2, best_score, gbest

        return run

    def attack_batch(self, x, y, rng):
        x, y = self.shard_inputs(x, y)
        params = self.replicate_params(self.model.jit_params())
        b = x.shape[0]
        const = np.full(b, self.initial_const, np.float64)
        lower_bound = np.zeros(b)
        upper_bound = np.full(b, 1e10)
        # global best state stays ON DEVICE across binary-search steps —
        # pulling the (B, L) best audio to host each step costs ~0.5 s
        # through the tunnel; the host only ever needs the (B,) decisions
        global_state = (jnp.full((b,), jnp.inf),
                        jnp.full((b,), -2, jnp.int32), x)

        for step in range(self.binary_search_steps):
            key = jax.random.fold_in(rng, step)
            best_l2, best_score, gbest = self._inner(
                params, x, y, jnp.asarray(const, jnp.float32),
                key)
            global_state = _merge_best(gbest, global_state)
            best_score = np.asarray(best_score)

            for j in range(b):
                if best_score[j] != -2:  # succeeded at this c
                    upper_bound[j] = min(upper_bound[j], const[j])
                    if upper_bound[j] < 1e9:
                        const[j] = (lower_bound[j] + upper_bound[j]) / 2
                else:
                    lower_bound[j] = max(lower_bound[j], const[j])
                    if upper_bound[j] < 1e9:
                        const[j] = (lower_bound[j] + upper_bound[j]) / 2
                    else:
                        const[j] *= 10
            if self.verbose:
                print(f"cw2 step {step}: c={const}, "
                      f"best_l2={np.asarray(global_state[0])}")

        global_l2, global_score, global_x = global_state
        success = (np.asarray(global_score) != -2).tolist()
        if self._fast:
            # fast in-loop scores are bf16 approximations: re-verify the
            # returned audio against the EXACT model so reported success
            # is victim-verified (the PGD design's exact-final-eval rule)
            scores = self.model.score(global_x, params=params)
            l1 = np.asarray(self._loss1(scores, y))
            success = [bool(s) and bool(v <= 0)
                       for s, v in zip(success, l1)]
        return global_x, success

    def attack(self, x, y, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x, restore = normalize_wav_input(x)
        y = jnp.asarray(y)
        # honor the batch_size memory knob (reference CW2 inherits the
        # FGSM.attack chunking loop, FGSM.py:83-96)
        if self.batch_size and self.batch_size < x.shape[0]:
            adver_x, success = self.run_batched(self.attack_batch, x, y,
                                                rng, self.batch_size)
        else:
            adver_x, success = self.attack_batch(x, y, rng)
        return restore(adver_x), success
