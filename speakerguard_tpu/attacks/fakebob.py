"""FAKEBOB — black-box score-based attack (IEEE S&P'21).

Re-design of reference attack/FAKEBOB.py: NES gradient estimation +
momentum + per-sample plateau LR decay + early stop.  The reference drops
solved samples from the working batch by rebuilding tensors on the host
(`delete_found`, FAKEBOB.py:125-168); here solved samples are an inactive
mask lane and the whole iteration loop is a `lax.while_loop` over small
scan chunks that exits when every lane is inactive (a per-iteration
data-dependent while_loop serializes each step against its cond — see
attacks/cw2.py; chunks are kept small because each wasted NES body is
expensive).

Per-sample plateau history is a (B, plateau_length) ring buffer.  (Note the
reference's `last_ls = [[]] * n_audios` aliases ONE list across the batch —
harmless at its default batch_size=1; we implement the per-sample semantics
the code intends.)

SG_BLACKBOX_FAST routes the NES sample forwards through the models' bf16
fast path with an exact-path final re-evaluation (see
attacks/base.blackbox_fast_active); threshold estimation always stays on
the exact path — its accept/exceed exits compare raw scores against
candidate thresholds, where bf16 quantization would bias the estimate.

Also implements the SV/OSI decision-threshold estimation algorithm
(FAKEBOB.py:210-295): a host-driven loop over candidate thresholds, with the
inner NES iteration jitted (threshold is a traced argument, so no
recompilation as candidates change).
"""

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.attacks.base import (Attack, blackbox_fast_active,
                                           normalize_wav_input)
from speakerguard_tpu.attacks.losses import margin_loss
from speakerguard_tpu.adaptive.eot import eot_no_grad
from speakerguard_tpu.adaptive.nes import nes_grad
from speakerguard_tpu.models.base import decide


class FAKEBOB(Attack):

    def __init__(self, model, threshold=None, task="CSI", targeted=False,
                 confidence=0.0, epsilon=0.002, max_iter=1000, max_lr=0.001,
                 min_lr=1e-6, samples_per_draw=50,
                 samples_per_draw_batch_size=50, sigma=0.001, momentum=0.9,
                 plateau_length=5, plateau_drop=2.0, stop_early=True,
                 stop_early_iter=100, batch_size=None, EOT_size=1,
                 EOT_batch_size=1, verbose=0, mesh=None):
        # batch_size: memory knob chunking the input (None = whole input in
        # one compiled batch); NES lanes already chunk via samples_batch
        # mesh: optional Mesh with a 'data' axis — the attack batch (and
        # with it the folded NES sample evaluations) shards across chips,
        # params replicate (same DP contract as PGD/CW2)
        self.batch_size = batch_size
        self.mesh = mesh
        self.model = model
        self.threshold = threshold
        self.task = task
        self.targeted = targeted
        self.confidence = confidence
        self.epsilon = epsilon
        self.max_iter = max_iter
        self.max_lr = max_lr
        self.min_lr = min_lr
        self.samples_per_draw = samples_per_draw
        self.samples_per_draw_batch_size = samples_per_draw_batch_size
        self.sigma = sigma
        self.momentum = momentum
        self.plateau_length = plateau_length
        self.plateau_drop = plateau_drop
        self.stop_early = stop_early
        self.stop_early_iter = stop_early_iter
        self.EOT_size = max(1, EOT_size)
        self.verbose = verbose
        self.grad_sign = -1  # Margin loss
        self._run_cache = {}

    # ------------------------------------------------------------------
    def _loss_fn(self, threshold):
        def fn(scores, label):
            return margin_loss(scores, label, task=self.task,
                               targeted=self.targeted,
                               confidence=self.confidence,
                               threshold=threshold, clip_max=False)
        return fn

    def _nes_step(self, x, y, threshold, key, params=None, score_kw=None):
        """One NES gradient estimate.  threshold: traced scalar.
        score_kw: extra model.score kwargs — the attack loop passes
        ``fast=True`` (+ per-run fast_ctx) under SG_BLACKBOX_FAST."""
        score_kw = score_kw or {}
        score_fn = lambda xx, kk: self.model.score(  # noqa: E731
            xx, rng=kk, params=params, **score_kw)
        eot_fn = eot_no_grad(score_fn, self._loss_fn(threshold),
                             self.model.threshold)
        nkey, ekey = jax.random.split(key)
        eot_keys = jax.random.split(ekey, self.EOT_size)
        num_classes = (self.model.num_spks if self.model.num_spks
                       else 1)
        return nes_grad(eot_fn, x, y, samples_per_draw=self.samples_per_draw,
                        sigma=self.sigma, key=nkey, num_classes=num_classes,
                        eot_keys=eot_keys,
                        samples_batch=self.samples_per_draw_batch_size)

    def _make_run(self):
        momentum, plateau_length = self.momentum, self.plateau_length
        plateau_drop, min_lr = self.plateau_drop, self.min_lr
        max_iter, stop_early = self.max_iter, self.stop_early
        stop_early_iter, grad_sign = self.stop_early_iter, self.grad_sign
        use_fast = blackbox_fast_active()
        model = self.model

        def run(params, x0, y, lower, upper, threshold, rng):
            b, length = x0.shape
            # SG_BLACKBOX_FAST: the ~max_iter × samples_per_draw NES
            # forwards run the model's bf16 fast path (same graphs as
            # PGD's gradient steps); the fast_ctx (e.g. iv_plda's frozen
            # top-K Gaussian selection) is computed ONCE on the clean
            # input, valid inside the epsilon-ball like in PGD
            # (attacks/gradient.py:79-85).
            score_kw = {}
            exact_fn = None
            if use_fast:
                ctx = model.fast_context(x0, params=params)
                score_kw = (dict(fast=True) if ctx is None
                            else dict(fast=True, fast_ctx=ctx))
                # exact-drop guard: a lane may only retire as "found" if
                # the EXACT model confirms its loss < 0 — a bf16 fast
                # loss crossing zero on a marginal lane must not lock in
                # a failure (chip r5: iv fakebob fast read ASR 87.5 vs
                # 100 exact before this guard).  The exact evaluation is
                # gated behind lax.cond, so it only runs on iterations
                # where some lane newly crosses.
                exact_fn = eot_no_grad(
                    lambda xx, kk: model.score(xx, rng=kk, params=params),
                    self._loss_fn(threshold), model.threshold)

            def cond(c):
                return jnp.logical_and(c["it"] <= max_iter,
                                       jnp.any(c["active"]))

            def body(c):
                key = jax.random.fold_in(rng, c["it"])
                loss, grad, adver_loss, _, y_pred = self._nes_step(
                    c["x"], y, threshold, key, params=params,
                    score_kw=score_kw)

                # `valid` gate: scan chunks may overshoot past max_iter —
                # those iterations must be exact no-ops
                valid = c["it"] <= max_iter
                better = jnp.logical_and(
                    jnp.logical_and(c["active"], valid),
                    adver_loss < c["best_loss"])
                best_loss = jnp.where(better, adver_loss, c["best_loss"])
                best_x = jnp.where(better[:, None], c["x"], c["best_x"])

                # drop found (adver_loss < 0); under the fast path the
                # drop must be confirmed by the exact model (see guard
                # construction above)
                would_drop = jnp.logical_and(
                    c["active"], jnp.logical_and(adver_loss < 0, valid))
                if exact_fn is not None:
                    ekeys = jax.random.split(
                        jax.random.fold_in(rng, 0x7e57 + c["it"]),
                        self.EOT_size)
                    ex_loss = jax.lax.cond(
                        jnp.any(would_drop),
                        lambda xx: exact_fn(xx, y, ekeys)[1],
                        lambda xx: jnp.zeros_like(adver_loss),
                        c["x"])
                    would_drop = jnp.logical_and(would_drop, ex_loss < 0)
                active = jnp.logical_and(c["active"],
                                         jnp.logical_not(would_drop))

                grad = momentum * c["prev_grad"] + (1.0 - momentum) * grad

                # plateau LR decay ring buffer
                ring = jnp.concatenate(
                    [c["ring"][:, 1:], loss[:, None]], axis=1)
                count = jnp.minimum(c["count"] + 1, plateau_length)
                full = count == plateau_length
                trigger = jnp.logical_and(full, ring[:, -1] > ring[:, 0])
                lr = jnp.where(trigger,
                               jnp.maximum(c["lr"] / plateau_drop, min_lr),
                               c["lr"])
                count = jnp.where(trigger, 0, count)

                x = c["x"] + grad_sign * lr[:, None] * jnp.sign(grad)
                x = jnp.clip(x, lower, upper)
                x = jnp.where(
                    jnp.logical_and(active, valid)[:, None], x, c["x"])

                # early-stop lane drop on convergence
                check = jnp.logical_and(
                    jnp.logical_and(stop_early, valid),
                    c["it"] % stop_early_iter == 0)
                converged = c["prev_loss"] * 0.9999 - loss < 0
                active = jnp.where(jnp.logical_and(check, converged),
                                   False, active)
                prev_loss = jnp.where(check, loss, c["prev_loss"])

                return dict(it=c["it"] + 1, x=x, prev_grad=grad, lr=lr,
                            ring=ring, count=count, active=active,
                            best_loss=best_loss, best_x=best_x,
                            prev_loss=prev_loss)

            init = dict(
                it=jnp.asarray(0), x=x0,
                prev_grad=jnp.zeros_like(x0),
                lr=jnp.full((b,), self.max_lr, jnp.float32),
                ring=jnp.zeros((b, plateau_length), jnp.float32),
                count=jnp.zeros((b,), jnp.int32),
                active=jnp.ones((b,), bool),
                best_loss=jnp.full((b,), jnp.inf, jnp.float32),
                best_x=x0,
                prev_loss=jnp.full((b,), jnp.inf, jnp.float32))
            # while over SCAN CHUNKS: a per-iteration data-dependent
            # while_loop serializes each step against its cond (~8-10 ms,
            # see attacks/cw2.py).  Outputs are identical — all per-lane
            # updates are masked by `active`, so in-chunk iterations after
            # every lane would have exited are no-ops; the chunk is kept
            # small because each wasted NES body is expensive.
            chunk = min(8, max_iter + 1)

            def chunk_body(c):
                out, _ = jax.lax.scan(lambda cc, _: (body(cc), None), c,
                                      None, length=chunk)
                return out

            final = jax.lax.while_loop(cond, chunk_body, init)
            best_x, best_loss = final["best_x"], final["best_loss"]
            if use_fast:
                # verified success: one exact-path re-evaluation of the
                # returned candidates, so the success vector reported to
                # the caller never depends on bf16 loss values (the
                # PGD/CW2 convention, attacks/gradient.py:86-90)
                exact = eot_no_grad(
                    lambda xx, kk: model.score(xx, rng=kk, params=params),
                    self._loss_fn(threshold), model.threshold)
                ekeys = jax.random.split(jax.random.fold_in(rng, 0x5eed),
                                         self.EOT_size)
                _, best_loss, _ = exact(best_x, y, ekeys)
            # final["it"] = NES iterations actually executed (including
            # masked chunk-overshoot bodies, which still burn forwards) —
            # bench MFU uses it instead of max_iter when lanes all solve
            # early and the while exits
            return best_x, best_loss, final["it"]

        return run

    # ------------------------------------------------------------------
    def attack(self, x, y, rng=None):
        if self.task in ("SV", "OSI") and self.threshold is None:
            raise RuntimeError(
                f"black-box attack on {self.task} requires a threshold; "
                "call estimate_threshold first")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x, restore = normalize_wav_input(x)
        y = jnp.asarray(y)
        # honor the batch_size memory knob (reference FAKEBOB.py loops the
        # input in attack-batches like FGSM.py:83-96)
        if self.batch_size and self.batch_size < x.shape[0]:
            adver_x, success = self.run_batched(self._attack_whole, x, y,
                                                rng, self.batch_size)
        else:
            adver_x, success = self._attack_whole(x, y, rng)
        return restore(adver_x), success

    def _attack_whole(self, x, y, rng):
        x, y = self.shard_inputs(x, y)
        params = self.replicate_params(self.model.jit_params())
        lower = jnp.clip(x - self.epsilon, -1.0)
        upper = jnp.clip(x + self.epsilon, None, 1.0)

        # cache key includes the knob: _make_run bakes use_fast in at
        # build time, so a toggled env var must not reuse a stale closure
        run_key = f"run_fast{int(blackbox_fast_active())}"
        if run_key not in self._run_cache:
            self._run_cache[run_key] = jax.jit(self._make_run())
        thr = jnp.asarray(self.threshold if self.threshold is not None
                          else 0.0, jnp.float32)
        best_x, best_loss, it = self._run_cache[run_key](
            params, x, y, lower, upper, thr, rng)
        self.last_executed_iters = int(it)
        success = (np.asarray(best_loss) < 0).tolist()
        return best_x, success

    # ------------------------------------------------------------------
    def estimate_threshold_run(self, x, step=0.1, rng=None):
        """Single-utterance threshold estimation (FAKEBOB.py:210-278).
        x: (1, L) rejected by the model.  Host-driven; NES steps jitted."""
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        d, s = self.model.make_decision(x)
        if int(d[0]) != -1:
            return None  # already accepted: unusable
        y = jnp.asarray([-1])
        init_score = float(jnp.max(s[0]))
        delta = abs(init_score * step)
        threshold = init_score + delta

        lower = jnp.clip(x - self.epsilon, -1.0)
        upper = jnp.clip(x + self.epsilon, None, 1.0)
        adver_x = x
        grad = jnp.zeros_like(x)

        if "est_run" not in self._run_cache:
            momentum, grad_sign = self.momentum, self.grad_sign
            plateau_length, plateau_drop = (self.plateau_length,
                                            self.plateau_drop)
            min_lr = self.min_lr

            def est_run(params, x0, grad0, thr, lr0, ring0, count0, it0,
                        lo, hi, rng):
                """The whole inner loop for ONE candidate threshold, on
                device: NES steps + momentum + plateau LR ring + the
                accept / exceeded exits, as a while over scan chunks (one
                dispatch per ~16 iterations instead of per iteration —
                each eager dispatch costs ~30 ms through the tunnel).

                Key/`it` semantics match the host loop exactly: `it` only
                advances on committed steps, and the breaking iteration's
                key is reused by the next candidate threshold.

                Each call is BUDGETED to 512 committed iterations — an
                unbounded on-device while_loop can spin past the TPU
                watchdog and crash the worker when the model threshold is
                unreachable; the host re-dispatches with carried state
                (lr/ring/count included, so resumption is seamless).
                The budget is only checked at scan-chunk boundaries, so a
                dispatch can commit up to 512+chunk-1 (~527) iterations;
                watchdog headroom is computed against that bound."""

                def cond(c):
                    live = jnp.logical_not(
                        jnp.logical_or(c["accepted"], c["exceeded"]))
                    return jnp.logical_and(live, c["it"] - it0 < 512)

                def body(c):
                    key = jax.random.fold_in(rng, c["it"])
                    loss, g, _, adver_score, predict = self._nes_step(
                        c["x"], y, thr, key, params=params)
                    score = jnp.max(adver_score[0])
                    live = jnp.logical_not(
                        jnp.logical_or(c["accepted"], c["exceeded"]))
                    accepted = jnp.logical_and(live, predict[0] != -1)
                    exceeded = jnp.logical_and(
                        live, jnp.logical_and(score >= thr,
                                              jnp.logical_not(accepted)))
                    commit = jnp.logical_and(live, jnp.logical_not(
                        jnp.logical_or(accepted, exceeded)))

                    g = momentum * c["grad"] + (1.0 - momentum) * g
                    nx = jnp.clip(c["x"] + grad_sign * c["lr"]
                                  * jnp.sign(g), lo, hi)
                    x = jnp.where(commit, nx, c["x"])
                    grad = jnp.where(commit, g, c["grad"])

                    ring = jnp.where(
                        commit,
                        jnp.concatenate([c["ring"][1:], loss[0:1]]),
                        c["ring"])
                    count = jnp.where(
                        commit,
                        jnp.minimum(c["count"] + 1, plateau_length),
                        c["count"])
                    trigger = jnp.logical_and(
                        jnp.logical_and(commit, count == plateau_length),
                        ring[-1] > ring[0])
                    lr = jnp.where(
                        jnp.logical_and(trigger, c["lr"] > min_lr),
                        jnp.maximum(c["lr"] / plateau_drop, min_lr),
                        c["lr"])
                    count = jnp.where(trigger, 0, count)

                    return dict(
                        x=x, grad=grad, lr=lr, ring=ring, count=count,
                        it=c["it"] + commit.astype(jnp.int32),
                        accepted=jnp.logical_or(c["accepted"], accepted),
                        exceeded=jnp.logical_or(c["exceeded"], exceeded),
                        score=jnp.where(accepted, score, c["score"]))

                init = dict(
                    x=x0, grad=grad0, lr=lr0, ring=ring0, count=count0,
                    it=it0,
                    accepted=jnp.asarray(False),
                    exceeded=jnp.asarray(False),
                    score=jnp.asarray(0.0, jnp.float32))

                def chunk_body(c):
                    out, _ = jax.lax.scan(
                        lambda cc, _: (body(cc), None), c, None, length=16)
                    return out

                return jax.lax.while_loop(cond, chunk_body, init)
            self._run_cache["est_run"] = jax.jit(est_run)

        it = jnp.asarray(0, jnp.int32)
        lr = jnp.asarray(self.max_lr, jnp.float32)
        ring = jnp.zeros((self.plateau_length,), jnp.float32)
        count = jnp.asarray(0, jnp.int32)
        while True:
            final = self._run_cache["est_run"](
                self.model.jit_params(), adver_x, grad,
                jnp.asarray(threshold, jnp.float32), lr, ring, count, it,
                lower, upper, rng)
            if bool(final["accepted"]):
                return float(final["score"])  # accepted: threshold found
            adver_x, grad, it = final["x"], final["grad"], final["it"]
            if bool(final["exceeded"]):
                # escalate the candidate; LR/ring reset (host semantics)
                threshold += delta
                lr = jnp.asarray(self.max_lr, jnp.float32)
                ring = jnp.zeros((self.plateau_length,), jnp.float32)
                count = jnp.asarray(0, jnp.int32)
            else:
                # budget exhausted: resume the SAME candidate seamlessly
                lr, ring, count = final["lr"], final["ring"], final["count"]

    def estimate_threshold(self, x, step=0.1, rng=None):
        """x: (B, 1, L) or (B, L) candidate rejected utterances; sets
        self.threshold to the mean estimate (FAKEBOB.py:280-295)."""
        if self.task == "CSI":
            return None
        x, _ = normalize_wav_input(x)
        estimates = []
        for i in range(x.shape[0]):
            est = self.estimate_threshold_run(x[i:i + 1], step, rng)
            if est is not None:
                estimates.append(est)
        self.threshold = float(np.mean(estimates)) if estimates else None
        return self.threshold
