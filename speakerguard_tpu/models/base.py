"""Uniform SRS model protocol.

Every model exposes the reference's five-method surface
(reference model/iv_plda.py:86-194):

    compute_feat(x, flag)             wav -> acoustic feature at `flag` level
    comput_feat_from_feat(f, o, d)    feature-ladder transitions
    embedding(x, flag)                any level -> speaker embedding
    forward/score(x, flag)           -> (B, S) scores
    make_decision(x, flag)           -> (decisions, scores); -1 = reject

plus the attributes attacks/defenses key on: ``allowed_flags``,
``range_type``, ``threshold``, ``spk_ids``/``num_spks``.

The "flag" ladder is the load-bearing cross-layer contract that lets
defenses insert at any feature level (reference model/defended_model.py).

All heavy math lives in pure jitted functions of (params, arrays); these
methods are thin shape-normalizing wrappers so attacks can close over them
and `jax.grad` straight through.
"""

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.utils.ranges import check_input_range

NEG_INF = float("-inf")


def fast_active() -> bool:
    """Gate for the bf16 fast attack-gradient path (SG_FAST={auto,0,1}).

    auto (default): active only on TPU — off-TPU (the CPU test mesh) the
    bf16 copies would change numerics without any speed benefit, and parity
    tests compare exact paths.  Attacks request fast=True for gradient-step
    graphs; models call this gate before honoring it."""
    import os
    mode = os.environ.get("SG_FAST", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"


def fast_dft_precision():
    """DFT-matmul precision for attack-gradient (fast) frontends.

    SG_DFT_FAST_PRECISION={high,default}; high (3-pass bf16) is the
    default — measured max rel err ~1e-5 on the power spectrum vs
    HIGHEST, far inside attack-gradient tolerance.  `default`
    (single-pass bf16) is the measurement knob for trading more frontend
    precision for MXU passes; the exact final evaluation always re-runs
    at HIGHEST regardless."""
    import os
    # default since r4: chip-measured ASR-identical at bf16-pass DFT
    # matmuls on both consumers (audionet 135.5 -> 157.6 utts/s PGD-100,
    # xv-PLDA 129.2 -> 132.7; ASR bit-equal both).  SG_DFT_FAST_PRECISION
    # =high restores 3-pass bf16 for the attack-gradient frontend.
    name = os.environ.get("SG_DFT_FAST_PRECISION", "default")
    table = {"high": jax.lax.Precision.HIGH,
             "default": jax.lax.Precision.DEFAULT}
    if name not in table:
        raise ValueError(
            f"SG_DFT_FAST_PRECISION={name!r}: accepted values are "
            f"{sorted(table)} (the exact final evaluation always runs at "
            "HIGHEST regardless)")
    return table[name]


def decide(scores: jnp.ndarray, threshold: float):
    """argmax + reject threshold (reference iv_plda.py:182-194)."""
    decisions = jnp.argmax(scores, axis=1).astype(jnp.int32)
    max_scores = jnp.max(scores, axis=1)
    return jnp.where(max_scores > threshold, decisions, -1), scores


def as_batch_wav(x) -> jnp.ndarray:
    """Accept (L,), (B, L) or (B, 1, L); return (B, L)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        return x[None, :]
    if x.ndim == 3:
        assert x.shape[1] == 1, "only mono audio"
        return x[:, 0, :]
    assert x.ndim == 2
    return x


class SRSModel:
    """Subclasses set: allowed_flags, range_type, threshold, spk_ids and
    implement _raw / _feat_step / _embedding_from_top / _scores_from_emb."""

    allowed_flags: tuple = (0, 1)
    range_type: str = "origin"
    threshold: float = NEG_INF
    spk_ids: list = None
    enroll_embs: jnp.ndarray | None = None

    @property
    def num_spks(self) -> int:
        return len(self.spk_ids) if self.spk_ids is not None else None

    # ---- parameter threading -------------------------------------------
    # Under jit, closed-over concrete arrays become inlined HLO constants
    # (a 3.3GB lowering for full-size iv_plda).  Every public method
    # therefore accepts an explicit `params` pytree; attacks pass
    # `model.params` into their jitted runners as a traced argument.
    params = None

    def resolve_params(self, params):
        return params if params is not None else self.params

    def jit_params(self):
        """The pytree attacks pass into their jitted runners.  Measured
        head-to-head on v5e, threading params as arguments beats closure
        capture (inlined HLO constants) at runtime AND avoids both the
        multi-GB lowering blowup (iv_plda) and recompiles when params
        change (attack-in-the-training-loop)."""
        return self.params

    # ---- ladder pieces (override; `p` is the resolved params pytree) ----
    def _raw(self, wav, rng=None, p=None, fast=False):
        raise NotImplementedError

    def _feat_step(self, feats, ori_flag, p=None):
        raise NotImplementedError

    def _embedding_from_top(self, feats, p=None, fast=False, fast_ctx=None):
        raise NotImplementedError

    def _scores_from_emb(self, emb, enroll_embs=None, p=None):
        raise NotImplementedError

    # ---- per-attack-run fast-path context --------------------------------
    def fast_context(self, x, rng=None, params=None):
        """Optional per-run constants for the fast attack-gradient path,
        computed ONCE from the attack's clean input inside the attack's jit
        (e.g. iv_plda's frozen top-K Gaussian selection).  Models without
        one return None; attack runners pass the result back via
        ``fast_ctx=`` on score/forward.  Never affects the exact
        (fast=False) path."""
        return None

    # ---- uniform API ----
    def compute_feat(self, x, flag=1, rng=None, params=None, fast=False):
        assert flag in self.allowed_flags and flag != 0
        p = self.resolve_params(params)
        wav = check_input_range(as_batch_wav(x), range_type=self.range_type)
        feats = self._raw(wav, rng=rng, p=p, fast=fast)
        for f in range(1, flag):
            feats = self._feat_step(feats, f, p=p)
        return feats

    def comput_feat_from_feat(self, feats, ori_flag=1, des_flag=2,
                              params=None):
        assert ori_flag in self.allowed_flags and des_flag in self.allowed_flags
        assert 0 < ori_flag < des_flag
        p = self.resolve_params(params)
        for f in range(ori_flag, des_flag):
            feats = self._feat_step(feats, f, p=p)
        return feats

    def embedding(self, x, flag=0, rng=None, params=None, fast=False,
                  fast_ctx=None):
        # fast=True marks an attack-gradient graph: models with a bf16
        # fast path (iv_plda) honor it; others ignore it.  Callers keep
        # their final success evaluation on the exact (fast=False) path.
        assert flag in self.allowed_flags
        p = self.resolve_params(params)
        top = self.allowed_flags[-1]
        if flag == 0:
            feats = self.compute_feat(x, flag=top, rng=rng, params=p,
                                      fast=fast)
        elif flag < top:
            feats = self.comput_feat_from_feat(x, ori_flag=flag,
                                               des_flag=top, params=p)
        else:
            feats = x
        if fast_ctx is None:
            # Keep old-signature subclasses working (e.g. test toy models):
            # only models that produce a fast_context need the kwarg.
            return self._embedding_from_top(feats, p=p, fast=fast)
        return self._embedding_from_top(feats, p=p, fast=fast,
                                        fast_ctx=fast_ctx)

    def forward(self, x, flag=0, return_emb=False, enroll_embs=None,
                rng=None, params=None, fast=False, fast_ctx=None):
        p = self.resolve_params(params)
        emb = self.embedding(x, flag=flag, rng=rng, params=p, fast=fast,
                             fast_ctx=fast_ctx)
        scores = self._scores_from_emb(emb, enroll_embs=enroll_embs, p=p)
        return (scores, emb) if return_emb else scores

    def score(self, x, flag=0, enroll_embs=None, rng=None, params=None,
              fast=False, fast_ctx=None):
        return self.forward(x, flag=flag, enroll_embs=enroll_embs, rng=rng,
                            params=params, fast=fast, fast_ctx=fast_ctx)

    def make_decision(self, x, flag=0, enroll_embs=None, rng=None,
                      params=None, fast=False):
        scores = self.score(x, flag=flag, enroll_embs=enroll_embs, rng=rng,
                            params=params, fast=fast)
        return decide(scores, self.threshold)

    # ---- reference-API aliases (iv_plda.py:197, :380) ----
    def raw(self, x, rng=None, params=None):
        """wav -> flag-1 acoustic features."""
        return self.compute_feat(x, flag=1, rng=rng, params=params)

    def extract_emb(self, feats, params=None):
        """top-level features -> embeddings."""
        return self._embedding_from_top(feats,
                                        p=self.resolve_params(params))
