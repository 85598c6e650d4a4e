"""Universal defended-model wrapper.

Re-design of reference model/defended_model.py: attaches (flag, defense_fn)
pairs to a base model and composes them either sequentially along the
feature ladder — computing features incrementally between flag levels — or
as an ensemble average of scores/embeddings over the defenses.

PRNG discipline: stochastic defenses take explicit keys, split per defense
application from the single key passed to score()/make_decision(); this is
what EOT averages over.
"""

import warnings

import jax
import jax.numpy as jnp

from speakerguard_tpu.models.base import SRSModel, decide, as_batch_wav

SEQUENTIAL = "sequential"
AVERAGE = "average"


def _split(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


class DefendedModel(SRSModel):

    def __init__(self, base_model: SRSModel, defense=None, order=SEQUENTIAL):
        self.base_model = base_model
        self.threshold = base_model.threshold
        self.range_type = base_model.range_type
        self.allowed_flags = base_model.allowed_flags
        self.spk_ids = base_model.spk_ids
        self.defense = defense
        self.order = order
        if defense is not None:
            assert order in (SEQUENTIAL, AVERAGE)
            flag2defense = {f: [] for f in base_model.allowed_flags}
            prev_flag = -1
            for flag, method in defense:
                if flag not in base_model.allowed_flags:
                    warnings.warn(
                        "Unsupported input-level flag; ignoring the defense")
                    continue
                flag2defense[flag].append(method)
                if order == SEQUENTIAL and flag < prev_flag:
                    warnings.warn("sequential defenses given out of flag "
                                  "order; re-ranged by flag")
                prev_flag = max(prev_flag, flag)
            self.flag2defense = flag2defense

    @property
    def num_defenses(self):
        return len(self.defense) if self.defense else 0

    @property
    def params(self):
        return self.base_model.params

    def resolve_params(self, params):
        return params if params is not None else self.base_model.params

    # ------------------------------------------------------------------
    def _active_flags(self):
        return sorted(f for f in self.flag2defense
                      if self.flag2defense[f] or True)

    def process_sequential(self, x, rng=None, params=None):
        """Walk the feature ladder, applying each defense at its flag level
        (reference defended_model.py:46-63).  Returns features at the highest
        flag that has a defense attached."""
        p = self.resolve_params(params)
        keys = iter(_split(rng, max(self.num_defenses, 1)))
        xx = x
        flags = sorted(self.flag2defense.keys())
        for flag in flags:
            if flag == 0:
                xx = x
            elif flag == 1:
                xx = self.base_model.compute_feat(xx, flag=1, params=p)
            else:
                xx = self.base_model.comput_feat_from_feat(
                    xx, ori_flag=flag - 1, des_flag=flag, params=p)
            for defense in self.flag2defense[flag]:
                xx = defense(xx, rng=next(keys))
        return xx, flags[-1]

    # ------------------------------------------------------------------
    def embedding(self, x, rng=None, flag=0, params=None, fast=False):
        p = self.resolve_params(params)
        if self.defense is None:
            return self.base_model.embedding(x, flag=0, rng=rng, params=p,
                                             fast=fast)
        if self.order == SEQUENTIAL:
            xx, top = self.process_sequential(x, rng=rng, params=p)
            return self.base_model.embedding(xx, flag=top, params=p,
                                             fast=fast)
        return self._average(x, rng, want="emb", params=p)

    def forward(self, x, return_emb=False, enroll_embs=None, rng=None,
                flag=0, params=None, fast=False):
        p = self.resolve_params(params)
        if self.defense is None:
            return self.base_model.forward(x, flag=0, return_emb=return_emb,
                                           enroll_embs=enroll_embs, rng=rng,
                                           params=p, fast=fast)
        if self.order == SEQUENTIAL:
            xx, top = self.process_sequential(x, rng=rng, params=p)
            return self.base_model.forward(xx, flag=top,
                                           return_emb=return_emb,
                                           enroll_embs=enroll_embs, params=p,
                                           fast=fast)
        scores, emb = self._average(x, rng, want="both",
                                    enroll_embs=enroll_embs, params=p)
        return (scores, emb) if return_emb else scores

    def score(self, x, enroll_embs=None, rng=None, flag=0, params=None,
              fast=False):
        return self.forward(x, enroll_embs=enroll_embs, rng=rng,
                            params=params, fast=fast)

    def make_decision(self, x, enroll_embs=None, rng=None, flag=0,
                      params=None, fast=False):
        scores = self.score(x, enroll_embs=enroll_embs, rng=rng,
                            params=params, fast=fast)
        return decide(scores, self.base_model.threshold)

    # ------------------------------------------------------------------
    def _average(self, x, rng, want="both", enroll_embs=None, params=None):
        p = self.resolve_params(params)
        """Ensemble-average composition (reference defended_model.py:107-126):
        each defense runs on the *clean* features at its flag level; scores
        and embeddings are averaged."""
        keys = iter(_split(rng, max(self.num_defenses, 1)))
        scores_acc, emb_acc, n = None, None, 0
        for flag in sorted(self.flag2defense.keys()):
            defenses = self.flag2defense[flag]
            if not defenses:
                continue
            xx = x if flag == 0 else self.base_model.compute_feat(
                x, flag=flag, params=p)
            for defense in defenses:
                xxx = defense(xx, rng=next(keys))
                scores, emb = self.base_model.forward(
                    xxx, flag=flag, return_emb=True,
                    enroll_embs=enroll_embs, params=p)
                scores_acc = scores if scores_acc is None else scores_acc + scores
                emb_acc = emb if emb_acc is None else emb_acc + emb
                n += 1
        scores_acc = scores_acc / n
        emb_acc = emb_acc / n
        if want == "emb":
            return emb_acc
        return scores_acc, emb_acc
