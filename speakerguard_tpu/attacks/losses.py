"""Task-aware attack losses, fully vectorized (no host index lists).

Re-design of reference attack/utils.py:7-116 (SEC4SR_CrossEntropy /
SEC4SR_MarginLoss / resolve_loss).  The reference builds Python index lists
per call (`.cpu().numpy().tolist()`, a device sync per attack iteration);
here every branch of the task/targeted/imposter matrix is a mask lane, so
the loss is one jittable expression whose VJP flows to the scores.

Conventions preserved exactly:
  * label -1 = imposter / reject
  * SV labels in {0, -1}; CSI/OSI labels in {-1, 0..S-1}
  * clip_max clamps the loss at 0 from below (used by CW2)
  * grad_sign: Entropy: +1 untargeted / -1 targeted; Margin: always -1
"""

import functools

import jax
import jax.numpy as jnp

BIG = 1.0e4


def cross_entropy_loss(scores: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """CSI-only cross entropy; imposter (-1) rows contribute 0
    (reference attack/utils.py:7-29).  Returns per-sample loss (B,)."""
    consider = label != -1
    safe_label = jnp.where(consider, label, 0)
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_label[:, None], axis=-1)[:, 0]
    return jnp.where(consider, ce, 0.0)


def margin_loss(scores: jnp.ndarray, label: jnp.ndarray, *, task: str = "CSI",
                targeted: bool = False, confidence: float = 0.0,
                threshold=None, clip_max: bool = True) -> jnp.ndarray:
    """SEC4SR margin loss, all task branches (reference attack/utils.py:31-102).

    threshold may be a python float or traced scalar (FAKEBOB's threshold
    estimation varies it at runtime)."""
    b, num_class = scores.shape
    conf = confidence
    thr = jnp.asarray(threshold if threshold is not None else 0.0,
                      scores.dtype)

    if task == "SV":
        s = scores[:, 0]
        # (label==0) == targeted  ->  thr + conf - s   else  s + conf - thr
        flip = (label == 0) == targeted
        loss = jnp.where(flip, thr + conf - s, s + conf - thr)
    elif task in ("CSI", "OSI"):
        consider = label != -1
        safe_label = jnp.where(consider, label, 0)
        one_hot = jax.nn.one_hot(safe_label, num_class, dtype=scores.dtype)
        score_real = jnp.sum(one_hot * scores, axis=1)
        score_other = jnp.max((1.0 - one_hot) * scores - one_hot * BIG,
                              axis=1)
        score_max = jnp.max(scores, axis=1)
        if targeted:
            if task == "CSI":
                enrolled = score_other + conf - score_real
            else:
                enrolled = jnp.maximum(score_other, thr) + conf - score_real
        else:
            if task == "CSI":
                enrolled = score_real + conf - score_other
            else:
                f_reject = score_max + conf - thr
                f_mis = jnp.maximum(score_real, thr) + conf - score_other
                enrolled = jnp.minimum(f_reject, f_mis)
        if task == "OSI":
            imposter = (score_max + conf - thr if targeted
                        else thr + conf - score_max)
        else:
            imposter = jnp.zeros_like(score_max)
        loss = jnp.where(consider, enrolled, imposter)
    else:
        raise ValueError(task)

    if clip_max:
        loss = jnp.maximum(loss, 0.0)
    return loss


def resolve_loss(loss_name: str = "Entropy", targeted: bool = False,
                 confidence: float = 0.0, task: str = "CSI", threshold=None,
                 clip_max: bool = True):
    """Returns (loss_fn(scores, label) -> (B,), grad_sign)
    (reference attack/utils.py:104-116: SV/OSI force Margin)."""
    assert loss_name in ("Entropy", "Margin")
    assert task in ("CSI", "SV", "OSI")
    if task in ("SV", "OSI") or loss_name == "Margin":
        loss_fn = functools.partial(
            margin_loss, task=task, targeted=targeted, confidence=confidence,
            threshold=threshold, clip_max=clip_max)
        grad_sign = -1 if loss_name == "Margin" else (1 - 2 * int(targeted))
        if task in ("SV", "OSI"):
            grad_sign = -1
    else:
        loss_fn = cross_entropy_loss
        grad_sign = 1 - 2 * int(targeted)
    return loss_fn, grad_sign


def majority_vote(decisions: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Majority vote over EOT-repeat decisions, jit-safe with a static class
    count (reference attack/utils.py:118-125, resolve_prediction).
    decisions: (E, B) in {-1..num_classes-1} -> (B,).  Ties resolve to the
    smallest label (the reference's Counter keeps insertion order; identical
    when E=1 or votes are unanimous)."""
    counts = jnp.sum(jax.nn.one_hot(decisions + 1, num_classes + 1,
                                    dtype=jnp.int32), axis=0)
    return jnp.argmax(counts, axis=-1).astype(jnp.int32) - 1


def compare(y: jnp.ndarray, y_pred: jnp.ndarray, targeted: bool
            ) -> jnp.ndarray:
    """Success test (reference attack/Attack.py:11-15)."""
    return (y_pred == y) if targeted else (y_pred != y)
