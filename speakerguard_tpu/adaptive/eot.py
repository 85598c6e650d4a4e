"""EOT — Expectation over Transformation, as a vmapped repeat axis.

Re-design of reference adaptive_attack/EOT.py: the reference loops
EOT_num_batches times, repeating the batch EOT_batch_size x and calling
loss.backward() each round.  Here the EOT repeats are one vmapped axis of
PRNG keys; scores / per-sample losses / input grads are averaged on device
and per-repeat decisions are returned for majority voting.  On a device
mesh the repeat axis can be sharded (see speakerguard_tpu.parallel).

The `score_fn(x, rng) -> (B, S)` closure is the only model contract.
"""

import jax
import jax.numpy as jnp

from speakerguard_tpu.models.base import decide


def eot(score_fn, loss_fn, threshold: float):
    """Returns fn(x, y, keys) -> (scores (B,S), loss (B,), grad like x,
    decisions (E, B)); means over the EOT axis."""

    def run(x, y, keys):
        def per_key(key):
            def lf(xx):
                scores = score_fn(xx, key)
                loss = loss_fn(scores, y)
                return jnp.sum(loss), (scores, loss)
            grad, (scores, loss) = jax.grad(lf, has_aux=True)(x)
            decisions, _ = decide(scores, threshold)
            return scores, loss, grad, decisions

        scores, loss, grad, decisions = jax.vmap(per_key)(keys)
        return (jnp.mean(scores, 0), jnp.mean(loss, 0), jnp.mean(grad, 0),
                decisions)

    return run


def eot_no_grad(score_fn, loss_fn, threshold: float):
    """Score-only variant for black-box attacks (use_grad=False)."""

    def run(x, y, keys):
        def per_key(key):
            scores = score_fn(x, key)
            loss = loss_fn(scores, y)
            decisions, _ = decide(scores, threshold)
            return scores, loss, decisions

        scores, loss, decisions = jax.vmap(per_key)(keys)
        return jnp.mean(scores, 0), jnp.mean(loss, 0), decisions

    return run
