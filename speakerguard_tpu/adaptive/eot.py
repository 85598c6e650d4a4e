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


def _chunked(per_key_vmapped, keys, eot_batch_size):
    """Run the vmapped per-key fn over `keys` in chunks of eot_batch_size
    (the reference's EOT_batch_size memory knob, EOT.py:26): a lax.map over
    chunk groups, vmap within each chunk.  Results are concatenated back to
    the full EOT axis."""
    e = keys.shape[0]
    if eot_batch_size is None or eot_batch_size >= e:
        return per_key_vmapped(keys)
    assert e % eot_batch_size == 0, \
        "EOT size must be divisible by EOT batch size"
    grouped = keys.reshape(e // eot_batch_size, eot_batch_size,
                           *keys.shape[1:])
    out = jax.lax.map(per_key_vmapped, grouped)
    return jax.tree.map(
        lambda a: a.reshape(e, *a.shape[2:]), out)


def eot(score_fn, loss_fn, threshold: float, eot_batch_size=None):
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

        if keys.shape[0] == 1:
            # no-vmap fast path: EOT(1) is the common case, and
            # vmap-of-grad-of-rfft trips an XLA:CPU fft-thunk layout check
            # under mesh sharding (dim0-major RET_CHECK)
            scores, loss, grad, decisions = per_key(keys[0])
            return scores, loss, grad, decisions[None]
        scores, loss, grad, decisions = _chunked(
            jax.vmap(per_key), keys, eot_batch_size)
        return (jnp.mean(scores, 0), jnp.mean(loss, 0), jnp.mean(grad, 0),
                decisions)

    return run


def eot_no_grad(score_fn, loss_fn, threshold: float, eot_batch_size=None):
    """Score-only variant for black-box attacks (use_grad=False)."""

    def run(x, y, keys):
        def per_key(key):
            scores = score_fn(x, key)
            loss = loss_fn(scores, y)
            decisions, _ = decide(scores, threshold)
            return scores, loss, decisions

        scores, loss, decisions = _chunked(
            jax.vmap(per_key), keys, eot_batch_size)
        return jnp.mean(scores, 0), jnp.mean(loss, 0), decisions

    return run
