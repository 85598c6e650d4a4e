"""NES gradient estimation (natural evolution strategies), batched.

Re-design of reference adaptive_attack/NES.py: antithetic Gaussian sampling
with the unperturbed point prepended (to obtain the adversarial loss/score
"for free"), the sample axis is a real array axis folded into the model
batch — shardable across a mesh — instead of a Python loop over draw
batches.

grad = E[loss(x + sigma*u) * u] / sigma, u ~ N(0, I) antithetic.
"""

import jax
import jax.numpy as jnp

from speakerguard_tpu.attacks.losses import majority_vote


def nes_grad(eot_fn, x, y, *, samples_per_draw: int, sigma: float,
             key, num_classes: int, eot_keys, samples_batch: int = None,
             sample_sharding=None):
    """x: (B, L); y: (B,).  eot_fn = eot_no_grad(...) closure.

    Returns (mean_loss (B,), grad (B, L), adver_loss (B,), adver_score
    (B, S), predict (B,)) matching reference NES.forward's quintuple.

    samples_batch: optional memory knob — evaluate the S+1 sample axis in
    chunks of samples_batch*B model inputs (the reference's
    samples_per_draw_batch_size, NES.py:17-18).

    sample_sharding: optional NamedSharding, e.g. P('eot', 'data', None)
    over a (data x eot) mesh — constrains the (S+1, B, L) sample tensor so
    the antithetic-sample axis shards over 'eot' and the batch over 'data';
    XLA inserts the sample-mean all-reduce.  The noise VALUES are layout-
    independent (jax.random is deterministic in the key), so sharded and
    single-device estimates agree to reduction-order roundoff.  Mutually
    exclusive with samples_batch chunking (chunking is a single-device
    memory knob; the mesh IS the memory knob when sharded).
    """
    b, length = x.shape
    half = samples_per_draw // 2
    noise = jax.random.normal(key, (half, b, length), x.dtype)
    noise = jnp.concatenate([jnp.zeros((1, b, length), x.dtype),
                             noise, -noise], axis=0)       # (S+1, B, L)
    if sample_sharding is not None:
        assert samples_batch is None or samples_batch >= samples_per_draw, \
            "sample_sharding and samples_batch chunking are exclusive"
        samples_batch = None
        noise = jax.lax.with_sharding_constraint(noise, sample_sharding)
    s1 = noise.shape[0]

    eval_x = (x[None] + sigma * noise).reshape(s1 * b, length)
    eval_y = jnp.tile(y[None], (s1, 1)).reshape(-1)

    if samples_batch is not None and samples_batch < samples_per_draw:
        # The chunking knob is the reference's samples_per_draw_batch_size
        # (NES.py:17-18), which budgets the DRAWN samples — the prepended
        # unperturbed point must not trip it: samples_batch == S (the
        # default) used to chunk s1 = S+1 into (S, 1) groups and pad the
        # second group with S-1 junk lanes — ~1.96x wasted forward passes
        # on every NES step.  When chunking is requested, the chunk count
        # comes from the budget but sizes are balanced so padding is
        # minimal (s1=51, budget 25 -> 3 chunks of 17, pad 0).  Regrouping
        # never changes values: lanes are independent and every chunk
        # shares the same eot_keys.
        n_chunks = -(-s1 // samples_batch)
        chunk = -(-s1 // n_chunks)
        pad = n_chunks * chunk - s1
        ex = jnp.pad(eval_x.reshape(s1, b, length),
                     ((0, pad), (0, 0), (0, 0))).reshape(
            n_chunks, chunk * b, length)
        ey = jnp.pad(eval_y.reshape(s1, b), ((0, pad), (0, 0))).reshape(
            n_chunks, chunk * b)
        scores_c, loss_c, dec_c = jax.lax.map(
            lambda args: eot_fn(args[0], args[1], eot_keys), (ex, ey))
        scores = scores_c.reshape(n_chunks * chunk, b, -1)[:s1]
        loss = loss_c.reshape(n_chunks * chunk, b)[:s1]
        decisions = jnp.moveaxis(dec_c, 1, 0).reshape(
            dec_c.shape[1], -1)[:, : s1 * b]
        scores = scores.reshape(s1, b, -1)
    else:
        scores, loss, decisions = eot_fn(eval_x, eval_y, eot_keys)
        scores = scores.reshape(s1, b, -1)
        loss = loss.reshape(s1, b)
    # decisions: (E, S1*B) -> majority over EOT axis -> (S1, B)
    predict_all = majority_vote(decisions, num_classes).reshape(s1, b)

    adver_loss = loss[0]
    adver_score = scores[0]
    predict = predict_all[0]
    sample_loss = loss[1:]                                  # (S, B)
    sample_noise = noise[1:]                                # (S, B, L)
    grad = jnp.mean(sample_loss[..., None] * sample_noise, axis=0) / sigma
    mean_loss = jnp.mean(sample_loss, axis=0)
    return mean_loss, grad, adver_loss, adver_score, predict
