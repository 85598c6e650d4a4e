"""Training loop tests: natural/adversarial steps learn, checkpoints
round-trip, resume works, EOT chunking is exact."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speakerguard_tpu.models.audionet import init_audionet, AudioNet
from speakerguard_tpu.models.training import (
    make_natural_train_step, make_adver_train_step, make_pgd_for_training,
    save_checkpoint, load_checkpoint)


def test_natural_training_reduces_loss(rng):
    params, state = init_audionet(rng, num_class=3)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_natural_train_step(opt, aug_eps=0.002)
    wavs = jnp.asarray(rng.uniform(-0.3, 0.3, (6, 4000)).astype(np.float32))
    labels = jnp.asarray([0, 0, 1, 1, 2, 2])
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss, acc = step(params, state, opt_state,
                                                   wavs, labels, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_adver_training_step_runs(rng):
    params, state = init_audionet(rng, num_class=3)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    attack = make_pgd_for_training(epsilon=0.01, step_size=0.004, max_iter=2)
    step = make_adver_train_step(opt, attack, ratio=0.5, aug_eps=0.002)
    wavs = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 4000)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 0])
    out = step(params, state, opt_state, wavs, labels, jax.random.PRNGKey(0))
    assert np.isfinite(float(out[3]))


def test_checkpoint_roundtrip_and_resume(tmp_path, rng):
    params, state = init_audionet(rng, num_class=3)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_natural_train_step(opt, aug_eps=0.0)
    wavs = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 4000)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 0])
    params, state, opt_state, _, _ = step(params, state, opt_state, wavs,
                                          labels, jax.random.PRNGKey(0))
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, params, state, opt_state, epoch=5)
    p2, s2, o2, epoch = load_checkpoint(p)
    assert epoch == 5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed optimizer state continues training identically
    out1 = step(params, state, opt_state, wavs, labels,
                jax.random.PRNGKey(1))
    out2 = step(p2, s2, o2, wavs, labels, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(out1[3]), float(out2[3]), rtol=1e-6)
    # model built from checkpoint makes identical decisions
    m = AudioNet(p2, s2)
    d, _ = m.make_decision(wavs)
    assert np.asarray(d).shape == (4,)


def test_eot_chunking_is_exact(rng):
    from speakerguard_tpu.adaptive.eot import eot
    from speakerguard_tpu.attacks.losses import resolve_loss
    from test_attacks import ToyModel
    from speakerguard_tpu.models.defended import DefendedModel
    from speakerguard_tpu.defenses.registry import parser_defense

    base = ToyModel()
    defense, _ = parser_defense(["AT"], ["20"], [0], "sequential")
    dm = DefendedModel(base, defense=defense, order="sequential")
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 4000)).astype(np.float32))
    y, _ = dm.make_decision(x, rng=jax.random.PRNGKey(3))
    loss_fn, _ = resolve_loss("Margin", task="CSI")
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    score_fn = lambda xx, k: dm.score(xx, rng=k)  # noqa: E731
    full = eot(score_fn, loss_fn, dm.threshold)(x, y, keys)
    chunked = eot(score_fn, loss_fn, dm.threshold, eot_batch_size=2)(
        x, y, keys)
    for a, b in zip(full, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_orbax_checkpoint_roundtrip(rng, tmp_path):
    """TPU-native async checkpoint backend: save (async) -> restore
    reproduces params/state/opt_state/epoch exactly."""
    import optax
    from speakerguard_tpu.models.audionet import init_audionet
    from speakerguard_tpu.models.training import (
        save_checkpoint_orbax, load_checkpoint_orbax)

    params, state = init_audionet(rng, num_class=4)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = tmp_path / "ckpt_orbax"
    save_checkpoint_orbax(path, params, state, opt_state, epoch=7,
                          wait=True)

    p0, s0 = init_audionet(np.random.default_rng(99), num_class=4)
    got_p, got_s, got_o, epoch = load_checkpoint_orbax(
        path, p0, s0, opt.init(p0))
    assert epoch == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(got_o)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(got_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mixed_precision_training_reduces_loss(rng):
    """compute_dtype='bf16' (the TPU mixed-precision mode): master params
    stay f32, the step runs, and the loss decreases like the f32 step.
    On the CPU test mesh XLA executes the bf16 convs by upconversion, so
    this validates dtype plumbing + learning dynamics, not speed."""
    params, state = init_audionet(rng, num_class=3)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_natural_train_step(opt, aug_eps=0.002,
                                   compute_dtype="bf16")
    wavs = jnp.asarray(rng.uniform(-0.3, 0.3, (6, 4000)).astype(np.float32))
    labels = jnp.asarray([0, 0, 1, 1, 2, 2])
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss, acc = step(params, state, opt_state,
                                                   wavs, labels, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # master weights and BN running stats stay f32
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(params)
               if jnp.issubdtype(a.dtype, jnp.floating))
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(state)
               if jnp.issubdtype(a.dtype, jnp.floating))


def test_mixed_precision_adver_step_runs(rng):
    params, state = init_audionet(rng, num_class=3)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    attack = make_pgd_for_training(max_iter=2)
    step = make_adver_train_step(opt, attack, ratio=0.5, aug_eps=0.002,
                                 compute_dtype="bf16")
    wavs = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 4000)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 0])
    out = step(params, state, opt_state, wavs, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(out[3]))
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(out[0])
               if jnp.issubdtype(a.dtype, jnp.floating))
