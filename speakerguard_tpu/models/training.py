"""Training loops for AudioNet CSI-NE: natural + adversarial training.

Re-design of reference natural_train.py / adver_train.py as jitted train
steps: the whole (noise-augment -> features -> forward(train BN) -> CE ->
grad -> Adam update) chain is one compiled function; adversarial training
nests the PGD/FGSM attack generation inside the step (the reference runs
the attack on the live model each batch, adver_train.py:190-198).

Checkpointing: numpy .npz of (params, bn state, opt state) with epoch
metadata — the orbax-free equivalent of the reference's per-epoch
state-dict saves (natural_train.py:175-181).
"""

import os
import pickle
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speakerguard_tpu.ops.logmel import audionet_logmel
from speakerguard_tpu.models.audionet import (
    AudioNetParams, AudioNetState, audionet_logits)


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def _cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree (params / BN state) to dtype.
    Differentiable: astype's VJP casts cotangents back, so master params
    stay f32 and receive f32 gradients (the standard TPU mixed-precision
    recipe: bf16 compute, f32 master weights + optimizer state)."""
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, tree)


def _resolve_compute_dtype(compute_dtype):
    """'bf16'/'f32'/None or a dtype -> dtype or None (None = exact f32,
    the reference-parity default).  bf16 halves the HBM traffic of every
    activation and runs the conv/matmul MXU passes single-pass — the
    idiomatic TPU training mode; CE loss and BN running stats stay f32."""
    if compute_dtype in (None, "f32", "float32"):
        return None
    if compute_dtype in ("bf16", "bfloat16"):
        return jnp.bfloat16
    return compute_dtype


def make_natural_train_step(optimizer, aug_eps: float = 0.002,
                            compute_dtype=None):
    """Returns jitted step(params, state, opt_state, wavs (B,L) scale-domain,
    labels, rng) -> (params, state, opt_state, loss, acc).

    Noise augmentation matches reference natural_train.py:138-148: uniform
    noise in [-a*eps, a*eps) with a ~ U[0,1), the noisy copies concatenated
    to the batch.

    compute_dtype='bf16' enables mixed-precision training (bf16 network
    compute, f32 master params / optimizer / BN running stats / loss —
    see _cast_floats); default is exact f32 like the torch reference.
    """
    cdt = _resolve_compute_dtype(compute_dtype)

    @jax.jit
    def step(params, state, opt_state, wavs, labels, rng):
        if aug_eps > 0.0:
            k1, k2 = jax.random.split(rng)
            a = jax.random.uniform(k1, ())
            noise = (2.0 * a * aug_eps
                     * jax.random.uniform(k2, wavs.shape, wavs.dtype)
                     - a * aug_eps)
            wavs_all = jnp.concatenate([wavs, wavs + noise], axis=0)
            labels_all = jnp.concatenate([labels, labels], axis=0)
        else:
            wavs_all, labels_all = wavs, labels

        def loss_fn(p):
            feats = audionet_logmel(wavs_all)
            logits, _, new_state = audionet_logits(
                _cast_floats(p, cdt), _cast_floats(state, cdt),
                _cast_floats(feats, cdt), train=True)
            logits = logits.astype(jnp.float32)
            new_state = _cast_floats(new_state, jnp.float32 if cdt else None)
            return jnp.mean(cross_entropy(logits, labels_all)), \
                (new_state, logits)

        (loss, (new_state, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels_all)
        return new_params, new_state, new_opt_state, loss, acc

    return step


def make_adver_train_step(optimizer, attack_fory, ratio: float = 0.5,
                          aug_eps: float = 0.002, compute_dtype=None):
    """Adversarial training step: replaces `ratio` of each minibatch with
    adversarial examples generated against the CURRENT params
    (reference adver_train.py:190-223).

    attack_fory(params, state, wavs, labels, rng) -> adver_wavs must be a
    jittable pure function (see make_pgd_for_training).

    compute_dtype='bf16': mixed-precision train substep (the in-graph
    attack keeps its own precision policy — its gradients feed sign()).
    """
    cdt = _resolve_compute_dtype(compute_dtype)

    @jax.jit
    def step(params, state, opt_state, wavs, labels, rng):
        b = wavs.shape[0]
        n_adv = int(b * ratio)
        k_atk, k_aug1, k_aug2 = jax.random.split(rng, 3)
        adv = attack_fory(params, state, wavs[:n_adv], labels[:n_adv], k_atk)
        wavs_mixed = jnp.concatenate([adv, wavs[n_adv:]], axis=0)

        if aug_eps > 0.0:
            a = jax.random.uniform(k_aug1, ())
            noise = (2.0 * a * aug_eps
                     * jax.random.uniform(k_aug2, wavs[n_adv:].shape,
                                          wavs.dtype) - a * aug_eps)
            wavs_all = jnp.concatenate(
                [wavs_mixed, wavs[n_adv:] + noise], axis=0)
            labels_all = jnp.concatenate([labels, labels[n_adv:]], axis=0)
        else:
            wavs_all, labels_all = wavs_mixed, labels

        def loss_fn(p):
            feats = audionet_logmel(wavs_all)
            logits, _, new_state = audionet_logits(
                _cast_floats(p, cdt), _cast_floats(state, cdt),
                _cast_floats(feats, cdt), train=True)
            logits = logits.astype(jnp.float32)
            new_state = _cast_floats(new_state, jnp.float32 if cdt else None)
            return jnp.mean(cross_entropy(logits, labels_all)), \
                (new_state, logits)

        (loss, (new_state, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        acc_adv = jnp.mean(jnp.argmax(logits[:n_adv], -1) == labels[:n_adv])
        acc_nor = jnp.mean(
            jnp.argmax(logits[n_adv:b], -1) == labels[n_adv:])
        return new_params, new_state, new_opt_state, loss, acc_adv, acc_nor

    return step


def make_pgd_for_training(epsilon=0.002, step_size=0.0004, max_iter=10):
    """In-graph PGD against the live model, BN in train mode like the
    reference (adver_train.py note: attack runs with model.train())."""

    def attack(params, state, wavs, labels, rng):
        lower = jnp.clip(wavs - epsilon, -1.0)
        upper = jnp.clip(wavs + epsilon, None, 1.0)

        def loss_of(x):
            feats = audionet_logmel(x)
            logits, _, _ = audionet_logits(params, state, feats, train=False)
            return jnp.sum(cross_entropy(logits, labels))

        def body(x, _):
            g = jax.grad(loss_of)(x)
            x = jnp.clip(x + step_size * jnp.sign(g), lower, upper)
            return x, None

        adv, _ = jax.lax.scan(body, wavs, None, length=max_iter)
        return adv

    return attack


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(path, params: AudioNetParams, state: AudioNetState,
                    opt_state=None, epoch: int = 0):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blob = {
        "params": jax.tree.map(np.asarray, params),
        "state": jax.tree.map(np.asarray, state),
        "opt_state": jax.tree.map(np.asarray, opt_state)
        if opt_state is not None else None,
        "epoch": epoch,
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_checkpoint(path):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    params = jax.tree.map(jnp.asarray, blob["params"])
    state = jax.tree.map(jnp.asarray, blob["state"])
    opt_state = (jax.tree.map(jnp.asarray, blob["opt_state"])
                 if blob["opt_state"] is not None else None)
    return params, state, opt_state, blob.get("epoch", 0)


# ---- orbax backend: TPU-native ASYNC checkpointing --------------------
# Device-to-host copies happen at save() time; serialization and disk IO
# run on background threads, so the train loop never blocks on storage.
# Multi-host safe (orbax coordinates the processes; each host writes its
# own param shards).  Opt-in via natural_train/adver_train
# `-ckpt_backend orbax`.

_ORBAX_CKPTR = None


def _orbax_checkpointer():
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp
        _ORBAX_CKPTR = ocp.StandardCheckpointer()  # async under the hood
    return _ORBAX_CKPTR


def save_checkpoint_orbax(dir_path, params: AudioNetParams,
                          state: AudioNetState, opt_state=None,
                          epoch: int = 0, wait: bool = False):
    """Async save to `dir_path` (an orbax checkpoint DIRECTORY).  Returns
    immediately unless wait=True (tests / final save)."""
    ckptr = _orbax_checkpointer()
    tree = {"params": params, "state": state,
            "opt_state": opt_state if opt_state is not None else {},
            "epoch": jnp.asarray(epoch)}
    path = os.path.abspath(str(dir_path))
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, tree)
    if wait:
        ckptr.wait_until_finished()


def load_checkpoint_orbax(dir_path, params_like: AudioNetParams,
                          state_like: AudioNetState, opt_state_like=None):
    """Restore from an orbax directory.  `*_like` supply the pytree
    structure (fresh init values work)."""
    ckptr = _orbax_checkpointer()
    ckptr.wait_until_finished()
    target = {"params": params_like, "state": state_like,
              "opt_state": opt_state_like if opt_state_like is not None
              else {},
              "epoch": jnp.asarray(0)}
    got = ckptr.restore(os.path.abspath(str(dir_path)), target)
    opt_state = got["opt_state"] if opt_state_like is not None else None
    return (got["params"], got["state"], opt_state,
            int(got["epoch"]))
