"""Multi-chip scaling: mesh construction + sharded train/attack steps.

The reference is single-device (SURVEY 2.3): no DP/TP/PP exists to port.
The TPU-native scaling design instead treats the *latent* parallel axes of
the workload as shardable array axes over an ICI mesh:

  * batch (utterance) axis        -> "data" mesh axis
  * EOT-repeat / NES-sample axis  -> "eot" mesh axis
  * PGD restart / PSO particle axis -> folds into either

Models are MB-scale, so parameters are fully replicated; all communication
is XLA-inserted all-reduce of gradient/loss means over ICI (the TPU
equivalent of the reference's in-Python EOT/NES averaging loops).  No
point-to-point communication is ever needed.

Multi-host: processes feed per-host shards via
jax.make_array_from_process_local_data — implemented in
speakerguard_tpu.parallel.input (host_sharded_batches); DCN carries only
the input pipeline.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axes=("data",), shape=None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if shape is None:
        shape = (n,) if len(axes) == 1 else None
    assert shape is not None, "give shape for multi-axis meshes"
    return Mesh(devices.reshape(shape), axes)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place x with its leading axis sharded over `axis`."""
    spec = P(axis, *([None] * (jnp.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def sharded_train_step(step_fn, mesh: Mesh):
    """Wrap a jitted train step for DP execution: batch args sharded over
    'data', params/state/opt replicated.  step_fn signature:
    (params, state, opt_state, wavs, labels, rng) -> ...
    XLA inserts the gradient all-reduce (psum over ICI) automatically from
    the shardings."""
    repl = NamedSharding(mesh, P())
    data1 = NamedSharding(mesh, P("data"))
    data2 = NamedSharding(mesh, P("data", None))
    return jax.jit(step_fn,
                   in_shardings=(repl, repl, repl, data2, data1, repl),
                   out_shardings=None)


def sharded_attack_grad(score_fn, loss_fn, mesh: Mesh):
    """EOT-averaged input-gradient step sharded over a (data, eot) mesh:
    the batch axis shards over 'data', the EOT-repeat axis over 'eot'.
    Returns jitted (x (B, L), y (B,), keys (E, 2)) -> (loss (B,), grad)."""

    def eot_grad(x, y, keys):
        def per_key(key):
            def lf(xx):
                loss = loss_fn(score_fn(xx, key), y)
                return jnp.sum(loss), loss
            g, loss = jax.grad(lf, has_aux=True)(x)
            return loss, g

        losses, grads = jax.vmap(per_key)(keys)   # (E, B), (E, B, L)
        return jnp.mean(losses, 0), jnp.mean(grads, 0)

    data1 = NamedSharding(mesh, P("data"))
    data2 = NamedSharding(mesh, P("data", None))
    keys_s = NamedSharding(mesh, P("eot", None))
    return jax.jit(eot_grad, in_shardings=(data2, data1, keys_s),
                   out_shardings=(data1, data2))


def sharded_nes_grad(eot_fn, mesh: Mesh, *, samples_per_draw: int,
                     sigma: float, num_classes: int):
    """Black-box NES gradient estimate sharded over a (data, eot) mesh:
    the batch axis shards over 'data', the antithetic-sample axis over
    'eot' (reference adaptive_attack/NES.py:19-54 semantics — its Python
    loop over draw batches becomes a sharded array axis).  XLA inserts the
    sample-mean all-reduce over ICI.

    Returns jitted (x (B, L), y (B,), key, eot_keys (E, 2)) ->
    nes_grad's quintuple with batchwise outputs sharded over 'data'."""
    from speakerguard_tpu.adaptive.nes import nes_grad

    sample_s = NamedSharding(mesh, P("eot", "data", None))

    def fn(x, y, key, eot_keys):
        return nes_grad(eot_fn, x, y, samples_per_draw=samples_per_draw,
                        sigma=sigma, key=key, num_classes=num_classes,
                        eot_keys=eot_keys, sample_sharding=sample_s)

    data1 = NamedSharding(mesh, P("data"))
    data2 = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())
    return jax.jit(fn, in_shardings=(data2, data1, repl, repl),
                   out_shardings=(data1, data2, data1, data2, data1))
