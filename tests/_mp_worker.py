"""Worker for test_multiprocess.py: one rank of a 2-process CPU
`jax.distributed` run.

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent), so
the 2-process global mesh has 8 devices over one 'data' axis.  Each rank
feeds ONLY its half of a fixed global batch through
parallel.input.make_global_batch (the multi-host input-feed contract,
SURVEY 2.3), computes a jitted white-box input gradient on the globally
sharded array, and reduces |grad| over the global batch — an all-reduce
that crosses the process boundary.  Rank 0 checks both the reduction and
its addressable gradient shards against an analytic single-process oracle.
"""

import sys

import numpy as np


def main():
    port, nproc, rank = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.distributed.initialize(f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=rank)
    except Exception as exc:  # noqa: BLE001 - parent maps this to skip
        print(f"DIST_UNAVAILABLE {type(exc).__name__}: {exc}", flush=True)
        sys.exit(3)

    import jax.numpy as jnp
    from jax.sharding import Mesh
    from speakerguard_tpu.parallel.input import make_global_batch

    devs = np.array(jax.devices())
    assert len(devs) == 4 * nproc, f"expected {4 * nproc} global devices"
    mesh = Mesh(devs, ("data",))

    gb, length, classes = 8, 400, 4
    rng = np.random.default_rng(0)  # same seed every rank -> same globals
    x_global = rng.standard_normal((gb, length)).astype(np.float32)
    y_global = rng.integers(0, classes, gb)
    w = jnp.asarray(rng.standard_normal((length, classes)).astype(
        np.float32))

    lb = gb // nproc
    x = make_global_batch(x_global[rank * lb:(rank + 1) * lb], mesh)
    y_onehot = make_global_batch(
        np.eye(classes, dtype=np.float32)[y_global[rank * lb:(rank + 1)
                                                   * lb]], mesh)
    assert x.shape == (gb, length)  # global logical shape

    def loss(xx, oh):
        return jnp.sum((xx @ w) * oh)

    grad = jax.jit(jax.grad(loss))(x, y_onehot)      # sharded like x
    total = jax.jit(lambda g: jnp.sum(jnp.abs(g)))(grad)  # all-reduce

    # analytic single-process oracle: d/dx sum((x@w)*onehot) = onehot @ w.T
    want = np.eye(classes, dtype=np.float32)[y_global] @ np.asarray(w).T
    np.testing.assert_allclose(float(total), np.abs(want).sum(), rtol=1e-5)
    for shard in grad.addressable_shards:
        rows = range(shard.index[0].start or 0,
                     shard.index[0].stop or gb)
        np.testing.assert_allclose(np.asarray(shard.data),
                                   want[list(rows)], rtol=1e-5)
    print(f"MP_OK rank={rank} total={float(total):.6f}", flush=True)


if __name__ == "__main__":
    main()
