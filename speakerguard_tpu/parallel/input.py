"""Multi-host input pipeline: per-process loading -> globally sharded arrays.

The reference is single-process (SURVEY 2.3); scaling its data feed to a
multi-host TPU pod means each host process loads ONLY its slice of the
global batch and the runtime assembles the logical global array across
hosts — DCN carries just the input pipeline, compute stays on ICI.

Single-process (tests, single chip) is the degenerate case: the "local"
slice is the whole batch, and `jax.make_array_from_process_local_data`
reduces to a sharded device_put.  The same code path runs unchanged under
`jax.distributed.initialize` on a real pod.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def prefetch(iterator, size: int = 2):
    """Overlap host-side batch loading (+ the async device_put inside
    make_global_batch) with device compute: a daemon thread keeps up to
    `size` batches queued ahead of the consumer.  Standard input-pipeline
    double buffering — while the train step runs on device, the next
    batch's wav loading and H2D transfer are already in flight.  Producer
    exceptions re-raise at the consumer's next pull."""
    import queue
    import threading

    q = queue.Queue(maxsize=size)
    _end = object()

    def producer():
        try:
            for item in iterator:
                q.put((None, item))
        except BaseException as exc:  # noqa: BLE001 - reraised at consumer
            q.put((exc, None))
            return
        q.put((_end, None))

    threading.Thread(target=producer, daemon=True).start()
    while True:
        exc, item = q.get()
        if exc is _end:
            return
        if exc is not None:
            raise exc
        yield item


def make_global_batch(local, mesh: Mesh, axis: str = "data"):
    """Assemble a process-local numpy batch (leading axis = this host's
    slice of the global batch) into a global jax.Array sharded over `axis`.
    Works for any rank; only the leading axis is sharded."""
    spec = P(axis, *([None] * (np.ndim(local) - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(local))


def host_sharded_batches(dataset, global_batch_size: int, mesh: Mesh,
                         axis: str = "data", shuffle: bool = False,
                         drop_last: bool = True, use_native: bool = True):
    """Yield globally-sharded (wavs (B, 1, L), labels (B,)) jax.Array pairs
    from a `data.dataset.Dataset`, loading only this process's slice.

    All processes must construct the dataset with the same seed so the
    (shuffled) global order agrees host-to-host; each process then reads the
    contiguous sub-range of every global batch that lands on its devices.
    Ragged tails cannot be split evenly across processes, so multi-host
    requires drop_last=True (asserted).
    """
    pi, pc = jax.process_index(), jax.process_count()
    assert global_batch_size % pc == 0, \
        "global batch must divide evenly across processes"
    assert drop_last or pc == 1, "multi-host feed requires drop_last"
    local_bs = global_batch_size // pc

    order = np.arange(len(dataset))
    if shuffle:
        dataset._rng.shuffle(order)  # same seed everywhere -> same order

    n = len(order)
    for s in range(0, n, global_batch_size):
        if s + global_batch_size > n:
            if drop_last:
                break
            # single-process ragged tail: keep it (shapes recompile once)
            idxs = order[s:]
        else:
            idxs = order[s + pi * local_bs: s + (pi + 1) * local_bs]
        wavs = dataset._native_batch(idxs) if use_native else None
        if wavs is None:
            wavs = np.stack([dataset[int(i)][0] for i in idxs]
                            ).astype(np.float32)
        labels = np.array(
            [dataset.spk_ids.index(dataset.audio_paths[i][0])
             if dataset.audio_paths[i][0] in dataset.spk_ids else -1
             for i in idxs], np.int64)
        yield (make_global_batch(wavs, mesh, axis),
               make_global_batch(labels, mesh, axis))
