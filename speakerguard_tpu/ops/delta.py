"""Kaldi add-deltas, batched.

The reference computes order-2 deltas with window=3 via per-utterance Python
loops (reference: model/iv_plda.py:248-293).  Here the delta scales are
computed once on the host (tiny), and the feature gather is a single batched
clamped-index take — differentiable and fully vectorized over (B, T, F).

Output: concat([feat, delta1, delta2], axis=-1)  => F -> F*(order+1).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def delta_scales(window: int = 3, order: int = 2) -> list[np.ndarray]:
    """Kaldi DeltaFeatures scales: scales[0]=[1]; scales[i] = conv of
    scales[i-1] with the length-(2*window+1) regression kernel
    [-w..w]/sum(j^2)."""
    scales = [np.array([1.0], dtype=np.float64)]
    for _ in range(1, order + 1):
        prev = scales[-1]
        prev_offset = (len(prev) - 1) // 2
        cur_offset = prev_offset + window
        cur = np.zeros(len(prev) + 2 * window, dtype=np.float64)
        normalizer = 0.0
        for j in range(-window, window + 1):
            normalizer += j * j
            for k in range(-prev_offset, prev_offset + 1):
                cur[j + k + cur_offset] += j * prev[k + prev_offset]
        scales.append(cur / normalizer)
    return [s.astype(np.float32) for s in scales]


@functools.partial(jax.jit, static_argnames=("window", "order"))
def add_delta(feat: jnp.ndarray, window: int = 3, order: int = 2) -> jnp.ndarray:
    """feat: (B, T, F) -> (B, T, F*(order+1)).  Edges replicate (index clamp),
    matching the reference's torch.clamp offset gather.

    Implemented as edge-padded static shifts + weighted sum: identical math
    to the clamped gather, but the backward is pad/slice instead of a
    scatter-add (slow on TPU)."""
    b, t, f = feat.shape
    scales = delta_scales(window, order)
    outs = []
    for s in scales:
        max_offset = (len(s) - 1) // 2
        if max_offset == 0:
            outs.append(feat * float(s[0]))
            continue
        fp = jnp.pad(feat, ((0, 0), (max_offset, max_offset), (0, 0)),
                     mode="edge")
        acc = None
        for k, w in enumerate(s):
            if w == 0.0:
                continue
            term = float(w) * jax.lax.dynamic_slice_in_dim(fp, k, t, axis=1)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)
