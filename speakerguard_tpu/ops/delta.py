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
    matching the reference's torch.clamp offset gather."""
    b, t, f = feat.shape
    scales = delta_scales(window, order)
    outs = []
    base = np.arange(t)
    for s in scales:
        max_offset = (len(s) - 1) // 2
        offs = np.arange(-max_offset, max_offset + 1)
        idx = np.clip(base[:, None] + offs[None, :], 0, t - 1)  # (T, K)
        gathered = jnp.take(feat, jnp.asarray(idx), axis=1)  # (B, T, K, F)
        outs.append(jnp.einsum("btkf,k->btf", gathered, jnp.asarray(s)))
    return jnp.concatenate(outs, axis=-1)
