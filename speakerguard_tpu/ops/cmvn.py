"""Sliding-window cepstral mean normalization (CMN), batched + vectorized.

The reference walks frames one-by-one in Python maintaining a running sum
(reference: model/iv_plda.py:296-377) — O(T) host loop per utterance.  The
window boundaries depend only on (t, num_frames) which are static under jit,
so here the whole thing collapses to a prefix-sum and two static gathers:

    mean_t = (cumsum[end_t] - cumsum[start_t]) / (end_t - start_t)

which XLA turns into one cumsum + vectorized arithmetic — differentiable and
O(T*F) with no sequential dependency.

Parameters pinned to the reference: center=True, cmn_window=300,
normalize_variance=False.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def window_bounds(t: int, cmn_window: int = 300, center: bool = True):
    """Static per-frame [start, end) window bounds (Kaldi sliding CMN)."""
    starts = np.empty(t, dtype=np.int64)
    ends = np.empty(t, dtype=np.int64)
    for i in range(t):
        if center:
            ws = i - cmn_window // 2
            we = ws + cmn_window
        else:
            ws, we = 0, i + 1
        if ws < 0:
            we -= ws
            ws = 0
        if we > t:
            ws -= (we - t)
            we = t
            if ws < 0:
                ws = 0
        starts[i], ends[i] = ws, we
    return starts, ends


@functools.partial(jax.jit, static_argnames=("cmn_window", "center"))
def sliding_cmvn(feat: jnp.ndarray, cmn_window: int = 300,
                 center: bool = True) -> jnp.ndarray:
    """feat: (B, T, F) -> mean-normalized (B, T, F)."""
    b, t, f = feat.shape
    starts, ends = window_bounds(t, cmn_window, center)
    if (starts == 0).all() and (ends == t).all():
        # every window covers the whole utterance (t <= cmn_window with
        # center=True): global mean subtract, no cumsum/gather needed
        return feat - jnp.mean(feat, axis=1, keepdims=True)
    csum = jnp.cumsum(feat, axis=1)
    csum = jnp.concatenate([jnp.zeros((b, 1, f), feat.dtype), csum], axis=1)
    win_sum = (jnp.take(csum, jnp.asarray(ends), axis=1)
               - jnp.take(csum, jnp.asarray(starts), axis=1))
    counts = jnp.asarray((ends - starts).astype(np.float32))[None, :, None]
    return feat - win_sum / counts
