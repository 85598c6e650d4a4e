"""Batched Lloyd k-means for the FeCo defense, fully on device.

Replaces the reference's libKMCUDA / kmeans_pytorch dependency (reference
defense/feature_level.py:168-217, native dep N3) with a jitted fixed-
iteration Lloyd loop: assignment is an argmin over a (T, K) distance matrix
(one MXU matmul), the center update is a one-hot segment-mean.  The
"differentiable compression" trick of the reference — recompute cluster
means from the live features with assignments treated as constants — is the
stop_gradient on the assignment one-hot.

Also provides warped k-means (contiguous segments, TS/random boundary init).
The boundary optimization is inherently sequential, so (like the reference,
which runs it on host python) it runs as a host callback; the segment-mean
recompute stays in-graph for gradients.
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


def _distances(feat, centers, distance: str):
    if distance == "cos":
        f = feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True),
                               1e-12)
        c = centers / jnp.maximum(
            jnp.linalg.norm(centers, axis=-1, keepdims=True), 1e-12)
        return 1.0 - f @ c.T
    # squared L2 via the expanded form (one matmul)
    f2 = jnp.sum(feat * feat, axis=-1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=-1)[None, :]
    return f2 + c2 - 2.0 * (feat @ centers.T)


def _segment_means(feat, one_hot, fallback):
    """one_hot: (T, K); empty clusters take `fallback` rows."""
    counts = jnp.sum(one_hot, axis=0)                      # (K,)
    sums = one_hot.T @ feat                                # (K, F)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where((counts > 0)[:, None], means, fallback)


@functools.partial(jax.jit, static_argnames=("k", "n_iters", "distance"))
def kmeans_compress(feat: jnp.ndarray, k: int, key: jax.Array,
                    n_iters: int = 20, distance: str = "L2") -> jnp.ndarray:
    """feat: (T, F) -> (K, F) cluster means, differentiable w.r.t. feat.

    Matches reference defense/feature_level.py:168-217: k-means clustering,
    then in-graph mean recompute; empty cluster i falls back to feat[i]
    ("force" path, feature_level.py:210-211).
    """
    t, f = feat.shape
    assert 0 < k <= t
    feat_sg = jax.lax.stop_gradient(feat)
    init_idx = jax.random.permutation(key, t)[:k]
    centers0 = feat_sg[init_idx]

    def body(_, centers):
        d = _distances(feat_sg, centers, distance)
        assign = jnp.argmin(d, axis=-1)
        oh = jax.nn.one_hot(assign, k, dtype=feat.dtype)
        return _segment_means(feat_sg, oh, centers)

    centers = jax.lax.fori_loop(0, n_iters, body, centers0)

    # differentiable recompute from the live features
    d = _distances(feat_sg, centers, distance)
    oh = jax.lax.stop_gradient(
        jax.nn.one_hot(jnp.argmin(d, axis=-1), k, dtype=feat.dtype))
    return _segment_means(feat, oh, feat[:k])


def kmeans_compress_batch(feat: jnp.ndarray, ratio: float, key: jax.Array,
                          n_iters: int = 20, distance: str = "L2"
                          ) -> jnp.ndarray:
    """feat: (B, T, F) -> (B, K, F) with K = int(T * ratio)."""
    b, t, f = feat.shape
    k = max(int(t * ratio), 1)
    keys = jax.random.split(key, b)
    fn = functools.partial(kmeans_compress, k=k, n_iters=n_iters,
                           distance=distance)
    return jax.vmap(lambda ft, kk: fn(ft, key=kk))(feat, keys)


# ---------------------------------------------------------------------------
# warped k-means (contiguous time segments)
# ---------------------------------------------------------------------------

def _ts_boundaries(feat: np.ndarray, k: int) -> np.ndarray:
    """Trajectory-split init: boundaries at equal cumulative path length
    (reference feature_level.py:53-77)."""
    n = len(feat)
    dist = np.zeros(n)
    for i in range(1, n):
        dist[i] = dist[i - 1] + np.linalg.norm(feat[i] - feat[i - 1])
    seg = dist[n - 1] / k
    boundary = [0]
    idx = 0
    for j in range(1, k):
        req = seg * j
        while idx < n and (req > dist[idx] or idx in boundary):
            idx += 1
        boundary.append(idx)
    boundary = np.array(boundary, dtype=np.int64)
    surpass = np.where(boundary == n)[0]
    if len(surpass):
        for i, bi in enumerate(surpass):
            boundary[bi] = n - len(surpass) + i
        for i in range(surpass[0] - 1, 1, -1):
            if boundary[i] >= boundary[i + 1]:
                boundary[i] = boundary[i + 1] - 1
            else:
                break
    return boundary


def _wk_boundaries_host(feat: np.ndarray, k: int, delta: float,
                        init: str, seed: int) -> np.ndarray:
    """Sequential warped-kmeans boundary optimization (host; the reference
    runs the same loop in Python, feature_level.py:114-154)."""
    n, _ = feat.shape
    if init == "ts":
        boundary = _ts_boundaries(feat, k)
    else:
        rs = np.random.RandomState(seed)
        boundary = np.concatenate(
            [[0], np.sort(rs.choice(np.arange(1, n), size=k - 1,
                                    replace=False))]).astype(np.int64)
    bp = np.concatenate([boundary, [n]])
    counts = (bp[1:] - bp[:-1]).astype(np.int64)
    means = np.stack([feat[bp[i]:bp[i + 1]].mean(0) for i in range(k)])

    def delta_sqe(x, mj, ml, cj, cl):
        return (((x - ml) ** 2).sum() * cl / (cl + 1)
                - ((x - mj) ** 2).sum() * cj / (cj - 1))

    cont = True
    while cont:
        cont = False
        for i in range(k):
            if i > 0:
                begin = boundary[i]
                end = begin + math.floor(counts[i] / 2 * (1 - delta))
                for j in range(begin, end):
                    d = delta_sqe(feat[j], means[i], means[i - 1],
                                  counts[i], counts[i - 1])
                    if counts[i] > 1 and d < 0:
                        cont = True
                        boundary[i] += 1
                        counts[i] -= 1
                        counts[i - 1] += 1
                        means[i] -= (feat[j] - means[i]) / counts[i]
                        means[i - 1] += (feat[j] - means[i - 1]) / counts[i - 1]
                    else:
                        break
            if i < k - 1:
                end = boundary[i + 1] - 1
                begin = end - math.floor(counts[i] / 2 * (1 - delta))
                for j in range(end, begin, -1):
                    d = delta_sqe(feat[j], means[i], means[i + 1],
                                  counts[i], counts[i + 1])
                    if counts[i] > 1 and d < 0:
                        cont = True
                        boundary[i + 1] -= 1
                        counts[i] -= 1
                        counts[i + 1] += 1
                        means[i] -= (feat[j] - means[i]) / counts[i]
                        means[i + 1] += (feat[j] - means[i + 1]) / counts[i + 1]
                    else:
                        break
    return boundary


def warped_kmeans_compress(feat: jnp.ndarray, ratio: float,
                           init: str = "random", delta: float = 0.0,
                           seed: int = 0) -> jnp.ndarray:
    """feat: (B, T, F) -> (B, K, F); differentiable segment means with
    host-computed segment boundaries."""
    b, t, f = feat.shape
    k = max(int(t * ratio), 1)

    def host_fn(x):
        return np.stack([_wk_boundaries_host(np.asarray(xi, np.float64), k,
                                             delta, init, seed)
                         for xi in x]).astype(np.int32)

    boundaries = jax.pure_callback(
        host_fn, jax.ShapeDtypeStruct((b, k), jnp.int32),
        jax.lax.stop_gradient(feat), vmap_method="sequential")

    # differentiable segment means: frame t belongs to segment
    # sum(boundary <= t) - 1
    frame_idx = jnp.arange(t)[None, :, None]
    seg_of_frame = jnp.sum(boundaries[:, None, :] <= frame_idx,
                           axis=-1) - 1                         # (B, T)
    oh = jax.nn.one_hot(seg_of_frame, k, dtype=feat.dtype)      # (B, T, K)
    counts = jnp.sum(oh, axis=1)                                # (B, K)
    sums = jnp.einsum("btk,btf->bkf", oh, feat)
    return sums / jnp.maximum(counts, 1.0)[..., None]
