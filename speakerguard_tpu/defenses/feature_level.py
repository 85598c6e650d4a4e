"""FeCo — feature-level compression defense (the reference authors' own).

Re-design of reference defense/feature_level.py: k-means compression of the
acoustic-feature frames to a `param` ratio of the original count.  The
libKMCUDA / kmeans_pytorch backends (native dep N3/N7) are replaced by a
jitted on-device Lloyd loop (ops/kmeans.py); differentiability comes from
the in-graph segment-mean recompute, exactly mirroring the reference's trick
(feature_level.py:202-217).
"""

import jax

from speakerguard_tpu.ops.kmeans import (
    kmeans_compress_batch, warped_kmeans_compress)


def FEATURE_COMPRESSION(feat, method: str = "kmeans", param: float = 0.5,
                        other_param: str = "L2", rng=None):
    """feat: (B, T, F) -> (B, int(T*param), F)."""
    if method == "kmeans":
        assert other_param in ("L2", "cos")
        key = rng if rng is not None else jax.random.PRNGKey(0)
        return kmeans_compress_batch(feat, param, key,
                                     distance=other_param)
    if method == "warped_kmeans":
        assert other_param in ("ts", "random")
        seed = 0
        if rng is not None:
            seed = int(jax.random.randint(rng, (), 0, 2 ** 31 - 1))
        return warped_kmeans_compress(feat, param, init=other_param,
                                      seed=seed)
    raise NotImplementedError(
        "FEATURE_COMPRESSION supports kmeans and warped_kmeans")


def FeCo(feat, method: str = "kmeans", param: float = 0.5,
         other_param: str = "L2", rng=None):
    return FEATURE_COMPRESSION(feat, method, param, other_param, rng=rng)
