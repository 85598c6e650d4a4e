"""Pallas TPU kernel: fused GMM component log-likelihood.

Computes loglike[t, c] = gconsts[c] + aug(x_t) . quad_proj[:, c] where
aug(x) = [x, packed upper-triangular x x^T] (see models/gmm.py), WITHOUT
materializing the (T, D + D(D+1)/2) augmented features in HBM: each T-tile
builds its augmentation once in VMEM scratch and sweeps the C tiles of the
projection matrix on the MXU.

The jnp fallback (gmm.component_loglike) materializes the augmented tensor;
for attack loops over long utterances this kernel removes that HBM
round-trip.  Use `fused_loglike(..., interpret=True)` on CPU for tests.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _make_kernel(t_tile, c_tile, d, f_aug, n_c_tiles):

    def kernel(x_ref, proj_ref, gconsts_ref, out_ref, aug_scratch):
        # x_ref:      (t_tile, d_pad)      feats tile (VMEM)
        # proj_ref:   (f_aug_pad, c_tile)  projection tile (VMEM, grid dim 1)
        # gconsts_ref:(1, c_tile)
        # out_ref:    (t_tile, c_tile)
        # aug_scratch:(t_tile, f_aug_pad)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _build_augmented():
            x = x_ref[:, :d]
            # packed upper-triangular outer product via static slices,
            # row-major (r, r..d-1) — matches np.triu_indices ordering
            pieces = [x]
            for r in range(d):
                pieces.append(x[:, r:r + 1] * x[:, r:])
            aug = jnp.concatenate(pieces, axis=-1)
            pad = aug_scratch.shape[1] - f_aug
            if pad:
                aug = jnp.pad(aug, ((0, 0), (0, pad)))
            aug_scratch[:, :] = aug

        out_ref[:, :] = (
            jnp.dot(aug_scratch[:, :], proj_ref[:, :],
                    preferred_element_type=jnp.float32)
            + gconsts_ref[0, :])

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("t_tile", "c_tile", "interpret"))
def fused_loglike(feats: jnp.ndarray, quad_proj: jnp.ndarray,
                  gconsts: jnp.ndarray, t_tile: int = 128,
                  c_tile: int = 256, interpret: bool = False) -> jnp.ndarray:
    """feats: (T, D); quad_proj: (D + D(D+1)/2, C); gconsts: (C,).
    Returns (T, C) component log-likelihoods."""
    t, d = feats.shape
    f_aug, c = quad_proj.shape
    assert f_aug == d + d * (d + 1) // 2

    t_pad = _round_up(t, t_tile)
    c_pad = _round_up(c, c_tile)
    d_pad = _round_up(d, 128)
    f_aug_pad = _round_up(f_aug, 128)

    feats_p = jnp.pad(feats, ((0, t_pad - t), (0, d_pad - d)))
    proj_p = jnp.pad(quad_proj, ((0, f_aug_pad - f_aug), (0, c_pad - c)))
    gconsts_p = jnp.pad(gconsts, (0, c_pad - c))[None, :]

    n_t, n_c = t_pad // t_tile, c_pad // c_tile
    kernel = _make_kernel(t_tile, c_tile, d, f_aug, n_c)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, c_pad), jnp.float32),
        grid=(n_t, n_c),
        in_specs=[
            pl.BlockSpec((t_tile, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_aug_pad, c_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_tile, c_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t_tile, f_aug_pad), jnp.float32)],
        interpret=interpret,
    )(feats_p, proj_p, gconsts_p)
    return out[:t, :c]


def fused_loglike_batch(feats: jnp.ndarray, quad_proj: jnp.ndarray,
                        gconsts: jnp.ndarray, **kw) -> jnp.ndarray:
    """feats: (B, T, D) -> (B, T, C)."""
    return jax.vmap(lambda f: fused_loglike(f, quad_proj, gconsts, **kw)
                    )(feats)
