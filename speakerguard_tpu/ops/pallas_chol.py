"""Pallas TPU kernel: batched Cholesky factorization.

XLA's cholesky on (B, 600, 600) lowers to a ~600-iteration While loop whose
per-step work is tiny relative to its launch + HBM round-trip cost —
measured ~23 ms on a v5e for B=128 (0.4% MXU util).  This kernel keeps each
batch-tile fully VMEM-resident, so the unavoidable ~N sequential factor
steps cost VPU-only microseconds, and the O(N^3) trailing updates run as
in-kernel MXU dots.

Layout trick: we compute the UPPER factor R = L^T with R^T R = A, working
row-wise.  Because A is symmetric, "column j of L" IS "row j of A" — the
kernel never transposes anything, and every sequential step is a
sublane-indexed row operation (dynamic lane indexing is the slow path on
TPU; dynamic sublane indexing is cheap).

Algorithm (right-looking, panel width NB, all in VMEM):

    for each panel p (rows s..s+NB):                    # static unroll
      for j in 0..NB:                                   # fori_loop
        row  = M[s+j, :] masked to lanes >= s+j
        row /= sqrt(row[s+j])
        M[s+j, :] = row
        M[s+j+1 : s+NB, :] -= outer(row[s : s+NB][j+1:], row)
      M[s+NB:, s+NB:] -= R12^T R12                      # MXU dot per batch

Strictly-lower garbage written by the rank-1 updates is never read (reads
mask lanes >= the current global row) and is zeroed by one masked pass at
the end.

Used by ivector.spd_solve (the i-vector posterior-precision solve,
reference ivector_extract.py:98-114).  `interpret=True` for CPU tests.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _make_kernel(b_tile, n_pad, nb):
    n_panels = n_pad // nb

    def kernel(a_ref, out_ref):
        out_ref[:] = a_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)  # (1, N)

        for p in range(n_panels):            # static
            s = p * nb

            def step(j, pan):
                # pan: (b_tile, nb, n_pad) — rows s..s+nb of M
                rowj = jax.lax.dynamic_slice_in_dim(pan, j, 1, axis=1)
                rowj = jnp.where(lane[None] >= s + j, rowj, 0.0)
                diag = jax.lax.dynamic_slice_in_dim(
                    rowj[:, 0, :], s + j, 1, axis=1)       # (b_tile, 1)
                rowj = rowj * jax.lax.rsqrt(diag)[:, None, :]
                pan = jax.lax.dynamic_update_slice_in_dim(pan, rowj, j,
                                                          axis=1)
                # rank-1 update of panel rows > j (garbage below the
                # diagonal is masked on read and zeroed at the end)
                coef = rowj[:, 0, s:s + nb]                 # (b_tile, nb)
                sub = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
                coef = jnp.where(sub[None, :, 0] > j, coef, 0.0)
                return pan - coef[:, :, None] * rowj
            pan = jax.lax.fori_loop(0, nb, step, out_ref[:, s:s + nb, :])
            out_ref[:, s:s + nb, :] = pan

            if s + nb < n_pad:
                # trailing update M[s+nb:, s+nb:] -= R12^T R12 (MXU)
                r12 = pan[:, :, s + nb:]                   # (b_tile, nb, m)
                for b in range(b_tile):                    # static
                    g = jax.lax.dot_general(
                        r12[b], r12[b], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    out_ref[b, s + nb:, s + nb:] = (
                        out_ref[b, s + nb:, s + nb:] - g)

        # zero the strictly-lower garbage: keep lanes >= row index
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        keep = (col_ids >= row_ids)[None]
        out_ref[:] = jnp.where(keep, out_ref[:], 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "b_tile", "interpret"))
def cholesky_rt(a: jnp.ndarray, nb: int = 32, b_tile: int = 8,
                interpret: bool = False) -> jnp.ndarray:
    """Batched Cholesky, returning the UPPER factor R with R^T R = a.

    a: (B, N, N) SPD (symmetric, only the upper triangle + diagonal are
    read).  R equals jnp.linalg.cholesky(a).mT exactly (up to f32 rounding).
    """
    b, n, n2 = a.shape
    assert n == n2
    n_pad = _round_up(n, max(nb, 128))
    b_pad = _round_up(b, b_tile)
    if n_pad != n:
        a = jnp.pad(a, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        # identity on the pad diagonal keeps the matrix SPD
        pad_diag = (jnp.arange(n_pad) >= n).astype(a.dtype)
        a = a + jnp.diag(pad_diag)[None]
    if b_pad != b:
        eye = jnp.broadcast_to(jnp.eye(n_pad, dtype=a.dtype),
                               (b_pad - b, n_pad, n_pad))
        a = jnp.concatenate([a, eye], axis=0)

    kernel = _make_kernel(b_tile, n_pad, nb)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), jnp.float32),
        grid=(b_pad // b_tile,),
        in_specs=[pl.BlockSpec((b_tile, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b_tile, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a)
    return out[:b, :n, :n]
