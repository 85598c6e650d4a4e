"""Batched block-substitution triangular solves (vector RHS), pure XLA.

XLA's `triangular_solve` on a (B, N, N) factor with an (N, 1) RHS is
latency-bound on TPU: the blocked TRSM degenerates for a 1-wide RHS and
the two substitutions of an SPD Cholesky solve measured ~7.3 ms at bench
shapes (B=128, N=600) — pure sequential-step latency, near-zero FLOPs.

This module does classic block substitution instead:

  1. invert the K = ceil(N/m) diagonal (m, m) blocks in ONE fat batched
     `triangular_solve` call against identity ((B*K, m, m) with an m-wide
     RHS — matmul-rich, no degenerate widths);
  2. run K unrolled substitution steps, each a batched (m, m) matvec per
     trailing block — all MXU work, K≈6 sequential steps instead of
     XLA's hundreds.

Measured (in-scan, v5e, B=128, N=600, m=100): the two solves of a
Cholesky apply drop 7.3 -> 1.3 ms; max rel err vs the XLA solves ~3e-7
(block inversion of the WELL-CONDITIONED diagonal blocks of a Cholesky
factor is backward-stable in practice; the i-vector system L = I + PSD
keeps the factor diagonal-heavy).

Replaces nothing in the reference (torch.solve on CPU,
ivector_extract.py:98-114); this is a TPU-latency artifact fix.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _pad_factor(r, n, m):
    """Pad (B, N, N) to (B, K*m, K*m) extending the diagonal with I so
    padded blocks are invertible and inert."""
    k = (n + m - 1) // m
    npad = k * m
    if npad > n:
        pad = npad - n
        r = jnp.pad(r, ((0, 0), (0, pad), (0, pad)))
        r = r.at[:, n:, n:].set(jnp.eye(pad, dtype=r.dtype))
    return r, k, npad


def _diag_block_inverses(r, k, m, lower):
    """(B, K*m, K*m) triangular -> (B, K, m, m) inverted diagonal blocks
    via one batched matrix-RHS triangular_solve."""
    b = r.shape[0]
    blocks = jnp.stack(
        [r[:, i * m:(i + 1) * m, i * m:(i + 1) * m] for i in range(k)], 1)
    flat = blocks.reshape(b * k, m, m)
    inv = jax.lax.linalg.triangular_solve(
        flat, jnp.broadcast_to(jnp.eye(m, dtype=r.dtype), (b * k, m, m)),
        left_side=True, lower=lower)
    return inv.reshape(b, k, m, m)


def triangular_solve_vec(r, v, lower, transpose_a=False, m=100,
                         dinv_t=None):
    """Solve op(R) x = v for batched triangular R.

    r: (B, N, N) triangular (upper if not `lower`); v: (B, N).
    op(R) = R^T when transpose_a.  Equivalent to
    jax.lax.linalg.triangular_solve(..., v[..., None], left_side=True)
    but block-substitution-structured for TPU (see module docstring).

    dinv_t: optional (B, K, m, m) PRE-INVERTED diagonal blocks, stored
    TRANSPOSED (dinv_t[:, i] = inv(D_i)^T) — as emitted by
    ops/pallas_chol.cholesky_rt_dinv with m=128.  When given, step 1
    (the one remaining XLA triangular_solve) is skipped entirely and the
    whole solve is batched matmuls.
    """
    n = r.shape[-1]
    if dinv_t is None and n <= m:
        out = jax.lax.linalg.triangular_solve(
            r, v[..., None], left_side=True, lower=lower,
            transpose_a=transpose_a)
        return out[..., 0]

    rp, k, npad = _pad_factor(r, n, m)
    if dinv_t is not None:
        assert dinv_t.shape == (r.shape[0], k, m, m)
        # stored transposed: swap the einsum orientations in diag_apply
        dinv = jnp.swapaxes(dinv_t, 2, 3)
    else:
        dinv = _diag_block_inverses(rp, k, m, lower)
    v = jnp.pad(v, ((0, 0), (0, npad - n)))

    # effective orientation of op(R): lower-triangular ops substitute
    # forward (i ascending), upper-triangular ops substitute backward
    eff_lower = lower != transpose_a

    def coupling(i, j, xj):
        """op(R)[i, j] @ xj as an einsum on the stored factor."""
        if transpose_a:
            blk = rp[:, j * m:(j + 1) * m, i * m:(i + 1) * m]
            return jnp.einsum("bji,bj->bi", blk, xj, precision=_HI)
        blk = rp[:, i * m:(i + 1) * m, j * m:(j + 1) * m]
        return jnp.einsum("bij,bj->bi", blk, xj, precision=_HI)

    def diag_apply(i, rhs):
        """dinv holds inv(D_i) of the STORED factor; apply op(inv(D_i))."""
        if transpose_a:
            return jnp.einsum("bji,bj->bi", dinv[:, i], rhs, precision=_HI)
        return jnp.einsum("bij,bj->bi", dinv[:, i], rhs, precision=_HI)

    xs = [None] * k
    order = range(k) if eff_lower else reversed(range(k))
    for i in order:
        rhs = v[:, i * m:(i + 1) * m]
        done = range(i) if eff_lower else range(i + 1, k)
        for j in done:
            rhs = rhs - coupling(i, j, xs[j])
        xs[i] = diag_apply(i, rhs)
    return jnp.concatenate(xs, axis=1)[:, :n]
