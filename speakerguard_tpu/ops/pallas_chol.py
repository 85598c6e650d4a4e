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

Algorithm (two-level right-looking, all in VMEM):

    for each OUTER block (OB=128 rows):                 # static unroll
      for each inner panel (NB=8 rows):                 # static unroll
        for j in 0..NB:                                 # fori_loop
          row  = M[s+j, :] masked to lanes >= s+j; row /= sqrt(row[s+j])
          panel rows r > j:  -= row[s+r] * row          # fused rank-1
        rows (s+NB .. outer end) -= panel^T panel       # batched MXU dot
      rows below the outer block -= R_blk^T R_blk       # rank-OB MXU dot

The inner one-hot row extraction reduces over only NB=8 sublanes;
coefficient columns are reached by transposing the (b, 8, w) panel (lane
slices must be 128-aligned on TPU, sublane slices only 8-aligned).
Strictly-lower garbage written by the full-width rank-1 updates is never
read (reads mask lanes >= the current global row) and is zeroed per panel.

Measured (B=128, N=600, v5e): ~12 ms vs ~23 ms for XLA's cholesky; the
end-to-end PGD-100 iv-PLDA bench gains ~25% from this kernel alone.

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


def _make_kernel(b_tile, n_pad, nb, ob, upd_dtype=jnp.float32):
    n_outer = n_pad // ob

    def kernel(a_ref, m_ref):
        # f32 input is aliased to output (input_output_aliases) so both
        # refs address ONE VMEM buffer — separate in+out copies blow the
        # scoped-vmem budget; the copy below is then a no-op (and keeps
        # interpret mode, which may not alias, correct).  A bfloat16
        # input (SG_IVEC_L_BF16 attack path) cannot alias the f32 output:
        # it arrives as its own half-size block — HBM reads half, and the
        # standalone XLA convert fusion that used to materialize the f32
        # (B, 640, 640) input disappears — and the up-convert happens here
        # in VMEM.
        m_ref[:] = a_ref[:].astype(jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0]  # (nb,)
        hi = jax.lax.Precision.HIGHEST

        def bdot(x, y):
            # (b, m, k) x (b, k, n) -> (b, m, n), batched matmul on the MXU.
            # upd_dtype=bfloat16 (SG_CHOL_BF16=1, attack-gradient paths
            # only) runs the O(N^3) trailing updates single-pass instead of
            # the ~6 bf16 passes a HIGHEST f32 dot costs — the sequential
            # panel sweeps stay f32 on the VPU, so the factor's diagonal
            # pivots keep f32 conditioning (measured factor rel err ~1e-3
            # vs 6.5e-7; fine for sign()-consumed gradients, NOT for the
            # exact scoring path).
            return jax.lax.dot_general(
                x.astype(upd_dtype), y.astype(upd_dtype),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=None if upd_dtype == jnp.bfloat16 else hi)

        for o in range(n_outer):             # static
            os_ = o * ob
            # lane window: columns < the outer-block start are final
            w = n_pad - os_
            lane = os_ + jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

            for ip in range(ob // nb):       # static
                s = os_ + ip * nb

                def step(j, pan):
                    # pan: (b_tile, nb, w) — nb=8 rows, so the one-hot row
                    # extraction reduces over just 8 sublanes.  The rank-1
                    # update and row-j normalization are one fused
                    # expression: pan -= c (x) rowj with c[r>j] = rowj[r],
                    # c[j] = sqrt(d)-1, c[r<j] = 0 (masked lanes).
                    onehot = (sub == j).astype(jnp.float32)
                    rowj = jnp.sum(pan * onehot[None, :, None], axis=1)
                    rowj = jnp.where(lane >= s + j, rowj, 0.0)
                    diag = jnp.sum(
                        jnp.where(lane == s + j, rowj, 0.0), axis=-1,
                        keepdims=True)
                    rsq = jax.lax.rsqrt(diag)
                    rowj = rowj * rsq
                    coef = rowj[:, s - os_:s - os_ + nb]
                    c = (jnp.where(sub[None, :] > j, coef, 0.0)
                         + onehot[None, :] * (diag * rsq - 1.0))
                    return pan - c[:, :, None] * rowj[:, None, :]
                pan = jax.lax.fori_loop(0, nb, step, m_ref[:, s:s + nb, os_:])
                # zero this panel's strictly-lower garbage
                tri = lane >= (s + sub)[:, None]
                pan = jnp.where(tri[None], pan, 0.0)
                m_ref[:, s:s + nb, os_:] = pan
                if os_ > 0:
                    m_ref[:, s:s + nb, :os_] = jnp.zeros(
                        (b_tile, nb, os_), jnp.float32)

                re = os_ + ob
                if s + nb < re:
                    # inner trailing update: remaining rows of THIS outer
                    # block only.  Coefficients are panel columns -> get
                    # them sublane-indexed via a small transpose (lane
                    # slices must be 128-aligned; sublane slices only 8)
                    pan_t = jnp.swapaxes(pan, 1, 2)          # (b, w, nb)
                    coef_t = pan_t[:, s + nb - os_:re - os_, :]
                    upd = bdot(coef_t, pan)                  # (b, rows, w)
                    blk = m_ref[:, s + nb:re, os_:]
                    m_ref[:, s + nb:re, os_:] = blk - upd

            if os_ + ob < n_pad:
                # outer trailing update: rank-ob SYRK onto all rows below
                # this block, chunked by 128 rows so the (b, rows, m)
                # temporaries stay well inside VMEM
                rblk = m_ref[:, os_:os_ + ob, os_ + ob:]     # (b, ob, m)
                for rs in range(os_ + ob, n_pad, 128):
                    coef_t = jnp.swapaxes(
                        m_ref[:, os_:os_ + ob, rs:rs + 128], 1, 2)
                    upd = bdot(coef_t, rblk)                 # (b, 128, m)
                    blk = m_ref[:, rs:rs + 128, os_ + ob:]
                    m_ref[:, rs:rs + 128, os_ + ob:] = blk - upd

    return kernel


def _make_kernel_dinv(b_tile, n_pad, nb, ob, upd_dtype=jnp.float32):
    """Like _make_kernel, but ALSO emits the inverse-transpose of every
    128x128 diagonal block of the factor as a byproduct of the sweep.

    A shared 128-lane identity block is appended past lane n_pad; it rides
    every WITHIN-outer-block row operation (the sequential rank-1 steps
    and the inner panel trailing updates) but is EXCLUDED from the
    cross-block outer trailing updates.  The within-block ops compose to
    the transform T_o with T_o A'_oo = R_oo (A'_oo = the block after
    cross-block elimination), i.e. T_o = R_oo^{-T}; applied to I they
    leave exactly that matrix in the aug lanes of block o's rows.  One
    shared 128-lane block suffices because different outer blocks' row
    ops never mix rows across blocks.

    With the block inverses in hand, BOTH triangular substitutions of the
    SPD solve become pure batched matmuls (ops/trsv.py dinv_t= path) —
    the XLA triangular_solve that inverted the diagonal blocks per
    iteration (latency-bound custom-call, measured 6.9 ms/iter at
    (512, 640, 640) bench shapes) disappears from the hot path.
    Requires ob == 128 (one aug block per outer block)."""
    assert ob == 128
    n_outer = n_pad // ob
    w_aug = n_pad + 128

    def kernel(a_ref, m_ref):
        # input may be bf16 (half-width block, no aliasing) or f32 padded
        # to the full aug width and aliased (the slice copy is then a
        # no-op); the aug lanes are (re)initialized to the per-row local
        # identity e_{row mod 128} either way.
        m_ref[:, :, :n_pad] = a_ref[:, :, :n_pad].astype(jnp.float32)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 128), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 128), 1)
        ident = (coli == rowi % 128).astype(jnp.float32)
        m_ref[:, :, n_pad:] = jnp.broadcast_to(ident[None],
                                               (b_tile, n_pad, 128))
        sub = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0]  # (nb,)
        hi = jax.lax.Precision.HIGHEST

        def bdot(x, y):
            return jax.lax.dot_general(
                x.astype(upd_dtype), y.astype(upd_dtype),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=None if upd_dtype == jnp.bfloat16 else hi)

        for o in range(n_outer):             # static
            os_ = o * ob
            w = w_aug - os_                  # panel width INCLUDING aug
            lane = os_ + jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

            for ip in range(ob // nb):       # static
                s = os_ + ip * nb

                def step(j, pan):
                    onehot = (sub == j).astype(jnp.float32)
                    rowj = jnp.sum(pan * onehot[None, :, None], axis=1)
                    keep = jnp.logical_or(lane >= s + j, lane >= n_pad)
                    rowj = jnp.where(keep, rowj, 0.0)
                    diag = jnp.sum(
                        jnp.where(lane == s + j, rowj, 0.0), axis=-1,
                        keepdims=True)
                    rsq = jax.lax.rsqrt(diag)
                    rowj = rowj * rsq
                    coef = rowj[:, s - os_:s - os_ + nb]
                    c = (jnp.where(sub[None, :] > j, coef, 0.0)
                         + onehot[None, :] * (diag * rsq - 1.0))
                    return pan - c[:, :, None] * rowj[:, None, :]
                pan = jax.lax.fori_loop(0, nb, step, m_ref[:, s:s + nb, os_:])
                tri = jnp.logical_or(lane >= (s + sub)[:, None],
                                     lane >= n_pad)
                pan = jnp.where(tri[None], pan, 0.0)
                m_ref[:, s:s + nb, os_:] = pan
                if os_ > 0:
                    m_ref[:, s:s + nb, :os_] = jnp.zeros(
                        (b_tile, nb, os_), jnp.float32)

                re = os_ + ob
                if s + nb < re:
                    # inner trailing update: WITHIN-block row ops, so the
                    # aug lanes ride along (pan spans them)
                    pan_t = jnp.swapaxes(pan, 1, 2)          # (b, w, nb)
                    coef_t = pan_t[:, s + nb - os_:re - os_, :]
                    upd = bdot(coef_t, pan)                  # (b, rows, w)
                    blk = m_ref[:, s + nb:re, os_:]
                    m_ref[:, s + nb:re, os_:] = blk - upd

            if os_ + ob < n_pad:
                # outer trailing update: cross-block elimination — the aug
                # lanes are EXCLUDED (slices bounded at n_pad), so each
                # block's aug stays the LOCAL transform R_oo^{-T}
                rblk = m_ref[:, os_:os_ + ob, os_ + ob:n_pad]
                for rs in range(os_ + ob, n_pad, 128):
                    coef_t = jnp.swapaxes(
                        m_ref[:, os_:os_ + ob, rs:rs + 128], 1, 2)
                    upd = bdot(coef_t, rblk)                 # (b, 128, m)
                    blk = m_ref[:, rs:rs + 128, os_ + ob:n_pad]
                    m_ref[:, rs:rs + 128, os_ + ob:n_pad] = blk - upd

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("nb", "ob", "b_tile", "interpret",
                                    "bf16_updates"))
def cholesky_rt_dinv(a: jnp.ndarray, nb: int = 8, ob: int = 128,
                     b_tile: int = 16, interpret: bool = False,
                     bf16_updates: bool = False):
    """Batched Cholesky returning (R, dinv_t): the upper factor R with
    R^T R = a (as cholesky_rt) plus dinv_t (B, K, 128, 128) where
    dinv_t[:, i] = inverse-TRANSPOSE of R's i-th 128x128 diagonal block
    (padded blocks invert to identity) — see _make_kernel_dinv.  With
    these, a triangular solve against R is pure block substitution with
    batched matmuls (ops/trsv.py dinv_t= path): no XLA triangular_solve
    anywhere in the SPD solve."""
    b, n, n2 = a.shape
    assert n == n2 and ob == 128 and ob % nb == 0
    n_pad = _round_up(n, 128)
    b_pad = _round_up(b, b_tile)
    if n_pad != n:
        a = jnp.pad(a, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        pad_diag = (jnp.arange(n_pad) >= n).astype(a.dtype)
        a = a + jnp.diag(pad_diag)[None]
    if b_pad != b:
        eye = jnp.broadcast_to(jnp.eye(n_pad, dtype=a.dtype),
                               (b_pad - b, n_pad, n_pad))
        a = jnp.concatenate([a, eye], axis=0)

    f32_in = a.dtype == jnp.float32
    if f32_in:
        # pad to the aug width so input and output alias one VMEM buffer
        # (the aug junk is overwritten by the kernel's identity init)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 128)))
    kernel = _make_kernel_dinv(b_tile, n_pad, nb, ob,
                               jnp.bfloat16 if bf16_updates
                               else jnp.float32)
    in_w = n_pad + 128 if f32_in else n_pad
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad + 128),
                                       jnp.float32),
        grid=(b_pad // b_tile,),
        in_specs=[pl.BlockSpec((b_tile, n_pad, in_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b_tile, n_pad, n_pad + 128),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0} if f32_in else {},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(a)
    dinv_t = out[:b, :, n_pad:].reshape(b, n_pad // 128, 128, 128)
    return out[:b, :n, :n], dinv_t


def _make_solve_kernel(b_tile, n_pad, nb, ob):
    """Fused SPD solve: phase 1 = the cholesky_rt sweep on the AUGMENTED
    matrix [A | v] (the augmented lane block rides every row operation, so
    after the sweep it holds y = R^{-T} v); phase 2 = blocked Gauss-Jordan
    UPWARD elimination (normalize pivot rows by the diagonal, subtract
    from rows above) which leaves [I | x] with x = A^{-1} v.

    Why: XLA's 1-RHS batched triangular_solve on (128, 600, 600) costs
    ~20 ms per call (sequential While with tiny per-step work) and
    spd_solve needs four of them per attack iteration — measured ~45 ms,
    the single largest cost of the iv-PLDA hot path.  Here both
    substitutions are ~N in-VMEM VPU steps amortized against the same
    MXU trailing updates the factorization already does."""
    n_outer = n_pad // ob
    w_aug = n_pad + 128  # one extra 128-lane block carries v / y / x

    def kernel(a_ref, m_ref):
        m_ref[:] = a_ref[:]
        sub = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0]  # (nb,)
        hi = jax.lax.Precision.HIGHEST

        def bdot(x, y):
            return jax.lax.dot_general(
                x, y, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=hi)

        # ---- phase 1: Cholesky forward sweep over [A | v] ----
        for o in range(n_outer):             # static
            os_ = o * ob
            w = w_aug - os_
            lane = os_ + jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

            for ip in range(ob // nb):       # static
                s = os_ + ip * nb

                def step(j, pan):
                    onehot = (sub == j).astype(jnp.float32)
                    rowj = jnp.sum(pan * onehot[None, :, None], axis=1)
                    # keep lanes >= pivot plus the augmented block
                    keep = jnp.logical_or(lane >= s + j, lane >= n_pad)
                    rowj = jnp.where(keep, rowj, 0.0)
                    diag = jnp.sum(
                        jnp.where(lane == s + j, rowj, 0.0), axis=-1,
                        keepdims=True)
                    rsq = jax.lax.rsqrt(diag)
                    rowj = rowj * rsq
                    coef = rowj[:, s - os_:s - os_ + nb]
                    c = (jnp.where(sub[None, :] > j, coef, 0.0)
                         + onehot[None, :] * (diag * rsq - 1.0))
                    return pan - c[:, :, None] * rowj[:, None, :]
                pan = jax.lax.fori_loop(0, nb, step, m_ref[:, s:s + nb, os_:])
                tri = jnp.logical_or(lane >= (s + sub)[:, None],
                                     lane >= n_pad)
                pan = jnp.where(tri[None], pan, 0.0)
                m_ref[:, s:s + nb, os_:] = pan
                if os_ > 0:
                    m_ref[:, s:s + nb, :os_] = jnp.zeros(
                        (b_tile, nb, os_), jnp.float32)

                re = os_ + ob
                if s + nb < re:
                    pan_t = jnp.swapaxes(pan, 1, 2)          # (b, w, nb)
                    coef_t = pan_t[:, s + nb - os_:re - os_, :]
                    upd = bdot(coef_t, pan)
                    blk = m_ref[:, s + nb:re, os_:]
                    m_ref[:, s + nb:re, os_:] = blk - upd

            if os_ + ob < n_pad:
                rblk = m_ref[:, os_:os_ + ob, os_ + ob:]
                for rs in range(os_ + ob, n_pad, 128):
                    coef_t = jnp.swapaxes(
                        m_ref[:, os_:os_ + ob, rs:rs + 128], 1, 2)
                    upd = bdot(coef_t, rblk)
                    blk = m_ref[:, rs:rs + 128, os_ + ob:]
                    m_ref[:, rs:rs + 128, os_ + ob:] = blk - upd

        # ---- phase 2: back-substitution R x = y on the AUG column only ----
        # The R entries are never modified (a pivot row only touches lanes
        # >= its own index, which later pivots never read as coefficients),
        # so only the (b, nb, 128) aug panels are updated per step — per-
        # step VPU work is tiny and the cross-panel/block updates are MXU
        # dots of R blocks against solved x panels.
        lane_nb = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
        for o in range(n_outer - 1, -1, -1):         # static, bottom-up
            os_ = o * ob
            for ip in range(ob // nb - 1, -1, -1):   # static, bottom-up
                s = os_ + ip * nb
                # R's nb x nb diagonal block, sublane-indexed via the
                # aligned-lane-block transpose trick
                blk_t = jnp.swapaxes(m_ref[:, s:s + nb, os_:os_ + ob],
                                     1, 2)           # (b, ob, nb)
                dblk = jnp.swapaxes(blk_t[:, s - os_:s - os_ + nb, :],
                                    1, 2)            # (b, nb, nb) rows x cols

                def step_bs(jj, pan_aug):
                    # pan_aug: (b_tile, nb, 128) aug entries of panel rows
                    # (all intermediates stay rank >= 2: Mosaic's layout
                    # inference aborts on rank-1 reshapes)
                    j = nb - 1 - jj
                    onehot = (sub == j).astype(jnp.float32)
                    lmask = (lane_nb == j).astype(jnp.float32)
                    augj = jnp.sum(pan_aug * onehot[None, :, None], axis=1)
                    colj = jnp.sum(dblk * lmask, axis=2)      # (b, nb)
                    diag = jnp.sum(colj * onehot[None, :], axis=1,
                                   keepdims=True)             # (b, 1)
                    xj = augj / diag                 # (b, 128)
                    c = (jnp.where(sub[None, :] < j, colj, 0.0)
                         + onehot[None, :] * (diag - 1.0))
                    return pan_aug - c[:, :, None] * xj[:, None, :]
                pan_aug = jax.lax.fori_loop(0, nb, step_bs,
                                            m_ref[:, s:s + nb, n_pad:])
                m_ref[:, s:s + nb, n_pad:] = pan_aug

                if s > os_:
                    # aug of rows above the panel inside this outer block:
                    # coefficients R[r, s:s+nb] via the transpose trick
                    ab_t = jnp.swapaxes(m_ref[:, os_:s, os_:os_ + ob],
                                        1, 2)        # (b, ob, rows)
                    coef = jnp.swapaxes(
                        ab_t[:, s - os_:s - os_ + nb, :], 1, 2)
                    upd = bdot(coef, pan_aug)        # (b, rows, 128)
                    m_ref[:, os_:s, n_pad:] = \
                        m_ref[:, os_:s, n_pad:] - upd

            if os_ > 0:
                # aug of all rows above this outer block (aligned slices)
                xblk = m_ref[:, os_:os_ + ob, n_pad:]         # (b, ob, 128)
                for rs in range(0, os_, 128):
                    coef = m_ref[:, rs:rs + 128, os_:os_ + ob]
                    upd = bdot(coef, xblk)
                    m_ref[:, rs:rs + 128, n_pad:] = \
                        m_ref[:, rs:rs + 128, n_pad:] - upd

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("nb", "ob", "b_tile", "interpret"))
def chol_solve(a: jnp.ndarray, v: jnp.ndarray, nb: int = 8, ob: int = 128,
               b_tile: int = 8, interpret: bool = False) -> jnp.ndarray:
    # b_tile=16 exceeds v5e VMEM (141M > 128M: 31.5M aliased block x
    # pipeline double-buffering + trailing-update temporaries)
    """Fused batched SPD solve x = a^{-1} v on TPU (see _make_solve_kernel).

    a: (B, N, N) SPD; v: (B, N).  Equivalent to Cholesky + two triangular
    substitutions in f32 (same op sequence, so same rounding class)."""
    b, n, n2 = a.shape
    assert n == n2 and v.shape == (b, n) and ob % nb == 0
    n_pad = _round_up(n, max(ob, 128))
    b_pad = _round_up(b, b_tile)
    if n_pad != n:
        a = jnp.pad(a, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        pad_diag = (jnp.arange(n_pad) >= n).astype(a.dtype)
        a = a + jnp.diag(pad_diag)[None]
        v = jnp.pad(v, ((0, 0), (0, n_pad - n)))
    # augmented lane block: v in lane 0, zeros elsewhere
    aug = jnp.pad(v[:, :, None], ((0, 0), (0, 0), (0, 127)))
    m = jnp.concatenate([a, aug], axis=2)
    if b_pad != b:
        eye = jnp.broadcast_to(
            jnp.pad(jnp.eye(n_pad, dtype=a.dtype), ((0, 0), (0, 128))),
            (b_pad - b, n_pad, n_pad + 128))
        m = jnp.concatenate([m, eye], axis=0)

    kernel = _make_solve_kernel(b_tile, n_pad, nb, ob)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad + 128),
                                       jnp.float32),
        grid=(b_pad // b_tile,),
        in_specs=[pl.BlockSpec((b_tile, n_pad, n_pad + 128),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b_tile, n_pad, n_pad + 128),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(m)
    return out[:b, :n, n_pad]


@functools.partial(jax.jit,
                   static_argnames=("nb", "ob", "b_tile", "interpret",
                                    "bf16_updates"))
def cholesky_rt(a: jnp.ndarray, nb: int = 8, ob: int = 128,
                b_tile: int = 16, interpret: bool = False,
                bf16_updates: bool = False) -> jnp.ndarray:
    """Batched Cholesky, returning the UPPER factor R with R^T R = a.

    a: (B, N, N) SPD (symmetric, only the upper triangle + diagonal are
    read), float32 or bfloat16 — a bf16 input is up-converted INSIDE the
    kernel (half the input HBM traffic; the factor and all arithmetic stay
    f32, so the result is bit-identical to converting before the call).
    R equals jnp.linalg.cholesky(a.astype(f32)).mT exactly (up to f32
    rounding).  nb: inner panel rows (sequential factor unit); ob: outer
    block (rank-ob MXU trailing updates).  bf16_updates: single-pass bf16
    trailing updates (attack-gradient experiment, SG_CHOL_BF16=1 — see
    _make_kernel.bdot).
    """
    b, n, n2 = a.shape
    assert n == n2 and ob % nb == 0
    n_pad = _round_up(n, max(ob, 128))
    b_pad = _round_up(b, b_tile)
    if n_pad != n:
        a = jnp.pad(a, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        # identity on the pad diagonal keeps the matrix SPD (1.0 is exact
        # in bf16, so the pad is dtype-neutral)
        pad_diag = (jnp.arange(n_pad) >= n).astype(a.dtype)
        a = a + jnp.diag(pad_diag)[None]
    if b_pad != b:
        eye = jnp.broadcast_to(jnp.eye(n_pad, dtype=a.dtype),
                               (b_pad - b, n_pad, n_pad))
        a = jnp.concatenate([a, eye], axis=0)

    kernel = _make_kernel(b_tile, n_pad, nb, ob,
                          jnp.bfloat16 if bf16_updates else jnp.float32)
    f32_in = a.dtype == jnp.float32
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), jnp.float32),
        grid=(b_pad // b_tile,),
        in_specs=[pl.BlockSpec((b_tile, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b_tile, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # a bf16 input cannot alias the f32 output buffer
        input_output_aliases={0: 0} if f32_in else {},
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the aliased block + pipeline double-buffering + step temps
            # exceed the 16 MB default scoped-vmem budget; v5e has 128 MB
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(a)
    return out[:b, :n, :n]
