"""i-vector extractor (total-variability T-matrix), batched for TPU.

Replaces reference model/_iv_plda/ivector_extract.py.  The per-utterance
posterior-precision system

    L = I + sum_c N_c  T_c^T Sigma_c^-1 T_c
    linear = sum_c T_c^T Sigma_c^-1 F_c
    ivector = L^-1 linear            (with Kaldi's prior-offset trick)

is evaluated with two load-time precomputations:

  * ``quad``  (C, IV, IV) = T_c^T Sigma_c^-1 T_c  — so L for a whole batch is
    a single einsum('bc,cij->bij'); the 2048x600x600 tensor is read once per
    *batch* (HBM-bandwidth-bound, amortized over utterances), instead of the
    reference's per-utterance 2048 matmul chain (ivector_extract.py:106).
  * ``proj``  (C, IV, D) = T_c^T Sigma_c^-1      — so linear is one einsum.

The 600x600 solve uses jnp.linalg.solve (batched LU on device).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class IvectorExtractorParams(NamedTuple):
    extractor_matrix: jax.Array  # (C, D, IV)   Kaldi "M"
    sigma_inv: jax.Array         # (C, D, D)
    offset: jax.Array            # scalar prior offset
    quad_packed: jax.Array       # (C, IV(IV+1)/2) upper-tri of T^T Sigma^-1 T
    proj: jax.Array              # (C, IV, D)
    # bf16 copies for the fast attack-gradient path: the quad contract is
    # the single biggest HBM read of an iv-PLDA attack iteration (1.48 GB
    # at full size, touched forward AND backward every iteration) — the
    # bf16 copies halve those bytes.  None only for hand-rolled tuples.
    quad_packed_bf16: jax.Array = None
    proj_bf16: jax.Array = None

    @property
    def num_gaussians(self):
        return self.extractor_matrix.shape[0]

    @property
    def dim(self):
        return self.extractor_matrix.shape[1]

    @property
    def ivector_dim(self):
        return self.extractor_matrix.shape[2]


def build_extractor(extractor_matrix: np.ndarray, sigma_inv: np.ndarray,
                    offset: float, fast_copies: bool | None = None
                    ) -> IvectorExtractorParams:
    # the quad precompute is ~90 GFLOP at full size (C=2048, IV=600): run it
    # on device (seconds of host numpy -> milliseconds of MXU).  quad_c is
    # symmetric, so only the packed upper triangle is stored — per-iteration
    # HBM traffic on the (otherwise 2.95 GB at full size) tensor halves,
    # and the math stays exact (see extract_ivectors).
    m = jnp.asarray(extractor_matrix, jnp.float32)
    s = jnp.asarray(sigma_inv, jnp.float32)
    iv = m.shape[2]
    rows, cols = np.triu_indices(iv)

    @jax.jit
    def _pre(m, s):
        proj = jnp.einsum("cdi,cde->cie", m, s,
                          precision=jax.lax.Precision.HIGHEST)
        quad = jnp.einsum("cie,cej->cij", proj, m,
                          precision=jax.lax.Precision.HIGHEST)
        return proj, quad[:, rows, cols]

    proj, quad_packed = _pre(m, s)
    # bf16 copies only when the fast path can run (quad_packed_bf16 is
    # ~740 MB at full size): exact-path-only processes (CPU test mesh,
    # SG_FAST=0) skip the footprint; _fast_quad/_fast_proj fall back to an
    # in-graph cast if SG_FAST is forced on after build (ADVICE r3)
    if fast_copies is None:
        from speakerguard_tpu.models.base import fast_active
        fast_copies = fast_active()
    return IvectorExtractorParams(
        extractor_matrix=m,
        sigma_inv=s,
        offset=jnp.asarray(offset, jnp.float32),
        quad_packed=quad_packed,
        proj=proj,
        quad_packed_bf16=(quad_packed.astype(jnp.bfloat16) if fast_copies
                          else None),
        proj_bf16=proj.astype(jnp.bfloat16) if fast_copies else None,
    )


def _fast_quad(params: IvectorExtractorParams) -> jnp.ndarray:
    q = params.quad_packed_bf16
    return q if q is not None else params.quad_packed.astype(jnp.bfloat16)


def _fast_proj(params: IvectorExtractorParams) -> jnp.ndarray:
    p = params.proj_bf16
    return p if p is not None else params.proj.astype(jnp.bfloat16)


def random_extractor(rng: np.random.Generator, num_gaussians: int = 2048,
                     dim: int = 60, ivector_dim: int = 600
                     ) -> IvectorExtractorParams:
    m = rng.standard_normal((num_gaussians, dim, ivector_dim)) * 0.05
    a = rng.standard_normal((num_gaussians, dim, dim)) * 0.1
    sigma_inv = np.einsum("cij,ckj->cik", a, a) + np.eye(dim)
    return build_extractor(m, sigma_inv, 1.0)


def _use_pallas_chol() -> bool:
    import os
    mode = os.environ.get("SG_CHOL_PALLAS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"


def _chol_factor(l_mat, fast=False):
    """Returns (factor, dinv_t, lower).  On TPU the batched Pallas kernel
    computes the upper factor R (R^T R = L) — XLA's cholesky on
    (128, 600, 600) lowers to a ~600-step While loop costing ~23 ms/call
    (see ops/pallas_chol.py); the kernel does it VMEM-resident.

    dinv_t (or None): inverse-transposed 128x128 diagonal blocks of R,
    emitted as a byproduct of the same sweep (SG_CHOL_EMIT_DINV=1) so the
    triangular applies skip their per-iteration XLA triangular_solve
    block inversion — see ops/pallas_chol.cholesky_rt_dinv."""
    if _use_pallas_chol():
        import os
        from speakerguard_tpu.ops.pallas_chol import (cholesky_rt,
                                                      cholesky_rt_dinv)
        interpret = jax.default_backend() != "tpu"
        # panel-rows knob: nb=16 measured +0.6 utts/s e2e over nb=8 at
        # bench shapes (same 6.5e-7 factor accuracy); nb=32 also correct
        nb = int(os.environ.get("SG_CHOL_NB", "16"))
        # bf16 single-pass trailing updates (factor rel err ~1e-3):
        # default ON for the fast attack-gradient path (chip-measured
        # 44.8 -> 46.6 utts/s iv-PLDA PGD-100 @512, ASR 100%, r4) whose
        # gradients feed sign() steps; default OFF for exact scoring.
        # SG_CHOL_BF16={0,1} forces either globally.
        bf16 = os.environ.get("SG_CHOL_BF16",
                              "1" if fast else "0") == "1"
        # batch-tile knob: grid steps run sequentially on the TensorCore,
        # so fewer/fatter tiles amortize the per-step serial panel sweeps
        # against more batch — bounded above by VMEM (the aliased
        # (b_tile, 640, 640) f32 block double-buffers)
        b_tile = int(os.environ.get("SG_CHOL_BTILE", "16"))
        # a bf16 L (SG_IVEC_L_BF16) feeds the kernel directly by default:
        # the up-convert happens in VMEM, killing the standalone XLA
        # convert fusion that materialized the f32 (B, 640, 640) input
        # (bit-identical factor; SG_CHOL_BF16_IN=0 restores the pre-r5f
        # convert-outside behavior for A/B)
        if (l_mat.dtype != jnp.float32
                and os.environ.get("SG_CHOL_BF16_IN", "1") != "1"):
            l_mat = l_mat.astype(jnp.float32)
        if os.environ.get("SG_CHOL_EMIT_DINV", "0") == "1":
            factor, dinv_t = cholesky_rt_dinv(
                l_mat, nb=nb, b_tile=b_tile, interpret=interpret,
                bf16_updates=bf16)
            return factor, dinv_t, False
        return cholesky_rt(l_mat, nb=nb, b_tile=b_tile,
                           interpret=interpret,
                           bf16_updates=bf16), None, False
    return jnp.linalg.cholesky(l_mat.astype(jnp.float32)), None, True


def _chol_apply(factor, lower: bool, v, dinv_t=None):
    """Solve A x = v given A's triangular factor (two triangular solves).

    Uses block-substitution solves (ops/trsv.py): XLA's vector-RHS
    triangular_solve is latency-bound on TPU (the two solves measured
    7.3 ms at (128, 600, 600) vs 1.3 ms block-structured, rel err ~3e-7).
    dinv_t: pre-inverted diagonal blocks from cholesky_rt_dinv — both
    substitutions become pure batched matmuls (m=128 block grid)."""
    from speakerguard_tpu.ops.trsv import triangular_solve_vec as tsv
    kw = {} if dinv_t is None else dict(dinv_t=dinv_t, m=128)
    if lower:   # A = C C^T
        y = tsv(factor, v, lower=True, **kw)
        x = tsv(factor, y, lower=True, transpose_a=True, **kw)
    else:       # A = R^T R
        y = tsv(factor, v, lower=False, transpose_a=True, **kw)
        x = tsv(factor, y, lower=False, **kw)
    return x


def _solve_kind() -> str:
    """Which solve strategy the current process state selects: 'upper'
    (Pallas R^T R factor), 'lower' (XLA cholesky), or 'fused' (the opt-in
    [A|v] -> x Pallas kernel — measured SLOWER on v5e at (128, 600, 600),
    ~33 ms net vs ~22 for factor+triangular, because its VMEM-capped
    batch tile doubles the sequential sweep repetitions; exact to 8e-7
    rel, see ARCHITECTURE perf notes)."""
    import os
    if os.environ.get("SG_CHOL_PALLAS") == "fused":
        return "fused"
    return "upper" if _use_pallas_chol() else "lower"


def _make_spd_solve(kind: str, fast: bool = False, bf16_l: bool = False):
    """Build the custom-VJP SPD solve for one factorization strategy.

    The IFT backward (grad_rhs = A^-1 g; grad_A = -outer(grad_rhs, x))
    needs a second solve against the SAME matrix — so for the factored
    kinds the residual carries the triangular FACTOR and the backward is
    just two extra triangular solves, skipping a second factorization
    (the factorization is ~half the solve stage cost on chip).  The
    factor's orientation is baked into WHICH traced function this is
    (kind is captured statically), so a SG_CHOL_PALLAS flip between the
    forward and backward trace can't mis-orient the triangular solves."""
    lower = kind == "lower"
    # bf16_l: the L matrix arrives bfloat16 (SG_IVEC_L_BF16 fast path) —
    # the factorization runs f32 (the convert fuses into the kernel's pad
    # fusion, one read of the half-size L) and the A-cotangent is emitted
    # bf16 to match the primal.
    l_dtype = jnp.bfloat16 if bf16_l else jnp.float32

    def impl(l_mat, rhs):
        if kind == "fused":
            from speakerguard_tpu.ops.pallas_chol import chol_solve
            interpret = jax.default_backend() != "tpu"
            return chol_solve(l_mat.astype(jnp.float32), rhs,
                              interpret=interpret)
        factor, dinv_t, _ = _chol_factor(l_mat, fast=fast)
        return _chol_apply(factor, lower, rhs, dinv_t=dinv_t)

    @jax.custom_vjp
    def solve(l_mat, rhs):
        return impl(l_mat, rhs)

    if kind == "fused":
        # no factor to reuse: re-solve against the saved matrix
        # (refactorization IS ~free inside the fused kernel's sweep)
        def fwd(l_mat, rhs):
            x = impl(l_mat, rhs)
            return x, (l_mat, x)

        def bwd(res, g):
            l_mat, x = res
            u = impl(l_mat, g)
            return (-jnp.einsum("bi,bj->bij", u, x).astype(l_dtype), u)
    else:
        def fwd(l_mat, rhs):
            factor, dinv_t, _ = _chol_factor(l_mat, fast=fast)
            x = _chol_apply(factor, lower, rhs, dinv_t=dinv_t)
            return x, (factor, dinv_t, x)

        def bwd(res, g):
            factor, dinv_t, x = res
            u = _chol_apply(factor, lower, g, dinv_t=dinv_t)
            return (-jnp.einsum("bi,bj->bij", u, x).astype(l_dtype), u)

    solve.defvjp(fwd, bwd)
    return solve


_SPD_SOLVES = {(k, f, b16): _make_spd_solve(k, f, b16)
               for k in ("lower", "upper", "fused") for f in (False, True)
               for b16 in (False, True)}


def spd_solve(l_mat: jnp.ndarray, rhs: jnp.ndarray,
              fast: bool = False) -> jnp.ndarray:
    """Batched SPD solve x = A^-1 rhs via Cholesky.  l_mat: (B, N, N)
    symmetric positive definite; rhs: (B, N).

    Custom VJP uses the implicit function theorem instead of
    differentiating through the factorization — much cheaper to compile
    and run than autodiff of cholesky on TPU — and the backward reuses
    the forward's factor (see _make_spd_solve).  fast=True (the attack-
    gradient path) selects bf16 trailing updates inside the Pallas
    factorization by default — see _chol_factor.  A bfloat16 l_mat
    (SG_IVEC_L_BF16 fast path) factorizes in f32 and receives a bf16
    A-cotangent (see _make_spd_solve)."""
    return _SPD_SOLVES[(_solve_kind(), fast,
                        l_mat.dtype == jnp.bfloat16)](l_mat, rhs)


import functools


@functools.lru_cache(maxsize=None)
def _sym_unpack(iv: int):
    """Packed upper-triangle (B, P) -> full symmetric (B, IV, IV).

    Forward is one gather; the custom VJP makes the backward TWO gathers
    (cot_packed = cot[r,c] + cot[c,r] off-diagonal) instead of autodiff's
    scatter-add, which is pathologically slow on TPU."""
    rows, cols = np.triu_indices(iv)
    idx_full = np.zeros((iv, iv), np.int32)
    p_arange = np.arange(len(rows), dtype=np.int32)
    idx_full[rows, cols] = p_arange
    idx_full[cols, rows] = p_arange
    # NOTE: keep only numpy in this cache — jnp constants materialized here
    # under an active trace would leak tracers across jit boundaries
    idx_flat = idx_full.ravel()
    offdiag = (rows != cols).astype(np.float32)

    @jax.custom_vjp
    def unpack(lp):
        return jnp.take(lp, jnp.asarray(idx_flat), axis=1
                        ).reshape(-1, iv, iv)

    def fwd(lp):
        return unpack(lp), None

    def bwd(_, cot):
        up = cot[:, jnp.asarray(rows), jnp.asarray(cols)]
        lo = cot[:, jnp.asarray(cols), jnp.asarray(rows)]
        # keep the packed cotangent in the primal's dtype (bf16 L path)
        return ((up + lo * jnp.asarray(offdiag)).astype(cot.dtype),)

    unpack.defvjp(fwd, bwd)
    return unpack


@jax.custom_vjp
def _quad_contract(zeroth, quad_packed):
    from speakerguard_tpu.models.gmm import HOT_PRECISION
    return jnp.einsum("bc,cp->bp", zeroth, quad_packed,
                      precision=HOT_PRECISION)


def _qc_fwd(zeroth, quad_packed):
    return _quad_contract(zeroth, quad_packed), quad_packed


def _qc_bwd(quad_packed, cot):
    from speakerguard_tpu.models.gmm import BWD_PRECISION
    gz = jnp.einsum("bp,cp->bc", cot, quad_packed,
                    precision=BWD_PRECISION)
    # params are never attack variables; the zero cotangent is DCE'd
    return gz, jnp.zeros_like(quad_packed)


_quad_contract.defvjp(_qc_fwd, _qc_bwd)


@jax.custom_vjp
def _quad_contract_fast(zeroth, quad_packed_bf16):
    """bf16 variant for attack-gradient graphs: halves the HBM bytes of the
    dominant weight read in both directions; f32 accumulation on the MXU.
    Off-TPU the dot degrades to f32 compute on the bf16-rounded weights
    (see gmm.fast_dot_dtype)."""
    from speakerguard_tpu.models.gmm import fast_dot_dtype
    dt = fast_dot_dtype()
    return jnp.einsum("bc,cp->bp", zeroth.astype(dt),
                      quad_packed_bf16.astype(dt),
                      preferred_element_type=jnp.float32)


def _qcf_fwd(zeroth, quad_packed_bf16):
    return _quad_contract_fast(zeroth, quad_packed_bf16), quad_packed_bf16


def _qcf_bwd(quad_packed_bf16, cot):
    from speakerguard_tpu.models.gmm import fast_dot_dtype
    dt = fast_dot_dtype()
    gz = jnp.einsum("bp,cp->bc", cot.astype(dt),
                    quad_packed_bf16.astype(dt),
                    preferred_element_type=jnp.float32)
    return gz, jnp.zeros_like(quad_packed_bf16)


_quad_contract_fast.defvjp(_qcf_fwd, _qcf_bwd)


def ivec_l_bf16_active() -> bool:
    """SG_IVEC_L_BF16 materializes the i-vector posterior-precision matrix
    L = I + sum_c z_c quad_c in bfloat16 on the attack-gradient path: the
    r5 iv trace (measurements/r05_iv_trace_top_ops.txt) shows ~15 ms/iter
    of the PGD while-body is L-assembly traffic — the packed quad matmul
    output, the pack<->full gather/unpack passes, the pad-to-640 relayout,
    and the backward outer-product cotangent are all full passes over a
    737 MB f32 (512, 600, 600) tensor family.  bf16 halves every one of
    them (the xv lesson applies: the matmul EMITS bf16, nothing converts
    after the fact).  The factorization itself stays f32: the Pallas
    kernel reads the bf16 L through a convert fused into its pad fusion,
    and its panel sweeps keep f32 pivots (bf16 trailing updates were
    already the fast-path default, factor rel err ~1e-3, sign()-consumed
    gradients).  Exact scoring path untouched.

    Default ON since chip-A/B'd (2026-08-19, measurements/r05_chip_log.txt):
    iv-PLDA PGD-100 @512 topk256 69.14 -> 73.14 utts/s (+5.8%) at ASR
    exactly 100.0 — beats the K=128 selection's 71.7 without its ASR
    loss.  SG_IVEC_L_BF16=0 restores the f32 L."""
    import os
    return os.environ.get("SG_IVEC_L_BF16", "1") == "1"


@jax.custom_vjp
def _quad_contract_fast16(zeroth, quad_packed_bf16):
    """_quad_contract_fast emitting the packed L in bfloat16 (see
    ivec_l_bf16_active): f32 accumulation on the MXU, one rounding at the
    output — the (B, IV(IV+1)/2) result is written bf16 so every
    downstream assembly pass reads/writes half the bytes."""
    from speakerguard_tpu.models.gmm import fast_dot_dtype
    dt = fast_dot_dtype()
    if dt == jnp.bfloat16:
        return jnp.einsum("bc,cp->bp", zeroth.astype(dt),
                          quad_packed_bf16.astype(dt),
                          preferred_element_type=jnp.bfloat16)
    # off-TPU (f32 operands): accumulate f32, round at the output — the
    # astype fuses; same value class as the TPU path
    return jnp.einsum("bc,cp->bp", zeroth, quad_packed_bf16.astype(dt),
                      preferred_element_type=jnp.float32
                      ).astype(jnp.bfloat16)


def _qcf16_fwd(zeroth, quad_packed_bf16):
    return _quad_contract_fast16(zeroth, quad_packed_bf16), quad_packed_bf16


def _qcf16_bwd(quad_packed_bf16, cot):
    from speakerguard_tpu.models.gmm import fast_dot_dtype
    dt = fast_dot_dtype()
    # cot arrives bf16; zeroth's cotangent must be f32 (the primal dtype)
    gz = jnp.einsum("bp,cp->bc", cot.astype(dt),
                    quad_packed_bf16.astype(dt),
                    preferred_element_type=jnp.float32)
    return gz, jnp.zeros_like(quad_packed_bf16)


_quad_contract_fast16.defvjp(_qcf16_fwd, _qcf16_bwd)


class IvectorTopK(NamedTuple):
    """Extractor tensors sliced to a frozen shared component selection
    (gmm.GmmTopKContext.sel) for one attack run: the i-vector quad
    contract and linear term run in the selected subspace — the dropped
    components carry ~0 posterior mass, so this equals the dense math on
    scattered-back stats without materializing (B, C[, D]) anything."""
    quad_sel: jax.Array  # (K, IV(IV+1)/2) bf16
    proj_sel: jax.Array  # (K, IV, D) bf16


def make_topk_slices(params: IvectorExtractorParams,
                     sel: jnp.ndarray) -> IvectorTopK:
    """Gather the (K, .) extractor slices for a shared selection — once
    per attack run, inside the attack jit (the gathers read ~230 MB bf16
    at full size / K=512; amortized over the run's iterations)."""
    sg = jax.lax.stop_gradient
    return IvectorTopK(
        quad_sel=sg(jnp.take(_fast_quad(params), sel, axis=0)),
        proj_sel=sg(jnp.take(_fast_proj(params), sel, axis=0)),
    )


def extract_ivectors(params: IvectorExtractorParams, zeroth: jnp.ndarray,
                     first: jnp.ndarray, fast=False,
                     topk: "IvectorTopK | None" = None) -> jnp.ndarray:
    """zeroth: (B, C), first: (B, C, D) -> ivectors (B, IV).

    Matches reference ivector_extract.py:98-114 (Extractivector), batched.
    fast=True uses the bf16 parameter copies (attack-gradient path only;
    the SPD solve stays f32).  topk (fast only) consumes SELECTED-space
    stats (B, K) / (B, K, D) against the pre-sliced extractor tensors —
    see IvectorTopK.
    """
    assert topk is None or fast, "topk slices are a fast-path-only knob"
    iv = params.ivector_dim
    # packed-symmetric accumulation: one (B, C) @ (C, IV(IV+1)/2) matmul
    # reads half the bytes of the full (C, IV, IV) form; the full L is then
    # a cheap gather-unpack of the (B, P) result.  Forward at HIGH (score
    # parity); cotangent at BWD_PRECISION (gradients feed sign() steps).
    from speakerguard_tpu.models.gmm import HOT_PRECISION
    if fast and topk is not None:
        from speakerguard_tpu.models.gmm import fast_dot_dtype
        dt = fast_dot_dtype()
        sg = jax.lax.stop_gradient
        qc = (_quad_contract_fast16 if ivec_l_bf16_active()
              else _quad_contract_fast)
        l_packed = qc(zeroth, sg(topk.quad_sel))
        linear = jnp.einsum("kid,bkd->bi",
                            sg(topk.proj_sel).astype(dt),
                            first.astype(dt),
                            preferred_element_type=jnp.float32)
    elif fast:
        from speakerguard_tpu.models.gmm import fast_dot_dtype
        dt = fast_dot_dtype()
        sg = jax.lax.stop_gradient
        qc = (_quad_contract_fast16 if ivec_l_bf16_active()
              else _quad_contract_fast)
        l_packed = qc(zeroth, sg(_fast_quad(params)))
        linear = jnp.einsum("cid,bcd->bi",
                            sg(_fast_proj(params)).astype(dt),
                            first.astype(dt),
                            preferred_element_type=jnp.float32)
    else:
        l_packed = _quad_contract(zeroth, params.quad_packed)
        linear = jnp.einsum("cid,bcd->bi", params.proj, first,
                            precision=HOT_PRECISION)
    l_mat = _sym_unpack(iv)(l_packed) + jnp.eye(iv, dtype=l_packed.dtype)
    linear = linear.at[:, 0].add(params.offset)
    # L is SPD by construction (I + sum of PSD terms): Cholesky solve with
    # an implicit-function-theorem VJP.  (Also essential on TPU: the
    # general LU jnp.linalg.solve triggers a pathological multi-minute XLA
    # compile when fused into larger graphs.)
    ivec = spd_solve(l_mat, linear, fast=fast)
    return ivec.at[:, 0].add(-params.offset)


def length_normalize(vec: jnp.ndarray, expected_length: jnp.ndarray
                     ) -> jnp.ndarray:
    """vec: (..., D); scales to the expected L2 norm
    (reference ivector_extract.py:116-125)."""
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    return vec * (expected_length / jnp.maximum(norm, 1e-12))
