"""Pallas fused GMM log-likelihood kernel vs the jnp reference path
(interpret mode on the CPU test mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from speakerguard_tpu.models import gmm as G
from speakerguard_tpu.ops.pallas_gmm import fused_loglike


@pytest.mark.parametrize("t,d,c", [(64, 8, 128), (100, 12, 200)])
def test_fused_loglike_matches_reference(rng, t, d, c):
    params = G.random_gmm(rng, c, d)
    feats = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    want = np.asarray(G.component_loglike(params, feats))
    got = np.asarray(fused_loglike(
        feats, params.quad_proj, params.gconsts, t_tile=32, c_tile=128,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_fused_loglike_ragged_tiles(rng):
    # shapes that don't divide the tiles exercise the padding path
    params = G.random_gmm(rng, 130, 10)
    feats = jnp.asarray(rng.standard_normal((37, 10)).astype(np.float32))
    want = np.asarray(G.component_loglike(params, feats))
    got = np.asarray(fused_loglike(
        feats, params.quad_proj, params.gconsts, t_tile=32, c_tile=128,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_dispatch_and_analytic_grad(rng, monkeypatch):
    """SG_GMM_PALLAS=1 routes component_loglike through the fused kernel
    (interpret off-TPU); value AND input-gradient must match the jnp path."""
    import jax

    params = G.random_gmm(rng, 130, 10)
    feats = jnp.asarray(rng.standard_normal((2, 37, 10)).astype(np.float32))

    def loss(f, mode):
        monkeypatch.setenv("SG_GMM_PALLAS", mode)
        ll = G.component_loglike(params, f)
        return jnp.sum(jax.nn.softmax(ll, axis=-1)[..., :3])

    monkeypatch.setenv("SG_GMM_PALLAS", "1")
    got = np.asarray(G.component_loglike(params, feats))
    g_got = np.asarray(jax.grad(lambda f: loss(f, "1"))(feats))
    monkeypatch.setenv("SG_GMM_PALLAS", "0")
    want = np.asarray(G.component_loglike(params, feats))
    g_want = np.asarray(jax.grad(lambda f: loss(f, "0"))(feats))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(g_got, g_want, rtol=1e-3, atol=1e-5)


def test_iv_plda_forward_parity_under_pallas(rng, monkeypatch):
    """End-to-end: the iv-PLDA scores are invariant to the GMM backend."""
    from speakerguard_tpu.models.iv_plda import IvPlda, random_iv_plda_params

    # small UBM: interpret-mode pallas on CPU is ~100x slower than
    # compiled, full-size took 400+ s of suite time
    params = random_iv_plda_params(rng, num_gaussians=128, dim=72,
                                   ivector_dim=64, reduced_dim=32)
    model = IvPlda(params)
    enroll = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    model.set_enrollment(["a", "b", "c"], enroll)
    wavs = jnp.asarray(
        (rng.uniform(-0.3, 0.3, (2, 8000)) * 32768).astype(np.float32))

    monkeypatch.setenv("SG_GMM_PALLAS", "0")
    want = np.asarray(model.score(wavs))
    monkeypatch.setenv("SG_GMM_PALLAS", "1")
    got = np.asarray(model.score(wavs))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)


# ---------------------------------------------------------------------------
# fused Baum-Welch stats kernel (ops/pallas_gmm_stats.py) — fast path only
# ---------------------------------------------------------------------------

def test_fused_stats_matches_exact(rng):
    """Forward: the fused loglike->softmax->stats kernel tracks the exact
    f32 stats within bf16 drift, at least as closely as the jnp fast path
    it replaces (the kernel is bf16-operand/f32-accum by design)."""
    from speakerguard_tpu.ops.pallas_gmm_stats import fused_stats
    params = G.random_gmm(rng, 128, 10)
    feats = jnp.asarray(rng.standard_normal((2, 37, 10)).astype(np.float32))

    z_ex, f_ex = G.zeroth_first_stats(params, feats, fast=False)
    z_got, f_got = fused_stats(G.fast_proj(params), params.gconsts,
                               feats, True)
    # T=37 with t_tile=128 exercises the padded-row masking
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ex),
                               rtol=0.05, atol=0.03)
    np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_ex),
                               rtol=0.05, atol=0.06)


def test_fused_stats_grad_tracks_exact(rng):
    """Backward: feature cotangent from the saved-bf16-posts residual VJP
    (r4 redesign — no recompute) agrees with the exact-path autodiff
    gradient (sign agreement is what the PGD-family sign() steps
    consume)."""
    import jax
    from speakerguard_tpu.ops.pallas_gmm_stats import fused_stats
    params = G.random_gmm(rng, 128, 10)
    feats = jnp.asarray(rng.standard_normal((2, 37, 10)).astype(np.float32))

    def mk_loss(fn):
        def loss(f):
            z, fi = fn(f)
            return jnp.sum(z[:, :5]) + jnp.sum(fi[:, :3, :] ** 2)
        return loss

    g_ex = np.asarray(jax.grad(mk_loss(
        lambda f: G.zeroth_first_stats(params, f, fast=False)))(feats))
    g_pal = np.asarray(jax.grad(mk_loss(
        lambda f: fused_stats(G.fast_proj(params), params.gconsts,
                              f, True)))(feats))
    cos = (g_ex * g_pal).sum() / (np.linalg.norm(g_ex)
                                  * np.linalg.norm(g_pal))
    assert cos > 0.999
    nz = np.abs(g_ex) > np.abs(g_ex).max() * 1e-3
    assert np.mean(np.sign(g_ex[nz]) == np.sign(g_pal[nz])) > 0.99


def test_fused_stats_dispatch(rng, monkeypatch):
    """SG_GMM_STATS_PALLAS=1 routes zeroth_first_stats(fast=True) through
    the kernel (interpret off-TPU); =0 keeps the jnp fast path.  Values
    agree within bf16 drift."""
    params = G.random_gmm(rng, 128, 10)
    feats = jnp.asarray(rng.standard_normal((2, 37, 10)).astype(np.float32))
    monkeypatch.setenv("SG_GMM_STATS_PALLAS", "0")
    z_jnp, f_jnp = G.zeroth_first_stats(params, feats, fast=True)
    monkeypatch.setenv("SG_GMM_STATS_PALLAS", "1")
    z_pal, f_pal = G.zeroth_first_stats(params, feats, fast=True)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_jnp),
                               rtol=0.05, atol=0.03)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_jnp),
                               rtol=0.05, atol=0.06)


# ---------------------------------------------------------------------------
# batched Cholesky kernel (ops/pallas_chol.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("b,n,nb,bt", [(3, 64, 32, 2), (5, 150, 32, 4),
                                       (1, 300, 64, 2)])
def test_pallas_cholesky_matches_lapack(rng, b, n, nb, bt):
    from speakerguard_tpu.ops.pallas_chol import cholesky_rt
    a = rng.standard_normal((b, n, n)).astype(np.float32) * 0.1
    spd = np.einsum("bij,bkj->bik", a, a) \
        + (n / 10.0) * np.eye(n, dtype=np.float32)
    r = np.asarray(cholesky_rt(jnp.asarray(spd), nb=nb, b_tile=bt,
                               interpret=True))
    want = np.linalg.cholesky(spd.astype(np.float64)).transpose(0, 2, 1)
    np.testing.assert_allclose(r, want, rtol=1e-4, atol=1e-4)
    # the strictly-lower triangle must be exactly zero
    assert np.abs(np.tril(r, -1)).max() == 0.0


def test_spd_solve_pallas_path(rng, monkeypatch):
    """spd_solve value + IFT gradient agree between the Pallas-chol and
    XLA-chol configurations."""
    import jax
    from speakerguard_tpu.models.ivector import spd_solve

    a = rng.standard_normal((4, 96, 96)).astype(np.float32) * 0.1
    l_mat = jnp.asarray(np.einsum("bij,bkj->bik", a, a)
                        + 5.0 * np.eye(96, dtype=np.float32))
    rhs = jnp.asarray(rng.standard_normal((4, 96)).astype(np.float32))

    def loss(l, r):
        return jnp.sum(spd_solve(l, r) ** 2)

    monkeypatch.setenv("SG_CHOL_PALLAS", "0")
    want = np.asarray(spd_solve(l_mat, rhs))
    gl_want, gr_want = jax.grad(loss, argnums=(0, 1))(l_mat, rhs)
    monkeypatch.setenv("SG_CHOL_PALLAS", "1")
    got = np.asarray(spd_solve(l_mat, rhs))
    gl_got, gr_got = jax.grad(loss, argnums=(0, 1))(l_mat, rhs)

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl_got), np.asarray(gl_want),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr_got), np.asarray(gr_want),
                               rtol=1e-3, atol=1e-4)

    # opt-in fused [A|v] kernel path (SG_CHOL_PALLAS=fused)
    monkeypatch.setenv("SG_CHOL_PALLAS", "fused")
    got_f = np.asarray(spd_solve(l_mat, rhs))
    gl_f, gr_f = jax.grad(loss, argnums=(0, 1))(l_mat, rhs)
    np.testing.assert_allclose(got_f, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl_f), np.asarray(gl_want),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_want),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("b,n,bt", [(3, 40, 2), (5, 200, 4)])
def test_chol_solve_matches_scipy(rng, b, n, bt):
    """Fused [A|v] -> x kernel vs float64 reference solve."""
    from speakerguard_tpu.ops.pallas_chol import chol_solve
    a = rng.standard_normal((b, n, n)).astype(np.float32) * 0.1
    spd = np.einsum("bij,bkj->bik", a, a) \
        + (n / 10.0) * np.eye(n, dtype=np.float32)
    v = rng.standard_normal((b, n)).astype(np.float32)
    got = np.asarray(chol_solve(jnp.asarray(spd), jnp.asarray(v),
                                b_tile=bt, interpret=True))
    want = np.linalg.solve(spd.astype(np.float64),
                           v.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pallas_cholesky_bf16_updates(rng, monkeypatch):
    """SG_CHOL_BF16 (r4 experiment): bf16 trailing updates keep the factor
    within ~1e-3 relative (sign()-consumed gradients) and the spd_solve
    dispatch honors the env knob."""
    from speakerguard_tpu.ops.pallas_chol import cholesky_rt
    from speakerguard_tpu.models.ivector import spd_solve

    a = rng.standard_normal((4, 150, 150)).astype(np.float32) * 0.1
    spd = np.einsum("bij,bkj->bik", a, a) \
        + 15.0 * np.eye(150, dtype=np.float32)
    r16 = np.asarray(cholesky_rt(jnp.asarray(spd), nb=16, b_tile=4,
                                 interpret=True, bf16_updates=True))
    want = np.linalg.cholesky(spd.astype(np.float64)).transpose(0, 2, 1)
    rel = np.abs(r16 - want).max() / np.abs(want).max()
    assert rel < 5e-3, rel
    # reconstruction sanity: R^T R ~= A
    rec = np.einsum("bij,bik->bjk", r16, r16)
    np.testing.assert_allclose(rec, spd, rtol=2e-2, atol=2e-2)

    rhs = jnp.asarray(rng.standard_normal((4, 150)).astype(np.float32))
    monkeypatch.setenv("SG_CHOL_PALLAS", "1")
    monkeypatch.setenv("SG_CHOL_BF16", "0")
    exact = np.asarray(spd_solve(jnp.asarray(spd), rhs))
    monkeypatch.setenv("SG_CHOL_BF16", "1")
    approx = np.asarray(spd_solve(jnp.asarray(spd), rhs))
    rel = np.abs(approx - exact).max() / (np.abs(exact).max() + 1e-12)
    assert 0 < rel < 5e-3, rel  # differs (knob active) but stays close


@pytest.mark.parametrize("b,n,nb,bt", [(3, 70, 8, 2), (2, 300, 16, 2)])
def test_cholesky_rt_dinv_factor_and_blocks(rng, b, n, nb, bt):
    """r5f: cholesky_rt_dinv emits the SAME factor bit-for-bit as
    cholesky_rt (the aug identity block rides the sweep without touching
    the factor lanes) plus the inverse-transposed 128x128 diagonal blocks
    (padded blocks invert to identity); a bfloat16 input goes through the
    same in-kernel up-convert as cholesky_rt."""
    from speakerguard_tpu.ops.pallas_chol import cholesky_rt, cholesky_rt_dinv
    a = rng.standard_normal((b, n, n)).astype(np.float32) * 0.1
    spd = jnp.asarray(np.einsum("bij,bkj->bik", a, a)
                      + (n / 10.0) * np.eye(n, dtype=np.float32))
    r0 = cholesky_rt(spd, nb=nb, b_tile=bt, interpret=True)
    r1, dinv_t = cholesky_rt_dinv(spd, nb=nb, b_tile=bt, interpret=True)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    npad = -(-n // 128) * 128
    assert dinv_t.shape == (b, npad // 128, 128, 128)
    rp = np.zeros((b, npad, npad), np.float32)
    rp[:, :n, :n] = np.asarray(r1)
    for j in range(n, npad):
        rp[:, j, j] = 1.0
    for i in range(npad // 128):
        d_blk = rp[:, i * 128:(i + 1) * 128, i * 128:(i + 1) * 128]
        inv = np.asarray(dinv_t)[:, i].transpose(0, 2, 1)
        np.testing.assert_allclose(inv @ d_blk,
                                   np.broadcast_to(np.eye(128), inv.shape),
                                   atol=5e-5)

    r2, _ = cholesky_rt_dinv(spd.astype(jnp.bfloat16), nb=nb, b_tile=bt,
                             interpret=True)
    r2b = cholesky_rt(spd.astype(jnp.bfloat16), nb=nb, b_tile=bt,
                      interpret=True)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r2b))


def test_trsv_dinv_t_path_matches_xla_inversion(rng):
    """ops/trsv.py with precomputed inverse-transposed diagonal blocks
    (m=128) equals the XLA-inverted path at f32 tolerance, in both
    orientations of an upper factor."""
    from speakerguard_tpu.ops.trsv import triangular_solve_vec as tsv
    from speakerguard_tpu.ops.pallas_chol import cholesky_rt_dinv
    a = rng.standard_normal((3, 300, 300)).astype(np.float32) * 0.1
    spd = jnp.asarray(np.einsum("bij,bkj->bik", a, a)
                      + 30.0 * np.eye(300, dtype=np.float32))
    r, dinv_t = cholesky_rt_dinv(spd, nb=16, b_tile=1, interpret=True)
    v = jnp.asarray(rng.standard_normal((3, 300)).astype(np.float32))
    for ta in (False, True):
        want = np.asarray(tsv(r, v, lower=False, transpose_a=ta, m=128))
        got = np.asarray(tsv(r, v, lower=False, transpose_a=ta, m=128,
                             dinv_t=dinv_t))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
