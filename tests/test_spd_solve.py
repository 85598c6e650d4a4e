"""spd_solve custom VJP vs autodiff-through-solve."""

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.models.ivector import spd_solve


def _spd(rng, b, n):
    a = rng.standard_normal((b, n, n))
    return jnp.asarray((np.einsum("bij,bkj->bik", a, a)
                        + 3 * np.eye(n)).astype(np.float32))


def test_spd_solve_matches_linalg(rng):
    l_mat = _spd(rng, 3, 8)
    rhs = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    got = np.asarray(spd_solve(l_mat, rhs))
    want = np.linalg.solve(np.asarray(l_mat), np.asarray(rhs)[..., None]
                           )[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spd_solve_vjp_matches_autodiff(rng):
    l_mat = _spd(rng, 2, 6)
    rhs = jnp.asarray(rng.standard_normal((2, 6)).astype(np.float32))

    def with_custom(lm, r):
        return jnp.sum(jnp.sin(spd_solve(lm, r)))

    def with_autodiff(lm, r):
        x = jnp.linalg.solve(lm, r[..., None])[..., 0]
        return jnp.sum(jnp.sin(x))

    g1 = jax.grad(with_custom, argnums=(0, 1))(l_mat, rhs)
    g2 = jax.grad(with_autodiff, argnums=(0, 1))(l_mat, rhs)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-4)
    # grad wrt L: jnp.linalg.solve's autodiff returns the unsymmetrized
    # cotangent too; compare directly
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-3, atol=1e-4)


def test_block_trsv_matches_xla_all_orientations(rng):
    """ops/trsv.py block substitution vs XLA triangular_solve in all four
    lower/transpose combinations, at N > m (block path, incl. the ragged
    identity-padded tail) and N <= m (fallback)."""
    from speakerguard_tpu.ops.trsv import triangular_solve_vec
    for n, m in [(250, 100), (64, 100)]:
        a = rng.standard_normal((3, n, n)).astype(np.float32) * 0.1
        low = np.tril(a) + 2.0 * np.eye(n, dtype=np.float32)
        v = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
        for lower in (True, False):
            fac = jnp.asarray(low if lower else low.transpose(0, 2, 1))
            for ta in (False, True):
                got = np.asarray(triangular_solve_vec(fac, v, lower=lower,
                                                      transpose_a=ta, m=m))
                want = np.asarray(jax.lax.linalg.triangular_solve(
                    fac, v[..., None], left_side=True, lower=lower,
                    transpose_a=ta))[..., 0]
                np.testing.assert_allclose(
                    got, want, rtol=2e-4, atol=2e-4,
                    err_msg=f"n={n} lower={lower} transpose={ta}")


def test_bf16_l_in_kernel_convert_is_bit_identical(rng, monkeypatch):
    """r5f: a bfloat16 L feeds the Pallas factorization directly (the
    up-convert happens in VMEM instead of a standalone XLA fusion that
    materializes the f32 (B, 640, 640) input).  The factor arithmetic is
    f32 either way, so solve AND IFT-VJP must be BIT-identical to the
    convert-outside route (SG_CHOL_BF16_IN=0)."""
    monkeypatch.setenv("SG_CHOL_PALLAS", "1")  # interpret-mode kernel
    l_mat = _spd(rng, 2, 70).astype(jnp.bfloat16)
    rhs = jnp.asarray(rng.standard_normal((2, 70)).astype(np.float32))

    def run():
        def f(lm, r):
            return jnp.sum(jnp.sin(spd_solve(lm, r)))
        x = spd_solve(l_mat, rhs)
        g = jax.grad(f, argnums=(0, 1))(l_mat, rhs)
        return np.asarray(x), np.asarray(g[0]), np.asarray(g[1])

    monkeypatch.setenv("SG_CHOL_BF16_IN", "0")
    x0, gl0, gr0 = run()
    monkeypatch.setenv("SG_CHOL_BF16_IN", "1")
    x1, gl1, gr1 = run()
    np.testing.assert_array_equal(x0, x1)
    np.testing.assert_array_equal(gl0, gl1)
    np.testing.assert_array_equal(gr0, gr1)


def test_spd_solve_emit_dinv_path(rng, monkeypatch):
    """r5f: SG_CHOL_EMIT_DINV=1 — the factorization kernel emits the
    inverse-transposed 128-blocks and both triangular applies become pure
    matmuls (no XLA triangular_solve in the hot path).  Value and IFT
    gradients must agree with the default path at f32 tolerance."""
    monkeypatch.setenv("SG_CHOL_PALLAS", "1")
    l_mat = _spd(rng, 2, 300)
    rhs = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))

    def f(lm, r):
        return jnp.sum(jnp.sin(spd_solve(lm, r)))

    monkeypatch.setenv("SG_CHOL_EMIT_DINV", "0")
    x0 = np.asarray(spd_solve(l_mat, rhs))
    g0 = jax.grad(f, argnums=(0, 1))(l_mat, rhs)
    monkeypatch.setenv("SG_CHOL_EMIT_DINV", "1")
    x1 = np.asarray(spd_solve(l_mat, rhs))
    g1 = jax.grad(f, argnums=(0, 1))(l_mat, rhs)
    np.testing.assert_allclose(x1, x0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                               rtol=1e-3, atol=1e-4)


def test_spd_solve_block_path_large(rng):
    """spd_solve at N=600-class shapes (block substitution active) vs
    float64 reference."""
    l_mat = _spd(rng, 2, 333)
    rhs = jnp.asarray(rng.standard_normal((2, 333)).astype(np.float32))
    got = np.asarray(spd_solve(l_mat, rhs))
    want = np.linalg.solve(np.asarray(l_mat, np.float64),
                           np.asarray(rhs, np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
