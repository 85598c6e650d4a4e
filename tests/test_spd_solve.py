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
