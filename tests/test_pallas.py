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
