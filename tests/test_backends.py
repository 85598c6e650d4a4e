"""GMM / ivector / PLDA math vs loop-based numpy oracles (small dims)."""

import numpy as np
import jax.numpy as jnp

from speakerguard_tpu.models import gmm as gmm_mod
from speakerguard_tpu.models import ivector as iv_mod
from speakerguard_tpu.models import plda as plda_mod


def small_gmm(rng, c=8, d=4):
    return gmm_mod.random_gmm(rng, c, d)


def test_gmm_loglike_and_stats(rng):
    params = small_gmm(rng)
    c, d = params.num_gaussians, params.dim
    feats = rng.standard_normal((2, 11, d)).astype(np.float32)

    gconsts = np.asarray(params.gconsts, np.float64)
    mic = np.asarray(params.means_invcovars, np.float64)
    inv = np.asarray(params.invcovars, np.float64)

    # oracle: per-frame loop of the Kaldi loglike
    for b in range(2):
        want_ll = np.zeros((11, c))
        for t in range(11):
            x = feats[b, t].astype(np.float64)
            for ci in range(c):
                want_ll[t, ci] = (mic[ci] @ x - 0.5 * x @ inv[ci] @ x
                                  + gconsts[ci])
        got_ll = np.asarray(gmm_mod.component_loglike(
            params, jnp.asarray(feats[b])))
        np.testing.assert_allclose(got_ll, want_ll, rtol=1e-4, atol=1e-4)

    zeroth, first = gmm_mod.zeroth_first_stats(params, jnp.asarray(feats))
    for b in range(2):
        posts = np.zeros((11, c))
        for t in range(11):
            x = feats[b, t].astype(np.float64)
            ll = np.array([mic[ci] @ x - 0.5 * x @ inv[ci] @ x + gconsts[ci]
                           for ci in range(c)])
            e = np.exp(ll - ll.max())
            posts[t] = e / e.sum()
        np.testing.assert_allclose(np.asarray(zeroth)[b], posts.sum(0),
                                   rtol=1e-4, atol=1e-5)
        want_first = posts.T @ feats[b].astype(np.float64)
        np.testing.assert_allclose(np.asarray(first)[b], want_first,
                                   rtol=1e-4, atol=1e-5)


def test_ivector_extraction(rng):
    c, d, iv = 8, 4, 6
    params = iv_mod.random_extractor(rng, c, d, iv)
    zeroth = np.abs(rng.standard_normal((2, c))).astype(np.float32) * 3
    first = rng.standard_normal((2, c, d)).astype(np.float32)

    got = np.asarray(iv_mod.extract_ivectors(
        params, jnp.asarray(zeroth), jnp.asarray(first)))

    m = np.asarray(params.extractor_matrix, np.float64)
    s = np.asarray(params.sigma_inv, np.float64)
    off = float(params.offset)
    for b in range(2):
        L = np.eye(iv)
        lin = np.zeros(iv)
        for ci in range(c):
            L += zeroth[b, ci] * m[ci].T @ s[ci] @ m[ci]
            lin += m[ci].T @ s[ci] @ first[b, ci]
        lin[0] += off
        want = np.linalg.solve(L, lin)
        want[0] -= off
        np.testing.assert_allclose(got[b], want, rtol=1e-3, atol=1e-4)


def test_plda_transform_and_scores(rng):
    d = 5
    params = plda_mod.random_plda(rng, d)
    mean = np.asarray(params.mean, np.float64)
    tr = np.asarray(params.transform, np.float64)
    psi = np.asarray(params.psi, np.float64)

    ivec = rng.standard_normal((3, d)).astype(np.float32)
    got_t = np.asarray(plda_mod.transform_ivector(params, jnp.asarray(ivec)))
    for b in range(3):
        x = tr @ (ivec[b].astype(np.float64) - mean)
        inv_covar = 1.0 / (psi + 1.0)
        factor = np.sqrt(d / (inv_covar @ (x ** 2)))
        np.testing.assert_allclose(got_t[b], x * factor, rtol=1e-4, atol=1e-5)

    enroll = rng.standard_normal((4, d)).astype(np.float32)
    test_iv = rng.standard_normal((2, d)).astype(np.float32)
    got = np.asarray(plda_mod.llr_scores(params, jnp.asarray(enroll),
                                         jnp.asarray(test_iv)))
    for b in range(2):
        for s_i in range(4):
            m = psi / (psi + 1.0) * enroll[s_i].astype(np.float64)
            var = 1.0 + psi / (psi + 1.0)
            ll_g = -0.5 * (np.log(var).sum() + np.log(2 * np.pi) * d
                           + ((test_iv[b] - m) ** 2 / var).sum())
            var0 = psi + 1.0
            ll_w = -0.5 * (np.log(var0).sum() + np.log(2 * np.pi) * d
                           + (test_iv[b] ** 2 / var0).sum())
            np.testing.assert_allclose(got[b, s_i], ll_g - ll_w,
                                       rtol=1e-4, atol=1e-4)


def test_length_normalize():
    v = jnp.asarray(np.array([[3.0, 4.0]], np.float32))
    out = np.asarray(iv_mod.length_normalize(v, jnp.asarray(10.0)))
    np.testing.assert_allclose(np.linalg.norm(out), 10.0, rtol=1e-6)


def test_augment_onehot_selection_bit_exact(rng):
    """aug(x) = [x, packed(x x^T)] built via one-hot selector MATMULS must
    be bit-equal to the gather construction (gmm._aug_ops replaced lane
    gathers — 8.8 ms/iter at bench shapes on TPU — with exact one-hot
    matmuls; selection by a single x_k * 1.0 term is exact at HIGHEST
    precision, verified on-chip and here on CPU)."""
    for d in (4, 10, 72):
        x = jnp.asarray(rng.standard_normal((3, 7, d)).astype(np.float32))
        rows, cols = gmm_mod._packed_indices(d)
        want = jnp.concatenate(
            [x, x[..., jnp.asarray(rows)] * x[..., jnp.asarray(cols)]],
            axis=-1)
        got = gmm_mod._augment(x, d)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
