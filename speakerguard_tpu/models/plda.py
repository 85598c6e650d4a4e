"""Kaldi two-covariance PLDA transform + log-likelihood-ratio scoring.

Replaces reference model/_iv_plda/plda.py (and the byte-identical
model/_xv_plda/plda.py).  Pure matmul/elementwise chain, batched over both
test utterances and enrolled speakers — the reference loops per test
utterance (iv_plda.py:399-408).
"""

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


class PLDAParams(NamedTuple):
    mean: jax.Array       # (D,)
    transform: jax.Array  # (D, D)
    psi: jax.Array        # (D,) between-class variances in transformed space

    @property
    def dim(self):
        return self.mean.shape[0]


def build_plda(mean: np.ndarray, transform: np.ndarray, psi: np.ndarray
               ) -> PLDAParams:
    return PLDAParams(jnp.asarray(mean, jnp.float32),
                      jnp.asarray(transform, jnp.float32),
                      jnp.asarray(psi, jnp.float32))


def random_plda(rng: np.random.Generator, dim: int = 200) -> PLDAParams:
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    return build_plda(rng.standard_normal(dim) * 0.1, q,
                      np.abs(rng.standard_normal(dim)) + 0.5)


def transform_ivector(params: PLDAParams, ivector: jnp.ndarray,
                      num_examples: int = 1, simple_length_norm: bool = False,
                      normalize_length: bool = True) -> jnp.ndarray:
    """ivector: (..., D) -> transformed (..., D)
    (reference plda.py:73-97)."""
    d = params.dim
    x = jnp.einsum("ij,...j->...i", params.transform, ivector - params.mean,
                   precision=jax.lax.Precision.HIGHEST)
    if simple_length_norm:
        factor = jnp.sqrt(jnp.asarray(float(d))) / jnp.linalg.norm(
            x, axis=-1, keepdims=True)
    elif normalize_length:
        inv_covar = 1.0 / (params.psi + 1.0 / num_examples)
        factor = jnp.sqrt(
            d / jnp.sum(inv_covar * x * x, axis=-1, keepdims=True))
    else:
        factor = jnp.ones_like(x[..., :1])
    return x * factor


def llr_scores(params: PLDAParams, enroll: jnp.ndarray, test: jnp.ndarray,
               num_examples: int = 1) -> jnp.ndarray:
    """enroll: (S, D) transformed speaker ivectors; test: (B, D) transformed
    test ivectors -> (B, S) log-likelihood ratios
    (reference plda.py:140-190, batched over both axes)."""
    d = params.dim
    psi = params.psi
    mean = (num_examples * psi / (num_examples * psi + 1.0))[None, :] * enroll
    var_given = 1.0 + psi / (num_examples * psi + 1.0)          # (D,)
    logdet_given = jnp.sum(jnp.log(var_given))
    sqdiff = (test[:, None, :] - mean[None, :, :]) ** 2          # (B, S, D)
    ll_given = -0.5 * (logdet_given + _LOG_2PI * d
                       + jnp.einsum("bsd,d->bs", sqdiff, 1.0 / var_given))
    var_without = psi + 1.0
    logdet_without = jnp.sum(jnp.log(var_without))
    ll_without = -0.5 * (logdet_without + _LOG_2PI * d
                         + (test ** 2) @ (1.0 / var_without))    # (B,)
    return ll_given - ll_without[:, None]
