"""Descriptor→codebook assignment kernels (the "predict" half of sklearn).

TPU-native replacements for the native-delegated kernels the reference calls
into sklearn for:

* ``KMeans.predict`` — nearest centroid (reference: pyvisim/encoders/vlad.py:95)
* ``GaussianMixture.predict_proba`` — diag-Gaussian posteriors
  (reference: pyvisim/encoders/fisher_vector.py:99)

Both are expressed in matmul form so the (N, K) work lands on the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import nn

from .codebooks import GmmCodebook

__all__ = [
    "pairwise_sqdist",
    "nearest_centroid",
    "gmm_log_prob",
    "gmm_posteriors",
]

_LOG_2PI = 1.8378770664093453  # log(2*pi)


def pairwise_sqdist(
    x: jnp.ndarray, centers: jnp.ndarray, precision=None
) -> jnp.ndarray:
    """Squared Euclidean distances ``(N, K)`` between ``x (N, D)`` and
    ``centers (K, D)`` in matmul form: ||x||^2 - 2 x c^T + ||c||^2.

    The cross term is a single (N, D) x (D, K) matmul -> MXU.
    ``precision=jax.lax.Precision.HIGHEST`` forces full-f32 MXU passes —
    use it on TPU training paths where |mean| >> std data would otherwise
    lose the cancellation to bf16 matmul inputs.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (N, 1)
    c2 = jnp.sum(centers * centers, axis=-1)  # (K,)
    cross = jnp.dot(
        x, centers.T, preferred_element_type=jnp.float32, precision=precision
    )  # (N, K)
    return x2 - 2.0 * cross + c2[None, :]


def nearest_centroid(
    x: jnp.ndarray, centers: jnp.ndarray, precision=None
) -> jnp.ndarray:
    """Hard assignment: index of the nearest centroid per row, ``(N,)`` int32.

    Equivalent to sklearn ``KMeans.predict`` (reference: vlad.py:95).
    Ties break toward the lower index, matching numpy/sklearn argmin.
    """
    return jnp.argmin(
        pairwise_sqdist(x, centers, precision=precision), axis=-1
    ).astype(jnp.int32)


def gmm_log_prob(
    x: jnp.ndarray, gmm: GmmCodebook, precision=None
) -> jnp.ndarray:
    """Per-component weighted log density ``log w_k + log N(x | mu_k, diag sigma_k)``.

    Shape: (N, K). Expressed in matmul form: for diag covariance,

        log N(x) = -0.5 * [ D log 2pi + sum_d log s_kd
                            + sum_d (x_d - m_kd)^2 / s_kd ]

    and the quadratic expands to ``x^2 @ (1/s)^T - 2 x @ (m/s)^T + sum m^2/s``,
    i.e. two MXU matmuls. Matches sklearn's diag
    ``_estimate_weighted_log_prob`` to float32 tolerance.
    """
    inv_cov = 1.0 / gmm.covariances  # (K, D)
    m_over_s = gmm.means * inv_cov  # (K, D)
    const = -0.5 * (
        x.shape[-1] * _LOG_2PI
        + jnp.sum(jnp.log(gmm.covariances), axis=-1)
        + jnp.sum(gmm.means * m_over_s, axis=-1)
    )  # (K,)
    quad = jnp.dot(
        x, m_over_s.T, preferred_element_type=jnp.float32, precision=precision
    ) - 0.5 * jnp.dot(
        x * x, inv_cov.T, preferred_element_type=jnp.float32,
        precision=precision,
    )  # (N, K)
    return quad + const[None, :] + jnp.log(gmm.weights)[None, :]


def gmm_posteriors(
    x: jnp.ndarray, gmm: GmmCodebook, precision=None
) -> jnp.ndarray:
    """Posterior responsibilities ``q_nk`` (softmax over components).

    Equivalent to sklearn ``GaussianMixture.predict_proba``
    (reference: fisher_vector.py:99).
    """
    return nn.softmax(gmm_log_prob(x, gmm, precision=precision), axis=-1)
