"""Diagonal-covariance GMM training on TPU (jit-compiled EM).

TPU-native replacement for sklearn ``GaussianMixture(covariance_type='diag').fit``
as invoked by the encoders' ``learn()``
(reference: pyvisim/encoders/_base_encoder.py:335-341). Numerically stable
log-space E-step (logsumexp), matmul-form M-step sufficient statistics, and
a covariance floor (``reg_covar``) matching sklearn's default.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .assign import gmm_log_prob
from .codebooks import GmmCodebook, KMeansCodebook
from .kmeans import kmeans_fit

__all__ = ["gmm_fit", "em_step"]


def _e_step(x: jnp.ndarray, mask: jnp.ndarray, gmm: GmmCodebook):
    """Responsibilities and per-sample log likelihood (masked)."""
    wlp = gmm_log_prob(x, gmm)  # (N, K)
    log_norm = jax.scipy.special.logsumexp(wlp, axis=1)  # (N,)
    resp = jnp.exp(wlp - log_norm[:, None]) * mask[:, None]
    mean_ll = jnp.sum(log_norm * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return resp, mean_ll


def em_step(x: jnp.ndarray, mask: jnp.ndarray, gmm: GmmCodebook, reg_covar: float):
    """One EM iteration -> (new GmmCodebook, mean log-likelihood)."""
    resp, mean_ll = _e_step(x, mask, gmm)
    nk = jnp.sum(resp, axis=0) + 10.0 * jnp.finfo(resp.dtype).eps  # (K,)
    sums = jnp.dot(resp.T, x, preferred_element_type=jnp.float32)  # (K, D)
    means = sums / nk[:, None]
    sq = jnp.dot(resp.T, x * x, preferred_element_type=jnp.float32)  # (K, D)
    covs = sq / nk[:, None] - means**2 + reg_covar
    covs = jnp.maximum(covs, reg_covar)
    weights = nk / jnp.maximum(jnp.sum(mask), 1.0)
    weights = weights / jnp.sum(weights)
    return GmmCodebook(weights=weights, means=means, covariances=covs), mean_ll


@partial(jax.jit, static_argnames=("max_iters",))
def _gmm_em_impl(x, mask, init_gmm, max_iters, tol, reg_covar):
    def cond(state):
        _, prev_ll, ll, it = state
        return jnp.logical_and(it < max_iters, jnp.abs(ll - prev_ll) > tol)

    def body(state):
        gmm, _, ll, it = state
        new_gmm, new_ll = em_step(x, mask, gmm, reg_covar)
        return new_gmm, ll, new_ll, it + 1

    init_state = (init_gmm, jnp.float32(-jnp.inf), jnp.float32(jnp.inf), 0)
    gmm, _, ll, n_iter = jax.lax.while_loop(cond, body, init_state)
    return gmm, ll, n_iter


def gmm_fit(
    x: jnp.ndarray,
    n_components: int,
    *,
    mask: jnp.ndarray | None = None,
    max_iters: int = 100,
    tol: float = 1e-3,
    reg_covar: float = 1e-6,
    seed: int = 0,
    kmeans_iters: int = 25,
):
    """Fit a diag-covariance GMM on ``x (N, D)``.

    Initialization follows sklearn's default strategy: a K-Means clustering
    seeds the responsibilities (here: the fitted centers seed the means,
    with cluster-wise moments for weights/covariances). Returns
    ``(GmmCodebook, final mean log-likelihood)``.
    """
    x = jnp.asarray(x, jnp.float32)
    if mask is None:
        mask = jnp.ones((x.shape[0],), jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)

    km, _ = kmeans_fit(
        x, n_components, mask=mask, max_iters=kmeans_iters, seed=seed
    )
    init = _init_from_kmeans(x, mask, km, reg_covar)
    gmm, ll, _ = _gmm_em_impl(
        x, mask, init, max_iters, jnp.float32(tol), jnp.float32(reg_covar)
    )
    return gmm, float(ll)


@jax.jit
def _init_from_kmeans(x, mask, km: KMeansCodebook, reg_covar):
    from .assign import pairwise_sqdist

    labels = jnp.argmin(pairwise_sqdist(x, km.centers), axis=1)
    one_hot = jax.nn.one_hot(labels, km.n_clusters, dtype=x.dtype) * mask[:, None]
    nk = jnp.sum(one_hot, axis=0) + 10.0 * jnp.finfo(x.dtype).eps
    means = jnp.dot(one_hot.T, x, preferred_element_type=jnp.float32) / nk[:, None]
    sq = jnp.dot(one_hot.T, x * x, preferred_element_type=jnp.float32) / nk[:, None]
    covs = jnp.maximum(sq - means**2, reg_covar) + reg_covar
    weights = nk / jnp.maximum(jnp.sum(mask), 1.0)
    weights = weights / jnp.sum(weights)
    return GmmCodebook(weights=weights, means=means, covariances=covs)
