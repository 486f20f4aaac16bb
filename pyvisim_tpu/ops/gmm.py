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
    # training path: full-f32 log-prob matmuls (see em_step's s1/s2 note)
    wlp = gmm_log_prob(x, gmm, precision=jax.lax.Precision.HIGHEST)  # (N, K)
    log_norm = jax.scipy.special.logsumexp(wlp, axis=1)  # (N,)
    resp = jnp.exp(wlp - log_norm[:, None]) * mask[:, None]
    mean_ll = jnp.sum(log_norm * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return resp, mean_ll


def em_step(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    gmm: GmmCodebook,
    reg_covar: float,
    chunk_size: int | None = None,
    use_pallas: bool = False,
):
    """One EM iteration -> (new GmmCodebook, mean log-likelihood).

    With ``chunk_size`` the (N, K) responsibility matrix streams blockwise
    under ``lax.scan`` (the Oxford-scale path — millions of descriptors);
    ``use_pallas`` fuses the E-step into the VMEM-resident Pallas kernel
    (ops/pallas/aggregate.py), the production TPU backend."""

    def block_stats(xb, mb):
        resp, _ = _e_step(xb, mb, gmm)
        wlp = gmm_log_prob(xb, gmm, precision=jax.lax.Precision.HIGHEST)
        log_norm = jax.scipy.special.logsumexp(wlp, axis=1)
        s0 = jnp.sum(resp, axis=0)
        # HIGHEST precision: the M-step covariance is s2/nk - mean^2 — a
        # catastrophic cancellation when |mean| >> std that TPU bf16
        # matmul inputs turn into a collapsed (floor) covariance. The
        # training path can afford full-f32 MXU passes.
        s1 = jnp.dot(
            resp.T, xb, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s2 = jnp.dot(
            resp.T, xb * xb, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ll = jnp.sum(log_norm * mb)
        return s0, s1, s2, ll

    n = x.shape[0]
    if use_pallas:
        from .pallas import gmm_em_stats_pallas

        s0, s1, s2, ll = gmm_em_stats_pallas(
            x, mask, gmm.weights, gmm.means, gmm.covariances,
            block_n=min(chunk_size or 2048, 2048),
            precision=jax.lax.Precision.HIGHEST,  # training path
        )
    elif chunk_size is None or chunk_size >= n:
        s0, s1, s2, ll = block_stats(x, mask)
    else:
        pad = (-n) % chunk_size
        if pad:
            x_p = jnp.pad(x, ((0, pad), (0, 0)))
            m_p = jnp.pad(mask, (0, pad))
        else:
            x_p, m_p = x, mask
        xc = x_p.reshape(-1, chunk_size, x.shape[1])
        mc = m_p.reshape(-1, chunk_size)

        def body(carry, xm):
            c0, c1, c2, cl = carry
            b0, b1, b2, bl = block_stats(*xm)
            return (c0 + b0, c1 + b1, c2 + b2, cl + bl), None

        k, d = gmm.means.shape
        init = (
            jnp.zeros((k,), jnp.float32),
            jnp.zeros((k, d), jnp.float32),
            jnp.zeros((k, d), jnp.float32),
            jnp.float32(0.0),
        )
        (s0, s1, s2, ll), _ = jax.lax.scan(body, init, (xc, mc))

    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    mean_ll = ll / n_valid
    nk = s0 + 10.0 * jnp.finfo(s0.dtype).eps  # (K,)
    means = s1 / nk[:, None]
    covs = s2 / nk[:, None] - means**2 + reg_covar
    covs = jnp.maximum(covs, reg_covar)
    weights = nk / n_valid
    weights = weights / jnp.sum(weights)
    return GmmCodebook(weights=weights, means=means, covariances=covs), mean_ll


@partial(jax.jit, static_argnames=("max_iters", "chunk_size", "use_pallas"))
def _gmm_em_impl(x, mask, init_gmm, max_iters, tol, reg_covar, chunk_size, use_pallas):
    def cond(state):
        _, prev_ll, ll, it = state
        return jnp.logical_and(it < max_iters, jnp.abs(ll - prev_ll) > tol)

    def body(state):
        gmm, _, ll, it = state
        new_gmm, new_ll = em_step(x, mask, gmm, reg_covar, chunk_size, use_pallas)
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
    chunk_size: int | None = None,
    use_pallas: bool | None = None,
):
    """Fit a diag-covariance GMM on ``x (N, D)``.

    Initialization follows sklearn's default strategy: a K-Means clustering
    seeds the responsibilities (here: the fitted centers seed the means,
    with cluster-wise moments for weights/covariances). Returns
    ``(GmmCodebook, final mean log-likelihood)``. For large N a
    ``chunk_size`` is chosen automatically so the per-iteration (N, K)
    responsibility block stays bounded.
    """
    x = jnp.asarray(x, jnp.float32)
    if mask is None:
        mask = jnp.ones((x.shape[0],), jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    if chunk_size is None and x.shape[0] * n_components > 64_000_000:
        chunk_size = 65536
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu" and x.shape[0] >= 16384

    km, _ = kmeans_fit(
        x, n_components, mask=mask, max_iters=kmeans_iters, seed=seed,
        chunk_size=chunk_size, use_pallas=use_pallas,
    )
    init = _init_from_kmeans(x, mask, km, reg_covar)
    gmm, ll, _ = _gmm_em_impl(
        x, mask, init, max_iters, jnp.float32(tol), jnp.float32(reg_covar),
        chunk_size, use_pallas,
    )
    return gmm, float(ll)


@jax.jit
def _init_from_kmeans(x, mask, km: KMeansCodebook, reg_covar):
    from .assign import pairwise_sqdist

    labels = jnp.argmin(
        pairwise_sqdist(x, km.centers, precision=jax.lax.Precision.HIGHEST),
        axis=1,
    )
    one_hot = jax.nn.one_hot(labels, km.n_clusters, dtype=x.dtype) * mask[:, None]
    nk = jnp.sum(one_hot, axis=0) + 10.0 * jnp.finfo(x.dtype).eps
    means = jnp.dot(
        one_hot.T, x, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / nk[:, None]
    sq = jnp.dot(
        one_hot.T, x * x, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / nk[:, None]
    covs = jnp.maximum(sq - means**2, reg_covar) + reg_covar
    weights = nk / jnp.maximum(jnp.sum(mask), 1.0)
    weights = weights / jnp.sum(weights)
    return GmmCodebook(weights=weights, means=means, covariances=covs)
