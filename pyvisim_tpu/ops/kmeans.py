"""K-Means training on TPU (jit-compiled Lloyd iterations + k-means++ init).

TPU-native replacement for sklearn ``KMeans.fit`` as invoked by the
encoders' ``learn()`` (reference: pyvisim/encoders/_base_encoder.py:333-341).
The E-step is an MXU distance matmul + argmin; the M-step is a one-hot
matmul (segment sum). Runs a fixed number of iterations under
``lax.while_loop`` with a center-shift tolerance, entirely on device.

The distributed (multi-chip) variant with ``psum``-reduced sufficient
statistics lives in pyvisim_tpu/parallel/.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .assign import pairwise_sqdist
from .codebooks import KMeansCodebook

__all__ = ["kmeans_fit", "kmeans_plus_plus_init", "lloyd_step"]


def kmeans_plus_plus_init(
    key: jax.Array, x: jnp.ndarray, n_clusters: int, mask: jnp.ndarray
) -> jnp.ndarray:
    """k-means++ seeding: iteratively sample centers ~ D^2 distribution.

    Invalid (masked) rows get zero sampling probability.
    """
    n = x.shape[0]
    neg_inf = jnp.float32(-jnp.inf)

    k0, key = jax.random.split(key)
    logits0 = jnp.where(mask > 0, 0.0, neg_inf)
    first = x[jax.random.categorical(k0, logits0)]

    def body(carry, k_key):
        centers, d2 = carry
        i, kk = k_key
        logits = jnp.where(mask > 0, jnp.log(jnp.maximum(d2, 1e-30)), neg_inf)
        idx = jax.random.categorical(kk, logits)
        c = x[idx]
        centers = centers.at[i].set(c)
        new_d2 = jnp.sum((x - c) ** 2, axis=1)
        return (centers, jnp.minimum(d2, new_d2)), None

    centers = jnp.zeros((n_clusters, x.shape[1]), x.dtype).at[0].set(first)
    d2 = jnp.sum((x - first) ** 2, axis=1)
    keys = jax.random.split(key, n_clusters - 1)
    (centers, _), _ = jax.lax.scan(
        body, (centers, d2), (jnp.arange(1, n_clusters), keys)
    )
    return centers


def lloyd_step(x: jnp.ndarray, mask: jnp.ndarray, centers: jnp.ndarray):
    """One Lloyd iteration -> (new_centers, inertia).

    Empty clusters keep their previous center (sklearn relocates them to
    far points; for vocabulary learning keeping the center is stable and
    deterministic, and parity is gated on downstream retrieval metrics).
    """
    d2 = pairwise_sqdist(x, centers)
    labels = jnp.argmin(d2, axis=1)
    inertia = jnp.sum(jnp.min(d2, axis=1) * mask)
    one_hot = jax.nn.one_hot(labels, centers.shape[0], dtype=x.dtype) * mask[:, None]
    counts = jnp.sum(one_hot, axis=0)
    sums = jnp.dot(one_hot.T, x, preferred_element_type=jnp.float32)
    new_centers = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
    )
    return new_centers, inertia


@partial(jax.jit, static_argnames=("n_clusters", "max_iters"))
def _kmeans_fit_impl(key, x, mask, n_clusters, max_iters, tol):
    centers0 = kmeans_plus_plus_init(key, x, n_clusters, mask)

    def cond(state):
        _, shift, it, _ = state
        return jnp.logical_and(it < max_iters, shift > tol)

    def body(state):
        centers, _, it, _ = state
        new_centers, inertia = lloyd_step(x, mask, centers)
        shift = jnp.sum((new_centers - centers) ** 2)
        return new_centers, shift, it + 1, inertia

    centers, _, n_iter, inertia = jax.lax.while_loop(
        cond, body, (centers0, jnp.float32(jnp.inf), 0, jnp.float32(0.0))
    )
    return centers, inertia, n_iter


def kmeans_fit(
    x: jnp.ndarray,
    n_clusters: int,
    *,
    mask: jnp.ndarray | None = None,
    max_iters: int = 300,
    tol: float = 1e-6,
    seed: int = 0,
    n_init: int = 1,
):
    """Fit K-Means on descriptors ``x (N, D)``; returns
    ``(KMeansCodebook, inertia)`` of the best of ``n_init`` seedings.

    Defaults mirror sklearn's (max_iter=300); ``tol`` here is an absolute
    squared center shift.
    """
    x = jnp.asarray(x, jnp.float32)
    if mask is None:
        mask = jnp.ones((x.shape[0],), jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)

    best = None
    for i in range(n_init):
        key = jax.random.PRNGKey(seed + i)
        centers, inertia, _ = _kmeans_fit_impl(
            key, x, mask, n_clusters, max_iters, jnp.float32(tol)
        )
        inertia = float(inertia)
        if best is None or inertia < best[1]:
            best = (centers, inertia)
    return KMeansCodebook(centers=best[0]), best[1]
