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


def lloyd_step(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    centers: jnp.ndarray,
    chunk_size: int | None = None,
    use_pallas: bool = False,
):
    """One Lloyd iteration -> (new_centers, inertia).

    Empty clusters keep their previous center (sklearn relocates them to
    far points; for vocabulary learning keeping the center is stable and
    deterministic, and parity is gated on downstream retrieval metrics).

    With ``chunk_size`` the (N, K) distance matrix is consumed blockwise
    under ``lax.scan`` so arbitrarily many descriptors stream through
    without materializing N x K in HBM (the Oxford-scale path: ~12M
    descriptors x K=256). ``use_pallas`` routes the sufficient statistics
    through the fused Pallas kernel (ops/pallas/aggregate.py), which keeps
    each distance block VMEM-resident — the production TPU backend.
    """
    if use_pallas:
        from .pallas import lloyd_stats_pallas

        sums, counts, inertia = lloyd_stats_pallas(
            x, mask, centers, block_n=min(chunk_size or 2048, 2048)
        )
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        return new_centers, inertia

    def block_stats(xb, mb):
        # training path: f32 MXU passes — bf16 inputs lose the
        # ||x||^2 - 2xc + ||c||^2 cancellation for |mean| >> std data
        d2 = pairwise_sqdist(xb, centers, precision=jax.lax.Precision.HIGHEST)
        labels = jnp.argmin(d2, axis=1)
        inertia = jnp.sum(jnp.min(d2, axis=1) * mb)
        one_hot = jax.nn.one_hot(labels, centers.shape[0], dtype=xb.dtype) * mb[:, None]
        counts = jnp.sum(one_hot, axis=0)
        sums = jnp.dot(one_hot.T, xb, preferred_element_type=jnp.float32)
        return sums, counts, inertia

    n = x.shape[0]
    if chunk_size is None or chunk_size >= n:
        sums, counts, inertia = block_stats(x, mask)
    else:
        pad = (-n) % chunk_size
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            mask = jnp.pad(mask, (0, pad))
        xc = x.reshape(-1, chunk_size, x.shape[1])
        mc = mask.reshape(-1, chunk_size)

        def body(carry, xm):
            s, c, i = carry
            bs, bc, bi = block_stats(*xm)
            return (s + bs, c + bc, i + bi), None

        init = (
            jnp.zeros((centers.shape[0], x.shape[1]), jnp.float32),
            jnp.zeros((centers.shape[0],), jnp.float32),
            jnp.float32(0.0),
        )
        (sums, counts, inertia), _ = jax.lax.scan(body, init, (xc, mc))

    new_centers = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
    )
    return new_centers, inertia


@partial(
    jax.jit,
    static_argnames=(
        "n_clusters", "max_iters", "chunk_size", "init_subsample", "use_pallas"
    ),
)
def _kmeans_fit_impl(
    key, x, mask, n_clusters, max_iters, tol, chunk_size, init_subsample, use_pallas
):
    if init_subsample and x.shape[0] > init_subsample:
        # k-means++ is O(N*K); seed from a masked subsample for huge N.
        sub_key, key = jax.random.split(key)
        idx = jax.random.choice(
            sub_key,
            x.shape[0],
            shape=(init_subsample,),
            replace=False,
            p=mask / jnp.maximum(jnp.sum(mask), 1.0),
        )
        centers0 = kmeans_plus_plus_init(
            key, x[idx], n_clusters, jnp.ones((init_subsample,), x.dtype)
        )
    else:
        centers0 = kmeans_plus_plus_init(key, x, n_clusters, mask)

    def cond(state):
        _, shift, it, _ = state
        return jnp.logical_and(it < max_iters, shift > tol)

    def body(state):
        centers, _, it, _ = state
        new_centers, inertia = lloyd_step(x, mask, centers, chunk_size, use_pallas)
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
    chunk_size: int | None = None,
    init_subsample: int = 65536,
    use_pallas: bool | None = None,
):
    """Fit K-Means on descriptors ``x (N, D)``; returns
    ``(KMeansCodebook, inertia)`` of the best of ``n_init`` seedings.

    Defaults mirror sklearn's (max_iter=300); ``tol`` here is an absolute
    squared center shift. For large N a ``chunk_size`` is chosen
    automatically so the per-iteration distance block stays bounded, and
    k-means++ seeding runs on an ``init_subsample`` of the data.
    """
    x = jnp.asarray(x, jnp.float32)
    if mask is None:
        mask = jnp.ones((x.shape[0],), jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    if chunk_size is None and x.shape[0] * n_clusters > 64_000_000:
        chunk_size = 65536
    if use_pallas is None:
        # fused Pallas Lloyd backend on real TPU for large descriptor sets
        use_pallas = jax.default_backend() != "cpu" and x.shape[0] >= 16384

    best = None
    for i in range(n_init):
        key = jax.random.PRNGKey(seed + i)
        centers, inertia, _ = _kmeans_fit_impl(
            key, x, mask, n_clusters, max_iters, jnp.float32(tol),
            chunk_size, init_subsample, use_pallas,
        )
        inertia = float(inertia)
        if best is None or inertia < best[1]:
            best = (centers, inertia)
    return KMeansCodebook(centers=best[0]), best[1]
