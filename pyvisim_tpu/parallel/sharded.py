"""Sharded (multi-chip) compute paths: encode, similarity, vocabulary
training.

Two styles are used deliberately:

* **GSPMD** (``jax.jit`` + ``NamedSharding`` annotations): the encode and
  similarity paths — XLA derives the collectives.
* **Explicit ``shard_map`` + ``psum``**: the vocabulary-training sufficient
  statistics — the collective pattern (per-device partial (K, D) stats,
  psum over the data axis) is the load-bearing design and is stated
  explicitly.

This is the TPU-native replacement for what the reference simply does not
have (serial loops, no backend; SURVEY.md §2 parallelism table).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.assign import pairwise_sqdist
from ..ops.codebooks import GmmCodebook, KMeansCodebook
from ..ops.gmm import _init_from_kmeans, gmm_log_prob
from .mesh import data_sharding, replicated

__all__ = [
    "pad_to_multiple",
    "sharded_cosine_similarity",
    "sharded_encode",
    "distributed_kmeans_fit",
    "distributed_gmm_fit",
]


def pad_to_multiple(arr, multiple: int, axis: int = 0, pad_value=0):
    """Pad ``axis`` up to a multiple (sharding needs divisible sizes).
    Returns (padded, original_size)."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=pad_value), n


def sharded_cosine_similarity(
    x: jnp.ndarray, y: jnp.ndarray, mesh: Mesh
) -> jnp.ndarray:
    """All-pairs cosine similarity with query rows sharded over 'data'.

    Each device holds Q/devices query rows and the full (replicated)
    gallery — the matmul is embarrassingly parallel over ICI-free rows;
    the output stays row-sharded until gathered by the caller.
    """
    from ..ops.similarity import cosine_similarity_matrix

    xq, n = pad_to_multiple(x, mesh.shape["data"])
    # re-shard inputs if they arrive with a different placement (e.g. a
    # data-sharded gallery from sharded_encode)
    xq = jax.device_put(xq, data_sharding(mesh, 2))
    y = jax.device_put(y, replicated(mesh))
    fn = jax.jit(
        cosine_similarity_matrix,
        in_shardings=(data_sharding(mesh, 2), replicated(mesh)),
        out_shardings=data_sharding(mesh, 2),
    )
    return fn(xq, y)[:n]


def sharded_encode(encode_fn, desc, mask, clustering_model, pca, mesh: Mesh):
    """Run a batched encode core with the image batch sharded over 'data'
    and the codebook replicated. ``encode_fn(desc, mask, model, pca)``."""
    d, b = pad_to_multiple(jnp.asarray(desc), mesh.shape["data"])
    m, _ = pad_to_multiple(jnp.asarray(mask), mesh.shape["data"])
    fn = jax.jit(
        encode_fn,
        in_shardings=(
            data_sharding(mesh, d.ndim),
            data_sharding(mesh, m.ndim),
            replicated(mesh),
            replicated(mesh),
        ),
        out_shardings=data_sharding(mesh, 2),
    )
    return fn(d, m, clustering_model, pca)[:b]


# ---------------------------------------------------------------------------
# Distributed vocabulary training: explicit psum-reduced sufficient stats
# ---------------------------------------------------------------------------
def _lloyd_stats_local(x, mask, centers):
    """Per-shard Lloyd sufficient statistics, psum-reduced over 'data'."""
    d2 = pairwise_sqdist(x, centers)
    labels = jnp.argmin(d2, axis=1)
    one_hot = jax.nn.one_hot(labels, centers.shape[0], dtype=x.dtype) * mask[:, None]
    sums = jnp.dot(one_hot.T, x, preferred_element_type=jnp.float32)
    counts = jnp.sum(one_hot, axis=0)
    inertia = jnp.sum(jnp.min(d2, axis=1) * mask)
    sums = jax.lax.psum(sums, "data")
    counts = jax.lax.psum(counts, "data")
    inertia = jax.lax.psum(inertia, "data")
    return sums, counts, inertia


def distributed_kmeans_fit(
    x: jnp.ndarray,
    n_clusters: int,
    mesh: Mesh,
    *,
    mask: jnp.ndarray | None = None,
    n_iters: int = 50,
    seed: int = 0,
) -> tuple[KMeansCodebook, float]:
    """K-Means with descriptor rows sharded over the mesh's 'data' axis.

    Each device computes (K, D) partial sums/counts for its shard of the
    descriptors; a ``psum`` over 'data' produces the global M-step. Centers
    are replicated. This is the scaling path for vocabularies learned from
    millions of descriptors (reference equivalent: the all-in-RAM
    ``np.vstack`` + sklearn fit at _base_encoder.py:320-341).
    """
    x = jnp.asarray(x, jnp.float32)
    if mask is None:
        mask = jnp.ones((x.shape[0],), jnp.float32)
    n_dev = mesh.shape["data"]
    x, _ = pad_to_multiple(x, n_dev)
    mask, _ = pad_to_multiple(jnp.asarray(mask, jnp.float32), n_dev)

    # Seed centers host-side from a subsample (cheap, deterministic).
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(
        key, x.shape[0], shape=(min(4096, x.shape[0]),), replace=False,
        p=mask / jnp.sum(mask),
    )
    from ..ops.kmeans import kmeans_plus_plus_init

    centers0 = kmeans_plus_plus_init(
        key, x[idx], n_clusters, jnp.ones((idx.shape[0],), jnp.float32)
    )

    stats = shard_map(
        _lloyd_stats_local,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P()),
        out_specs=(P(), P(), P()),
    )

    @jax.jit
    def run(centers):
        def body(_, carry):
            centers, _ = carry
            sums, counts, inertia = stats(x, mask, centers)
            new_centers = jnp.where(
                counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
            )
            return new_centers, inertia

        return jax.lax.fori_loop(0, n_iters, body, (centers, jnp.float32(0.0)))

    centers, inertia = run(centers0)
    return KMeansCodebook(centers=centers), float(inertia)


def _gmm_stats_local(x, mask, gmm: GmmCodebook):
    """Per-shard EM sufficient statistics, psum-reduced over 'data'."""
    wlp = gmm_log_prob(x, gmm)
    log_norm = jax.scipy.special.logsumexp(wlp, axis=1)
    resp = jnp.exp(wlp - log_norm[:, None]) * mask[:, None]
    s0 = jax.lax.psum(jnp.sum(resp, axis=0), "data")
    s1 = jax.lax.psum(
        jnp.dot(resp.T, x, preferred_element_type=jnp.float32), "data"
    )
    s2 = jax.lax.psum(
        jnp.dot(resp.T, x * x, preferred_element_type=jnp.float32), "data"
    )
    ll = jax.lax.psum(jnp.sum(log_norm * mask), "data")
    n = jax.lax.psum(jnp.sum(mask), "data")
    return s0, s1, s2, ll, n


def distributed_gmm_fit(
    x: jnp.ndarray,
    n_components: int,
    mesh: Mesh,
    *,
    mask: jnp.ndarray | None = None,
    n_iters: int = 50,
    reg_covar: float = 1e-6,
    seed: int = 0,
) -> tuple[GmmCodebook, float]:
    """Diag-GMM EM with descriptor rows sharded over 'data' (psum-reduced
    E/M statistics); the (K, D) mixture state is replicated."""
    x = jnp.asarray(x, jnp.float32)
    if mask is None:
        mask = jnp.ones((x.shape[0],), jnp.float32)
    n_dev = mesh.shape["data"]
    x, _ = pad_to_multiple(x, n_dev)
    mask, _ = pad_to_multiple(jnp.asarray(mask, jnp.float32), n_dev)

    km, _ = distributed_kmeans_fit(
        x, n_components, mesh, mask=mask, n_iters=10, seed=seed
    )
    init = _init_from_kmeans(x, mask, km, jnp.float32(reg_covar))

    stats = shard_map(
        _gmm_stats_local,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P()),
        out_specs=(P(), P(), P(), P(), P()),
    )

    @jax.jit
    def run(gmm):
        def body(_, carry):
            gmm, _ = carry
            s0, s1, s2, ll, n = stats(x, mask, gmm)
            nk = s0 + 10.0 * jnp.finfo(jnp.float32).eps
            means = s1 / nk[:, None]
            covs = jnp.maximum(s2 / nk[:, None] - means**2 + reg_covar, reg_covar)
            weights = nk / jnp.maximum(n, 1.0)
            weights = weights / jnp.sum(weights)
            return (
                GmmCodebook(weights=weights, means=means, covariances=covs),
                ll / jnp.maximum(n, 1.0),
            )

        return jax.lax.fori_loop(0, n_iters, body, (gmm, jnp.float32(-jnp.inf)))

    gmm, ll = run(init)
    return gmm, float(ll)
