"""Spectral clustering on TPU.

TPU-native replacement for sklearn
``SpectralClustering(affinity='nearest_neighbors')`` as used by the
reference's clustering evaluation (reference: pyvisim/_utils.py:155-160):
kNN connectivity graph (dense (N, N) affinity via ``lax.top_k``),
symmetrically-normalized Laplacian, ``eigh`` embedding with the
diffusion-map D^{-1/2} rescaling sklearn applies, then on-TPU K-Means on
the embedding. Eval-sized N (thousands) keeps the dense eigensolve cheap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .kmeans import kmeans_fit
from .assign import nearest_centroid, pairwise_sqdist

__all__ = ["spectral_embedding", "spectral_cluster", "knn_affinity"]


@partial(jax.jit, static_argnames=("n_neighbors",))
def knn_affinity(x: jnp.ndarray, n_neighbors: int = 10) -> jnp.ndarray:
    """Symmetrized kNN connectivity matrix (N, N) (0.5 * (A + A^T)),
    matching sklearn's nearest-neighbors affinity construction."""
    d2 = pairwise_sqdist(x, x)
    n = x.shape[0]
    # self is always the nearest; take n_neighbors + 1 and drop self.
    _, idx = jax.lax.top_k(-d2, n_neighbors + 1)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], idx.shape)
    a = jnp.zeros((n, n), x.dtype).at[rows.reshape(-1), idx.reshape(-1)].set(1.0)
    a = a.at[jnp.arange(n), jnp.arange(n)].set(1.0)
    return 0.5 * (a + a.T)


@partial(jax.jit, static_argnames=("n_components", "n_neighbors"))
def spectral_embedding(
    x: jnp.ndarray, n_components: int, n_neighbors: int = 10
) -> jnp.ndarray:
    """(N, n_components) spectral embedding from the normalized Laplacian."""
    w = knn_affinity(x, n_neighbors)
    deg = jnp.sum(w, axis=1)
    d_inv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
    l_sym = -(w * d_inv_sqrt[:, None] * d_inv_sqrt[None, :])
    l_sym = l_sym.at[jnp.arange(w.shape[0]), jnp.arange(w.shape[0])].add(1.0)
    eigvals, eigvecs = jnp.linalg.eigh(l_sym)  # ascending
    emb = eigvecs[:, :n_components]
    # sklearn's spectral_embedding recovers u = v / dd (diffusion scaling).
    emb = emb * d_inv_sqrt[:, None]
    # deterministic sign flip (largest-|value| coordinate positive).
    max_abs = jnp.argmax(jnp.abs(emb), axis=0)
    signs = jnp.sign(emb[max_abs, jnp.arange(n_components)])
    return emb * jnp.where(signs == 0, 1.0, signs)[None, :]


def spectral_cluster(
    x: jnp.ndarray,
    n_clusters: int,
    *,
    n_neighbors: int = 10,
    seed: int = 42,
    n_init: int = 3,
) -> jnp.ndarray:
    """Cluster rows of ``x (N, D)`` -> integer labels ``(N,)``."""
    emb = spectral_embedding(jnp.asarray(x, jnp.float32), n_clusters, n_neighbors)
    cb, _ = kmeans_fit(emb, n_clusters, seed=seed, n_init=n_init)
    return nearest_centroid(emb, cb.centers)
