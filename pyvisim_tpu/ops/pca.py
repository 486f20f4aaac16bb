"""PCA training on TPU.

TPU-native replacement for sklearn ``PCA.fit`` as invoked by the encoders'
``learn()`` (reference: pyvisim/encoders/_base_encoder.py:330-332). Uses an
eigendecomposition of the (D, D) covariance — descriptors stream through a
single X^T X matmul, so the full (N, D) matrix never needs to be resident
for the decomposition itself.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .codebooks import PcaProjector

__all__ = ["pca_fit", "projector_from_moments"]


@jax.jit
def _moments(x: jnp.ndarray, mask: jnp.ndarray):
    n = jnp.maximum(jnp.sum(mask), 1.0)
    xm = x * mask[:, None]
    mean = jnp.sum(xm, axis=0) / n
    xc = (x - mean) * mask[:, None]
    cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32) / jnp.maximum(
        n - 1.0, 1.0
    )
    return mean, cov, n


def pca_fit(
    x: jnp.ndarray,
    n_components: int,
    *,
    mask: jnp.ndarray | None = None,
    whiten: bool = False,
) -> PcaProjector:
    """Fit a PCA projector on descriptors ``x (N, D)`` (optionally masked).

    Returns components sorted by decreasing explained variance, with
    sklearn's ``svd_flip`` sign convention (largest-|loading| coordinate of
    each component made positive) so converted and self-trained projectors
    are comparable.
    """
    x = jnp.asarray(x, jnp.float32)
    if mask is None:
        mask = jnp.ones((x.shape[0],), jnp.float32)
    mean, cov, _ = _moments(x, mask.astype(jnp.float32))
    return projector_from_moments(mean, cov, n_components, whiten=whiten)


def projector_from_moments(
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    n_components: int,
    *,
    whiten: bool = False,
) -> PcaProjector:
    """Build a :class:`PcaProjector` from precomputed first/second moments.

    Shared by :func:`pca_fit` and the mesh-sharded
    :func:`pyvisim_tpu.parallel.distributed_pca_fit`, which psum-reduces
    the (D,) mean and (D, D) covariance over the 'data' axis and then
    decomposes the replicated statistics here.
    """
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    idx = jnp.argsort(-eigvals)[:n_components]
    components = eigvecs[:, idx].T  # (n_components, D)
    explained = jnp.maximum(eigvals[idx], 0.0)
    # svd_flip-style deterministic signs.
    max_abs_idx = jnp.argmax(jnp.abs(components), axis=1)
    signs = jnp.sign(
        components[jnp.arange(components.shape[0]), max_abs_idx]
    )
    signs = jnp.where(signs == 0, 1.0, signs)
    components = components * signs[:, None]
    return PcaProjector(
        mean=mean,
        components=components,
        explained_variance=explained,
        whiten=whiten,
    )
