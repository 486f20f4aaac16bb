"""Similarity kernels.

TPU-native replacement for the reference's sklearn-BLAS cosine similarity
(reference: pyvisim/_utils.py:312-330): an L2-normalize fused into a single
MXU matmul. The sharded multi-chip variant lives in
``pyvisim_tpu/parallel/``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cosine_similarity_matrix", "pairwise_euclidean",
           "pad_rows_for_mxu"]


def pad_rows_for_mxu(x: jnp.ndarray, min_rows: int = 8):
    """Zero-pad a tiny row set to ``min_rows`` so a (rows, D) x (D, N)
    gallery scan fills the 8-sublane MXU tile; returns ``(padded, n0)``
    with ``n0`` the original row count to slice back. Measured on a
    6,149 x 131,584 f32 gallery: 4.25 -> 2.4 ms/scan at 1 row vs 8
    (the tile under-fill reads the gallery ~1.8x slower). Shared by
    :func:`cosine_similarity_matrix` and the serving index's exact f32
    scan (``pyvisim_tpu.index``) so the tile heuristic is tuned in ONE
    place."""
    n = x.shape[0]
    if n >= min_rows:
        return x, n
    pad = jnp.zeros((min_rows - n,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad]), n


def _l2_normalize_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Row L2 normalize; zero rows stay zero (sklearn ``normalize`` puts 1 in
    the denominator for zero-norm rows, which our parity layer relies on)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.where(norm == 0.0, 1.0, norm)


@jax.jit
def cosine_similarity_matrix(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity matrix ``(N, M)`` between row sets ``x (N, D)`` and
    ``y (M, D)``.

    Matches sklearn ``cosine_similarity`` semantics as used at reference
    pyvisim/_utils.py:330 (zero vectors yield similarity 0, not NaN).

    A (N<8, D) x (D, M) scan over a large gallery under-fills the
    8-sublane MXU tile and reads the gallery ~1.8x slower (measured
    4.25 -> 2.4 ms/scan at N=1 vs N=8 on a 6149 x 131584 f32 gallery),
    so tiny row sets are zero-padded to 8 rows for the matmul and sliced
    back — zero rows stay zero under the normalize and cost nothing.
    """
    xn = _l2_normalize_rows(x.astype(jnp.float32))
    yn = _l2_normalize_rows(y.astype(jnp.float32))
    xn, n = pad_rows_for_mxu(xn)
    out = jnp.dot(xn, yn.T, preferred_element_type=jnp.float32)
    return out[:n]


@jax.jit
def pairwise_euclidean(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix ``(N, M)`` in matmul form (clamped at 0)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1)
    sq = x2 - 2.0 * jnp.dot(x, y.T, preferred_element_type=jnp.float32) + y2[None, :]
    return jnp.sqrt(jnp.maximum(sq, 0.0))
