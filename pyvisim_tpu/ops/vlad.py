"""VLAD encoding core (Vector of Locally Aggregated Descriptors).

TPU-native redesign of the reference's per-descriptor Python scatter-add loop
(reference: pyvisim/encoders/vlad.py:95-111): the hard assignment becomes an
argmin over an MXU distance matmul, and the residual aggregation becomes a
one-hot (K, N) x (N, D) matmul — no scatter, no data-dependent shapes.

Semantics replicated exactly (parity-tested):
  * residual accumulation ``sum_{n in cluster k} (x_n - c_k)``  (vlad.py:102-104)
  * signed power norm, default weight 1.0                        (vlad.py:106)
  * **per-row** (intra) L_p normalization with additive epsilon  (vlad.py:107-108)
  * optional flatten to (K*D,)                                   (vlad.py:110-111)
  * zero descriptors -> zero vector (the reference's early-return
    at vlad.py:92-93 crashes on an empty array; here the masked
    aggregation naturally yields the intended all-zeros encoding)

Descriptor sets are fixed-budget ``(N_max, D)`` arrays with a boolean/float
validity mask so everything jits with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .assign import pairwise_sqdist
from .norms import lp_normalize, power_normalize

__all__ = ["vlad_aggregate", "vlad_encode", "vlad_encode_batch"]


def _masked_one_hot_assign(desc: jnp.ndarray, mask: jnp.ndarray, centers: jnp.ndarray):
    """One-hot hard assignment (N, K) with invalid rows zeroed out."""
    labels = jnp.argmin(pairwise_sqdist(desc, centers), axis=-1)
    one_hot = jax.nn.one_hot(labels, centers.shape[0], dtype=desc.dtype)
    return one_hot * mask[:, None]


def vlad_aggregate(
    desc: jnp.ndarray,
    mask: jnp.ndarray | None,
    centers: jnp.ndarray,
    *,
    chunk_size: int | None = None,
) -> jnp.ndarray:
    """Unnormalized VLAD matrix ``(K, D)`` of summed residuals.

    Computes ``V[k] = sum_{n: a_n = k} (x_n - c_k)`` as
    ``A^T @ X - counts[:, None] * C`` where ``A`` is the masked one-hot
    assignment — two MXU matmuls instead of the reference's per-descriptor
    Python loop (vlad.py:102-104).

    ``chunk_size`` switches to a ``lax.scan`` over descriptor chunks so the
    (N, K) assignment matrix never materializes for very large N (the
    long-descriptor-set analog of blockwise attention).
    """
    n = desc.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=desc.dtype)
    else:
        mask = mask.astype(desc.dtype)

    def block_stats(d, m):
        a = _masked_one_hot_assign(d, m, centers)  # (n_b, K)
        sums = jnp.dot(a.T, d, preferred_element_type=jnp.float32)  # (K, D)
        counts = jnp.sum(a, axis=0)  # (K,)
        return sums, counts

    if chunk_size is None or chunk_size >= n:
        sums, counts = block_stats(desc, mask)
    else:
        pad = (-n) % chunk_size
        if pad:
            desc = jnp.pad(desc, ((0, pad), (0, 0)))
            mask = jnp.pad(mask, (0, pad))
        n_chunks = desc.shape[0] // chunk_size
        desc_c = desc.reshape(n_chunks, chunk_size, desc.shape[1])
        mask_c = mask.reshape(n_chunks, chunk_size)

        def body(carry, dm):
            s, c = carry
            d, m = dm
            bs, bc = block_stats(d, m)
            return (s + bs, c + bc), None

        init = (
            jnp.zeros((centers.shape[0], desc.shape[1]), jnp.float32),
            jnp.zeros((centers.shape[0],), jnp.float32),
        )
        (sums, counts), _ = jax.lax.scan(body, init, (desc_c, mask_c))

    return sums - counts[:, None] * centers


def vlad_encode(
    desc: jnp.ndarray,
    mask: jnp.ndarray | None,
    centers: jnp.ndarray,
    *,
    power_norm_weight: float = 1.0,
    norm_order: float = 2.0,
    epsilon: float = 1e-9,
    flatten: bool = True,
    chunk_size: int | None = None,
) -> jnp.ndarray:
    """Full VLAD encoding of one descriptor set.

    Returns ``(K*D,)`` if ``flatten`` else ``(K, D)``. Defaults mirror the
    reference's VLADEncoder (power 1.0, L2, eps 1e-9; vlad.py:48-51).
    """
    v = vlad_aggregate(desc, mask, centers, chunk_size=chunk_size)
    v = power_normalize(v, power_norm_weight)
    v = lp_normalize(v, ord=norm_order, axis=-1, epsilon=epsilon)
    return v.reshape(-1) if flatten else v


def vlad_encode_batch(
    desc: jnp.ndarray,
    mask: jnp.ndarray | None,
    centers: jnp.ndarray,
    **kwargs,
) -> jnp.ndarray:
    """vmapped VLAD over a batch: ``desc (B, N, D)``, ``mask (B, N)`` ->
    ``(B, K*D)`` (or ``(B, K, D)`` when ``flatten=False``)."""
    if mask is None:
        mask = jnp.ones(desc.shape[:2], dtype=desc.dtype)
    return jax.vmap(lambda d, m: vlad_encode(d, m, centers, **kwargs))(desc, mask)
