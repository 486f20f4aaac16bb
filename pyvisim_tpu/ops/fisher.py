"""Fisher Vector encoding core.

TPU-native redesign of the reference's FisherVectorEncoder.encode
(reference: pyvisim/encoders/fisher_vector.py:83-135). The GMM posterior
computation is a diag-Gaussian log-pdf in matmul form (see ops/assign.py),
and the three sufficient statistics are MXU matmuls of the (N, K)
posterior block against the descriptors.

Semantics replicated exactly (parity-tested against the reference formulas):
  * ``pp_sum``  = mean over N of posteriors                  (fisher_vector.py:102)
  * ``pp_x``    = q^T x / N, ``pp_x_2`` = q^T x^2 / N        (:103-104)
  * ``d_pi``    = pp_sum - w                                 (:107)
  * ``d_mu``    = pp_x - pp_sum * mu                         (:109)
  * ``d_sigma`` = -pp_x_2 - pp_sum*mu^2 + pp_sum*cov + 2*pp_x*mu   (:111-114)
    NOTE: this is the reference's **sign-flipped** variant of the textbook
    gradient; cosine similarity is sign-invariant but parity testing is not,
    so we keep it bit-for-bit.
  * Fisher-information diagonal normalization by sqrt(w), sqrt(w)*sqrt(cov),
    sqrt(2w)*cov                                             (:117-120)
  * concat order [d_pi, d_mu.ravel(), d_sigma.ravel()]       (:123)
  * signed power norm (default 0.5) + global L_p norm + eps  (:127-129)

Output dim: ``2*K*D + K``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .assign import gmm_posteriors
from .codebooks import GmmCodebook
from .norms import lp_normalize, power_normalize

__all__ = ["fisher_stats", "fisher_encode", "fisher_encode_batch"]


def fisher_stats(
    desc: jnp.ndarray,
    mask: jnp.ndarray | None,
    gmm: GmmCodebook,
    *,
    chunk_size: int | None = None,
):
    """Sufficient statistics ``(pp_sum (K,), pp_x (K, D), pp_x_2 (K, D))``.

    All three are normalized by the number of *valid* descriptors N,
    matching the reference's division by ``num_descriptors``
    (fisher_vector.py:96, 102-104). Invalid (masked) rows contribute zero
    posterior mass.

    ``chunk_size`` enables a ``lax.scan`` over descriptor chunks so the
    (N, K) posterior matrix stays block-resident in VMEM for large N.
    """
    n = desc.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=desc.dtype)
    else:
        mask = mask.astype(desc.dtype)

    def block_stats(d, m):
        q = gmm_posteriors(d, gmm) * m[:, None]  # (n_b, K)
        s0 = jnp.sum(q, axis=0)  # (K,)
        s1 = jnp.dot(q.T, d, preferred_element_type=jnp.float32)  # (K, D)
        s2 = jnp.dot(q.T, d * d, preferred_element_type=jnp.float32)  # (K, D)
        return s0, s1, s2

    if chunk_size is None or chunk_size >= n:
        s0, s1, s2 = block_stats(desc, mask)
    else:
        pad = (-n) % chunk_size
        if pad:
            desc = jnp.pad(desc, ((0, pad), (0, 0)))
            mask = jnp.pad(mask, (0, pad))
        n_chunks = desc.shape[0] // chunk_size
        desc_c = desc.reshape(n_chunks, chunk_size, desc.shape[1])
        mask_c = mask.reshape(n_chunks, chunk_size)

        def body(carry, dm):
            c0, c1, c2 = carry
            b0, b1, b2 = block_stats(*dm)
            return (c0 + b0, c1 + b1, c2 + b2), None

        k, d_dim = gmm.means.shape
        init = (
            jnp.zeros((k,), jnp.float32),
            jnp.zeros((k, d_dim), jnp.float32),
            jnp.zeros((k, d_dim), jnp.float32),
        )
        (s0, s1, s2), _ = jax.lax.scan(body, init, (desc_c, mask_c))

    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    return s0 / n_valid, s1 / n_valid, s2 / n_valid


def fisher_encode(
    desc: jnp.ndarray,
    mask: jnp.ndarray | None,
    gmm: GmmCodebook,
    *,
    power_norm_weight: float = 0.5,
    norm_order: float = 2.0,
    epsilon: float = 1e-9,
    flatten: bool = True,
    chunk_size: int | None = None,
) -> jnp.ndarray:
    """Full Fisher Vector encoding of one descriptor set -> ``(2*K*D + K,)``.

    Defaults mirror the reference's FisherVectorEncoder (power 0.5, L2,
    eps 1e-9; fisher_vector.py:46-48). ``flatten=False`` returns shape
    ``(1, 2*K*D + K)``, matching the reference's un-flattened row vector
    (fisher_vector.py:124, 131-132).
    """
    w, mu, cov = gmm.weights, gmm.means, gmm.covariances
    pp_sum, pp_x, pp_x_2 = fisher_stats(desc, mask, gmm, chunk_size=chunk_size)

    d_pi = pp_sum - w
    d_mu = pp_x - pp_sum[:, None] * mu
    d_sigma = (
        -pp_x_2 - pp_sum[:, None] * mu**2 + pp_sum[:, None] * cov + 2.0 * pp_x * mu
    )

    sqrt_w = jnp.sqrt(w)
    d_pi = d_pi / sqrt_w
    d_mu = d_mu / (sqrt_w[:, None] * jnp.sqrt(cov))
    d_sigma = d_sigma / (jnp.sqrt(2.0) * sqrt_w[:, None] * cov)

    v = jnp.concatenate([d_pi, d_mu.reshape(-1), d_sigma.reshape(-1)])
    v = power_normalize(v, power_norm_weight)
    v = lp_normalize(v, ord=norm_order, axis=-1, epsilon=epsilon)
    return v if flatten else v[None, :]


def fisher_encode_batch(
    desc: jnp.ndarray,
    mask: jnp.ndarray | None,
    gmm: GmmCodebook,
    **kwargs,
) -> jnp.ndarray:
    """vmapped Fisher Vector over a batch: ``desc (B, N, D)`` -> ``(B, 2KD+K)``."""
    if mask is None:
        mask = jnp.ones(desc.shape[:2], dtype=desc.dtype)
    kwargs.setdefault("flatten", True)
    return jax.vmap(lambda d, m: fisher_encode(d, m, gmm, **kwargs))(desc, mask)
