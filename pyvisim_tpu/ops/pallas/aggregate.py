"""Fused descriptor-aggregation Pallas kernels.

The VLAD/FV hot loop consumes an (N, K) assignment/posterior block per
descriptor chunk. The XLA path (ops/vlad.py, ops/fisher.py) materializes
that block in HBM for large N; these kernels keep it VMEM-resident: each
grid step streams one descriptor chunk into VMEM, computes the (chunk, K)
distances/posteriors on the MXU, and accumulates the (K, D) sufficient
statistics in the output buffers — descriptors are read once and the
(N, K) intermediate never touches HBM.

Used automatically by the encode cores for large descriptor sets; the
pure-XLA path remains the reference implementation and both are
cross-checked in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "vlad_aggregate_pallas",
    "fisher_stats_pallas",
    "gmm_em_stats_pallas",
    "lloyd_stats_pallas",
]

_LOG_2PI = 1.8378770664093453


def _lloyd_kernel(desc_ref, mask_ref, centers_ref, sums_ref, counts_ref, inertia_ref):
    """One grid step of fused Lloyd sufficient statistics: nearest-centroid
    assignment, (K, D) sums, (K,) counts and the masked inertia — the
    M-step inputs of ops.kmeans.lloyd_step with the (N, K) distance block
    kept VMEM-resident."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)
        inertia_ref[:] = jnp.zeros_like(inertia_ref)

    desc = desc_ref[:]  # (BN, D)
    mask = mask_ref[:]  # (BN, 1) — kept 2-D throughout (Mosaic constraint)
    centers = centers_ref[:]  # (K, D)

    # Training path: full-f32 MXU passes — bf16 inputs lose the
    # cross-term cancellation for |mean| >> std data (see ops/gmm.py).
    cross = jnp.dot(desc, centers.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(centers * centers, axis=1, keepdims=True)  # (K, 1)
    neg_half_d2 = cross - 0.5 * c2.T  # (BN, K); argmax == nearest centroid
    labels = jnp.argmax(neg_half_d2, axis=1, keepdims=True)  # (BN, 1)
    x2 = jnp.sum(desc * desc, axis=1, keepdims=True)  # (BN, 1)
    best = jnp.max(neg_half_d2, axis=1, keepdims=True)  # (BN, 1)
    min_d2 = jnp.maximum(x2 - 2.0 * best, 0.0)  # (BN, 1)

    one_hot = (
        labels == jax.lax.broadcasted_iota(jnp.int32, (1, centers.shape[0]), 1)
    ).astype(jnp.float32) * mask

    sums_ref[:] += jnp.dot(one_hot.T, desc, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    counts_ref[:] += jnp.sum(one_hot, axis=0, keepdims=True)
    inertia_ref[:] += jnp.sum(min_d2 * mask).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("block_n",))
def lloyd_stats_pallas(
    desc: jnp.ndarray,
    mask: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    block_n: int = 2048,
):
    """Fused Lloyd statistics -> (sums (K, D), counts (K,), inertia ()).

    Production backend of on-TPU K-Means training (ops/kmeans.py) for
    dataset-scale descriptor sets.
    """
    n, d = desc.shape
    k = centers.shape[0]
    pad = (-n) % block_n
    if pad:
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, (0, pad))
    grid = desc.shape[0] // block_n

    sums, counts, inertia = pl.pallas_call(
        _lloyd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, d), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
    )(desc.astype(jnp.float32), mask.astype(jnp.float32)[:, None], centers)
    return sums, counts[0], inertia[0, 0]


def _vlad_kernel(desc_ref, mask_ref, centers_ref, sums_ref, counts_ref):
    """One grid step: aggregate a (BN, D) descriptor chunk.

    sums (K, D) and counts (1, K) accumulate across the sequential TPU
    grid; step 0 zero-initializes.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)

    desc = desc_ref[:]  # (BN, D)
    mask = mask_ref[:]  # (BN, 1)
    centers = centers_ref[:]  # (K, D)

    # squared distances via the MXU cross term; ||x||^2 is constant per row
    # and does not affect the argmin over K.
    cross = jnp.dot(desc, centers.T, preferred_element_type=jnp.float32)
    c2 = jnp.sum(centers * centers, axis=1, keepdims=True)  # (K, 1)
    neg_half_d2 = cross - 0.5 * c2.T  # argmax == nearest centroid
    labels = jnp.argmax(neg_half_d2, axis=1, keepdims=True)  # (BN, 1)

    one_hot = (
        labels == jax.lax.broadcasted_iota(jnp.int32, (1, centers.shape[0]), 1)
    ).astype(jnp.float32) * mask

    sums_ref[:] += jnp.dot(one_hot.T, desc, preferred_element_type=jnp.float32)
    counts_ref[:] += jnp.sum(one_hot, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block_n",))
def vlad_aggregate_pallas(
    desc: jnp.ndarray,
    mask: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    block_n: int = 1024,
) -> jnp.ndarray:
    """Unnormalized VLAD (K, D) residual matrix, fused in one kernel.

    Semantics match ops.vlad.vlad_aggregate (reference semantics
    pyvisim/encoders/vlad.py:95-104).
    """
    n, d = desc.shape
    k = centers.shape[0]
    pad = (-n) % block_n
    if pad:
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, (0, pad))
    n_pad = desc.shape[0]
    grid = n_pad // block_n

    sums, counts = pl.pallas_call(
        _vlad_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, d), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
    )(desc.astype(jnp.float32), mask.astype(jnp.float32)[:, None], centers)
    return sums - counts[0][:, None] * centers


def _fisher_kernel(
    desc_ref, mask_ref, minv_ref, half_inv_ref, const_ref,
    s0_ref, s1_ref, s2_ref, ll_ref,
    *, precision=None,
):
    """One grid step of fused diag-GMM posterior + sufficient statistics
    (+ masked log-likelihood — the EM E-step byproduct).

    minv = means / cov (K, D); half_inv = 0.5 / cov (K, D);
    const = log w - 0.5 (D log 2pi + sum log cov + sum m^2/cov), shape (1, K).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        s0_ref[:] = jnp.zeros_like(s0_ref)
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)
        ll_ref[:] = jnp.zeros_like(ll_ref)

    desc = desc_ref[:]  # (BN, D)
    mask = mask_ref[:]  # (BN, 1)
    d2 = desc * desc

    logp = (
        jnp.dot(desc, minv_ref[:].T, preferred_element_type=jnp.float32,
                precision=precision)
        - jnp.dot(d2, half_inv_ref[:].T, preferred_element_type=jnp.float32,
                  precision=precision)
        + const_ref[:]
    )  # (BN, K)
    m = jnp.max(logp, axis=-1, keepdims=True)
    e = jnp.exp(logp - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    q = (e / denom) * mask  # (BN, K) softmax posteriors, masked
    log_norm = m + jnp.log(denom)  # (BN, 1) logsumexp per row

    s0_ref[:] += jnp.sum(q, axis=0, keepdims=True)
    s1_ref[:] += jnp.dot(q.T, desc, preferred_element_type=jnp.float32,
                         precision=precision)
    s2_ref[:] += jnp.dot(q.T, d2, preferred_element_type=jnp.float32,
                         precision=precision)
    ll_ref[:] += jnp.sum(log_norm * mask).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("block_n",))
def fisher_stats_pallas(
    desc: jnp.ndarray,
    mask: jnp.ndarray,
    weights: jnp.ndarray,
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    *,
    block_n: int = 1024,
):
    """Fused (pp_sum, pp_x, pp_x_2) normalized by the valid count —
    semantics of ops.fisher.fisher_stats (reference
    pyvisim/encoders/fisher_vector.py:99-104)."""
    s0, s1, s2, _ = gmm_em_stats_pallas(
        desc, mask, weights, means, covariances, block_n=block_n
    )
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    return s0 / n_valid, s1 / n_valid, s2 / n_valid


@functools.partial(jax.jit, static_argnames=("block_n", "precision"))
def gmm_em_stats_pallas(
    desc: jnp.ndarray,
    mask: jnp.ndarray,
    weights: jnp.ndarray,
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    *,
    block_n: int = 1024,
    precision=None,
):
    """Fused *unnormalized* EM sufficient statistics
    ``(s0 (K,), s1 (K, D), s2 (K, D), log_likelihood ())`` — the E-step of
    ops.gmm.em_step with the (N, K) responsibility block VMEM-resident.

    ``precision=jax.lax.Precision.HIGHEST`` (EM training) keeps the MXU
    passes full-f32 so the M-step's ``s2/nk - mean^2`` cancellation
    survives |mean| >> std data; the FV *encode* wrapper keeps the fast
    default (descriptor-scale inputs, measured adequate)."""
    n, d = desc.shape
    k = means.shape[0]
    pad = (-n) % block_n
    if pad:
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, (0, pad))
    grid = desc.shape[0] // block_n

    inv_cov = 1.0 / covariances
    minv = means * inv_cov
    const = (
        jnp.log(weights)
        - 0.5
        * (d * _LOG_2PI + jnp.sum(jnp.log(covariances), axis=1)
           + jnp.sum(means * minv, axis=1))
    )[None, :]

    s0, s1, s2, ll = pl.pallas_call(
        functools.partial(_fisher_kernel, precision=precision),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((k, d), jnp.float32),
            jax.ShapeDtypeStruct((k, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
    )(
        desc.astype(jnp.float32),
        mask.astype(jnp.float32)[:, None],
        minv,
        0.5 * inv_cov,
        const,
    )
    return s0[0], s1, s2, ll[0, 0]
