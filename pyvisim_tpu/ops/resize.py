"""Shared antialiased linear image resize with padding-aware renormalization.

Used by every device preprocessing path that must produce identical pixels
for an image regardless of the batch it arrives in (DeepConvFeature,
SiameseEncoder). Capability anchor: torchvision's Resize-on-tensor inside
the reference's default transform (reference
pyvisim/features/_features.py:192-194); the batch-composition consistency
requirement is ours (the reference processes images one at a time and
never hits the problem).

Two pieces:

* ``bucket_side`` — a geometric (~1.2x) ladder of zero-padding side
  lengths, bounding the number of distinct jit traces for ragged corpora
  to the ladder size instead of one ~20-40 s remote compile per distinct
  photo shape.
* ``masked_linear_resize`` — ``jax.image.resize``-equivalent antialiased
  linear resampling via ``scale_and_translate`` with *dynamic* source
  extent: when the input is zero-padded past ``(oh, ow)``, dividing by the
  identically resampled ones-mask renormalizes the separable kernel over
  the valid region — numerically identical (float noise) to resizing the
  unpadded image, so one compiled graph serves every original shape that
  shares a padding bucket.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["SIZE_LADDER", "bucket_side", "masked_linear_resize"]

SIZE_LADDER = (
    32, 48, 64, 80, 96, 128, 160, 192, 224, 256, 320, 384, 448, 512,
    640, 768, 896, 1024, 1280, 1536, 1792, 2048, 2560, 3072, 4096,
)


def bucket_side(n: int) -> int:
    for s in SIZE_LADDER:
        if s >= n:
            return s
    return n  # beyond the ladder: dedicated trace for pathological sizes


def masked_linear_resize(
    x: jnp.ndarray, out_size: int, oh, ow, padded: bool = False
) -> jnp.ndarray:
    """(B, BH, BW, C) with valid region (oh, ow) -> (B, out_size, out_size, C).

    The resampling itself runs in float32 regardless of ``x.dtype``: a
    bf16-rounded *scale* would shift sample-tap positions by up to ~0.6 px
    (breaking torchvision-Resize parity), a far larger error than bf16
    pixel storage. The result is cast back to ``x.dtype``.
    """
    s = out_size
    b, bh, bw, c = x.shape
    xf = x.astype(jnp.float32)
    scale = jnp.stack(
        [s / jnp.asarray(oh, jnp.float32), s / jnp.asarray(ow, jnp.float32)]
    )
    zero = jnp.zeros((2,), jnp.float32)
    out = jax.image.scale_and_translate(
        xf, (b, s, s, c), (1, 2), scale, zero,
        method="linear", antialias=True,
    )
    if padded:
        rr = (jnp.arange(bh) < oh).astype(jnp.float32)
        cc = (jnp.arange(bw) < ow).astype(jnp.float32)
        mask = (rr[:, None] * cc[None, :])[None, :, :, None]
        m_out = jax.image.scale_and_translate(
            mask, (1, s, s, 1), (1, 2), scale, zero,
            method="linear", antialias=True,
        )
        out = out / jnp.maximum(m_out, 1e-12)
    return out.astype(x.dtype)
