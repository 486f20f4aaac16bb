"""Shared int8 MXU convolution for inference trunks.

Accelerates the conv forward the reference runs through torch
(/root/reference/pyvisim/features/_features.py:276-285) on v5e's int8
systolic array (2x bf16 peak); routing a conv through it pays a
quantize/repack cost that only MXU-bound shapes amortize (measured
per-shape numbers in docs/PERF.md). Quantization is dynamic and
symmetric: per-IMAGE activation scales (amax per batch element — a
per-tensor scale would make an image's descriptors depend on its
batchmates), per-output-channel weight scales, int8 x int8 -> int32
accumulation, dequantized into ``dtype`` before bias/BN/ReLU.

Parameter names and shapes ("kernel" HWIO + optional "bias") match
``flax.linen.Conv`` exactly, so converted torchvision checkpoints load
into the float and int8 paths interchangeably.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["QuantConv"]


class QuantConv(nn.Module):
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        xf = x.astype(jnp.float32)
        # per-image scales: an image's quantization grid must not depend
        # on its batchmates (batch-composition-independent descriptors)
        sx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0, 1e-8
        )  # (B, 1, 1, 1)
        xq = jnp.round(xf / sx).clip(-127, 127).astype(jnp.int8)
        sw = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0, 1e-8
        )
        wq = jnp.round(kernel / sw).clip(-127, 127).astype(jnp.int8)
        padding = (
            self.padding
            if isinstance(self.padding, str)
            else tuple((p, p) for p in self.padding)
        )
        y = jax.lax.conv_general_dilated(
            xq, wq, tuple(self.strides), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (sx * sw)  # (B,1,1,1)x(Cout) bcast
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias
        return out.astype(self.dtype)
