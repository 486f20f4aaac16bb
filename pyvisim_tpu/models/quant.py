"""Shared int8 MXU convolution for inference trunks.

v5e's int8 systolic-array peak is 2x bf16; routing a conv through it pays
a quantize/repack cost that only MXU-bound shapes amortize (measured
per-shape numbers in docs/PERF.md). Quantization is dynamic and symmetric:
per-tensor activation scale (one fused amax over the producer's output),
per-output-channel weight scales, int8 x int8 -> int32 accumulation,
dequantized into ``dtype`` before bias/BN/ReLU.

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
        sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
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
        out = y.astype(jnp.float32) * (sx * sw)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias
        return out.astype(self.dtype)
