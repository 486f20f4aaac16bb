"""ResNet convolutional trunks in Flax (additional deep-feature family).

The reference's DeepConvFeature accepts any torchvision model
(reference: pyvisim/features/_features.py:177-211); VGG is its default and
ResNets are the most common alternative. This module provides
torchvision-compatible ResNet trunks (18/34/50) usable as
``DeepConvFeature(module=..., params=...)`` feature extractors, with a
state-dict converter for pretrained torchvision checkpoints.

Inference-oriented: BatchNorm uses converted running statistics
(``use_running_average=True``).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .quant import QuantConv

__all__ = [
    "ResNetTrunk",
    "RESNET_CFGS",
    "init_params",
    "params_from_torch_state_dict",
]

# (block type, per-stage block counts)
RESNET_CFGS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
}
_STAGE_WIDTHS = (64, 128, 256, 512)


def _block_conv(parent_int8, lo, hi, x, feats, ksize, strides, pad, name, dtype):
    """nn.Conv or the int8 MXU QuantConv, chosen per layer by the input
    spatial size (quantize only where int8 measures faster; BN follows
    the dequantized output, so no BN folding is needed)."""
    sp = x.shape[1]
    if parent_int8 and lo <= sp <= hi and x.shape[-1] >= 64:
        return QuantConv(
            feats, kernel_size=ksize, strides=(strides, strides),
            padding=(pad, pad), use_bias=False, dtype=dtype, name=name,
        )(x)
    return nn.Conv(
        feats, ksize, strides=strides, padding=pad, use_bias=False,
        dtype=dtype, name=name,
    )(x)


class _BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    int8: bool = False
    int8_min_spatial: int = 7
    int8_max_spatial: int = 56

    @nn.compact
    def __call__(self, x):
        conv = partial(
            _block_conv, self.int8, self.int8_min_spatial,
            self.int8_max_spatial,
        )
        residual = x
        y = conv(x, self.features, (3, 3), self.strides, 1, "conv1", self.dtype)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = conv(y, self.features, (3, 3), 1, 1, "conv2", self.dtype)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn2")(y)
        if residual.shape != y.shape:
            residual = conv(x, self.features, (1, 1), self.strides, 0,
                            "downsample_conv", self.dtype)
            residual = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class _Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: Any = jnp.float32
    int8: bool = False
    int8_min_spatial: int = 7
    int8_max_spatial: int = 56

    @nn.compact
    def __call__(self, x):
        conv = partial(
            _block_conv, self.int8, self.int8_min_spatial,
            self.int8_max_spatial,
        )
        residual = x
        y = conv(x, self.features, (1, 1), 1, 0, "conv1", self.dtype)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = conv(y, self.features, (3, 3), self.strides, 1, "conv2", self.dtype)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = conv(y, 4 * self.features, (1, 1), 1, 0, "conv3", self.dtype)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn3")(y)
        if residual.shape != y.shape:
            residual = conv(x, 4 * self.features, (1, 1), self.strides, 0,
                            "downsample_conv", self.dtype)
            residual = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetTrunk(nn.Module):
    """ResNet feature trunk: stem + stages 1..``n_stages``; returns the
    ``(B, Hf, Wf, C)`` feature map of the last kept stage (pre-pooling)."""

    cfg_name: str = "resnet50"
    n_stages: int = 4
    dtype: Any = jnp.float32
    # int8: quantize block convs whose input spatial size falls within
    # [int8_min_spatial, int8_max_spatial] (the 7x7 stem stays float).
    # Same dynamic-quantization scheme and parameter-tree compatibility
    # as the VGG trunk (models/quant.py).
    int8: bool = False
    int8_min_spatial: int = 7
    int8_max_spatial: int = 56

    @nn.compact
    def __call__(self, x):
        block_kind, counts = RESNET_CFGS[self.cfg_name]
        block_cls = _BasicBlock if block_kind == "basic" else _Bottleneck
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage in range(self.n_stages):
            for blk in range(counts[stage]):
                strides = 2 if stage > 0 and blk == 0 else 1
                x = block_cls(
                    _STAGE_WIDTHS[stage], strides=strides, dtype=self.dtype,
                    int8=self.int8,
                    int8_min_spatial=self.int8_min_spatial,
                    int8_max_spatial=self.int8_max_spatial,
                    name=f"layer{stage + 1}_{blk}",
                )(x)
        return x

    @property
    def out_channels(self) -> int:
        kind, _ = RESNET_CFGS[self.cfg_name]
        w = _STAGE_WIDTHS[self.n_stages - 1]
        return w if kind == "basic" else 4 * w


def init_params(cfg_name="resnet50", n_stages=4, seed=0, image_size=224,
                dtype=jnp.float32):
    model = ResNetTrunk(cfg_name=cfg_name, n_stages=n_stages, dtype=dtype)
    return model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, image_size, image_size, 3), dtype)
    )


def _conv(w):
    return jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd, prefix):
    g = lambda k: jnp.asarray(np.asarray(sd[f"{prefix}.{k}"]))
    params = {"scale": g("weight"), "bias": g("bias")}
    stats = {"mean": g("running_mean"), "var": g("running_var")}
    return params, stats


def params_from_torch_state_dict(
    state_dict: dict, cfg_name: str = "resnet50", n_stages: int = 4
):
    """Convert a torchvision ResNet ``state_dict`` (tensors or numpy) to the
    Flax variables dict {'params': ..., 'batch_stats': ...}."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state_dict.items()}
    _, counts = RESNET_CFGS[cfg_name]
    params: dict = {"conv1": {"kernel": _conv(sd["conv1.weight"])}}
    stats: dict = {}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s
    for stage in range(n_stages):
        for blk in range(counts[stage]):
            t = f"layer{stage + 1}.{blk}"
            f = f"layer{stage + 1}_{blk}"
            bp: dict = {}
            bs: dict = {}
            conv_i = 1
            while f"{t}.conv{conv_i}.weight" in sd:
                bp[f"conv{conv_i}"] = {"kernel": _conv(sd[f"{t}.conv{conv_i}.weight"])}
                bp[f"bn{conv_i}"], bs[f"bn{conv_i}"] = _bn(sd, f"{t}.bn{conv_i}")
                conv_i += 1
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                bp["downsample_bn"], bs["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f] = bp
            stats[f] = bs
    return {"params": params, "batch_stats": stats}
