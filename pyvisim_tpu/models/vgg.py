"""VGG convolutional backbones in Flax (TPU-native deep feature extractor).

Replaces the reference's torchvision VGG16 + forward-hook machinery
(reference: pyvisim/features/_features.py:151-306) with a jit-compiled
Flax module that returns the **post-ReLU** output of a chosen conv layer.
Although the reference hooks the ``nn.Conv2d`` module itself
(_features.py:254-261), torchvision's VGG uses ``ReLU(inplace=True)``,
which mutates the hooked tensor in place before the buffer is read — so
the values the reference actually consumes are post-ReLU (verified
empirically against torch). We reproduce that observable behavior.

Weights: torchvision's pretrained checkpoints are not bundled (zero-egress
image); use :func:`params_from_torch_state_dict` to convert a downloaded
``vgg16-*.pth`` state dict, or :func:`init_params` for deterministic random
initialization.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "VGG_CFGS",
    "VGGConvFeatures",
    "init_params",
    "params_from_torch_state_dict",
    "num_conv_layers",
]

# Layer configurations (conv output channels; "M" = 2x2 max pool), matching
# the torchvision VGG "A"/"D"/"E" configs the reference can hook into.
VGG_CFGS: Dict[str, Sequence] = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


def num_conv_layers(cfg_name: str = "vgg16") -> int:
    return sum(1 for c in VGG_CFGS[cfg_name] if c != "M")


def conv_out_channels(cfg_name: str, layer_index: int) -> int:
    chans = [c for c in VGG_CFGS[cfg_name] if c != "M"]
    return chans[layer_index]


# int8 MXU conv shared with the ResNet family (see models/quant.py for
# the quantization scheme and measured speedups)
from .quant import QuantConv as _QuantConv  # noqa: E402


class VGGConvFeatures(nn.Module):
    """The convolutional trunk of a VGG network, truncated at ``layer_index``.

    ``__call__`` runs conv/relu/pool layers in order and returns the
    **post-ReLU** output of conv layer ``layer_index`` (negative indices
    allowed), shape ``(B, H', W', C)`` — matching what the reference's
    forward hook observably captures under torchvision's inplace ReLU
    (reference: _features.py:239-261; see module docstring).

    ``int8``: route MXU-bound middle convs through the chip's int8 path
    (dynamic symmetric quantization, see ``_QuantConv``; v5e int8 peak is
    2x bf16). Only layers where int8 MEASURES faster are quantized —
    input spatial size within [``int8_min_spatial``, ``int8_max_spatial``]
    and >= 64 input channels; the bandwidth-bound 224²/112² head and the
    14² tail (where int8 measured slower than bf16) stay in ``dtype``.
    On-chip sweep (VGG16->VLAD-k256 e2e, B=128): quantize <=56² 6,412
    img/s, <=112² 6,333, <=224² 5,850, bf16-only 5,224. Same parameter
    tree as the float path; trunk-encoding cosine vs f32 > 0.999
    (gated in tests/test_features_deep.py).
    """

    cfg_name: str = "vgg16"
    layer_index: int = -1
    dtype: Any = jnp.float32
    int8: bool = False
    int8_min_spatial: int = 28
    int8_max_spatial: int = 56

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = VGG_CFGS[self.cfg_name]
        n_convs = num_conv_layers(self.cfg_name)
        target = self.layer_index % n_convs
        conv_i = 0
        for item in cfg:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            use_int8 = (
                self.int8
                and self.int8_min_spatial <= x.shape[1] <= self.int8_max_spatial
                and x.shape[-1] >= 64
            )
            if use_int8:
                x = _QuantConv(
                    features=item, dtype=self.dtype, name=f"conv{conv_i}"
                )(x)
            else:
                x = nn.Conv(
                    features=item,
                    kernel_size=(3, 3),
                    padding=1,
                    dtype=self.dtype,
                    name=f"conv{conv_i}",
                )(x)
            x = nn.relu(x)
            if conv_i == target:
                return x
            conv_i += 1
        raise AssertionError("layer_index out of range")  # pragma: no cover


def init_params(
    cfg_name: str = "vgg16",
    layer_index: int = -1,
    seed: int = 0,
    image_size: int = 224,
    dtype=jnp.float32,
):
    """Deterministic random initialization (He-uniform via Flax defaults)."""
    model = VGGConvFeatures(cfg_name=cfg_name, layer_index=layer_index, dtype=dtype)
    dummy = jnp.zeros((1, image_size, image_size, 3), dtype)
    return model.init(jax.random.PRNGKey(seed), dummy)


def params_from_torch_state_dict(
    state_dict: Dict[str, Any], cfg_name: str = "vgg16", layer_index: int = -1
) -> Dict:
    """Convert a torchvision VGG ``state_dict`` to Flax params.

    Accepts either torch tensors or numpy arrays as values. Torch conv
    weights are OIHW; Flax expects HWIO. Keys follow torchvision naming
    (``features.{idx}.weight`` where idx counts convs, relus and pools).
    Only convs up to ``layer_index`` (inclusive) are converted, matching a
    truncated :class:`VGGConvFeatures` of the same ``layer_index``.
    """
    cfg = VGG_CFGS[cfg_name]
    target = layer_index % num_conv_layers(cfg_name)
    params = {}
    conv_i = 0
    torch_idx = 0
    for item in cfg:
        if item == "M":
            torch_idx += 1  # the pool layer
            continue
        if conv_i > target:
            break
        w = state_dict[f"features.{torch_idx}.weight"]
        b = state_dict[f"features.{torch_idx}.bias"]
        w = np.asarray(getattr(w, "numpy", lambda: w)())
        b = np.asarray(getattr(b, "numpy", lambda: b)())
        params[f"conv{conv_i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            "bias": jnp.asarray(b),
        }
        conv_i += 1
        torch_idx += 2  # conv + relu
    return {"params": params}
