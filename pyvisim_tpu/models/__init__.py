"""TPU-native model definitions (Flax)."""
from . import resnet, siamese, vgg
from .resnet import ResNetTrunk
from .vgg import VGGConvFeatures, init_params, params_from_torch_state_dict

__all__ = [
    "vgg",
    "resnet",
    "siamese",
    "VGGConvFeatures",
    "ResNetTrunk",
    "init_params",
    "params_from_torch_state_dict",
]
