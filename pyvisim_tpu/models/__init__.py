"""TPU-native model definitions (Flax)."""
from . import vgg
from .vgg import VGGConvFeatures, init_params, params_from_torch_state_dict

__all__ = ["vgg", "VGGConvFeatures", "init_params", "params_from_torch_state_dict"]
