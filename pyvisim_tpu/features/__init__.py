"""Feature extractors (reference parity: pyvisim/features/__init__.py:1-2)."""
from ._features import SIFT, RootSIFT, DeepConvFeature, Lambda, FeatureExtractorBase

__all__ = ["SIFT", "RootSIFT", "DeepConvFeature", "Lambda", "FeatureExtractorBase"]
