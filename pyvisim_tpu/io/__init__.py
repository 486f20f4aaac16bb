"""Host-side image IO feeding the TPU input pipeline.

The reference decodes with ``cv2.imread`` inline in its encode loops
(reference: pyvisim/encoders/_base_encoder.py:357, pipeline.py:80,
datasets/datasets.py:281). Here IO is its own layer: a native C++
multithreaded JPEG decoder (pyvisim_tpu/io/native, built on libjpeg) with
an OpenCV fallback, so host decode overlaps device compute.
"""
from __future__ import annotations

import numpy as np

from ._loader import imread_rgb, imread_rgb_batch, native_loader_available
from ._prefetch import PrefetchIterator, prefetch_to_device

__all__ = [
    "imread_rgb",
    "imread_rgb_batch",
    "native_loader_available",
    "PrefetchIterator",
    "prefetch_to_device",
]
