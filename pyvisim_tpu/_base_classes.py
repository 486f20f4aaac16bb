"""Abstract contracts for similarity metrics and feature extractors.

Capability parity with reference pyvisim/_base_classes.py:9-55, extended
with the TPU-first batched contract: extractors can emit fixed-budget
``(B, N_max, D)`` descriptor tensors plus validity masks so the whole
features→encode chain compiles into one jitted graph.
"""
from __future__ import annotations

import abc
from typing import Any, Iterable, Tuple

import numpy as np

from ._config import get_logger
from ._validation import validate_image


class SimilarityMetric(abc.ABC):
    """Abstract base for all similarity encoders
    (reference: pyvisim/_base_classes.py:9-25)."""

    _logger = get_logger("similarity_metric")

    @abc.abstractmethod
    def similarity_score(self, images1, images2):
        """Compute a similarity score (or matrix) between two image batches."""
        raise NotImplementedError


class FeatureExtractorBase(abc.ABC):
    """Abstract interface for extracting local features from images
    (reference: pyvisim/_base_classes.py:27-55).

    Contract (parity path): ``__call__(image) -> (N, output_dim)`` float32
    numpy array for a single HWC numpy image.

    Contract (TPU path): ``extract_batch(images) -> (desc, mask)`` where
    ``desc`` is ``(B, N_max, output_dim)`` and ``mask`` is ``(B, N_max)``;
    ``N_max`` is the extractor's static per-image descriptor budget.
    The default implementation loops ``__call__`` host-side and pads —
    subclasses override with a fully jitted batched version.
    """

    _logger = get_logger("feature_extractor")

    def __init__(self):
        pass

    @abc.abstractmethod
    def __call__(self, image: np.ndarray) -> np.ndarray:
        """Extract features from one image; validates the input image."""
        validate_image(image, 0)

    @property
    @abc.abstractmethod
    def output_dim(self) -> int:
        """Dimensionality D of each feature vector (shape[1] of the output)."""
        raise NotImplementedError

    @property
    def descriptor_budget(self) -> int | None:
        """Static N_max for the batched path; None = dynamic (host loop only)."""
        return None

    def extract_batch(
        self, images: Iterable[np.ndarray] | np.ndarray
    ) -> Tuple[Any, Any]:
        """Host-side fallback: loop ``__call__``, pad to a common N, mask.

        Subclasses with a jittable pipeline override this to run fully
        on-device.
        """
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        all_desc = [np.asarray(self(img), np.float32) for img in images]
        if not all_desc:
            raise ValueError("extract_batch received no images.")
        budget = self.descriptor_budget
        n_max = max((d.shape[0] for d in all_desc), default=1)
        n_max = max(n_max, 1)
        if budget is not None:
            n_max = budget
        b = len(all_desc)
        desc = np.zeros((b, n_max, self.output_dim), np.float32)
        mask = np.zeros((b, n_max), np.float32)
        for i, d in enumerate(all_desc):
            n = min(d.shape[0], n_max)
            desc[i, :n] = d[:n]
            mask[i, :n] = 1.0
        return desc, mask
