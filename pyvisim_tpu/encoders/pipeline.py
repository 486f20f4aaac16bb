"""Pipeline: multi-encoder concatenation.

Capability parity with reference pyvisim/encoders/pipeline.py:15-128 (a
"pipeline" here is encoder *concatenation*, not stage pipelining).

TPU redesign: encoders sharing the same feature-extractor instance reuse a
single extraction pass — the reference re-runs the extractor per encoder on
a tee'd image stream (pipeline.py:59-63), doubling e.g. the VGG16 forward
cost for a VLAD+FV pipeline.
"""
from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

from .._base_classes import SimilarityMetric
from .._config import get_logger
from .._utils import cosine_similarity
from ._base_encoder import ImageEncoderBase, check_desired_output

__all__ = ["Pipeline"]


class Pipeline(SimilarityMetric):
    """Computes feature vectors with a set of descriptor-based encoders and
    concatenates them (always flattened, as in the reference).

    :param encoders: list of ImageEncoderBase instances.
    :param similarity_func: batch similarity function returning an
        (N, M) matrix.
    """

    _logger = get_logger("pipeline")

    def __init__(
        self,
        encoders: list[ImageEncoderBase],
        similarity_func: Callable = cosine_similarity,
    ):
        self._check_valid_encoders(encoders)
        self.encoders = encoders
        self._similarity_func = similarity_func

    def _check_valid_encoders(self, encoders: list[ImageEncoderBase]) -> None:
        for encoder in encoders:
            if not isinstance(encoder, ImageEncoderBase):
                raise ValueError(
                    f"Pipeline only accepts instances of ImageEncoderBase, "
                    f"not {type(encoder)}"
                )

    def encode(self, images: Iterable[np.ndarray] | np.ndarray) -> np.ndarray:
        """Encode images with every encoder and hstack the results
        (parity: pipeline.py:47-66), sharing feature extraction between
        encoders that hold the same extractor instance."""
        try:
            import torch

            if torch.is_tensor(images):
                raise RuntimeError("Torch images are not supported yet.")
        except ImportError:
            pass
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        images = list(images) if not isinstance(images, np.ndarray) else images

        # One extraction pass per distinct extractor instance. The
        # device-resident variant (when offered and no member needs mesh
        # re-placement) skips the descriptor host round trip exactly as
        # ImageEncoderBase.encode does.
        features: dict[int, tuple] = {}
        for enc in self.encoders:
            ext = enc.feature_extractor
            key = id(ext)
            if key not in features:
                if hasattr(ext, "extract_batch_device") and enc._mesh is None:
                    features[key] = ext.extract_batch_device(images)
                else:
                    features[key] = ext.extract_batch(images)

        all_encodings = []
        for enc in self.encoders:
            desc, mask = features[id(enc.feature_extractor)]
            saved_flatten = enc.flatten
            enc.flatten = True
            try:
                # the same engine as ImageEncoderBase.encode — including
                # mesh padding/placement for mesh-aware extractors, so a
                # Pipeline member behaves identically inside and outside
                # the pipeline on any batch size
                all_encodings.append(enc._encode_descriptors(desc, mask))
            finally:
                enc.flatten = saved_flatten
        return np.hstack(all_encodings)

    def generate_encoding_map(
        self,
        image_paths: Iterable[str],
        batch_size: int = 64,
        save_path: str | None = None,
    ) -> dict[str, np.ndarray] | None:
        """``{path: concatenated_vector}`` (parity: pipeline.py:68-81),
        decoded host-side and encoded in device batches; ``save_path``
        streams to HDF5 like ``ImageEncoderBase.generate_encoding_map``."""
        from ._base_encoder import _encode_paths_to_map

        return _encode_paths_to_map(
            self.encode, image_paths, batch_size, save_path
        )

    @property
    def similarity_func(self):
        return self._similarity_func

    @similarity_func.setter
    def similarity_func(self, func: Callable):
        dummy1, dummy2 = np.random.rand(10, 10), np.random.rand(10, 10)
        self._similarity_func = check_desired_output(func, dummy1, dummy2)

    def similarity_score(
        self,
        images1: Iterable[np.ndarray] | np.ndarray,
        images2: Iterable[np.ndarray] | np.ndarray,
    ) -> np.ndarray:
        """Encode both batches and apply ``similarity_func``
        (parity: pipeline.py:92-103)."""
        vector1 = self.encode(images1)
        vector2 = self.encode(images2)
        return np.float32(self.similarity_func(vector1, vector2))

    def fit(
        self,
        images: Iterable[np.ndarray],
        *,
        n_clusters: int,
        dim_reduction_factor: int | None = None,
        **kwargs,
    ) -> None:
        """Train every member encoder's vocabulary on the same images.

        The reference left this commented out (pipeline.py:105-118); here
        it is functional, reusing each encoder's on-TPU ``learn``.
        """
        images = list(images) if not isinstance(images, np.ndarray) else images
        for enc in self.encoders:
            self._logger.info("Fitting %s ...", type(enc).__name__)
            enc.learn(
                images,
                n_clusters=n_clusters,
                dim_reduction_factor=dim_reduction_factor,
                **kwargs,
            )

    def __repr__(self) -> str:
        encoders_str = "\n".join(str(e) for e in self.encoders)
        sim_name = getattr(self._similarity_func, "__name__", str(self._similarity_func))
        return (
            f"Pipeline(\nencoders=[{encoders_str}],\n"
            f"similarity_func={sim_name})"
        )
