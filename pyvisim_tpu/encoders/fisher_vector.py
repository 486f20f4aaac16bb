"""FisherVectorEncoder: the stateful API over the Fisher Vector TPU core.

Capability parity with reference pyvisim/encoders/fisher_vector.py:15-135;
per-image loop replaced by one jitted batched graph via ops/fisher.py
(including the reference's sign-flipped d_sigma — see ops/fisher.py).
"""
from __future__ import annotations

import warnings
from typing import Callable, Optional

import jax

from .._utils import cosine_similarity
from ..features import FeatureExtractorBase, RootSIFT
from ..ops.codebooks import GmmCodebook
from ..ops.fisher import fisher_encode
from ._base_encoder import GMMWeights, ImageEncoderBase

__all__ = ["FisherVectorEncoder"]


class FisherVectorEncoder(ImageEncoderBase):
    """Encodes images into Fisher Vector descriptors from a diag-GMM
    vocabulary.

    Same constructor surface as the reference FisherVectorEncoder
    (fisher_vector.py:41-52); ``gmm_model`` accepts either a
    :class:`GmmCodebook` or a fitted sklearn ``GaussianMixture``
    (auto-converted; non-diag covariances rejected with the reference's
    warning semantics). Output dim is ``2*K*D + K``.

    References:
    ===========
    [1] Jegou et al., "Aggregating Local Image Descriptors into Compact
        Codes".
    """

    _vocabulary_kind = "gmm"

    def __init__(
        self,
        feature_extractor: FeatureExtractorBase | None = None,
        weights: Optional[GMMWeights] = None,
        gmm_model=None,
        power_norm_weight: float = 0.5,
        norm_order: float = 2.0,
        epsilon: float = 1e-9,
        flatten: bool = True,
        similarity_func: Callable = cosine_similarity,
        pca=None,
        raise_error_when_pca_incompatible: bool = False,
    ):
        if feature_extractor is None:
            feature_extractor = RootSIFT()
        if weights is not None and weights.__class__.__name__ != "GMMWeights":
            raise ValueError(
                "You can only pass an instance of GMMWeights, "
                f"not {weights.__class__.__name__}"
            )
        super().__init__(
            feature_extractor,
            weights,
            gmm_model,
            similarity_func,
            power_norm_weight,
            norm_order,
            epsilon,
            flatten,
            pca,
            raise_error_when_pca_incompatible,
        )

    def _coerce_clustering_model(self, model):
        if isinstance(model, GmmCodebook):
            return model
        if hasattr(model, "covariances_"):
            if getattr(model, "covariance_type", "diag") != "diag":
                warnings.warn(
                    "Attribute 'covariance_type' of the clustering model must "
                    "be 'diag'; converting assumes diagonal covariances."
                )
            return GmmCodebook.from_sklearn(model)
        raise ValueError(
            f"The clustering model must be a GmmCodebook or sklearn "
            f"GaussianMixture, not {type(model)}"
        )

    def _encode_cluster_sharded(self, desc, mask, mesh):
        """K mixture-component axis sharded over the mesh's 'cluster' axis
        (EP analog): the posterior softmax's global normalizer is recovered
        with a pmax+psum over 'cluster'
        (parallel.cluster_sharded_fisher_encode)."""
        from ..parallel import cluster_sharded_fisher_encode

        if self._pca is not None:
            desc = self._pca(desc)  # (B, N, D_in) -> (B, N, D)
        out = cluster_sharded_fisher_encode(
            desc,
            mask,
            self._clustering_model,
            mesh,
            power_norm_weight=self._power_norm_weight,
            norm_order=self._norm_order,
            epsilon=self._epsilon,
        )
        # match the replicated core's un-flattened row-vector shape
        return out if self._flatten else out[:, None, :]

    def _encode_core(self, desc, mask, clustering_model, pca):
        power = self._power_norm_weight
        order = self._norm_order
        eps = self._epsilon
        flat = self._flatten

        def one(d, m):
            if pca is not None:
                d = pca(d)
            return fisher_encode(
                d,
                m,
                clustering_model,
                power_norm_weight=power,
                norm_order=order,
                epsilon=eps,
                flatten=flat,
            )

        return jax.vmap(one)(desc, mask)
