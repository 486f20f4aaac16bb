"""pyvisim_tpu.ops — pure-functional TPU compute cores.

Every hot kernel the reference delegates to third-party native code
(OpenCV SIFT, sklearn KMeans/GMM/PCA/BLAS; see SURVEY.md §2) is owned here
as JAX/XLA/Pallas code compiled for TPU.
"""
from .codebooks import (
    GmmCodebook,
    KMeansCodebook,
    PcaProjector,
    load_codebook,
    save_codebook,
)
from .assign import (
    gmm_log_prob,
    gmm_posteriors,
    nearest_centroid,
    pairwise_sqdist,
)
from .norms import lp_norm, lp_normalize, power_normalize
from .vlad import vlad_aggregate, vlad_encode, vlad_encode_batch
from .fisher import fisher_encode, fisher_encode_batch, fisher_stats
from .similarity import cosine_similarity_matrix, pairwise_euclidean
from .kmeans import kmeans_fit
from .gmm import gmm_fit
from .pca import pca_fit
from .spectral import spectral_cluster
from .gaussian import gaussian_blur, gaussian_blur_batch

__all__ = [
    "GmmCodebook",
    "KMeansCodebook",
    "PcaProjector",
    "load_codebook",
    "save_codebook",
    "gmm_log_prob",
    "gmm_posteriors",
    "nearest_centroid",
    "pairwise_sqdist",
    "lp_norm",
    "lp_normalize",
    "power_normalize",
    "vlad_aggregate",
    "vlad_encode",
    "vlad_encode_batch",
    "fisher_encode",
    "fisher_encode_batch",
    "fisher_stats",
    "cosine_similarity_matrix",
    "pairwise_euclidean",
    "kmeans_fit",
    "gmm_fit",
    "pca_fit",
    "spectral_cluster",
    "gaussian_blur",
    "gaussian_blur_batch",
]
