"""Codebook pytrees: the statistical "vocabulary" models owned by encoders.

The reference holds live sklearn estimators (KMeans / diag-GaussianMixture /
PCA) inside each encoder and pickles them to disk
(reference: pyvisim/encoders/_base_encoder.py:117-155, pyvisim/_utils.py:830-850).
The TPU-native design replaces them with immutable JAX pytrees of plain
arrays, serialized as ``.npz`` — jit/pjit-friendly, shardable, and free of
pickle security issues. A converter from the reference's sklearn pickles
lives in ``tools/convert_sklearn_pickles.py``.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "KMeansCodebook",
    "GmmCodebook",
    "PcaProjector",
    "save_codebook",
    "load_codebook",
    "validate_codebook",
]


def validate_codebook(codebook: Any) -> None:
    """Assert the structural invariants of a vocabulary artifact.

    Used by the pickle converter (tools/convert_sklearn_pickles.py) and
    ``_utils.load_model`` so that a silently-corrupted unpickle — e.g. an
    sklearn version skew changing attribute layouts — fails loudly instead
    of propagating garbage into encodings. Raises ``ValueError``.
    """

    def _finite(name, arr, ndim):
        arr = np.asarray(arr)
        if arr.ndim != ndim:
            raise ValueError(f"{name}: expected {ndim}-D, got shape {arr.shape}")
        if not np.isfinite(arr).all():
            raise ValueError(f"{name}: contains non-finite values")
        return arr

    if isinstance(codebook, KMeansCodebook):
        centers = _finite("KMeansCodebook.centers", codebook.centers, 2)
        if centers.shape[0] < 1:
            raise ValueError("KMeansCodebook: needs at least one center")
    elif isinstance(codebook, GmmCodebook):
        w = _finite("GmmCodebook.weights", codebook.weights, 1)
        mu = _finite("GmmCodebook.means", codebook.means, 2)
        cov = _finite("GmmCodebook.covariances", codebook.covariances, 2)
        if not (w.shape[0] == mu.shape[0] == cov.shape[0]):
            raise ValueError(
                f"GmmCodebook: component counts disagree "
                f"(weights {w.shape}, means {mu.shape}, covariances {cov.shape})"
            )
        if mu.shape != cov.shape:
            raise ValueError(
                f"GmmCodebook: means {mu.shape} vs covariances {cov.shape}"
            )
        if (w < 0).any() or abs(float(w.sum()) - 1.0) > 1e-3:
            raise ValueError(
                f"GmmCodebook: weights must be >= 0 and sum to 1 "
                f"(sum={float(w.sum())!r})"
            )
        if (cov <= 0).any():
            raise ValueError("GmmCodebook: covariances must be strictly positive")
    elif isinstance(codebook, PcaProjector):
        comp = _finite("PcaProjector.components", codebook.components, 2)
        mean = _finite("PcaProjector.mean", codebook.mean, 1)
        if comp.shape[0] > comp.shape[1]:
            raise ValueError(
                f"PcaProjector: more components than input dims {comp.shape}"
            )
        if mean.shape[0] != comp.shape[1]:
            raise ValueError(
                f"PcaProjector: mean dim {mean.shape[0]} != input dim {comp.shape[1]}"
            )
        if codebook.explained_variance is not None:
            ev = _finite(
                "PcaProjector.explained_variance", codebook.explained_variance, 1
            )
            if (ev < 0).any():
                raise ValueError("PcaProjector: explained_variance must be >= 0")
    else:
        raise TypeError(f"Not a codebook pytree: {type(codebook)}")


@struct.dataclass
class PcaProjector:
    """PCA projection ``y = (x - mean) @ components.T`` (+ optional whitening).

    Equivalent capability: sklearn ``PCA.transform`` as called at
    reference pyvisim/encoders/vlad.py:90 and fisher_vector.py:92.

    mean: (D_in,), components: (D_out, D_in), explained_variance: (D_out,)
    """

    mean: jnp.ndarray
    components: jnp.ndarray
    explained_variance: jnp.ndarray | None = None
    whiten: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_features_in(self) -> int:
        return self.components.shape[1]

    @property
    def n_components(self) -> int:
        return self.components.shape[0]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.dot(
            x - self.mean, self.components.T, preferred_element_type=jnp.float32
        )
        if self.whiten:
            y = y / jnp.sqrt(self.explained_variance)
        return y

    @classmethod
    def from_sklearn(cls, pca: Any) -> "PcaProjector":
        return cls(
            mean=jnp.asarray(pca.mean_, jnp.float32),
            components=jnp.asarray(pca.components_, jnp.float32),
            explained_variance=jnp.asarray(pca.explained_variance_, jnp.float32),
            whiten=bool(getattr(pca, "whiten", False)),
        )

    def to_sklearn(self):
        """Build an equivalent fitted sklearn ``PCA`` (migration escape
        hatch back to the reference's stack)."""
        import numpy as _np
        from sklearn.decomposition import PCA

        pca = PCA(n_components=self.n_components, whiten=self.whiten)
        pca.mean_ = _np.asarray(self.mean, _np.float64)
        pca.components_ = _np.asarray(self.components, _np.float64)
        ev = (
            _np.ones(self.n_components)
            if self.explained_variance is None
            else _np.asarray(self.explained_variance, _np.float64)
        )
        pca.explained_variance_ = ev
        pca.explained_variance_ratio_ = ev / max(ev.sum(), 1e-12)
        pca.singular_values_ = _np.sqrt(_np.maximum(ev, 0.0))
        pca.n_components_ = self.n_components
        pca.n_features_in_ = self.n_features_in
        pca.n_samples_ = self.n_components + 1
        pca.noise_variance_ = 0.0
        return pca


@struct.dataclass
class KMeansCodebook:
    """K-Means vocabulary: cluster centers only (hard assignment).

    Equivalent capability: sklearn ``KMeans`` as used by VLAD
    (reference: pyvisim/encoders/vlad.py:95-104).

    centers: (K, D)
    """

    centers: jnp.ndarray

    @property
    def n_clusters(self) -> int:
        return self.centers.shape[0]

    @property
    def n_features_in(self) -> int:
        return self.centers.shape[1]

    @classmethod
    def from_sklearn(cls, kmeans: Any) -> "KMeansCodebook":
        return cls(centers=jnp.asarray(kmeans.cluster_centers_, jnp.float32))

    def to_sklearn(self):
        """Build an equivalent fitted sklearn ``KMeans``."""
        import numpy as _np
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=self.n_clusters, n_init=1)
        # sklearn's cython predict requires centers dtype == query dtype;
        # keep float32 (matching the reference's float32 descriptor casts).
        km.cluster_centers_ = _np.asarray(self.centers, _np.float32)
        km._n_features_out = self.n_clusters
        km.n_features_in_ = self.n_features_in
        km._n_threads = 1
        km.labels_ = _np.zeros(self.n_clusters, _np.int32)
        km.inertia_ = 0.0
        km.n_iter_ = 0
        return km


@struct.dataclass
class GmmCodebook:
    """Diagonal-covariance Gaussian mixture vocabulary.

    Equivalent capability: sklearn ``GaussianMixture(covariance_type='diag')``
    as used by the Fisher Vector encoder
    (reference: pyvisim/encoders/fisher_vector.py:95-120).

    weights: (K,), means: (K, D), covariances: (K, D)
    """

    weights: jnp.ndarray
    means: jnp.ndarray
    covariances: jnp.ndarray

    @property
    def n_components(self) -> int:
        return self.means.shape[0]

    @property
    def n_features_in(self) -> int:
        return self.means.shape[1]

    @classmethod
    def from_sklearn(cls, gmm: Any) -> "GmmCodebook":
        if getattr(gmm, "covariance_type", "diag") != "diag":
            raise ValueError(
                "Only diag-covariance GMMs are supported "
                f"(got covariance_type={gmm.covariance_type!r})."
            )
        return cls(
            weights=jnp.asarray(gmm.weights_, jnp.float32),
            means=jnp.asarray(gmm.means_, jnp.float32),
            covariances=jnp.asarray(gmm.covariances_, jnp.float32),
        )

    def to_sklearn(self):
        """Build an equivalent fitted sklearn diag ``GaussianMixture``."""
        import numpy as _np
        from sklearn.mixture import GaussianMixture

        gmm = GaussianMixture(
            n_components=self.n_components, covariance_type="diag"
        )
        gmm.weights_ = _np.asarray(self.weights, _np.float64)
        gmm.means_ = _np.asarray(self.means, _np.float64)
        gmm.covariances_ = _np.asarray(self.covariances, _np.float64)
        gmm.precisions_cholesky_ = 1.0 / _np.sqrt(gmm.covariances_)
        gmm.precisions_ = 1.0 / gmm.covariances_
        gmm.converged_ = True
        gmm.n_iter_ = 0
        gmm.lower_bound_ = 0.0
        gmm.n_features_in_ = self.n_features_in
        return gmm


_KIND_TO_CLS = {
    "kmeans": KMeansCodebook,
    "gmm": GmmCodebook,
    "pca": PcaProjector,
}
_CLS_TO_KIND = {v: k for k, v in _KIND_TO_CLS.items()}


def save_codebook(path, codebook) -> None:
    """Serialize a codebook pytree to ``.npz`` (replaces the reference's
    joblib pickles; reference: pyvisim/_utils.py:830-850)."""
    kind = _CLS_TO_KIND.get(type(codebook))
    if kind is None:
        raise TypeError(f"Not a known codebook type: {type(codebook)}")
    arrays = {}
    for k, v in vars(codebook).items():
        if v is None:
            continue
        # Static (non-pytree) bool fields like PcaProjector.whiten travel as
        # 0-d arrays under a marker prefix and come back as Python bools.
        if isinstance(v, bool):
            arrays[f"__bool__{k}"] = np.asarray(v)
        else:
            arrays[k] = np.asarray(v)
    np.savez(path, __kind__=np.array(kind), **arrays)


def load_codebook(path):
    """Load a codebook pytree saved by :func:`save_codebook`."""
    with np.load(path, allow_pickle=False) as data:
        kind = str(data["__kind__"])
        cls = _KIND_TO_CLS[kind]
        kwargs = {}
        for k in data.files:
            if k.startswith("__bool__"):
                kwargs[k[len("__bool__"):]] = bool(data[k])
            elif k.startswith("__"):
                continue  # metadata (e.g. __kind__, __provenance__)
            else:
                kwargs[k] = jnp.asarray(data[k])
    return cls(**kwargs)
