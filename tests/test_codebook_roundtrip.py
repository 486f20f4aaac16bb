"""sklearn <-> codebook round-trip converters (migration bridges)."""
import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

from pyvisim_tpu.ops import (
    GmmCodebook,
    KMeansCodebook,
    PcaProjector,
    gmm_posteriors,
    nearest_centroid,
)


def test_kmeans_round_trip(rng):
    from sklearn.cluster import KMeans

    x = rng.normal(size=(200, 12)).astype(np.float32)
    km = KMeans(n_clusters=5, n_init=2, random_state=0).fit(x)
    cb = KMeansCodebook.from_sklearn(km)
    back = cb.to_sklearn()
    q = rng.normal(size=(40, 12)).astype(np.float32)
    np.testing.assert_array_equal(back.predict(q), km.predict(q))


def test_gmm_round_trip(rng):
    from sklearn.mixture import GaussianMixture

    x = rng.normal(size=(300, 8)).astype(np.float32)
    sk = GaussianMixture(4, covariance_type="diag", random_state=0).fit(x)
    cb = GmmCodebook.from_sklearn(sk)
    back = cb.to_sklearn()
    q = rng.normal(size=(30, 8)).astype(np.float64)
    np.testing.assert_allclose(
        back.predict_proba(q), sk.predict_proba(q), atol=1e-6
    )
    # and our own posteriors agree with the round-tripped estimator
    np.testing.assert_allclose(
        np.asarray(gmm_posteriors(q.astype(np.float32), cb)),
        sk.predict_proba(q),
        atol=2e-4,
    )


def test_pca_round_trip(rng):
    from sklearn.decomposition import PCA

    x = rng.normal(size=(300, 16)).astype(np.float32)
    sk = PCA(n_components=6).fit(x)
    cb = PcaProjector.from_sklearn(sk)
    back = cb.to_sklearn()
    q = rng.normal(size=(20, 16)).astype(np.float64)
    np.testing.assert_allclose(back.transform(q), sk.transform(q), atol=1e-5)


def test_pca_whiten_save_load_roundtrip(tmp_path, rng):
    """ADVICE r1: whiten was dropped by save_codebook, silently flipping
    projections after a save/load round trip."""
    from pyvisim_tpu.ops import load_codebook, save_codebook

    x = rng.normal(size=(100, 10)).astype(np.float32)
    proj = PcaProjector(
        mean=x.mean(0),
        components=np.linalg.svd(x - x.mean(0), full_matrices=False)[2][:4],
        explained_variance=np.array([4.0, 3.0, 2.0, 1.0], np.float32),
        whiten=True,
    )
    path = tmp_path / "pca_whiten.npz"
    save_codebook(path, proj)
    back = load_codebook(path)
    assert back.whiten is True
    q = rng.normal(size=(7, 10)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(back(q)), np.asarray(proj(q)), atol=1e-6)

    # and the default (whiten=False) also survives
    proj_nw = PcaProjector(mean=proj.mean, components=proj.components,
                           explained_variance=proj.explained_variance)
    save_codebook(path, proj_nw)
    assert load_codebook(path).whiten is False
