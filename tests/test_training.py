"""On-TPU vocabulary training tests (KMeans / GMM / PCA) vs sklearn quality."""
import numpy as np
import pytest

from pyvisim_tpu.ops import nearest_centroid
from pyvisim_tpu.ops.gmm import gmm_fit
from pyvisim_tpu.ops.kmeans import kmeans_fit
from pyvisim_tpu.ops.pca import pca_fit


@pytest.fixture
def blobs(rng):
    centers = rng.normal(scale=8.0, size=(5, 12)).astype(np.float32)
    labels = rng.integers(0, 5, size=600)
    x = centers[labels] + rng.normal(scale=0.3, size=(600, 12)).astype(np.float32)
    return x.astype(np.float32), labels, centers


def test_kmeans_recovers_blobs(blobs):
    x, labels, centers = blobs
    cb, inertia = kmeans_fit(x, 5, seed=1, n_init=3)
    got = np.sort(np.asarray(cb.centers), axis=0)
    want = np.sort(centers, axis=0)
    np.testing.assert_allclose(got, want, atol=0.3)
    pred = np.asarray(nearest_centroid(x, cb.centers))
    from sklearn.metrics import adjusted_rand_score

    assert adjusted_rand_score(labels, pred) > 0.99


def test_kmeans_inertia_close_to_sklearn(blobs):
    x, _, _ = blobs
    from sklearn.cluster import KMeans

    sk = KMeans(n_clusters=5, n_init=3, random_state=0).fit(x)
    _, inertia = kmeans_fit(x, 5, seed=0, n_init=3)
    assert inertia <= sk.inertia_ * 1.02


def test_kmeans_masked_ignores_padding(blobs, rng):
    x, _, _ = blobs
    pad = rng.normal(scale=100.0, size=(50, 12)).astype(np.float32)
    x_pad = np.vstack([x, pad])
    mask = np.r_[np.ones(len(x)), np.zeros(50)].astype(np.float32)
    cb_pad, _ = kmeans_fit(x_pad, 5, mask=mask, seed=1, n_init=2)
    cb, _ = kmeans_fit(x, 5, seed=1, n_init=2)
    got = np.sort(np.asarray(cb_pad.centers), axis=0)
    want = np.sort(np.asarray(cb.centers), axis=0)
    np.testing.assert_allclose(got, want, atol=0.3)


def test_gmm_fit_quality(blobs):
    x, labels, centers = blobs
    gmm, ll = gmm_fit(x, 5, seed=0)
    assert np.isfinite(ll)
    got = np.sort(np.asarray(gmm.means), axis=0)
    want = np.sort(centers, axis=0)
    np.testing.assert_allclose(got, want, atol=0.3)
    w = np.asarray(gmm.weights)
    assert w.sum() == pytest.approx(1.0, abs=1e-5)
    assert (np.asarray(gmm.covariances) > 0).all()
    # log-likelihood should be in the same ballpark as sklearn's
    from sklearn.mixture import GaussianMixture

    sk = GaussianMixture(5, covariance_type="diag", random_state=0).fit(x)
    assert ll >= sk.score(x) - 0.5


def test_pca_matches_sklearn(rng):
    from sklearn.decomposition import PCA

    x = rng.normal(size=(500, 20)).astype(np.float32)
    x[:, :5] *= 5.0  # give some directions real variance
    ours = pca_fit(x, 8)
    sk = PCA(n_components=8).fit(x)
    np.testing.assert_allclose(np.asarray(ours.mean), sk.mean_, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours.explained_variance), sk.explained_variance_, rtol=1e-3
    )
    # components match up to sign per row (we apply the same sign rule but
    # eigh vs SVD can still disagree on near-degenerate directions)
    cos = np.abs(np.sum(np.asarray(ours.components) * sk.components_, axis=1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-3)
    # transform parity
    np.testing.assert_allclose(
        np.abs(np.asarray(ours(x[:10]))), np.abs(sk.transform(x[:10])), rtol=1e-2, atol=1e-3
    )


def test_kmeans_chunked_matches_unchunked(blobs):
    x, _, _ = blobs
    cb_a, in_a = kmeans_fit(x, 5, seed=1, chunk_size=128)
    cb_b, in_b = kmeans_fit(x, 5, seed=1)
    np.testing.assert_allclose(
        np.asarray(cb_a.centers), np.asarray(cb_b.centers), rtol=1e-4, atol=1e-4
    )
    assert in_a == pytest.approx(in_b, rel=1e-4)


def test_gmm_chunked_matches_unchunked(blobs):
    x, _, _ = blobs
    g_a, ll_a = gmm_fit(x, 5, seed=0, chunk_size=128)
    g_b, ll_b = gmm_fit(x, 5, seed=0)
    np.testing.assert_allclose(
        np.asarray(g_a.means), np.asarray(g_b.means), rtol=1e-3, atol=1e-3
    )
    assert ll_a == pytest.approx(ll_b, rel=1e-3)


def test_learn_with_descriptor_cap(rng):
    from pyvisim_tpu.encoders import VLADEncoder
    from pyvisim_tpu.features import Lambda

    centers = rng.normal(scale=10.0, size=(4, 8)).astype(np.float32)

    def fn(image):
        r = np.random.default_rng(int(image.sum()) % 2**31)
        lab = r.integers(0, 4, size=200)
        return (centers[lab] + r.normal(scale=0.1, size=(200, 8))).astype(np.float32)

    enc = VLADEncoder(feature_extractor=Lambda(fn, output_dim=8))
    imgs = [np.full((4, 4, 3), v, np.uint8) for v in range(6)]
    enc.learn(imgs, n_clusters=4, batch_size=2, max_descriptors=400)
    got = np.sort(np.asarray(enc.clustering_model.centers), axis=0)
    np.testing.assert_allclose(got, np.sort(centers, axis=0), atol=0.3)
