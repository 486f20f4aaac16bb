"""Utility module tests: persistence, clustering eval, blur, misc."""
import numpy as np
import pytest

from pyvisim_tpu import _utils as U
from pyvisim_tpu._errors import InvalidImageError


def test_cosine_similarity_shapes(rng):
    x = rng.normal(size=(64,)).astype(np.float32)
    y = rng.normal(size=(3, 64)).astype(np.float32)
    out = U.cosine_similarity(x, y)
    assert out.shape == (1, 3)
    with pytest.raises(ValueError, match=">= 2 features"):
        U.cosine_similarity(np.ones((3, 1)), np.ones((3, 1)))


def test_hdf5_round_trip(tmp_path, rng):
    data = {
        "scalar_int": 3,
        "scalar_float": 2.5,
        "arr": rng.normal(size=(4, 5)).astype(np.float32),
        "strings": ["a", "bc"],
        "nested": {"x": np.arange(3), "s": "hello"},
    }
    p = str(tmp_path / "t.h5")
    U.save_to_hdf5(p, data)
    back = U.load_hdf5(p)
    assert back["scalar_int"] == 3
    np.testing.assert_allclose(back["arr"], data["arr"])
    assert list(back["strings"]) == ["a", "bc"]
    np.testing.assert_array_equal(back["nested"]["x"], np.arange(3))
    assert back["nested"]["s"][0] == "hello"


def test_model_save_load_npz_and_joblib(tmp_path, rng):
    from pyvisim_tpu.ops import KMeansCodebook

    cb = KMeansCodebook(centers=rng.normal(size=(4, 8)).astype(np.float32))
    p = str(tmp_path / "cb.npz")
    U.save_model(cb, p)
    back = U.load_model(p)
    np.testing.assert_allclose(np.asarray(back.centers), np.asarray(cb.centers))
    # sklearn estimator via joblib path, auto-converted on load
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=3, n_init=2, random_state=0).fit(
        rng.normal(size=(50, 8)).astype(np.float32)
    )
    p2 = str(tmp_path / "km.pkl")
    U.save_model(km, p2)
    back2 = U.load_model(p2)
    assert isinstance(back2, KMeansCodebook)


def test_standardize_and_misc(rng):
    x = rng.normal(size=(10, 4))
    s = U.standardize_data(x, axis=0)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=1e-12)
    np.testing.assert_allclose(s.std(0), 1.0, atol=1e-12)
    m = np.array([[1.0, 0.2, 0.3], [0.4, 1.0, 0.6], [0.7, 0.8, 1.0]])
    assert U.mean_below_diagonal(m) == pytest.approx(np.mean([0.4, 0.7, 0.8]))
    assert U.is_subset([1, 2], [1, 2, 3])
    assert U.list_is_unique([1, 2, 3]) and not U.list_is_unique([1, 1])
    assert U.convert_to_integers([(1.7, 2.2)]) == [(1, 2)]
    assert U.average(np.ones((2, 2))) == 1.0


def test_gaussian_blur_matches_opencv(rng):
    import cv2

    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    ours = U.gaussian_blur(img, sigma=1.0)
    want = cv2.GaussianBlur(img, (7, 7), 1.0)
    assert ours.dtype == np.uint8
    diff = np.abs(ours.astype(int) - want.astype(int))
    assert diff.mean() < 1.0 and diff.max() <= 2


def test_gaussian_blur_kernel_size_validation(rng):
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    with pytest.raises(ValueError, match="outside the supported"):
        U.gaussian_blur(img, kernel_size=3, sigma=2.0)


def test_clustering_statistics_kmeans(rng):
    centers = rng.normal(scale=10, size=(3, 6)).astype(np.float32)
    labels = rng.integers(0, 3, size=200)
    x = centers[labels] + rng.normal(scale=0.2, size=(200, 6)).astype(np.float32)
    stats = U.cluster_images_and_generate_statistics(x, labels, 3, method="kmeans")
    assert stats["ari"] > 0.99
    assert stats["ri"] > 0.99
    assert stats["nmi"] > 0.95


def test_clustering_statistics_spectral(rng):
    centers = rng.normal(scale=10, size=(3, 6)).astype(np.float32)
    labels = rng.integers(0, 3, size=150)
    x = centers[labels] + rng.normal(scale=0.2, size=(150, 6)).astype(np.float32)
    stats = U.cluster_images_and_generate_statistics(x, labels, 3, method="spectral")
    assert stats["ari"] > 0.95


def test_validation_rejects_bad_images():
    with pytest.raises(InvalidImageError):
        U.is_numpy_image(np.zeros((4, 4, 4)), 0)
    with pytest.raises(InvalidImageError):
        U.is_numpy_image(np.full((4, 4, 3), 300.0), 0)


def test_soft_dice_score():
    a = np.ones((2, 3, 4), np.float32)
    assert float(U.soft_dice_score(a, a)) == pytest.approx(1.0)
    z = np.zeros_like(a)
    assert float(U.soft_dice_score(a, z)) == pytest.approx(0.0)


def test_plots_write_files(tmp_path, rng):
    import matplotlib

    matplotlib.use("Agg")
    m = rng.random((4, 4))
    U.plot_and_save_heatmap(m, show=False, save_fig_path=str(tmp_path / "h.png"))
    U.plot_and_save_barplot(
        {"a": [1.0, 2.0], "b": [2.0, 3.0]},
        ["x", "y"],
        show=False,
        save_path=str(tmp_path / "b.png"),
    )
    U.plot_and_save_lineplot(
        rng.random(30), show=False, save_path=str(tmp_path / "l.png")
    )
    U.plot_and_save_histogram(
        rng.random(100), show=False, save_path=str(tmp_path / "hist.png")
    )
    x = rng.random(200)
    y = 0.5 * x + rng.normal(scale=0.05, size=200)
    res = U.plot_boxplot_with_regression(
        x, y, show=False, save_fig_path=str(tmp_path / "box.png"), return_results=True
    )
    assert res["overall_statistics"].pearson > 0.9
    assert res["regression_result"].coefficients[1] == pytest.approx(0.5, abs=0.1)
    U.plot_scatter_with_regression(
        x, y, show=False, save_fig_path=str(tmp_path / "sc.png")
    )
    for f in ["h.png", "b.png", "l.png", "hist.png", "box.png", "sc.png"]:
        assert (tmp_path / f).exists()


def test_load_sklearn_pickle_version_skew_gate(tmp_path, rng):
    """A pickle carrying an sklearn version skew must raise by default and
    load (invariant-checked) with allow_version_skew=True."""
    import joblib
    import pytest
    import sklearn
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=3, n_init=2, random_state=0).fit(
        rng.normal(size=(50, 8)).astype(np.float32)
    )
    p = str(tmp_path / "km.pkl")
    joblib.dump(km, p)
    # same-version pickle: loads clean either way
    assert U.load_sklearn_pickle(p).n_clusters == 3

    # forge a skewed pickle by lying about the writer's version (the
    # version stamp is injected by BaseEstimator.__getstate__ from
    # sklearn.base's module-level __version__)
    import sklearn.base as skbase

    orig = skbase.__version__
    p2 = str(tmp_path / "km_skew.pkl")
    try:
        skbase.__version__ = "0.0.1"
        joblib.dump(km, p2)
    finally:
        skbase.__version__ = orig
    with pytest.raises(RuntimeError, match="different sklearn version"):
        U.load_sklearn_pickle(p2)
    got = U.load_sklearn_pickle(p2, allow_version_skew=True)
    np.testing.assert_allclose(got.cluster_centers_, km.cluster_centers_)


def test_load_model_validates_converted_codebook(tmp_path):
    """A corrupted estimator (invariant-violating arrays) must fail loudly
    when auto-converted by load_model, not propagate garbage."""
    import joblib
    import pytest
    from sklearn.mixture import GaussianMixture

    gmm = GaussianMixture(n_components=2, covariance_type="diag")
    gmm.weights_ = np.array([0.7, 0.7])  # does not sum to 1
    gmm.means_ = np.zeros((2, 4))
    gmm.covariances_ = np.ones((2, 4))
    p = str(tmp_path / "bad_gmm.pkl")
    joblib.dump(gmm, p)
    with pytest.raises(ValueError, match="sum to 1"):
        U.load_model(p)


def test_validate_codebook_accepts_good_and_rejects_bad(rng):
    import pytest

    from pyvisim_tpu.ops.codebooks import (
        GmmCodebook,
        KMeansCodebook,
        PcaProjector,
        validate_codebook,
    )

    validate_codebook(
        KMeansCodebook(centers=rng.normal(size=(4, 8)).astype(np.float32))
    )
    validate_codebook(
        PcaProjector(
            mean=np.zeros(8, np.float32),
            components=rng.normal(size=(4, 8)).astype(np.float32),
            explained_variance=np.ones(4, np.float32),
        )
    )
    with pytest.raises(ValueError, match="strictly positive"):
        validate_codebook(
            GmmCodebook(
                weights=np.full(2, 0.5, np.float32),
                means=np.zeros((2, 4), np.float32),
                covariances=np.zeros((2, 4), np.float32),
            )
        )
    with pytest.raises(ValueError, match="non-finite"):
        validate_codebook(
            KMeansCodebook(centers=np.full((2, 4), np.nan, np.float32))
        )
    with pytest.raises(ValueError, match="more components"):
        validate_codebook(
            PcaProjector(
                mean=np.zeros(2, np.float32),
                components=np.ones((4, 2), np.float32),
            )
        )
