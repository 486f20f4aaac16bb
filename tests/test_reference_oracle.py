"""Reference-in-the-loop differential gates (VERDICT r3 task 1).

Every other parity test in this suite compares against re-derived formulas
or hand transcriptions of the reference loops. These tests instead run the
ACTUAL reference implementation (``/root/reference/pyvisim``, loaded live
by ``_reference_oracle``) side by side with ``pyvisim_tpu`` on identical
inputs, so a transcription error on either side fails loudly.

Gates (reference anchors):
  * VLAD / Fisher encodings  — encoders/vlad.py:83-115, fisher_vector.py:83-135
  * eval trio                — eval.py:13-145
  * cosine_similarity, cluster stats — _utils.py:312-361
  * golden fixtures          — regenerated claim: fixtures == live reference
  * pretrained GMM artifact  — res/model_files/gmm_k256_sift_pca.pkl
"""
import pathlib

import numpy as np
import pytest

import _reference_oracle

if not _reference_oracle.reference_available():  # pragma: no cover
    pytest.skip("reference package not mounted", allow_module_level=True)


@pytest.fixture(scope="module")
def ref():
    return _reference_oracle.load_reference()


def _images(n, seed=0, h=6, w=5):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (h, w, 3), np.uint8) for _ in range(n)]


def _descriptor_table(images, dim, n_desc, seed=1):
    """Deterministic per-image descriptor sets, keyed by image bytes, so a
    Lambda extractor on either stack serves byte-identical float32 rows."""
    rng = np.random.default_rng(seed)
    return {
        im.tobytes(): rng.normal(size=(n_desc + i, dim)).astype(np.float32)
        for i, im in enumerate(images)
    }


def _lambda_pair(ref, table, dim):
    import pyvisim_tpu.features as ours

    func = lambda im: table[im.tobytes()]  # noqa: E731
    return (
        ours.Lambda(func, output_dim=dim),
        ref.features.Lambda(func, output_dim=dim),
    )


# ---------------------------------------------------------------------------
# cosine_similarity (_utils.py:312-330)
# ---------------------------------------------------------------------------
def test_cosine_similarity_matches_reference(ref):
    import pyvisim._utils as ref_utils

    from pyvisim_tpu._utils import cosine_similarity

    rng = np.random.default_rng(7)
    x = rng.normal(size=(5, 32)).astype(np.float32)
    y = rng.normal(size=(9, 32)).astype(np.float32)
    np.testing.assert_allclose(
        cosine_similarity(x, y), ref_utils.cosine_similarity(x, y), atol=1e-5
    )
    # 1-D inputs reshape to a row on both sides
    np.testing.assert_allclose(
        cosine_similarity(x[0], y[3]),
        ref_utils.cosine_similarity(x[0], y[3]),
        atol=1e-5,
    )
    # single-feature rejection parity
    with pytest.raises(ValueError):
        ref_utils.cosine_similarity(x[:, :1], y[:, :1])
    with pytest.raises(ValueError):
        cosine_similarity(x[:, :1], y[:, :1])


# ---------------------------------------------------------------------------
# VLAD encodings (encoders/vlad.py:83-115)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "power_norm_weight,norm_order,flatten",
    [(1.0, 2, True), (0.5, 2, True), (1.0, 1, True), (1.0, 2, False)],
)
def test_vlad_encode_matches_reference(ref, power_norm_weight, norm_order, flatten):
    from pyvisim_tpu.encoders import VLADEncoder
    from pyvisim_tpu.ops import KMeansCodebook

    dim, k = 24, 7
    images = _images(4, seed=10)
    table = _descriptor_table(images, dim, n_desc=40, seed=11)
    ours_ext, ref_ext = _lambda_pair(ref, table, dim)

    rng = np.random.default_rng(12)
    book = KMeansCodebook(centers=rng.normal(size=(k, dim)).astype(np.float32))
    kwargs = dict(
        power_norm_weight=power_norm_weight, norm_order=norm_order, flatten=flatten
    )
    ours = VLADEncoder(feature_extractor=ours_ext, kmeans_model=book, **kwargs)
    theirs = ref.encoders.VLADEncoder(
        feature_extractor=ref_ext, kmeans_model=book.to_sklearn(), **kwargs
    )

    got, want = ours.encode(images), theirs.encode(images)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
    # single-image path (ndim == 3 short-circuit) must agree too
    np.testing.assert_allclose(
        ours.encode(images[0]), theirs.encode(images[0]), atol=2e-4, rtol=2e-4
    )


def test_vlad_encode_with_pca_matches_reference(ref):
    from pyvisim_tpu.encoders import VLADEncoder
    from pyvisim_tpu.ops import KMeansCodebook, PcaProjector

    dim, out_dim, k = 32, 12, 5
    images = _images(3, seed=20)
    table = _descriptor_table(images, dim, n_desc=30, seed=21)
    ours_ext, ref_ext = _lambda_pair(ref, table, dim)

    rng = np.random.default_rng(22)
    # an orthonormal-ish projection so the PCA transform is well-conditioned
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    pca = PcaProjector(
        mean=rng.normal(size=(dim,)).astype(np.float32),
        components=q[:out_dim].astype(np.float32),
        explained_variance=np.linspace(4.0, 1.0, out_dim).astype(np.float32),
    )
    book = KMeansCodebook(centers=rng.normal(size=(k, out_dim)).astype(np.float32))

    ours = VLADEncoder(feature_extractor=ours_ext, kmeans_model=book, pca=pca)
    theirs = ref.encoders.VLADEncoder(
        feature_extractor=ref_ext,
        kmeans_model=book.to_sklearn(),
        pca=pca.to_sklearn(),
    )
    np.testing.assert_allclose(
        ours.encode(images), theirs.encode(images), atol=2e-4, rtol=2e-4
    )


# ---------------------------------------------------------------------------
# Fisher encodings (encoders/fisher_vector.py:83-135)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "power_norm_weight,norm_order", [(0.5, 2), (1.0, 2), (0.5, 1)]
)
def test_fisher_encode_matches_reference(ref, power_norm_weight, norm_order):
    from pyvisim_tpu.encoders import FisherVectorEncoder
    from pyvisim_tpu.ops import GmmCodebook

    dim, k = 16, 6
    images = _images(4, seed=30)
    table = _descriptor_table(images, dim, n_desc=50, seed=31)
    ours_ext, ref_ext = _lambda_pair(ref, table, dim)

    rng = np.random.default_rng(32)
    w = rng.uniform(0.5, 1.5, k)
    gmm = GmmCodebook(
        weights=(w / w.sum()).astype(np.float32),
        means=rng.normal(size=(k, dim)).astype(np.float32),
        covariances=rng.uniform(0.5, 2.0, (k, dim)).astype(np.float32),
    )
    kwargs = dict(power_norm_weight=power_norm_weight, norm_order=norm_order)
    ours = FisherVectorEncoder(feature_extractor=ours_ext, gmm_model=gmm, **kwargs)
    theirs = ref.encoders.FisherVectorEncoder(
        feature_extractor=ref_ext, gmm_model=gmm.to_sklearn(), **kwargs
    )

    got, want = ours.encode(images), theirs.encode(images)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


# ---------------------------------------------------------------------------
# eval trio (eval.py:13-145) — retires the hand transcription oracle
# ---------------------------------------------------------------------------
class _TableEncoder:
    """Minimal ``.encode`` implementation both eval stacks accept: maps an
    image to a fixed vector (1-D for a single image, stacked otherwise)."""

    def __init__(self, table):
        self.table = table

    def encode(self, images):
        if isinstance(images, np.ndarray) and images.ndim == 3:
            return self.table[images.tobytes()]
        return np.vstack([self.table[im.tobytes()] for im in images])


@pytest.fixture(scope="module")
def eval_problem():
    rng = np.random.default_rng(40)
    n_gallery, n_query, d, n_classes = 37, 11, 19, 5
    gallery = rng.normal(size=(n_gallery, d)).astype(np.float32)
    encoding_map = {f"img_{i}.jpg": gallery[i] for i in range(n_gallery)}
    path_labels = {
        f"img_{i}.jpg": int(rng.integers(0, n_classes)) for i in range(n_gallery)
    }
    queries = _images(n_query, seed=41)
    query_labels = [int(rng.integers(0, n_classes)) for _ in range(n_query)]
    table = {
        im.tobytes(): rng.normal(size=(d,)).astype(np.float32) for im in queries
    }
    return encoding_map, path_labels, queries, query_labels, _TableEncoder(table)


@pytest.mark.parametrize("k", [None, 1, 3, 10])
def test_top_k_map_matches_reference(ref, eval_problem, k):
    import pyvisim.eval as ref_eval

    import pyvisim_tpu.eval as ours_eval

    emap, plabels, queries, qlabels, enc = eval_problem
    got = ours_eval.top_k_map(queries, qlabels, emap, plabels, enc, k=k)
    want = ref_eval.top_k_map(queries, qlabels, emap, plabels, enc, k=k)
    assert got == pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("k", [1, 3, 10])
def test_top_k_accuracy_matches_reference(ref, eval_problem, k):
    import pyvisim.eval as ref_eval

    import pyvisim_tpu.eval as ours_eval

    emap, plabels, queries, qlabels, enc = eval_problem
    got = ours_eval.top_k_accuracy(queries, qlabels, emap, plabels, enc, k=k)
    want = ref_eval.top_k_accuracy(queries, qlabels, emap, plabels, enc, k=k)
    assert got == pytest.approx(want, abs=1e-9)


def test_retrieve_top_k_similar_matches_reference(ref, eval_problem):
    import pyvisim.eval as ref_eval

    import pyvisim_tpu.eval as ours_eval

    emap, _, queries, _, enc = eval_problem
    got = ours_eval.retrieve_top_k_similar(queries[0], emap, enc, k=5)
    want = ref_eval.retrieve_top_k_similar(queries[0], emap, enc, k=5)
    assert [p for p, _ in got] == [p for p, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], atol=1e-5
    )


# ---------------------------------------------------------------------------
# clustering statistics (_utils.py:333-361)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("method", ["kmeans", "dbscan"])
def test_cluster_statistics_match_reference(ref, method):
    import pyvisim._utils as ref_utils

    from pyvisim_tpu._utils import cluster_images_and_generate_statistics

    rng = np.random.default_rng(50)
    # three well-separated blobs: any sane clustering recovers the same
    # partition, so the two stacks' statistics must agree exactly
    centers = np.array([[0.0, 0.0], [30.0, 0.0], [0.0, 30.0]])
    feats = np.concatenate(
        [c + rng.normal(scale=0.5, size=(40, 2)) for c in centers]
    ).astype(np.float32)
    labels = np.repeat([0, 1, 2], 40)
    kwargs = {"eps": 3.0, "min_samples": 3} if method == "dbscan" else {}
    got = cluster_images_and_generate_statistics(
        feats, labels, n_clusters=3, method=method, **kwargs
    )
    want = ref_utils.cluster_images_and_generate_statistics(
        feats, labels, n_clusters=3, method=method, **kwargs
    )
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=1e-9), key


# ---------------------------------------------------------------------------
# golden fixtures: provenance pinned to the live reference
# ---------------------------------------------------------------------------
GOLDEN = pathlib.Path(__file__).parent / "testdata" / "golden_encodings.npz"


def _encode_one_with_reference(ref, encoder_cls_name, valid_desc, model, **kwargs):
    img = np.zeros((4, 4, 3), np.uint8)
    ext = ref.features.Lambda(lambda _: valid_desc, output_dim=valid_desc.shape[1])
    if encoder_cls_name == "vlad":
        enc = ref.encoders.VLADEncoder(
            feature_extractor=ext, kmeans_model=model, **kwargs
        )
    else:
        enc = ref.encoders.FisherVectorEncoder(
            feature_extractor=ext, gmm_model=model, **kwargs
        )
    return enc.encode(img).ravel()


def test_golden_fixtures_match_live_reference(ref):
    """The frozen fixtures in testdata/golden_encodings.npz were produced by
    round-1 pyvisim_tpu; this pins them to the RUNNING reference instead,
    retiring the self-referential provenance (VERDICT r3 weak #3)."""
    from pyvisim_tpu.ops import GmmCodebook, KMeansCodebook

    g = np.load(GOLDEN)
    valid = g["desc"][g["mask"] > 0.5]
    km = KMeansCodebook(centers=g["centers"]).to_sklearn()
    np.testing.assert_allclose(
        _encode_one_with_reference(ref, "vlad", valid, km),
        g["vlad"], atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(
        _encode_one_with_reference(ref, "vlad", valid, km, power_norm_weight=0.5),
        g["vlad_p05"], atol=2e-4, rtol=2e-4,
    )
    gmm = GmmCodebook(
        weights=g["gmm_w"], means=g["gmm_m"], covariances=g["gmm_c"]
    ).to_sklearn()
    np.testing.assert_allclose(
        _encode_one_with_reference(ref, "fisher", valid, gmm),
        g["fisher"], atol=3e-4, rtol=3e-4,
    )


def test_golden_real_artifact_matches_reference_pickle(ref):
    """fisher_real was computed with our CONVERTED gmm_k256_sift_pca.npz;
    recompute it with the reference encoder loading the reference's own
    pickle — gating the pickle conversion end to end."""
    g = np.load(GOLDEN)
    gmm = ref.encoders.GMMWeights.OXFORD102_K256_SIFT_PCA.load()
    np.testing.assert_allclose(
        _encode_one_with_reference(ref, "fisher", g["desc_real"], gmm),
        g["fisher_real"], atol=3e-4, rtol=3e-4,
    )
