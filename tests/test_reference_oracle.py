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


# Loading the reference's own sklearn-1.5-era pickle under this image's
# newer sklearn legitimately trips the version-skew warning; this gate
# exists precisely to exercise that artifact, so silence it here only
# (VERDICT r4 task 7).
@pytest.mark.filterwarnings(
    "ignore::sklearn.exceptions.InconsistentVersionWarning"
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


# ---------------------------------------------------------------------------
# Pipeline (encoders/pipeline.py:47-103) — live differential
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def pipeline_pair(ref):
    """Two-member (VLAD + Fisher) pipelines on both stacks, sharing
    byte-identical descriptors via Lambda tables. The VLAD member is
    constructed with ``flatten=False`` so the force-override at
    reference pipeline.py:61-65 (and ours) is exercised."""
    from pyvisim_tpu.encoders import FisherVectorEncoder, Pipeline, VLADEncoder
    from pyvisim_tpu.ops import GmmCodebook, KMeansCodebook

    dim_a, k_a, dim_b, k_b = 24, 5, 16, 4
    images = _images(5, seed=60)
    table_a = _descriptor_table(images, dim_a, n_desc=35, seed=61)
    table_b = _descriptor_table(images, dim_b, n_desc=28, seed=62)
    ours_a, ref_a = _lambda_pair(ref, table_a, dim_a)
    ours_b, ref_b = _lambda_pair(ref, table_b, dim_b)

    rng = np.random.default_rng(63)
    km = KMeansCodebook(centers=rng.normal(size=(k_a, dim_a)).astype(np.float32))
    w = rng.uniform(0.5, 1.5, k_b)
    gmm = GmmCodebook(
        weights=(w / w.sum()).astype(np.float32),
        means=rng.normal(size=(k_b, dim_b)).astype(np.float32),
        covariances=rng.uniform(0.5, 2.0, (k_b, dim_b)).astype(np.float32),
    )
    vlad_o = VLADEncoder(feature_extractor=ours_a, kmeans_model=km, flatten=False)
    vlad_r = ref.encoders.VLADEncoder(
        feature_extractor=ref_a, kmeans_model=km.to_sklearn(), flatten=False
    )
    fv_o = FisherVectorEncoder(feature_extractor=ours_b, gmm_model=gmm)
    fv_r = ref.encoders.FisherVectorEncoder(
        feature_extractor=ref_b, gmm_model=gmm.to_sklearn()
    )
    ours = Pipeline([vlad_o, fv_o])
    theirs = ref.encoders.Pipeline([vlad_r, fv_r])
    return ours, theirs, images


def test_pipeline_encode_matches_reference(pipeline_pair):
    ours, theirs, images = pipeline_pair
    got, want = ours.encode(images), theirs.encode(images)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)
    # members' flatten=False must be restored on BOTH stacks afterwards
    assert ours.encoders[0].flatten is False
    assert theirs.encoders[0].flatten is False
    # single-image (3-D ndarray) short-circuit
    np.testing.assert_allclose(
        ours.encode(images[0]), theirs.encode(images[0]), atol=3e-4, rtol=3e-4
    )


def test_pipeline_similarity_score_matches_reference(pipeline_pair):
    ours, theirs, images = pipeline_pair
    got = ours.similarity_score(images[:3], images[3:])
    want = theirs.similarity_score(images[:3], images[3:])
    assert np.asarray(got).shape == np.asarray(want).shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_pipeline_generate_encoding_map_matches_reference(ref, tmp_path):
    """Write lossless PNGs to disk so both stacks decode identical pixels,
    then compare the {path: vector} maps (pipeline.py:68-81)."""
    import cv2

    from pyvisim_tpu.encoders import Pipeline, VLADEncoder
    from pyvisim_tpu.ops import KMeansCodebook

    rng = np.random.default_rng(64)
    paths, decoded = [], []
    for i in range(4):
        img = rng.integers(0, 255, (8, 7, 3), np.uint8)
        p = str(tmp_path / f"img_{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        decoded.append(cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB))

    dim, k = 20, 4
    table = _descriptor_table(decoded, dim, n_desc=25, seed=65)
    ours_ext, ref_ext = _lambda_pair(ref, table, dim)
    km = KMeansCodebook(centers=rng.normal(size=(k, dim)).astype(np.float32))
    ours = Pipeline([VLADEncoder(feature_extractor=ours_ext, kmeans_model=km)])
    theirs = ref.encoders.Pipeline(
        [ref.encoders.VLADEncoder(feature_extractor=ref_ext, kmeans_model=km.to_sklearn())]
    )
    got, want = ours.generate_encoding_map(paths), theirs.generate_encoding_map(paths)
    assert list(got) == list(want) == paths
    for p in paths:
        np.testing.assert_allclose(got[p], want[p], atol=2e-4, rtol=2e-4)


def test_pipeline_rejects_non_encoder_like_reference(ref):
    from pyvisim_tpu.encoders import Pipeline

    with pytest.raises(ValueError, match="only accepts instances"):
        Pipeline([object()])
    with pytest.raises(ValueError, match="only accepts instances"):
        ref.encoders.Pipeline([object()])


# ---------------------------------------------------------------------------
# similarity_score + similarity_func validator observable behavior
# (_base_encoder.py:23-97, :371-385) — live differential
# ---------------------------------------------------------------------------
@pytest.fixture()
def vlad_pair(ref):
    from pyvisim_tpu.encoders import VLADEncoder
    from pyvisim_tpu.ops import KMeansCodebook

    dim, k = 18, 5
    images = _images(6, seed=70)
    table = _descriptor_table(images, dim, n_desc=30, seed=71)
    ours_ext, ref_ext = _lambda_pair(ref, table, dim)
    rng = np.random.default_rng(72)
    km = KMeansCodebook(centers=rng.normal(size=(k, dim)).astype(np.float32))
    ours = VLADEncoder(feature_extractor=ours_ext, kmeans_model=km)
    theirs = ref.encoders.VLADEncoder(
        feature_extractor=ref_ext, kmeans_model=km.to_sklearn()
    )
    return ours, theirs, images


def test_similarity_score_default_matches_reference(vlad_pair):
    ours, theirs, images = vlad_pair
    got = ours.similarity_score(images[:2], images[2:])
    want = theirs.similarity_score(images[:2], images[2:])
    assert np.asarray(got).shape == np.asarray(want).shape == (2, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
    # single-image pair: both stacks return the np.float32(...) of a (1,1)
    # similarity matrix (reference _base_encoder.py:385)
    g1 = ours.similarity_score(images[0], images[1])
    w1 = theirs.similarity_score(images[0], images[1])
    assert np.asarray(g1).shape == np.asarray(w1).shape
    np.testing.assert_allclose(g1, w1, atol=2e-4, rtol=2e-4)


def test_pairwise_only_similarity_func_fallback_matches_reference(vlad_pair):
    """A similarity function that raises on batches: BOTH stacks must warn
    at assignment (probe failure) and then produce identical matrices via
    their row-pair fallback adapters (_base_encoder.py:44-48, 74-97)."""
    ours, theirs, images = vlad_pair

    def rowdot(a, b):
        if a.shape[0] != 1 or b.shape[0] != 1:
            raise ValueError("pairwise only")
        return float(a[0] @ b[0])

    with pytest.warns(UserWarning):
        ours.similarity_func = rowdot
    with pytest.warns(UserWarning):
        theirs.similarity_func = rowdot
    got = ours.similarity_score(images[:2], images[2:5])
    want = theirs.similarity_score(images[:2], images[2:5])
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_non_ndarray_similarity_func_fallback_matches_reference(vlad_pair):
    """A function returning a python float (not an ndarray) downgrades to
    the fallback on both stacks (_base_encoder.py:50-52)."""
    ours, theirs, images = vlad_pair

    def scalar_mean_dot(a, b):
        return float(np.mean(a @ b.T))

    with pytest.warns(UserWarning):
        ours.similarity_func = scalar_mean_dot
    with pytest.warns(UserWarning):
        theirs.similarity_func = scalar_mean_dot
    got = ours.similarity_score(images[:3], images[3:])
    want = theirs.similarity_score(images[:3], images[3:])
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_batch_similarity_func_accepted_without_warning(vlad_pair):
    """A well-behaved batch function passes the probe silently on both
    stacks and is used directly (_base_encoder.py:44-71)."""
    import warnings as warnings_mod

    ours, theirs, images = vlad_pair

    def batch_dot(a, b):
        return np.asarray(a @ b.T)

    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("error")
        ours.similarity_func = batch_dot
        theirs.similarity_func = batch_dot
    got = ours.similarity_score(images[:2], images[2:])
    want = theirs.similarity_score(images[:2], images[2:])
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-3)


# ---------------------------------------------------------------------------
# RootSIFT Hellinger map (features/_features.py:102-115) — live differential
# on genuinely shared raw descriptors (both stacks run host OpenCV SIFT on
# the same image, which is deterministic, so the raw descriptor sets are
# byte-identical and any difference isolates the Hellinger map itself).
# ---------------------------------------------------------------------------
def _textured_image(seed=0, size=128):
    import cv2

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (16, 16), np.uint8)
    img = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
    return np.stack([img] * 3, axis=-1)


def test_sift_opencv_backend_matches_reference(ref):
    from pyvisim_tpu.features import SIFT

    img = _textured_image(seed=80)
    got = SIFT(backend="opencv")(img)
    want = ref.features.SIFT()(img)
    assert want.shape[0] > 10, "test image produced too few keypoints"
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rootsift_hellinger_matches_reference(ref):
    from pyvisim_tpu.features import RootSIFT

    img = _textured_image(seed=81)
    got = RootSIFT(backend="opencv")(img)
    want = ref.features.RootSIFT()(img)
    assert want.shape[0] > 10, "test image produced too few keypoints"
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)
    # Hellinger rows are unit-L2 up to the +1e-7 regularizer on both stacks
    assert np.all(got >= 0)


# ---------------------------------------------------------------------------
# losses (losses/_losses.py:17-202) + soft_dice_score (_utils.py:285-309)
# — live differential, retiring the hand-transcription goldens
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_losses(ref):
    import pyvisim.losses._losses as mod

    return mod


def _seg_batch(seed=90, b=2, c=4, h=8, w=8):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, c, h, w)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w))
    one_hot = np.eye(c, dtype=np.float32)[labels].transpose(0, 3, 1, 2)
    return logits, one_hot


def _torch_pair(logits, target):
    import torch

    return torch.from_numpy(logits), torch.from_numpy(target)


def test_soft_dice_score_matches_reference(ref):
    import pyvisim._utils as ref_utils
    import torch

    from pyvisim_tpu.losses import soft_dice_score

    rng = np.random.default_rng(91)
    out = rng.uniform(size=(2, 3, 50)).astype(np.float32)
    tgt = rng.integers(0, 2, size=(2, 3, 50)).astype(np.float32)
    for smooth, dims in [(0.0, (0, 2)), (1.0, (0, 2)), (0.0, None)]:
        got = np.asarray(soft_dice_score(out, tgt, smooth=smooth, dims=dims))
        want = ref_utils.soft_dice_score(
            torch.from_numpy(out), torch.from_numpy(tgt), smooth=smooth, dims=dims
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(log_loss=True),
        dict(smooth=1.0),
        dict(ignore_index=0),
        dict(from_logits=False),
    ],
)
def test_dice_loss_matches_reference(ref_losses, kwargs):
    from pyvisim_tpu.losses import MultiClassDiceLoss

    logits, target = _seg_batch(seed=92)
    if kwargs.get("from_logits") is False:
        # feed valid probabilities when bypassing the softmax
        logits = np.abs(logits) / np.abs(logits).sum(1, keepdims=True)
    got = float(MultiClassDiceLoss(mode="multiclass", **kwargs)(logits, target))
    tp, tt = _torch_pair(logits, target)
    want = float(ref_losses.MultiClassDiceLoss(mode="multiclass", **kwargs)(tp, tt))
    assert got == pytest.approx(want, abs=1e-5)


def test_dice_loss_classes_subset_matches_reference(ref_losses):
    from pyvisim_tpu.losses import MultiClassDiceLoss

    import torch

    logits, target = _seg_batch(seed=93)
    got = float(
        MultiClassDiceLoss(mode="multiclass", classes=np.array([0, 2]))(logits, target)
    )
    tp, tt = _torch_pair(logits, target)
    want = float(
        ref_losses.MultiClassDiceLoss(
            mode="multiclass", classes=torch.tensor([0, 2])
        )(tp, tt)
    )
    assert got == pytest.approx(want, abs=1e-5)


def test_dice_loss_absent_class_matches_reference(ref_losses):
    """A class never present in the target must contribute ZERO loss on
    both stacks (reference _losses.py:80-81)."""
    from pyvisim_tpu.losses import MultiClassDiceLoss

    rng = np.random.default_rng(94)
    logits = rng.normal(size=(1, 3, 4, 4)).astype(np.float32)
    labels = rng.integers(0, 2, size=(1, 4, 4))  # class 2 never appears
    target = np.eye(3, dtype=np.float32)[labels].transpose(0, 3, 1, 2)
    got = float(MultiClassDiceLoss(mode="multiclass")(logits, target))
    tp, tt = _torch_pair(logits, target)
    want = float(ref_losses.MultiClassDiceLoss(mode="multiclass")(tp, tt))
    assert got == pytest.approx(want, abs=1e-5)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(gamma=0.5),
        dict(alpha=[1.0, 2.0, 3.0, 4.0]),
        dict(alpha=[1.0, 2.0, 3.0, 4.0], normalize_weights=False),
        dict(ignore_index=0),
    ],
)
def test_focal_loss_matches_reference(ref_losses, kwargs):
    import torch

    from pyvisim_tpu.losses import FocalLoss

    logits, target = _seg_batch(seed=95)
    ours_kwargs = dict(kwargs)
    ref_kwargs = dict(kwargs)
    if "alpha" in kwargs:
        ours_kwargs["alpha"] = np.asarray(kwargs["alpha"], np.float32)
        ref_kwargs["alpha"] = torch.tensor(kwargs["alpha"], dtype=torch.float32)
    got = float(FocalLoss(mode="multiclass", **ours_kwargs)(logits, target))
    tp, tt = _torch_pair(logits, target)
    want = float(ref_losses.FocalLoss(mode="multiclass", **ref_kwargs)(tp, tt))
    assert got == pytest.approx(want, rel=1e-5)


def test_focal_loss_binary_matches_reference(ref_losses):
    from pyvisim_tpu.losses import FocalLoss

    import torch

    rng = np.random.default_rng(96)
    logits = rng.normal(size=(2, 1, 6, 6)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 1, 6, 6)).astype(np.float32)
    # NB: a python-float alpha crashes the reference constructor under its
    # default normalize_weights=True (`float.sum()`, _losses.py:106), so the
    # scalar-alpha gate runs with normalize_weights=False on both stacks.
    got = float(
        FocalLoss(mode="binary", alpha=0.25, normalize_weights=False)(logits, target)
    )
    tp, tt = _torch_pair(logits, target)
    want = float(
        ref_losses.FocalLoss(
            mode="binary", alpha=torch.tensor(0.25), normalize_weights=False
        )(tp, tt)
    )
    assert got == pytest.approx(want, rel=1e-5)
    # no-alpha binary path too
    got0 = float(FocalLoss(mode="binary")(logits, target))
    want0 = float(ref_losses.FocalLoss(mode="binary")(tp, tt))
    assert got0 == pytest.approx(want0, rel=1e-5)


def test_hybrid_loss_matches_reference(ref_losses):
    """Includes the reference quirk that ignore_index masks only the focal
    term (its dice member is built WITHOUT ignore_index, _losses.py:189-192)."""
    from pyvisim_tpu.losses import HybridFocalDiceLoss

    logits, target = _seg_batch(seed=97)
    for kwargs in [dict(), dict(ignore_index=0)]:
        got = float(
            HybridFocalDiceLoss(
                mode="multiclass", dice_weight=0.3, focal_weight=0.7, **kwargs
            )(logits, target)
        )
        tp, tt = _torch_pair(logits, target)
        want = float(
            ref_losses.HybridFocalDiceLoss(
                mode="multiclass", dice_weight=0.3, focal_weight=0.7, **kwargs
            )(tp, tt)
        )
        assert got == pytest.approx(want, rel=1e-5), kwargs


def test_hybrid_weight_validation_matches_reference(ref_losses):
    from pyvisim_tpu.losses import HybridFocalDiceLoss

    with pytest.raises(ValueError, match="must be equal to 1.0"):
        HybridFocalDiceLoss(mode="multiclass")  # defaults 1.0 + 1.0
    with pytest.raises(ValueError, match="must be equal to 1.0"):
        ref_losses.HybridFocalDiceLoss(mode="multiclass")


# ---------------------------------------------------------------------------
# learn() at quality level (_base_encoder.py:311-342) — both stacks train a
# vocabulary on the SAME descriptor corpus (ours: on-device PCA/Lloyd/EM;
# reference: sklearn fits), then each encodes and retrieves with its own
# vocabulary; retrieval metrics must land within +-0.05 (VERDICT r4 task 6).
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def learn_corpus():
    dim, n_classes, per_gallery, per_query, n_desc = 20, 4, 6, 2, 40
    rng = np.random.default_rng(100)
    anchors = rng.normal(scale=4.0, size=(n_classes, 3, dim))  # 3 modes/class
    gallery, g_labels, queries, q_labels = [], [], [], []
    table = {}

    def make_image(cls, i):
        img = rng.integers(0, 255, (6, 5, 3), np.uint8)
        which = rng.integers(0, 3, size=n_desc)
        desc = anchors[cls, which] + rng.normal(scale=0.4, size=(n_desc, dim))
        table[img.tobytes()] = desc.astype(np.float32)
        return img

    for cls in range(n_classes):
        for i in range(per_gallery):
            gallery.append(make_image(cls, i))
            g_labels.append(cls)
        for i in range(per_query):
            queries.append(make_image(cls, i))
            q_labels.append(cls)
    return dim, table, gallery, g_labels, queries, q_labels


def _retrieval_quality(eval_mod, encoder, gallery, g_labels, queries, q_labels):
    emap = {f"g{i}.jpg": np.asarray(encoder.encode(img)).ravel()
            for i, img in enumerate(gallery)}
    plabels = {f"g{i}.jpg": int(lab) for i, lab in enumerate(g_labels)}
    top1 = eval_mod.top_k_accuracy(queries, q_labels, emap, plabels, encoder, k=1)
    m_ap = eval_mod.top_k_map(queries, q_labels, emap, plabels, encoder, k=5)
    return float(top1), float(m_ap)


@pytest.mark.parametrize("family", ["vlad", "fisher"])
def test_learn_quality_matches_reference(ref, learn_corpus, family):
    import pyvisim.eval as ref_eval

    import pyvisim_tpu.eval as ours_eval
    from pyvisim_tpu.encoders import FisherVectorEncoder, VLADEncoder

    dim, table, gallery, g_labels, queries, q_labels = learn_corpus
    ours_ext, ref_ext = _lambda_pair(ref, table, dim)
    if family == "vlad":
        ours = VLADEncoder(feature_extractor=ours_ext)
        theirs = ref.encoders.VLADEncoder(feature_extractor=ref_ext)
        ref_kwargs = dict(random_state=0, n_init=10)
    else:
        ours = FisherVectorEncoder(feature_extractor=ours_ext)
        theirs = ref.encoders.FisherVectorEncoder(feature_extractor=ref_ext)
        ref_kwargs = dict(random_state=0)
    ours.learn(gallery, n_clusters=8, dim_reduction_factor=2)
    theirs.learn(gallery, n_clusters=8, dim_reduction_factor=2, **ref_kwargs)

    got_top1, got_map = _retrieval_quality(
        ours_eval, ours, gallery, g_labels, queries, q_labels
    )
    want_top1, want_map = _retrieval_quality(
        ref_eval, theirs, gallery, g_labels, queries, q_labels
    )
    # both stacks must solve this well-separated problem...
    assert want_top1 >= 0.7 and got_top1 >= 0.7
    # ...and land within the +-0.05 quality gate of each other
    assert abs(got_top1 - want_top1) <= 0.05
    assert abs(got_map - want_map) <= 0.05
