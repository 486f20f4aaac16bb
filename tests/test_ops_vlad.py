"""VLAD core parity tests.

Golden values come from an independent numpy transcription of the reference
semantics (pyvisim/encoders/vlad.py:95-111): hard-assign to nearest centroid,
residual scatter-add, signed power norm, per-row L_p norm with additive
epsilon, flatten.
"""
import numpy as np
import pytest

from pyvisim_tpu.ops import (
    KMeansCodebook,
    nearest_centroid,
    vlad_encode,
    vlad_encode_batch,
)


def numpy_vlad(desc, centers, power=1.0, norm_order=2, eps=1e-9, flatten=True):
    """Numpy golden model of the reference VLAD semantics."""
    d2 = ((desc[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    labels = d2.argmin(1)
    k, dim = centers.shape
    v = np.zeros((k, dim), np.float32)
    for i, x in enumerate(desc):
        v[labels[i]] += x - centers[labels[i]]
    v = np.sign(v) * np.abs(v) ** power
    norms = np.linalg.norm(v, axis=1, ord=norm_order, keepdims=True) + eps
    v = v / norms
    return v.flatten() if flatten else v


@pytest.fixture
def data(rng):
    desc = rng.normal(size=(300, 16)).astype(np.float32)
    centers = rng.normal(size=(8, 16)).astype(np.float32)
    return desc, centers


def test_nearest_centroid_matches_numpy(data):
    desc, centers = data
    d2 = ((desc[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(
        np.asarray(nearest_centroid(desc, centers)), d2.argmin(1)
    )


@pytest.mark.parametrize("power,norm_order", [(1.0, 2), (0.5, 2), (0.7, 1)])
def test_vlad_matches_reference_semantics(data, power, norm_order):
    desc, centers = data
    got = np.asarray(
        vlad_encode(
            desc, None, centers, power_norm_weight=power, norm_order=float(norm_order)
        )
    )
    want = numpy_vlad(desc, centers, power=power, norm_order=norm_order)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_vlad_against_sklearn_kmeans(rng):
    sklearn = pytest.importorskip("sklearn.cluster")
    train = rng.normal(size=(500, 32)).astype(np.float32)
    km = sklearn.KMeans(n_clusters=16, random_state=0, n_init=3).fit(train)
    cb = KMeansCodebook.from_sklearn(km)
    # Encode held-out descriptors: encoding the training set itself is
    # numerically degenerate (KMeans centroids are exact cluster means, so
    # VLAD residual sums are ~0 and normalization amplifies float noise).
    desc = rng.normal(size=(300, 32)).astype(np.float32)
    labels_ours = np.asarray(nearest_centroid(desc, cb.centers))
    labels_sk = km.predict(desc)
    assert (labels_ours == labels_sk).mean() > 0.999
    got = np.asarray(vlad_encode(desc, None, cb.centers))
    want = numpy_vlad(desc, np.asarray(cb.centers, np.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_mask_equals_truncation(data):
    desc, centers = data
    n_valid = 137
    mask = np.zeros(desc.shape[0], bool)
    mask[:n_valid] = True
    got = np.asarray(vlad_encode(desc, mask, centers))
    want = np.asarray(vlad_encode(desc[:n_valid], None, centers))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_chunked_equals_direct(data):
    desc, centers = data
    a = np.asarray(vlad_encode(desc, None, centers, chunk_size=64))
    b = np.asarray(vlad_encode(desc, None, centers))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_zero_descriptors_give_zero_vector(data):
    _, centers = data
    desc = np.zeros((10, 16), np.float32)
    mask = np.zeros(10, bool)
    out = np.asarray(vlad_encode(desc, mask, centers))
    assert out.shape == (8 * 16,)
    np.testing.assert_array_equal(out, 0.0)


def test_batch_matches_loop(data):
    desc, centers = data
    batch = np.stack([desc, desc[::-1].copy()])
    mask = np.ones(batch.shape[:2], np.float32)
    got = np.asarray(vlad_encode_batch(batch, mask, centers))
    for i in range(2):
        want = np.asarray(vlad_encode(batch[i], None, centers))
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_unit_l2_rows_when_norm2(data):
    desc, centers = data
    v = np.asarray(vlad_encode(desc, None, centers, flatten=False))
    norms = np.linalg.norm(v, axis=1)
    nonzero = norms > 1e-6
    np.testing.assert_allclose(norms[nonzero], 1.0, atol=1e-4)
