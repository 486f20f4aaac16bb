"""Cosine similarity kernel parity tests vs sklearn."""
import numpy as np
import pytest

from pyvisim_tpu.ops import cosine_similarity_matrix, pairwise_euclidean


def test_matches_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics.pairwise")
    x = rng.normal(size=(20, 64)).astype(np.float32)
    y = rng.normal(size=(30, 64)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(cosine_similarity_matrix(x, y)),
        sk.cosine_similarity(x, y),
        rtol=1e-4,
        atol=1e-5,
    )


def test_zero_rows_give_zero_similarity(rng):
    x = np.zeros((2, 8), np.float32)
    y = rng.normal(size=(3, 8)).astype(np.float32)
    out = np.asarray(cosine_similarity_matrix(x, y))
    np.testing.assert_array_equal(out, 0.0)


def test_self_similarity_diag_is_one(rng):
    x = rng.normal(size=(10, 32)).astype(np.float32)
    out = np.asarray(cosine_similarity_matrix(x, x))
    np.testing.assert_allclose(np.diag(out), 1.0, atol=1e-5)


def test_euclidean_matches_numpy(rng):
    x = rng.normal(size=(15, 16)).astype(np.float32)
    y = rng.normal(size=(12, 16)).astype(np.float32)
    want = np.sqrt(((x[:, None] - y[None]) ** 2).sum(-1))
    np.testing.assert_allclose(
        np.asarray(pairwise_euclidean(x, y)), want, rtol=1e-3, atol=1e-4
    )
