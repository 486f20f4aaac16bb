"""Property tests: normalization and similarity invariants
(SURVEY.md §4 test-strategy plan)."""
import numpy as np
import pytest

from pyvisim_tpu.ops import (
    GmmCodebook,
    cosine_similarity_matrix,
    fisher_encode,
    vlad_encode,
)


@pytest.fixture
def setup(rng):
    desc = rng.normal(size=(200, 12)).astype(np.float32)
    centers = rng.normal(size=(6, 12)).astype(np.float32)
    w = rng.random(6) + 0.1
    gmm = GmmCodebook(
        weights=(w / w.sum()).astype(np.float32),
        means=centers,
        covariances=(rng.random((6, 12)) + 0.5).astype(np.float32),
    )
    return desc, centers, gmm


def test_fisher_vector_is_unit_l2(setup):
    desc, _, gmm = setup
    v = np.asarray(fisher_encode(desc, None, gmm))
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-4)


def test_vlad_rows_unit_l2(setup):
    desc, centers, _ = setup
    v = np.asarray(vlad_encode(desc, None, centers, flatten=False))
    norms = np.linalg.norm(v, axis=1)
    np.testing.assert_allclose(norms[norms > 1e-5], 1.0, atol=1e-4)


def test_cosine_scale_invariance(rng):
    x = rng.normal(size=(5, 32)).astype(np.float32)
    y = rng.normal(size=(7, 32)).astype(np.float32)
    a = np.asarray(cosine_similarity_matrix(x, y))
    b = np.asarray(cosine_similarity_matrix(3.7 * x, 0.2 * y))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_cosine_sign_flip(rng):
    x = rng.normal(size=(4, 16)).astype(np.float32)
    a = np.asarray(cosine_similarity_matrix(x, x))
    b = np.asarray(cosine_similarity_matrix(-x, x))
    np.testing.assert_allclose(a, -b, atol=1e-5)


def test_cosine_bounded(rng):
    x = rng.normal(size=(20, 8)).astype(np.float32)
    s = np.asarray(cosine_similarity_matrix(x, x))
    assert s.min() >= -1.0 - 1e-5 and s.max() <= 1.0 + 1e-5


def test_vlad_descriptor_permutation_invariance(setup, rng):
    desc, centers, _ = setup
    perm = rng.permutation(desc.shape[0])
    a = np.asarray(vlad_encode(desc, None, centers))
    b = np.asarray(vlad_encode(desc[perm], None, centers))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fisher_descriptor_permutation_invariance(setup, rng):
    desc, _, gmm = setup
    perm = rng.permutation(desc.shape[0])
    a = np.asarray(fisher_encode(desc, None, gmm))
    b = np.asarray(fisher_encode(desc[perm], None, gmm))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fisher_duplication_invariance(setup):
    """FV statistics are means over N -> duplicating the descriptor set
    leaves the encoding unchanged."""
    desc, _, gmm = setup
    a = np.asarray(fisher_encode(desc, None, gmm))
    b = np.asarray(fisher_encode(np.vstack([desc, desc]), None, gmm))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
