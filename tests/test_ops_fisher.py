"""Fisher Vector core parity tests.

Golden values: (a) sklearn GaussianMixture.predict_proba on the *real*
reference pickle (gmm_k256_sift_pca.pkl: K=256 diag, D=64) for the posterior
kernel, and (b) an independent numpy transcription of the reference FV
formulas (pyvisim/encoders/fisher_vector.py:99-129) for the full encoding.
"""
import os

import numpy as np
import pytest

from pyvisim_tpu.ops import (
    GmmCodebook,
    fisher_encode,
    fisher_encode_batch,
    gmm_posteriors,
)

REF_GMM_PKL = "/root/reference/pyvisim/res/model_files/gmm_k256_sift_pca.pkl"


def numpy_fisher(desc, w, mu, cov, power=0.5, norm_order=2, eps=1e-9):
    """Numpy golden model of the reference FV semantics (incl. the
    sign-flipped d_sigma)."""
    # diag gaussian log prob
    lp = (
        -0.5 * (desc.shape[1] * np.log(2 * np.pi) + np.log(cov).sum(1))[None, :]
        - 0.5
        * (
            (desc**2) @ (1.0 / cov).T
            - 2 * desc @ (mu / cov).T
            + (mu**2 / cov).sum(1)[None, :]
        )
        + np.log(w)[None, :]
    )
    lp = lp - lp.max(1, keepdims=True)
    q = np.exp(lp)
    q = q / q.sum(1, keepdims=True)

    n = len(desc)
    pp_sum = q.mean(0)
    pp_x = q.T @ desc / n
    pp_x2 = q.T @ (desc**2) / n

    d_pi = pp_sum - w
    d_mu = pp_x - pp_sum[:, None] * mu
    d_sigma = -pp_x2 - pp_sum[:, None] * mu**2 + pp_sum[:, None] * cov + 2 * pp_x * mu

    sw = np.sqrt(w)
    d_pi = d_pi / sw
    d_mu = d_mu / (sw[:, None] * np.sqrt(cov))
    d_sigma = d_sigma / (np.sqrt(2) * sw[:, None] * cov)

    v = np.hstack([d_pi, d_mu.ravel(), d_sigma.ravel()])
    v = np.sign(v) * np.abs(v) ** power
    v = v / (np.linalg.norm(v, ord=norm_order) + eps)
    return v


@pytest.fixture
def small_gmm(rng):
    k, d = 8, 16
    w = rng.random(k) + 0.1
    w = (w / w.sum()).astype(np.float32)
    mu = rng.normal(size=(k, d)).astype(np.float32)
    cov = (rng.random((k, d)) + 0.5).astype(np.float32)
    return GmmCodebook(weights=w, means=mu, covariances=cov)


def test_fisher_matches_reference_semantics(rng, small_gmm):
    desc = rng.normal(size=(400, 16)).astype(np.float32)
    got = np.asarray(fisher_encode(desc, None, small_gmm))
    want = numpy_fisher(
        desc,
        np.asarray(small_gmm.weights),
        np.asarray(small_gmm.means),
        np.asarray(small_gmm.covariances),
    )
    assert got.shape == (2 * 8 * 16 + 8,)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-5)


def test_fisher_power_one_and_l1(rng, small_gmm):
    desc = rng.normal(size=(100, 16)).astype(np.float32)
    got = np.asarray(
        fisher_encode(desc, None, small_gmm, power_norm_weight=1.0, norm_order=1.0)
    )
    want = numpy_fisher(
        desc,
        np.asarray(small_gmm.weights),
        np.asarray(small_gmm.means),
        np.asarray(small_gmm.covariances),
        power=1.0,
        norm_order=1,
    )
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-5)


def test_mask_equals_truncation(rng, small_gmm):
    desc = rng.normal(size=(200, 16)).astype(np.float32)
    mask = np.zeros(200, bool)
    mask[:77] = True
    got = np.asarray(fisher_encode(desc, mask, small_gmm))
    want = np.asarray(fisher_encode(desc[:77], None, small_gmm))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_chunked_equals_direct(rng, small_gmm):
    desc = rng.normal(size=(300, 16)).astype(np.float32)
    a = np.asarray(fisher_encode(desc, None, small_gmm, chunk_size=64))
    b = np.asarray(fisher_encode(desc, None, small_gmm))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_batch_matches_loop(rng, small_gmm):
    batch = rng.normal(size=(3, 120, 16)).astype(np.float32)
    got = np.asarray(fisher_encode_batch(batch, None, small_gmm))
    for i in range(3):
        want = np.asarray(fisher_encode(batch[i], None, small_gmm))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_GMM_PKL), reason="reference pickle absent")
def test_posteriors_match_sklearn_on_real_pickle(rng):
    from pyvisim_tpu._utils import load_sklearn_pickle

    gmm_sk = load_sklearn_pickle(REF_GMM_PKL, allow_version_skew=True)
    gmm = GmmCodebook.from_sklearn(gmm_sk)
    desc = (gmm_sk.means_[rng.integers(0, 256, size=64)]).astype(np.float32)
    desc += rng.normal(scale=0.3, size=desc.shape).astype(np.float32)
    want = gmm_sk.predict_proba(desc.astype(np.float64))
    got = np.asarray(gmm_posteriors(desc, gmm))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.skipif(not os.path.exists(REF_GMM_PKL), reason="reference pickle absent")
def test_fisher_on_real_pickle_shape_and_norm(rng):
    from pyvisim_tpu._utils import load_sklearn_pickle

    gmm_sk = load_sklearn_pickle(REF_GMM_PKL, allow_version_skew=True)
    gmm = GmmCodebook.from_sklearn(gmm_sk)
    desc = rng.normal(size=(500, 64)).astype(np.float32)
    v = np.asarray(fisher_encode(desc, None, gmm))
    assert v.shape == (2 * 256 * 64 + 256,)  # 33024
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
