"""Pallas fused aggregation kernels vs the XLA reference path.

These run in Pallas interpret mode on CPU (the compiled path is exercised
on real TPU hardware by bench.py / the verify drive).
"""
import jax
import numpy as np
import pytest

from pyvisim_tpu.ops import GmmCodebook
from pyvisim_tpu.ops.fisher import fisher_stats
from pyvisim_tpu.ops.vlad import vlad_aggregate


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_vlad_pallas_matches_xla(rng):
    from pyvisim_tpu.ops.pallas import vlad_aggregate_pallas

    desc = rng.normal(size=(700, 32)).astype(np.float32)
    mask = (rng.random(700) > 0.1).astype(np.float32)
    centers = rng.normal(size=(16, 32)).astype(np.float32)
    got = np.asarray(vlad_aggregate_pallas(desc, mask, centers, block_n=256))
    want = np.asarray(vlad_aggregate(desc, mask, centers))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fisher_pallas_matches_xla(rng):
    from pyvisim_tpu.ops.pallas import fisher_stats_pallas

    k, d = 8, 16
    w = rng.random(k) + 0.1
    gmm = GmmCodebook(
        weights=(w / w.sum()).astype(np.float32),
        means=rng.normal(size=(k, d)).astype(np.float32),
        covariances=(rng.random((k, d)) + 0.5).astype(np.float32),
    )
    desc = rng.normal(size=(500, d)).astype(np.float32)
    mask = (rng.random(500) > 0.1).astype(np.float32)
    g0, g1, g2 = fisher_stats_pallas(
        desc, mask, gmm.weights, gmm.means, gmm.covariances, block_n=128
    )
    w0, w1, w2 = fisher_stats(desc, mask, gmm)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(w0), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(w1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2), rtol=1e-4, atol=1e-5)


def test_lloyd_pallas_matches_xla(rng):
    from pyvisim_tpu.ops.kmeans import lloyd_step
    from pyvisim_tpu.ops.pallas import lloyd_stats_pallas

    x = rng.normal(size=(600, 24)).astype(np.float32)
    mask = (rng.random(600) > 0.1).astype(np.float32)
    centers = rng.normal(size=(8, 24)).astype(np.float32)
    sums, counts, inertia = lloyd_stats_pallas(x, mask, centers, block_n=256)
    want_centers, want_inertia = lloyd_step(x, mask, centers)
    got_centers = np.where(
        np.asarray(counts)[:, None] > 0,
        np.asarray(sums) / np.maximum(np.asarray(counts)[:, None], 1.0),
        centers,
    )
    np.testing.assert_allclose(got_centers, np.asarray(want_centers), rtol=1e-4, atol=1e-4)
    assert float(inertia) == pytest.approx(float(want_inertia), rel=1e-4)


def test_kmeans_fit_pallas_backend(rng):
    from pyvisim_tpu.ops.kmeans import kmeans_fit

    centers = rng.normal(scale=8.0, size=(4, 8)).astype(np.float32)
    labels = rng.integers(0, 4, size=400)
    x = (centers[labels] + rng.normal(scale=0.2, size=(400, 8))).astype(np.float32)
    cb_p, in_p = kmeans_fit(x, 4, seed=1, use_pallas=True, chunk_size=128)
    cb_x, in_x = kmeans_fit(x, 4, seed=1, use_pallas=False)
    np.testing.assert_allclose(
        np.sort(np.asarray(cb_p.centers), 0), np.sort(np.asarray(cb_x.centers), 0),
        atol=1e-3,
    )
    assert in_p == pytest.approx(in_x, rel=1e-3)


def test_gmm_fit_pallas_backend(rng):
    from pyvisim_tpu.ops.gmm import gmm_fit

    centers = rng.normal(scale=8.0, size=(3, 6)).astype(np.float32)
    labels = rng.integers(0, 3, size=300)
    x = (centers[labels] + rng.normal(scale=0.2, size=(300, 6))).astype(np.float32)
    g_p, ll_p = gmm_fit(x, 3, seed=0, use_pallas=True, chunk_size=128)
    g_x, ll_x = gmm_fit(x, 3, seed=0, use_pallas=False)
    np.testing.assert_allclose(
        np.sort(np.asarray(g_p.means), 0), np.sort(np.asarray(g_x.means), 0),
        rtol=1e-3, atol=1e-3,
    )
    # EM may stop one iteration apart across backends; gate on closeness
    assert ll_p == pytest.approx(ll_x, abs=0.01)


def test_sift_descriptor_window_kernel_matches_xla():
    """The fused descriptor + orientation window kernels
    (ops/pallas/sift_window.py) must reproduce the XLA passes through
    the full extractor core (same detection, same orientations up to
    f32 reduction order, same rounding-to-int descriptor semantics)."""
    import jax.numpy as jnp

    from pyvisim_tpu.ops import sift as S

    rng_np = np.random.default_rng(7)
    img = (rng_np.random((180, 140)) * 255).astype(np.uint8)
    base = jnp.asarray(S._letterbox(img, 128))[None]
    kw = dict(process_size=128, max_keypoints=192, ori_chunk=64,
              desc_chunk=32, pallas_chunk=64)
    out_x = S._sift_core(base, S.SiftConfig(patch_backend="xla", **kw))
    out_p = S._sift_core(base, S.SiftConfig(patch_backend="pallas", **kw))
    assert np.array_equal(np.asarray(out_x["mask"]), np.asarray(out_p["mask"]))
    tv = np.asarray(out_x["mask"][0]) > 0
    np.testing.assert_allclose(
        np.asarray(out_p["theta"][0])[tv], np.asarray(out_x["theta"][0])[tv],
        atol=1e-5)
    dx = np.asarray(out_x["desc"][0])
    dp = np.asarray(out_p["desc"][0])
    v = np.asarray(out_x["mask"][0]) > 0
    assert v.sum() > 20
    np.testing.assert_allclose(dp[v], dx[v], atol=1.0)
    # descriptors are integer-valued (OpenCV saturate-cast semantics)
    assert float(np.abs(dp[v] - np.round(dp[v])).max()) == 0.0


def test_window_geom_lane_width_is_tight():
    """The window lane width must cover exactly p + 15 cols (the col
    residual is ws - (ws//16)*16 <= 15) rounded to full 128-lane tiles.
    Every default radius class has p = 2R+1 == 1 (mod 16), so a p+16
    bound would waste a whole extra tile per window (regression guard
    for the round-3g off-by-one: 640 -> 512 lanes at R=24)."""
    from pyvisim_tpu.ops.pallas.sift_window import _window_geom

    for radius, want_lw in [(12, 384), (16, 384), (24, 512), (32, 640),
                            (40, 768)]:
        p, nh8, lw = _window_geom(radius)
        assert p == 2 * radius + 1
        assert lw == want_lw, (radius, lw, want_lw)
        # exactness: one fewer tile could not cover p + 15 cols
        assert (lw - 128) < (p + 15) * 8 <= lw
        # rows: s0 in 0..7, so nh8 chunks must cover p + 7 rows
        assert nh8 * 8 >= p + 7 > (nh8 - 1) * 8
