"""TPU SIFT parity tests vs OpenCV's C++ implementation.

Keypoint sets cannot match exactly (OpenCV emits extra keypoints at
secondary orientation peaks; fixed processing resolution) — the acceptance
gates are keypoint-position recall and descriptor cosine on matched pairs
(SURVEY.md §7 hard-part 1); end-to-end retrieval parity is gated in the
integration tests.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pyvisim_tpu.ops.sift import SiftConfig, _letterbox, sift_descriptors

CFG = SiftConfig(process_size=256, max_keypoints=512)


def blob_image(seed=0, h=256, w=320):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(30):
        y, x = rng.integers(30, h - 30), rng.integers(30, w - 30)
        s = rng.integers(3, 14)
        yy, xx = np.mgrid[-28:29, -28:29]
        img[y - 28 : y + 29, x - 28 : x + 29] += np.exp(
            -(yy**2 + xx**2) / (2 * s**2)
        ) * rng.uniform(60, 200)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def ours_and_cv():
    img = blob_image()
    out = sift_descriptors([img], CFG)
    mask = np.asarray(out["mask"][0]) > 0
    ours = {
        "x": np.asarray(out["x"][0])[mask],
        "y": np.asarray(out["y"][0])[mask],
        "desc": np.asarray(out["desc"][0])[mask],
    }
    lb = _letterbox(img, CFG.process_size).astype(np.uint8)
    kps, cv_desc = cv2.SIFT.create().detectAndCompute(lb, None)
    return ours, np.array([k.pt for k in kps]), cv_desc


def test_keypoints_found(ours_and_cv):
    ours, cv_pts, _ = ours_and_cv
    assert len(ours["x"]) > 20
    assert len(cv_pts) > 20


def test_keypoint_positions_match_opencv(ours_and_cv):
    ours, cv_pts, _ = ours_and_cv
    d = np.sqrt(
        (ours["x"][:, None] - cv_pts[None, :, 0]) ** 2
        + (ours["y"][:, None] - cv_pts[None, :, 1]) ** 2
    )
    frac_matched = (d.min(axis=1) < 2.0).mean()
    assert frac_matched > 0.8, f"only {frac_matched:.0%} of our kps near a cv2 kp"


def test_descriptors_match_opencv(ours_and_cv):
    ours, cv_pts, cv_desc = ours_and_cv
    cosines = []
    for i in range(len(ours["x"])):
        d = np.sqrt(
            (cv_pts[:, 0] - ours["x"][i]) ** 2 + (cv_pts[:, 1] - ours["y"][i]) ** 2
        )
        near = np.where(d < 2.0)[0]
        if len(near) == 0:
            continue
        a = ours["desc"][i]
        cos = (cv_desc[near] @ a) / (
            np.linalg.norm(cv_desc[near], axis=1) * np.linalg.norm(a) + 1e-9
        )
        cosines.append(cos.max())
    cosines = np.array(cosines)
    assert len(cosines) > 20
    assert np.median(cosines) > 0.95
    assert (cosines > 0.8).mean() > 0.85


def test_descriptor_range_and_shape(ours_and_cv):
    ours, _, _ = ours_and_cv
    d = ours["desc"]
    assert d.shape[1] == 128
    assert d.min() >= 0.0 and d.max() <= 255.0


def test_batch_deterministic():
    img = blob_image(seed=3)
    out = sift_descriptors([img, img], CFG)
    np.testing.assert_allclose(
        np.asarray(out["desc"][0]), np.asarray(out["desc"][1]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out["mask"][0]), np.asarray(out["mask"][1])
    )


def test_root_sift_hellinger():
    img = blob_image(seed=4)
    plain = sift_descriptors([img], CFG)
    root = sift_descriptors([img], CFG, root_sift=True)
    mask = np.asarray(plain["mask"][0]) > 0
    d = np.asarray(plain["desc"][0])[mask]
    want = d / (d.sum(axis=1, keepdims=True) + 1e-7)
    want = np.sqrt(want)
    got = np.asarray(root["desc"][0])[mask]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_extractor_api():
    from pyvisim_tpu.features import SIFT, RootSIFT

    img = np.stack([blob_image(seed=5)] * 3, axis=-1)  # HWC RGB
    ext = SIFT(backend="tpu", max_keypoints=256)
    # Note: feature extractors re-letterbox internally at the default
    # process size; just check the contract here.
    desc = ext(img)
    assert desc.ndim == 2 and desc.shape[1] == 128
    batch_desc, batch_mask = ext.extract_batch([img, img])
    assert batch_desc.shape == (2, 256, 128)
    r = RootSIFT(backend="tpu", max_keypoints=256)
    rd = r(img)
    assert rd.shape[1] == 128
    # Hellinger-mapped descriptors have unit L2 norm (sqrt of L1-normalized)
    norms = np.linalg.norm(rd, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=0.02)


def test_opencv_backend_parity_of_rootsift_formula():
    from pyvisim_tpu.features import RootSIFT, SIFT

    img = np.stack([blob_image(seed=6)] * 3, axis=-1)
    s = SIFT(backend="opencv")(img)
    r = RootSIFT(backend="opencv")(img)
    want = np.sqrt(s / (s.sum(axis=1, keepdims=True) + 1e-7))
    np.testing.assert_allclose(r, want, atol=1e-5)


def test_real_photograph_parity():
    """Descriptor parity on a real photograph (matplotlib's bundled
    grace_hopper.jpg): matched keypoints must have near-identical
    descriptors; our float32 pipeline legitimately finds a superset of
    cv2's fixed-point keypoints."""
    import matplotlib.cbook as cbook
    from PIL import Image

    with cbook.get_sample_data("grace_hopper.jpg") as f:
        img = np.asarray(Image.open(f))
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    cfg = SiftConfig(process_size=256, max_keypoints=1024)
    out = sift_descriptors([gray], cfg)
    mask = np.asarray(out["mask"][0]) > 0
    x = np.asarray(out["x"][0])[mask]
    y = np.asarray(out["y"][0])[mask]
    desc = np.asarray(out["desc"][0])[mask]

    lb = _letterbox(gray, 256).astype(np.uint8)
    kps, cvd = cv2.SIFT.create().detectAndCompute(lb, None)
    pts = np.array([k.pt for k in kps])
    # recall: most cv2 keypoints have one of ours within 2px
    d_cv = np.sqrt(
        (pts[:, 0][:, None] - x[None, :]) ** 2
        + (pts[:, 1][:, None] - y[None, :]) ** 2
    ).min(1)
    assert (d_cv < 2.0).mean() > 0.6
    cosines = []
    for i in range(len(x)):
        d = np.sqrt((pts[:, 0] - x[i]) ** 2 + (pts[:, 1] - y[i]) ** 2)
        near = np.where(d < 2.0)[0]
        if len(near) == 0:
            continue
        c = (cvd[near] @ desc[i]) / (
            np.linalg.norm(cvd[near], axis=1) * np.linalg.norm(desc[i]) + 1e-9
        )
        cosines.append(c.max())
    cosines = np.array(cosines)
    assert len(cosines) > 100
    assert np.median(cosines) > 0.95
    assert (cosines > 0.8).mean() > 0.85


def test_sift_batch_chunks_large_batches(monkeypatch):
    """Batches beyond the device-batch cap split into multiple device
    calls (bounding the ~35 MB/img atlas HBM footprint) with identical
    results."""
    from pyvisim_tpu.ops import sift as S

    rng = np.random.default_rng(7)
    cfg = S.SiftConfig(process_size=128, max_keypoints=64)
    imgs = [(rng.random((90, 110)) * 255).astype(np.uint8) for _ in range(5)]
    monkeypatch.setenv("PYVISIM_SIFT_DEVICE_BATCH", "2")
    d_c, m_c = S.sift_batch(imgs, max_keypoints=64, cfg=cfg)
    monkeypatch.setenv("PYVISIM_SIFT_DEVICE_BATCH", "16")
    d_r, m_r = S.sift_batch(imgs, max_keypoints=64, cfg=cfg)
    assert d_c.shape == (5, 64, 128)
    np.testing.assert_array_equal(np.asarray(m_c), np.asarray(m_r))
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_r), atol=1e-4)


def test_sift_descriptors_packed_wire_full_dict(monkeypatch):
    """The multi-chunk wire packs all non-desc planes into ONE stacked
    fetch (relay round trips dominate small transfers); geometry planes
    (x/y/size/theta/response) must survive the pack exactly, and the
    keys= filter must not change desc/mask."""
    from pyvisim_tpu.ops import sift as S

    rng = np.random.default_rng(11)
    cfg = S.SiftConfig(process_size=128, max_keypoints=64)
    imgs = [(rng.random((90, 110)) * 255).astype(np.uint8) for _ in range(5)]
    monkeypatch.setenv("PYVISIM_SIFT_DEVICE_BATCH", "2")
    full = S.sift_descriptors(imgs, cfg)
    slim = S.sift_descriptors(imgs, cfg, keys=("desc", "mask"))
    monkeypatch.setenv("PYVISIM_SIFT_DEVICE_BATCH", "16")
    ref = S.sift_descriptors(imgs, cfg)

    assert set(full) == {"desc", "mask", "x", "y", "size", "theta", "response"}
    assert set(slim) == {"desc", "mask"}
    for k in ("x", "y", "size", "theta", "response", "mask"):
        np.testing.assert_array_equal(
            np.asarray(full[k]), np.asarray(ref[k]), err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(full["desc"]), np.asarray(ref["desc"]), atol=1e-4
    )
    np.testing.assert_array_equal(full["desc"], slim["desc"])
    np.testing.assert_array_equal(full["mask"], slim["mask"])


def test_sift_config_radius_class_coverage():
    """ADVICE r2: the largest radius class must cover the worst-case patch
    radius — radius_class() clamps out-of-range scales to the last class,
    so an undersized ladder would silently truncate patches."""
    import pytest

    from pyvisim_tpu.ops.sift import SiftConfig

    with pytest.raises(ValueError, match="ori_patch_radius"):
        SiftConfig(ori_radius_classes=(12,))
    with pytest.raises(ValueError, match="desc_patch_radius"):
        SiftConfig(desc_radius_classes=(24, 32))
    SiftConfig()  # defaults stay valid


def test_encoder_device_resident_descriptor_handoff():
    """encode() consumes SIFT descriptors device-resident (no host wire
    round trip; measured 13x on the relay-attached chip for the gallery
    encoding-map flow, docs/PERF.md round 3f) and must produce EXACTLY
    the wire path's encodings, including on a multi-chunk (>16) batch."""
    from pyvisim_tpu.encoders import KMeansWeights, VLADEncoder
    from pyvisim_tpu.features import RootSIFT

    def mk(seed):
        r = np.random.default_rng(seed)
        img = np.zeros((150, 180, 3), np.uint8)
        for _ in range(25):
            y, x = r.integers(15, 135), r.integers(15, 165)
            yy, xx = np.mgrid[:150, :180]
            rad = int(r.integers(3, 12))
            img[(yy - y) ** 2 + (xx - x) ** 2 < rad**2] = r.integers(60, 255, 3)
        return img

    imgs = [mk(s) for s in range(20)]  # > device_batch -> multi-chunk
    ext = RootSIFT(max_keypoints=256, process_size=128)
    enc = VLADEncoder(
        feature_extractor=ext, weights=KMeansWeights.OXFORD102_K256_ROOTSIFT
    )
    v_dev = enc.encode(imgs)  # device-resident handoff (default)
    d, m = ext.extract_batch(imgs)  # host wire path
    v_wire = enc._encode_descriptors(d, m)
    np.testing.assert_array_equal(v_dev, v_wire)


@pytest.mark.parametrize("ps", [32, 96, 200, 222])
def test_fold_geometry_odd_process_sizes(ps):
    # ps=222 makes the top octave width == 14 (mod 16): the 16-col-aligned
    # Pallas refine window can then start ON a right-edge candidate column,
    # the worst case for the fold's right pad (regression guard)
    """The row-folded atlas/DoG layouts must hold (and the Pallas window
    kernels must match XLA exactly) at process sizes whose octave dims
    are not multiples of 8 — exercises every rounding path in the fold
    geometry."""
    import jax.numpy as jnp

    from pyvisim_tpu.ops import sift as S

    rng_np = np.random.default_rng(0)
    img = (rng_np.random((ps + 13, ps - 5)) * 255).astype(np.uint8)
    base = jnp.asarray(S._letterbox(img, ps))[None]
    kw = dict(process_size=ps, max_keypoints=128, ori_chunk=32,
              desc_chunk=16, pallas_chunk=32)
    ox = S._sift_core(base, S.SiftConfig(patch_backend="xla", **kw))
    op = S._sift_core(base, S.SiftConfig(patch_backend="pallas", **kw))
    np.testing.assert_array_equal(
        np.asarray(ox["mask"]), np.asarray(op["mask"]))
    np.testing.assert_allclose(
        np.asarray(ox["desc"]), np.asarray(op["desc"]), atol=1.0)


@pytest.mark.parametrize("reach", [5, 7])
def test_custom_refine_reach_backend_parity(reach):
    """refine_reach >= 7 grows the Pallas refine window to 48 cols; the
    folded DoG's right pad must cover the 16-col-aligned DMA (it reads
    up to lw/8 - 1 cols past a right-edge candidate — regression guard
    for the under-padded reach+25 bound). Gate: XLA and Pallas paths
    agree exactly through the full core."""
    import jax.numpy as jnp

    from pyvisim_tpu.ops import sift as S

    rng_np = np.random.default_rng(3)
    img = (rng_np.random((150, 170)) * 255).astype(np.uint8)
    base = jnp.asarray(S._letterbox(img, 128))[None]
    kw = dict(process_size=128, max_keypoints=128, ori_chunk=32,
              desc_chunk=16, pallas_chunk=32, refine_reach=reach)
    ox = S._sift_core(base, S.SiftConfig(patch_backend="xla", **kw))
    op = S._sift_core(base, S.SiftConfig(patch_backend="pallas", **kw))
    np.testing.assert_array_equal(
        np.asarray(ox["mask"]), np.asarray(op["mask"]))
    assert float(np.asarray(ox["mask"]).sum()) > 10
    np.testing.assert_allclose(
        np.asarray(ox["desc"]), np.asarray(op["desc"]), atol=1.0)
    # the fold's right col pad covers the Pallas window bound
    side = 2 * reach + 3
    lw_cols = (-(-(side + 16) * 8 // 128) * 128) // 8
    folded = S._fold_dog(
        jnp.zeros((7, 40, 48), jnp.float32), S.SiftConfig(**kw))
    wp = folded.shape[-1] // 8
    assert wp >= 48 + (reach + 1) + lw_cols - 1
