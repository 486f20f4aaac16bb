"""End-to-end retrieval integration: the full TPU stack vs the
reference-style OpenCV stack on a synthetic mini-dataset.

This is the environment-local stand-in for the Oxford-102 parity gates
(BASELINE.md): the dataset cannot be downloaded in a zero-egress image, so
quality parity is gated *cross-stack* — our TPU SIFT feeding the TPU
VLAD/FV encoders must retrieve as well as OpenCV SIFT feeding the same
encoders on identical images.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pyvisim_tpu.encoders import FisherVectorEncoder, VLADEncoder
from pyvisim_tpu.eval import top_k_accuracy, top_k_map
from pyvisim_tpu.features import RootSIFT


def make_class_images(seed, n, h=240, w=300):
    """One 'class' = a structured base scene + mild affine/noise variants."""
    rng = np.random.default_rng(seed)
    base = np.zeros((h, w), np.float32)
    for _ in range(25):
        y, x = rng.integers(30, h - 30), rng.integers(30, w - 30)
        s = rng.integers(3, 12)
        yy, xx = np.mgrid[-25:26, -25:26]
        base[y - 25 : y + 26, x - 25 : x + 26] += np.exp(
            -(yy**2 + xx**2) / (2 * s**2)
        ) * rng.uniform(60, 220)
    base = np.clip(base, 0, 255)
    images = []
    for i in range(n):
        ang = rng.uniform(-8, 8)
        scale = rng.uniform(0.92, 1.08)
        m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, scale)
        m[:, 2] += rng.uniform(-8, 8, size=2)
        img = cv2.warpAffine(base, m, (w, h))
        img = np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(np.uint8)
        images.append(np.stack([img] * 3, axis=-1))
    return images


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("minids")
    gallery_paths, gallery_labels = [], {}
    queries, query_labels = [], []
    for cls in range(4):
        imgs = make_class_images(seed=100 + cls, n=6)
        for i, img in enumerate(imgs[:4]):
            p = str(d / f"c{cls}_{i}.png")
            cv2.imwrite(p, img)
            gallery_paths.append(p)
            gallery_labels[p] = cls
        for img in imgs[4:]:
            queries.append(img)
            query_labels.append(cls)
    return gallery_paths, gallery_labels, queries, query_labels


def run_stack(backend, mini_dataset, encoder_cls, **enc_kwargs):
    gallery_paths, gallery_labels, queries, query_labels = mini_dataset
    # small processing size keeps the test fast
    ext = RootSIFT(backend=backend, max_keypoints=512, process_size=256)
    enc = encoder_cls(feature_extractor=ext, **enc_kwargs)
    from pyvisim_tpu.io import imread_rgb

    train_imgs = [imread_rgb(p) for p in gallery_paths]
    enc.learn(train_imgs, n_clusters=16)
    emap = enc.generate_encoding_map(gallery_paths)
    top1 = top_k_accuracy(queries, query_labels, emap, gallery_labels, enc, k=1)
    m = top_k_map(queries, query_labels, emap, gallery_labels, enc, k=4)
    return top1, m


@pytest.mark.parametrize("encoder_cls", [VLADEncoder, FisherVectorEncoder])
def test_tpu_stack_matches_opencv_stack(mini_dataset, encoder_cls):
    tpu_top1, tpu_map = run_stack("tpu", mini_dataset, encoder_cls)
    cv_top1, cv_map = run_stack("opencv", mini_dataset, encoder_cls)
    # both stacks must clearly beat the 0.25 random baseline …
    assert cv_top1 > 0.5, f"opencv stack failed sanity: top1={cv_top1}"
    assert tpu_top1 > 0.5, f"tpu stack failed sanity: top1={tpu_top1}"
    # … and the TPU stack must be within reach of the opencv stack
    assert tpu_top1 >= cv_top1 - 0.15
    assert tpu_map >= cv_map - 0.15
