"""Retrieval evaluation: mAP and top-k accuracy on Oxford Flowers-102.

Mirrors the reference's examples/m_ap_and_top_k_accuracy.ipynb: gallery =
train split (6,149 images, swapped-split semantics), queries = validation
+ test (2,040), VGG16 deep features with spatial encoding, k=256
vocabulary. Requires network access for the dataset download and a
converted torchvision VGG16 checkpoint for pretrained features.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

# PYVISIM_EXAMPLE_FAST=1 shrinks the problem so the script doubles as a
# CPU-sized smoke test (tests/test_examples.py); the flow is identical.
FAST = bool(os.environ.get("PYVISIM_EXAMPLE_FAST"))

from pyvisim_tpu.datasets import OxfordFlowerDataset
from pyvisim_tpu.encoders import VLADEncoder
from pyvisim_tpu.eval import top_k_accuracy, top_k_map
from pyvisim_tpu.features import DeepConvFeature
from pyvisim_tpu.profiling import Throughput


def _synthetic_fallback():
    """Zero-egress environments: demonstrate the same eval API on a tiny
    synthetic gallery (class = dominant color family) instead of dying on
    the Oxford-102 download."""
    rng = np.random.default_rng(0)
    side = 96 if FAST else 160
    imgs, labels = [], []
    for i in range(24):
        label = i % 4
        img = np.zeros((side, side, 3), np.uint8)
        img[..., label % 3] = 120 + 30 * (label // 3)
        img = np.clip(
            img.astype(np.int32) + rng.integers(-60, 60, img.shape), 0, 255
        ).astype(np.uint8)
        imgs.append(img)
        labels.append(label)

    ext = DeepConvFeature(image_size=32 if FAST else 64)
    encoder = VLADEncoder(feature_extractor=ext)
    encoder.learn(imgs[::2], n_clusters=4 if FAST else 8)
    paths = [f"mem://{i}" for i in range(16)]
    emap = {
        p: np.asarray(encoder.encode([img]))[0]
        for p, img in zip(paths, imgs[:16])
    }
    path_labels = dict(zip(paths, labels[:16]))
    q_imgs, q_labels = imgs[16:], labels[16:]
    top1 = top_k_accuracy(q_imgs, q_labels, emap, path_labels, encoder, k=1)
    m = top_k_map(q_imgs, q_labels, emap, path_labels, encoder, k=5)
    print(f"[synthetic fallback] top-1={top1:.4f} mAP@5={m:.4f}")


def main():
    try:
        train = OxfordFlowerDataset(purpose="train")
        queries = OxfordFlowerDataset(purpose=["validation", "test"])
    except Exception as e:  # zero-egress image: no dataset download
        print(f"Oxford-102 unavailable ({type(e).__name__}); "
              "running the synthetic-gallery fallback instead.")
        _synthetic_fallback()
        return
    print(f"gallery={len(train)} queries={len(queries)}")

    # Pretrained VGG16: convert a torchvision checkpoint with
    # models.vgg.params_from_torch_state_dict(torch.load("vgg16.pth"))
    ext = DeepConvFeature()  # random init unless params are provided
    encoder = VLADEncoder(feature_extractor=ext)
    encoder.learn(
        [train[i][0] for i in range(0, len(train), 8)], n_clusters=256
    )

    meter = Throughput()
    emap = encoder.generate_encoding_map(train.image_paths, batch_size=128)
    meter.update(len(train))
    print(f"gallery encoded at {meter.rate:.0f} img/s")

    path_labels = dict(zip(train.image_paths, train.labels))
    q_imgs = [queries[i][0] for i in range(len(queries))]
    top1 = top_k_accuracy(q_imgs, queries.labels, emap, path_labels, encoder, k=1)
    top5 = top_k_accuracy(q_imgs, queries.labels, emap, path_labels, encoder, k=5)
    m = top_k_map(q_imgs, queries.labels, emap, path_labels, encoder, k=5)
    print(f"top-1={top1:.4f} top-5={top5:.4f} mAP@5={m:.4f}")
    # Reference baselines (pretrained weights): top-1 0.6975, top-5 0.8672


if __name__ == "__main__":
    main()
