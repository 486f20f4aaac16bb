"""Clustering encoded images and scoring against ground truth.

Mirrors the reference's clustering_images_using_{vlad,fv,pipeline}.ipynb:
encode a labeled image set, run spectral clustering on the vectors and on
the cosine-similarity matrix, report RI/ARI/NMI.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

# PYVISIM_EXAMPLE_FAST=1 shrinks the problem so the script doubles as a
# CPU-sized smoke test (tests/test_examples.py); the flow is identical.
FAST = bool(os.environ.get("PYVISIM_EXAMPLE_FAST"))

from pyvisim_tpu._utils import (
    cluster_images_and_generate_statistics,
    cosine_similarity,
)
from pyvisim_tpu.encoders import FisherVectorEncoder, Pipeline, VLADEncoder
from pyvisim_tpu.features import RootSIFT


def class_images(seed, n, h=220, w=280):
    rng = np.random.default_rng(seed)
    import cv2

    base = np.zeros((h, w), np.float32)
    for _ in range(25):
        y, x = rng.integers(25, h - 25), rng.integers(25, w - 25)
        s = rng.integers(3, 11)
        yy, xx = np.mgrid[-22:23, -22:23]
        base[y - 22 : y + 23, x - 22 : x + 23] += np.exp(
            -(yy**2 + xx**2) / (2 * s**2)
        ) * rng.uniform(60, 220)
    imgs = []
    for _ in range(n):
        m = cv2.getRotationMatrix2D((w / 2, h / 2), rng.uniform(-8, 8), 1.0)
        img = cv2.warpAffine(np.clip(base, 0, 255), m, (w, h))
        imgs.append(np.stack([img.astype(np.uint8)] * 3, -1))
    return imgs


def main():
    n_classes, per_class = (4, 3) if FAST else (4, 6)
    hw = dict(h=128, w=160) if FAST else {}
    kp, k = (128, 4) if FAST else (256, 8)
    images, labels = [], []
    for c in range(n_classes):
        images += class_images(100 + c, per_class, **hw)
        labels += [c] * per_class
    labels = np.array(labels)

    shared = RootSIFT(max_keypoints=kp)
    vlad = VLADEncoder(feature_extractor=shared)
    vlad.learn(images, n_clusters=k)
    fv = FisherVectorEncoder(feature_extractor=shared)
    fv.learn(images, n_clusters=k)

    for name, enc in [("VLAD", vlad), ("FisherVector", fv), ("Pipeline", Pipeline([vlad, fv]))]:
        vecs = enc.encode(images)
        stats_v = cluster_images_and_generate_statistics(
            vecs, labels, n_classes, method="spectral"
        )
        sims = cosine_similarity(vecs, vecs)
        stats_s = cluster_images_and_generate_statistics(
            sims, labels, n_classes, method="spectral"
        )
        print(f"{name:13s} on vectors: {stats_v}")
        print(f"{name:13s} on sims:    {stats_s}")


if __name__ == "__main__":
    main()
