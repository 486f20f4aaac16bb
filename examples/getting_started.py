"""Getting started: learn a vocabulary, save/load it, encode and score.

Mirrors the reference's examples/getting_started.ipynb flow (learn ->
save -> load -> encode -> similarity round-trip with shape checks), on
synthetic images so it runs anywhere.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import tempfile

import numpy as np

# PYVISIM_EXAMPLE_FAST=1 shrinks the problem so the script doubles as a
# CPU-sized smoke test (tests/test_examples.py); the flow is identical.
FAST = bool(os.environ.get("PYVISIM_EXAMPLE_FAST"))

from pyvisim_tpu._utils import load_model, save_model
from pyvisim_tpu.encoders import FisherVectorEncoder, VLADEncoder
from pyvisim_tpu.features import RootSIFT


def blob_image(seed, h=240, w=300):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(25):
        y, x = rng.integers(30, h - 30), rng.integers(30, w - 30)
        s = rng.integers(3, 12)
        yy, xx = np.mgrid[-25:26, -25:26]
        img[y - 25 : y + 26, x - 25 : x + 26] += np.exp(
            -(yy**2 + xx**2) / (2 * s**2)
        ) * rng.uniform(60, 220)
    return np.stack([np.clip(img, 0, 255).astype(np.uint8)] * 3, axis=-1)


def main():
    n_img, kp, k = (4, 192, 8) if FAST else (8, 512, 32)
    h, w = (144, 176) if FAST else (240, 300)
    images = [blob_image(i, h, w) for i in range(n_img)]

    # VLAD with a learned K-Means vocabulary (k=32, PCA to 64-D)
    vlad = VLADEncoder(feature_extractor=RootSIFT(max_keypoints=kp))
    vlad.learn(images, n_clusters=k, dim_reduction_factor=2)
    enc = vlad.encode(images[:2])
    print("VLAD encodings:", enc.shape)  # (2, 32*64) = (2, 2048)

    # Persist + reload the vocabulary (.npz codebook)
    with tempfile.TemporaryDirectory() as d:
        save_model(vlad.clustering_model, f"{d}/kmeans.npz")
        save_model(vlad.pca, f"{d}/pca.npz")
        vlad2 = VLADEncoder(
            feature_extractor=RootSIFT(max_keypoints=kp),
            pca=load_model(f"{d}/pca.npz"),
            kmeans_model=load_model(f"{d}/kmeans.npz"),
        )
        score = vlad2.similarity_score(images[0], images[1])
        print("VLAD similarity img0 vs img1:", float(score[0, 0]))

    # Fisher Vectors with a learned GMM vocabulary
    fv = FisherVectorEncoder(feature_extractor=RootSIFT(max_keypoints=kp))
    fv.learn(images, n_clusters=k, dim_reduction_factor=2)
    enc = fv.encode(images[:2])
    print("FV encodings:", enc.shape)  # (2, 2*32*64+32) = (2, 4128)
    print("FV similarity:", float(fv.similarity_score(images[0], images[1])[0, 0]))


if __name__ == "__main__":
    main()
