"""Multi-encoder pipeline blending.

Mirrors the reference's examples/pipeline.ipynb: batch similarity matrices
from a VLAD+FV pipeline and the concat-equivalence check (pipeline score ==
cosine of hstacked per-encoder vectors, cells 18-20).
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

# PYVISIM_EXAMPLE_FAST=1 shrinks the problem so the script doubles as a
# CPU-sized smoke test (tests/test_examples.py); the flow is identical.
FAST = bool(os.environ.get("PYVISIM_EXAMPLE_FAST"))

from pyvisim_tpu._utils import cosine_similarity
from pyvisim_tpu.encoders import FisherVectorEncoder, Pipeline, VLADEncoder
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
    n_img, kp, k = (4, 192, 8) if FAST else (6, 512, 16)
    h, w = (144, 176) if FAST else (240, 300)
    images = [blob_image(i, h, w) for i in range(n_img)]

    # Encoders share ONE extractor instance -> the pipeline runs feature
    # extraction once per image (the reference re-runs it per encoder).
    shared = RootSIFT(max_keypoints=kp)
    vlad = VLADEncoder(feature_extractor=shared)
    vlad.learn(images, n_clusters=k)
    fv = FisherVectorEncoder(feature_extractor=shared)
    fv.learn(images, n_clusters=k)

    pipe = Pipeline([vlad, fv])
    vectors = pipe.encode(images)
    print("pipeline vectors:", vectors.shape)

    half = n_img // 2
    sims = pipe.similarity_score(images[:half], images[half:])
    print("batch similarity matrix:\n", np.round(sims, 4))

    # concat-equivalence: pipeline score == cosine of hstacked vectors
    manual = cosine_similarity(
        np.hstack([vlad.encode(images[:half]), fv.encode(images[:half])]),
        np.hstack([vlad.encode(images[half:]), fv.encode(images[half:])]),
    )
    print("max |pipeline - manual concat|:", float(np.abs(sims - manual).max()))


if __name__ == "__main__":
    main()
