"""Train and ship K-Means vocabulary artifacts for the SIFT/RootSIFT families.

The reference's six KMeans pickles are absent from its own mount
(/root/reference/.MISSING_LARGE_BLOBS), so the `KMeansWeights.*` registry
entries (reference parity: pyvisim/encoders/_base_encoder.py:124-130) had
nothing to resolve to. This script regenerates them with the framework's
own pipeline so the pretrained-VLAD path is exercisable end-to-end:

    corpus -> SIFT / RootSIFT descriptors (ops/sift.py, TPU pipeline)
           -> [optional PCA projection with the shipped reference PCA]
           -> K-Means k=256 (ops/kmeans.py, jit Lloyd + k-means++)
           -> res/model_files/k_means_k256_{family}_{pca|no_pca}.npz

By default the corpus is a reproducible seeded synthetic set (structured
shapes + texture + blur, so SIFT finds real keypoints); pass
``--corpus DIR`` with JPEG/PNG images (e.g. Oxford-102) to train production
vocabularies instead — the artifact format and registry wiring are
identical. Artifacts carry a ``__provenance__`` note.

Usage:
    python tools/train_vocabularies.py [--images 96] [--seed 0] [--cpu]
                                       [--corpus DIR] [--k 256]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def synthetic_corpus(n_images: int, seed: int, size: int = 384) -> list[np.ndarray]:
    """Reproducible structured images: filled/outlined polygons, ellipses,
    gradient backgrounds, and Gaussian texture — enough corners and blobs
    for a few hundred SIFT keypoints per image."""
    import cv2

    rng = np.random.default_rng(seed)
    images = []
    for _ in range(n_images):
        # gradient background
        gx, gy = rng.uniform(0, 255, 2)
        ramp = np.linspace(0, 1, size, dtype=np.float32)
        img = (gx * ramp[None, :] + gy * ramp[:, None])[..., None]
        img = np.repeat(img, 3, axis=2)
        # random shapes
        for _ in range(int(rng.integers(40, 80))):
            color = tuple(int(c) for c in rng.integers(0, 256, 3))
            kind = rng.integers(0, 3)
            if kind == 0:
                pts = rng.integers(0, size, (int(rng.integers(3, 7)), 2))
                cv2.fillPoly(img, [pts.astype(np.int32)], color)
            elif kind == 1:
                center = tuple(int(c) for c in rng.integers(0, size, 2))
                axes = tuple(int(a) for a in rng.integers(8, size // 4, 2))
                cv2.ellipse(img, center, axes, float(rng.uniform(0, 180)),
                            0, 360, color, thickness=int(rng.integers(-1, 4)))
            else:
                p1 = tuple(int(c) for c in rng.integers(0, size, 2))
                p2 = tuple(int(c) for c in rng.integers(0, size, 2))
                cv2.rectangle(img, p1, p2, color,
                              thickness=int(rng.integers(-1, 4)))
        # texture + mild blur
        img += rng.normal(0, 6.0, img.shape)
        img = cv2.GaussianBlur(img.clip(0, 255).astype(np.float32), (0, 0),
                               float(rng.uniform(0.5, 1.2)))
        images.append(img.clip(0, 255).astype(np.uint8))
    return images


def load_corpus(directory: Path) -> list[np.ndarray]:
    from pyvisim_tpu.io import imread_rgb

    paths = sorted(
        p for p in directory.rglob("*")
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    if not paths:
        raise SystemExit(f"no images found under {directory}")
    return [imread_rgb(str(p)) for p in paths]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", type=int, default=96,
                    help="synthetic corpus size (ignored with --corpus)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--corpus", type=Path, default=None,
                    help="directory of real images to train on instead")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (slow; CI/debug)")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pyvisim_tpu.features import SIFT, RootSIFT
    from pyvisim_tpu.ops import codebooks as cb
    from pyvisim_tpu.ops.kmeans import kmeans_fit

    out_dir = REPO / "pyvisim_tpu" / "res" / "model_files"
    if args.corpus:
        images = load_corpus(args.corpus)
        provenance = f"corpus={args.corpus} n={len(images)} seed={args.seed}"
    else:
        images = synthetic_corpus(args.images, args.seed)
        provenance = (
            f"synthetic corpus n={len(images)} seed={args.seed} "
            "(tools/train_vocabularies.py; regenerate with --corpus "
            "<oxford102 dir> for production vocabularies)"
        )
    print(f"corpus: {len(images)} images ({provenance})")

    pca_paths = {
        "sift": out_dir / "pca_k256_sift_f2.npz",
        "root_sift": out_dir / "pca_k256_root_sift_f2.npz",
    }

    for family, extractor in (("sift", SIFT()), ("root_sift", RootSIFT())):
        descs, masks = [], []
        for i in range(0, len(images), args.batch):
            d, m = extractor.extract_batch(images[i : i + args.batch])
            descs.append(np.asarray(d, np.float32))
            masks.append(np.asarray(m, np.float32))
        desc = np.concatenate(descs).reshape(-1, extractor.output_dim)
        mask = np.concatenate(masks).reshape(-1)
        print(f"{family}: {int(mask.sum())} valid descriptors of {len(mask)}")

        variants = {"no_pca": (desc, None)}
        pca_path = pca_paths[family]
        if pca_path.exists():
            pca = cb.load_codebook(pca_path)
            # project through the projector itself (not a re-implementation)
            # so the whiten flag / variance scaling match encode time exactly
            projected = np.asarray(pca(jnp.asarray(desc)), np.float32)
            variants["pca"] = (projected, pca)
        else:
            print(f"  (no PCA artifact at {pca_path.name}; skipping pca variant)")

        for tag, (x, _) in variants.items():
            codebook, inertia = kmeans_fit(
                x, args.k, mask=mask, seed=args.seed, n_init=2, max_iters=60
            )
            path = out_dir / f"k_means_k{args.k}_{family}_{tag}.npz"
            cb.save_codebook(path, codebook)
            # append provenance without disturbing the codebook schema
            data = dict(np.load(path, allow_pickle=False))
            data["__provenance__"] = np.str_(provenance)
            np.savez(path, **data)
            print(f"  wrote {path.name} (inertia {inertia:.1f})")


if __name__ == "__main__":
    main()
