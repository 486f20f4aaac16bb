"""Multi-chip scaling walkthrough (runs on a virtual CPU mesh too).

Demonstrates the three sharded paths: distributed vocabulary training
(psum-reduced Lloyd/EM), sharded batch encoding, and mesh-aware retrieval
evaluation.

Run with:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu python examples/multichip_scaling.py
(on a real multi-chip slice, drop both env vars)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import jax

if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    # a virtual CPU mesh was requested; must switch before backend init
    jax.config.update("jax_platforms", "cpu")

import numpy as np

# PYVISIM_EXAMPLE_FAST=1 shrinks the problem so the script doubles as a
# CPU-sized smoke test (tests/test_examples.py); the flow is identical.
FAST = bool(os.environ.get("PYVISIM_EXAMPLE_FAST"))

from pyvisim_tpu.index import RetrievalIndex
from pyvisim_tpu.ops import KMeansCodebook
from pyvisim_tpu.ops.vlad import vlad_encode
from pyvisim_tpu.parallel import (
    distributed_gmm_fit,
    distributed_kmeans_fit,
    make_mesh,
    sharded_cosine_similarity,
    sharded_encode,
)


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(axis_names=("data",))
    print(f"mesh: {n_dev} devices over axis 'data'")
    rng = np.random.default_rng(0)

    # 1) distributed vocabulary training: descriptors sharded over 'data',
    #    (K, D) statistics psum-reduced
    rows, k, km_iters, gmm_iters = (512, 16, 5, 3) if FAST else (4096, 32, 20, 10)
    desc = rng.normal(size=(n_dev * rows, 64)).astype(np.float32)
    cb, inertia = distributed_kmeans_fit(desc, k, mesh, n_iters=km_iters)
    print(f"distributed kmeans: inertia/N = {inertia / len(desc):.3f}")
    gmm, ll = distributed_gmm_fit(desc, k, mesh, n_iters=gmm_iters)
    print(f"distributed gmm:    mean ll  = {ll:.3f}")

    # 2) sharded batch encoding: image batch partitioned across chips
    n_desc = 100 if FAST else 500
    batch_desc = rng.normal(size=(n_dev * 4, n_desc, 64)).astype(np.float32)
    mask = np.ones(batch_desc.shape[:2], np.float32)

    def core(d, m, model, pca):
        return jax.vmap(lambda dd, mm: vlad_encode(dd, mm, model.centers))(d, m)

    encodings = sharded_encode(core, batch_desc, mask, cb, None, mesh)
    print(f"sharded encode: {encodings.shape}")

    # 3) mesh-aware retrieval: query rows sharded over 'data'
    sims = sharded_cosine_similarity(encodings, encodings, mesh)
    print(f"sharded all-pairs similarity: {sims.shape}")

    idx = RetrievalIndex(
        np.asarray(encodings), [f"img_{i}" for i in range(encodings.shape[0])],
        mesh=mesh,
    )
    scores, ids = idx.query_vectors(np.asarray(encodings[:2]), k=3)
    print("sharded index self-query rank-1:", ids[:, 0].tolist())


if __name__ == "__main__":
    main()
