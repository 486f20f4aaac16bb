"""Benchmark: end-to-end VLAD-k256 encoding throughput on one TPU chip.

Measures the BASELINE.md north-star metric — images/sec/chip through the
full flagship graph (uint8 images -> VGG16 last-conv descriptors + spatial
coords (514-D) -> VLAD k=256 -> normalized (B, 131584) encodings), the
pipeline the reference runs as a serial per-image Python/torch/sklearn loop
(reference: pyvisim/encoders/vlad.py:87-113 over
pyvisim/features/_features.py:263-300).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` is measured against the BASELINE.json north-star target of
5,000 images/sec/chip on v5e (the reference publishes no throughput
numbers).

Env knobs: PYVISIM_BENCH_BATCH (default 128), PYVISIM_BENCH_DTYPE
(int8|bfloat16|float32, default int8 — bf16 trunk with the MXU-bound
middle convs on the chip's int8 path), PYVISIM_BENCH_STEPS (default 20),
PYVISIM_BENCH_METRIC=throughput|latency (default throughput; latency
measures p50 single-query encode + gallery-search time, the BASELINE.md
"p50 query latency" row; sift|sift_e2e|encode_map|deep_e2e|serving_qps
select the other metric families — see each *_main docstring).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def sift_main() -> None:
    """SIFT detect+describe throughput (512² letterbox, 2048-kp budget,
    multi-orientation) — the reference's OpenCV host path runs ~20 img/s
    on one core (PYVISIM_BENCH_METRIC=sift)."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from train_vocabularies import synthetic_corpus

    from pyvisim_tpu.ops import sift as S

    # batch 16 measures best (8: 52.9, 16: 60.1, 32: 53.5 img/s)
    batch = int(os.environ.get("PYVISIM_BENCH_BATCH", "16"))
    steps = int(os.environ.get("PYVISIM_BENCH_STEPS", "10"))
    cfg = S.SiftConfig()
    imgs = synthetic_corpus(batch, 0, size=cfg.process_size)
    base = jnp.asarray(
        np.stack([S._letterbox(i.mean(axis=2), cfg.process_size) for i in imgs])
    )
    # drain with a DEVICE-side scalar checksum: np.asarray(out) would pull
    # the full 16 MB descriptor block through the ~50 MB/s relay INSIDE the
    # timed window (0.3-1 s depending on relay state — most of the metric's
    # historical run-to-run variance); one 4-byte fetch costs one ~30 ms RTT
    full = jax.jit(lambda bb: S._sift_core(bb, cfg)["desc"].sum())
    _ = float(full(base))  # compile + sync
    t0 = time.time()
    for _ in range(steps):
        out = full(base)
    _ = float(out)  # drain the in-order queue
    img_s = batch * steps / (time.time() - t0)
    print(
        json.dumps(
            {
                "metric": "sift_detect_describe_throughput",
                "value": round(img_s, 1),
                "unit": "images/sec/chip",
                # the reference's serial OpenCV path: ~20 img/s on one core
                "vs_baseline": round(img_s / 20.0, 3),
            }
        )
    )


def sift_e2e_main() -> None:
    """END-TO-END SIFT extractor throughput: ``SIFT.extract_batch`` on raw
    ragged RGB photos, INCLUDING the host grayscale+letterbox and the
    host->device transfer each call pays in production
    (PYVISIM_BENCH_METRIC=sift_e2e). The kernel-only number
    (PYVISIM_BENCH_METRIC=sift) measures the jitted core on a device-
    resident batch; VERDICT r2 weak #3 asked for both to be reported."""
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from train_vocabularies import synthetic_corpus

    from pyvisim_tpu.features import SIFT

    # 64 = four device chunks through the host/device extraction pipeline
    # (sift_descriptors overlaps letterbox/upload with device compute);
    # this is the gallery-extraction operating mode the metric models.
    batch = int(os.environ.get("PYVISIM_BENCH_BATCH", "64"))
    steps = int(os.environ.get("PYVISIM_BENCH_STEPS", "5"))
    ext = SIFT()
    # ragged raw sizes around the 512 letterbox target, RGB uint8
    imgs = [
        np.ascontiguousarray(
            np.stack([i] * 3, axis=-1)[: 480 + 8 * (j % 5), : 600 - 16 * (j % 3)]
        )
        for j, i in enumerate(
            g.mean(axis=2).astype(np.uint8)
            for g in synthetic_corpus(batch, 0, size=640)
        )
    ]
    d, m = ext.extract_batch(imgs)  # compile
    _ = float(np.asarray(d).sum())
    t0 = time.time()
    for _ in range(steps):
        d, m = ext.extract_batch(imgs)
        _ = float(np.asarray(d).sum())  # host materialization each call
    img_s = batch * steps / (time.time() - t0)
    print(
        json.dumps(
            {
                "metric": "sift_extractor_e2e_throughput",
                "value": round(img_s, 1),
                "unit": "images/sec/chip",
                # same reference anchor as the kernel metric (~20 img/s
                # serial OpenCV incl. its own host decode)
                "vs_baseline": round(img_s / 20.0, 3),
            }
        )
    )


def encode_map_main() -> None:
    """Flagship reference workflow: SIFT-family gallery encoding
    (RootSIFT -> VLAD-k256 through the public encoder API, the path
    ``generate_encoding_map`` streams), with the device-resident
    descriptor handoff (docs/PERF.md round 3f)
    (PYVISIM_BENCH_METRIC=encode_map)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from train_vocabularies import synthetic_corpus

    from pyvisim_tpu.encoders import KMeansWeights, VLADEncoder
    from pyvisim_tpu.features import RootSIFT

    batch = int(os.environ.get("PYVISIM_BENCH_BATCH", "64"))
    steps = int(os.environ.get("PYVISIM_BENCH_STEPS", "3"))
    imgs = [i.astype(np.uint8) for i in synthetic_corpus(batch, 0, size=512)]
    enc = VLADEncoder(
        feature_extractor=RootSIFT(),
        weights=KMeansWeights.OXFORD102_K256_ROOTSIFT,
    )
    _ = enc.encode(imgs)  # compile + warm
    t0 = time.time()
    for _ in range(steps):
        out = enc.encode(imgs)  # returns host numpy: true end-to-end
    img_s = batch * steps / (time.time() - t0)
    assert out.shape == (batch, 256 * 128)
    print(
        json.dumps(
            {
                "metric": "rootsift_vlad_encode_map_throughput",
                "value": round(img_s, 1),
                "unit": "images/sec/chip",
                # reference: ~20 img/s OpenCV extraction alone bounds its
                # serial extract+encode loop above the encode cost
                "vs_baseline": round(img_s / 20.0, 3),
            }
        )
    )


def deep_e2e_main() -> None:
    """END-TO-END deep-feature gallery encoding: host uint8 RGB batches
    -> ``VLADEncoder(DeepConvFeature).encode`` -> host numpy encodings,
    INCLUDING the host->device image upload and host materialization each
    call pays in production (PYVISIM_BENCH_METRIC=deep_e2e). The headline
    ``throughput`` metric times the same graph on a device-resident batch
    (multi-GB H2D through this relay is forbidden; CLAUDE.md) — this is
    its ingest-included twin, the deep-family analogue of ``encode_map``
    vs ``sift``. On this image's ~50 MB/s relay the uint8 wire
    (~150 KB/img) bounds the number; on directly-attached hardware PCIe
    moves the same bytes at >10 GB/s and the device graph dominates."""
    import jax.numpy as jnp

    from pyvisim_tpu.encoders import VLADEncoder
    from pyvisim_tpu.features import DeepConvFeature
    from pyvisim_tpu.ops.codebooks import KMeansCodebook

    batch = int(os.environ.get("PYVISIM_BENCH_BATCH", "64"))
    steps = int(os.environ.get("PYVISIM_BENCH_STEPS", "3"))
    dtype_name = os.environ.get("PYVISIM_BENCH_DTYPE", "int8")
    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    ext = DeepConvFeature(
        cfg_name="vgg16", image_size=224, spatial_encoding=True, dtype=dtype,
        int8=(dtype_name == "int8"),
    )
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.normal(size=(256, 514)).astype(np.float32))
    enc = VLADEncoder(feature_extractor=ext,
                      kmeans_model=KMeansCodebook(centers))
    imgs = [(rng.random((224, 224, 3)) * 255).astype(np.uint8)
            for _ in range(batch)]
    out = enc.encode(imgs)  # compile + warm
    assert out.shape == (batch, 256 * 514)
    t0 = time.time()
    for _ in range(steps):
        out = enc.encode(imgs)  # returns host numpy: true end-to-end
    img_s = batch * steps / (time.time() - t0)
    print(
        json.dumps(
            {
                "metric": "deep_vlad_encode_e2e_throughput",
                "value": round(img_s, 1),
                "unit": "images/sec/chip",
                # no reference throughput figure exists for its torch path
                "vs_baseline": 0.0,
            }
        )
    )


def latency_main() -> None:
    """p50 end-to-end query latency: encode ONE image (VGG16 -> VLAD-k256)
    and rank it against a 6,149-vector gallery (Oxford-102 train size)."""
    import jax
    import jax.numpy as jnp

    from pyvisim_tpu.features import DeepConvFeature
    from pyvisim_tpu.ops.vlad import vlad_encode

    dtype_name = os.environ.get("PYVISIM_BENCH_DTYPE", "int8")
    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    ext = DeepConvFeature(
        cfg_name="vgg16", image_size=224, dtype=dtype,
        int8=(dtype_name == "int8"),
    )
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.normal(size=(256, 514)).astype(np.float32))
    # generate the 6149 x 131584 gallery on-device (a ~3 GB host transfer
    # through the axon relay is pathologically slow in this image) and
    # L2-normalize it ONCE — a serving index keeps it normalized resident.
    gallery = jax.jit(
        lambda key: jax.random.normal(key, (6149, 256 * 514), jnp.float32)
    )(jax.random.PRNGKey(0))
    gallery = jax.jit(
        lambda g: g / jnp.linalg.norm(g, axis=1, keepdims=True)
    )(gallery)
    gallery.block_until_ready()

    # NOTE: the gallery is a jit *argument*, never a closure — a closed-over
    # concrete array becomes an HLO constant, and a multi-GB constant makes
    # the (remote) compile pathological.
    @jax.jit
    def query(image, gallery):
        desc = ext._forward(image[None]).astype(jnp.float32)
        vec = jax.vmap(lambda d: vlad_encode(d, None, centers))(desc)
        vec = vec / jnp.maximum(jnp.linalg.norm(vec, axis=1, keepdims=True), 1e-12)
        sims = jnp.dot(vec, gallery.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(sims[0], 5)

    img = jnp.asarray((rng.random((224, 224, 3)) * 255).astype(np.uint8))
    np.asarray(query(img, gallery)[0])  # compile + sync
    times = []
    for _ in range(30):
        t0 = time.perf_counter()
        scores, idx = query(img, gallery)
        np.asarray(scores)  # the client reads the results: true E2E latency
        times.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(times, 50) * 1e3)
    print(
        json.dumps(
            {
                "metric": "vlad_k256_query_p50_latency",
                "value": round(p50_ms, 3),
                "unit": "ms",
                "vs_baseline": 0.0,  # no reference latency value exists
            }
        )
    )


def serving_qps_main() -> None:
    """Sustained query throughput of the production serving path:
    ``RetrievalIndex(quantize="int8", screen_dim=256, rerank=128)`` over
    the BASELINE-shaped 6,149 x 131,584 gallery — int8+screen is the
    round-3k measured winner (fastest at Q=1 and Q=8 among screened
    modes AND 4x gallery density; docs/PERF.md "Serving-index modes"),
    and rerank=128 is the round-4 recall-sized default (recall@5 >= 0.99
    vs the exact scan on structured encodings; "Serving-index recall"). Queries queue
    back-to-back behind the in-order dispatch stream with ONE final
    scalar fetch, so the number is device+dispatch throughput with the
    relay RTT amortized — the steady-state QPS a serving loop sustains
    (per-query wall latency on this relay adds the ~30 ms RTT; see
    PYVISIM_BENCH_METRIC=latency)."""
    import time

    import jax
    import jax.numpy as jnp

    from pyvisim_tpu.index import RetrievalIndex

    n, d = 6149, 256 * 514
    gallery = jax.jit(
        lambda key: jax.random.normal(key, (n, d), jnp.float32)
    )(jax.random.PRNGKey(0))
    gallery = jax.jit(
        lambda g: g / jnp.linalg.norm(g, axis=1, keepdims=True)
    )(gallery)
    idx = RetrievalIndex(
        gallery, [str(i) for i in range(n)], quantize="int8",
        screen_dim=256, rerank=128, _assume_normalized=True,
    )
    q = jax.jit(
        lambda g, key: (
            lambda v: v / jnp.linalg.norm(v, axis=1, keepdims=True)
        )(0.8 * g[:1] + 0.6 * jax.random.normal(key, (1, d), jnp.float32)
          / jnp.sqrt(d))
    )(gallery, jax.random.PRNGKey(1))
    steps = int(os.environ.get("PYVISIM_BENCH_STEPS", "100"))
    sc, _ = idx._query(q, 5)
    float(sc.sum())  # compile + drain
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out, _ = idx._query(q, 5)
    float(out.sum())  # one fetch drains the in-order queue
    qps = steps / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "screened_index_query_throughput",
                "value": round(qps, 1),
                "unit": "queries/sec",
                # reference rescored per query in host numpy (eval.py:13-46);
                # no comparable published figure exists
                "vs_baseline": 0.0,
            }
        )
    )


def main() -> None:
    metric = os.environ.get("PYVISIM_BENCH_METRIC", "throughput")
    if metric == "latency":
        latency_main()
        return
    if metric == "serving_qps":
        serving_qps_main()
        return
    if metric == "sift":
        sift_main()
        return
    if metric == "sift_e2e":
        sift_e2e_main()
        return
    if metric == "encode_map":
        encode_map_main()
        return
    if metric == "deep_e2e":
        deep_e2e_main()
        return
    import jax
    import jax.numpy as jnp

    from pyvisim_tpu.features import DeepConvFeature
    from pyvisim_tpu.ops.vlad import vlad_encode

    batch = int(os.environ.get("PYVISIM_BENCH_BATCH", "128"))
    steps = int(os.environ.get("PYVISIM_BENCH_STEPS", "120"))
    # Default int8: MXU-bound middle convs ride the chip's int8 path (2x
    # bf16 peak), gated by the same >0.999 encoding-cosine fidelity test
    # as bf16 (tests/test_features_deep.py). bf16/float32 modes remain
    # for parity measurement.
    dtype_name = os.environ.get("PYVISIM_BENCH_DTYPE", "int8")
    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16

    ext = DeepConvFeature(
        cfg_name="vgg16", image_size=224, spatial_encoding=True, dtype=dtype,
        int8=(dtype_name == "int8"),
    )
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.normal(size=(256, 514)).astype(np.float32))
    images = jnp.asarray((rng.random((batch, 224, 224, 3)) * 255).astype(np.uint8))

    def encode_once(imgs):
        desc = ext._forward(imgs).astype(jnp.float32)  # (B, 196, 514)
        mask = jnp.ones(desc.shape[:2], jnp.float32)
        return jax.vmap(lambda d, m: vlad_encode(d, m, centers))(desc, mask)

    # All steps run inside ONE jitted loop: the relay in this image costs
    # ~1 ms per dispatch (serialized, it does not pipeline) plus ~30 ms per
    # host fetch, which at 25 ms/step would tax the measurement ~4% for
    # transport that neither a directly-attached chip nor a production
    # serving queue pays. The returned checksum both prevents dead-code
    # elimination and drains the device queue when fetched
    # (block_until_ready is a no-op on this backend; see CLAUDE.md).
    @jax.jit
    def encode_steps(imgs, n):
        def body(i, acc):
            # isnan(acc) is always 0 at runtime but not provably so at
            # compile time, so the loop body can't be hoisted as invariant.
            dep = jnp.isnan(acc).astype(jnp.uint8)
            return acc + jnp.sum(encode_once(imgs ^ dep))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @jax.jit
    def encode(imgs):
        out = encode_once(imgs)
        return out, jnp.sum(out)

    # Warmup / compile both graphs; verify shape and that the looped
    # checksum really is `steps` independent evaluations.
    out, checksum_1 = encode(images)
    assert out.shape == (batch, 256 * 514)
    checksum_n = float(encode_steps(images, steps))
    ratio = checksum_n / float(checksum_1)
    assert abs(ratio - steps) < 0.01 * steps, (
        f"loop checksum ratio {ratio} != steps {steps}: loop was optimized out"
    )

    t0 = time.perf_counter()
    checksum_n = float(encode_steps(images, steps))  # fetch-synchronize
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * steps / dt
    target = 5000.0  # BASELINE.json north star: >5k img/s/chip VLAD-k256 on v5e
    print(
        json.dumps(
            {
                "metric": "vlad_k256_vgg16_end_to_end_throughput",
                "value": round(imgs_per_sec, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
