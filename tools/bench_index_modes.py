"""Measure RetrievalIndex serving modes at gallery scale on the real TPU.

Compares per-query device time and screened-mode recall for the serving
configurations of ``pyvisim_tpu.index.RetrievalIndex`` (exact f32 scan,
int8 MXU scan, coarse-to-fine JL screen + exact re-rank, screen + int8)
on the BASELINE-shaped gallery (6,149 x 131,584 — Oxford-102 train size x
VLAD-k256 dim; reference retrieval loop: pyvisim/eval.py:13-46).

Queries are planted near-duplicates: q = normalize(c * g_i + sqrt(1-c^2) * u)
with u a unit random direction, so cos(q, g_i) ~= c (default 0.8) against
a ~N(0, 1/sqrt(D)) distractor floor — screening recall is measured against
real signal margins, not noise. (A per-dim noise scale, the first draft of
this tool, drowns the signal at D=131,584: cos ~= 0.008, unrecoverable by
ANY dimensionality-reducing screen.)

Timing protocol (this image's relay swallows ``block_until_ready``): queue
``STEPS`` jitted queries back-to-back with no host fetch, then fetch one
scalar — the in-order queue makes (total - one RTT)/STEPS the per-query
device time. RTT is measured separately on a trivial fetch. Indexes are
built and deleted strictly one at a time: each f32 index pads capacity to
8,192 rows (4.3 GB) and two alive at once plus the 3.2 GB source gallery
risks RESOURCE_EXHAUSTED on a 16 GB chip.

Usage: ``python tools/bench_index_modes.py`` (prints one JSON dict per
config; the table lives in docs/PERF.md "Serving-index modes").
``--big`` instead runs the 32,768-row case — an f32 gallery of that
shape is 17 GB and cannot exist on a 16 GB chip at all, so it is built
by streaming ``add()`` chunks into an int8 index (4.3 GB) and compares
the exact int8 scan against screen+rerank serving.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pyvisim_tpu.index import RetrievalIndex

N, D = 6149, 256 * 514
K = 5
STEPS = 30
QUERY_COS = 0.8


def _make_gallery():
    g = jax.jit(
        lambda key: jax.random.normal(key, (N, D), jnp.float32)
    )(jax.random.PRNGKey(0))
    g = jax.jit(lambda g: g / jnp.linalg.norm(g, axis=1, keepdims=True))(g)
    float(g[0, 0])  # drain
    return g


def _make_queries(gallery, q_rows: int):
    """Planted near-duplicates with cos(q, g_i) ~= QUERY_COS."""

    @jax.jit
    def f(g, key):
        base = g[: q_rows * 7 : 7]  # spread over the gallery
        noise = jax.random.normal(key, base.shape, jnp.float32)
        noise = noise / jnp.linalg.norm(noise, axis=1, keepdims=True)
        q = QUERY_COS * base + np.sqrt(1.0 - QUERY_COS**2) * noise
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    q = f(gallery, jax.random.PRNGKey(1))
    float(q[0, 0])
    return q


def _rtt() -> float:
    x = jnp.zeros(())
    float(x)  # ensure no pending work
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(x + 1.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _time_queries(idx: RetrievalIndex, q, rtt: float) -> float:
    sc, _ = idx._query(q, K)
    float(sc.sum())  # compile + drain
    t0 = time.perf_counter()
    out = None
    for _ in range(STEPS):
        out, _ = idx._query(q, K)
    float(out.sum())
    return (time.perf_counter() - t0 - rtt) / STEPS * 1e3


def main_big() -> None:
    """32,768 x 131,584 serving case: int8 exact scan vs int8+screen."""
    n_big, chunk = 32768, 4096
    rtt = _rtt()

    # ONE jitted generator reused across chunks — a fresh ``jax.jit``
    # per chunk misses the cache and pays the 20-40 s remote compile 16x.
    _gen = jax.jit(lambda key: (
        lambda g: g / jnp.linalg.norm(g, axis=1, keepdims=True)
    )(jax.random.normal(key, (chunk, D), jnp.float32)))

    def gen_chunk(i):
        return _gen(jax.random.PRNGKey(100 + i))

    first_host = np.asarray(gen_chunk(0)[:8])  # query bases, host-side only

    @jax.jit
    def mk_q(base, key):
        noise = jax.random.normal(key, base.shape, jnp.float32)
        noise = noise / jnp.linalg.norm(noise, axis=1, keepdims=True)
        q = QUERY_COS * jnp.asarray(base) + np.sqrt(1 - QUERY_COS**2) * noise
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    q8 = mk_q(first_host[:8], jax.random.PRNGKey(7))
    q1 = q8[:1]
    true_top1 = np.arange(8)

    def build(**kw):
        idx = RetrievalIndex(gen_chunk(0), [str(i) for i in range(chunk)],
                             _assume_normalized=True, **kw)
        for i in range(1, n_big // chunk):
            c = gen_chunk(i)  # stays on device: add() normalizes/quantizes
            idx.add(c, [str(i * chunk + j) for j in range(chunk)])
            del c
            print(f"# ingested {(i + 1) * chunk}/{n_big}",
                  file=sys.stderr, flush=True)
        float(idx.vectors[0, 0].astype(jnp.float32))  # drain ingest queue
        return idx

    for name, kw in (
        ("big_int8_exact", dict(quantize="int8")),
        ("big_int8_screen256_rerank64",
         dict(quantize="int8", screen_dim=256, rerank=64)),
        ("big_int8_screen256_rerank128",  # the shipped default
         dict(quantize="int8", screen_dim=256, rerank=128)),
    ):
        t0 = time.perf_counter()
        idx = build(**kw)
        build_s = time.perf_counter() - t0
        got = np.asarray(idx._query(q8, K)[1])
        row = {
            "config": name,
            "q1_ms": round(_time_queries(idx, q1, rtt), 2),
            "q8_ms": round(_time_queries(idx, q8, rtt), 2),
            "planted_top1": round(float(np.mean(got[:, 0] == true_top1)), 3),
            "build_s": round(build_s, 1),
        }
        print(json.dumps(row), flush=True)
        del idx
        # free the 4.3 GB buffer BEFORE the next build starts allocating:
        # drop python refs, then drain the in-order queue so the runtime
        # processes the deallocations.
        import gc

        gc.collect()
        float(jnp.zeros(()) + 1.0)

    print(json.dumps({"rtt_ms": round(rtt * 1e3, 1), "n": n_big, "d": D,
                      "steps": STEPS, "query_cos": QUERY_COS}))


def main_recall() -> None:
    """Recall@5-vs-exact across rerank on a REAL-encoding gallery.

    Planted-synthetic galleries measure screening recall only on the
    planted match (ranks 2-5 are i.i.d. distractor ties — docs/PERF.md
    round 3j finding 3). This mode builds a gallery with realistic margin
    structure instead: mini-dataset images -> TPU RootSIFT -> learned
    VLAD-k256 encodings (D=32,768), expanded along their class manifolds
    to the BASELINE row count (datasets.expand_encodings), and sweeps
    ``rerank`` for the production int8+screen config against the int8
    exact scan (same quantization, so differences are purely screening;
    set-intersection recall — the screened rescorer keeps the query in
    float where the int8 scan quantizes it, so score-threshold metrics
    drown in sub-1e-3 ties on this margin structure).
    """
    from pyvisim_tpu.datasets import expand_encodings, make_retrieval_corpus
    from pyvisim_tpu.encoders import VLADEncoder
    from pyvisim_tpu.features import RootSIFT

    n_classes, n_per = 20, 10
    images, labels = make_retrieval_corpus(n_classes, n_per)
    gal_imgs = [im for i, im in enumerate(images) if i % n_per < 6]
    gal_labels = labels[np.arange(len(images)) % n_per < 6]
    q_imgs = [im for i, im in enumerate(images) if i % n_per >= 6]

    enc = VLADEncoder(
        feature_extractor=RootSIFT(max_keypoints=512, process_size=256)
    )
    t0 = time.perf_counter()
    enc.learn(gal_imgs, n_clusters=256)
    base = enc.encode(gal_imgs)  # (120, 32768) real VLAD-k256 vectors
    q = enc.encode(q_imgs)  # (80, 32768) real query encodings
    build_s = time.perf_counter() - t0
    gal, _ = expand_encodings(base, gal_labels, n_total=N, seed=0)
    paths = [str(i) for i in range(gal.shape[0])]

    exact = RetrievalIndex(gal, paths, quantize="int8")
    _, ix_exact = exact.query_vectors(q, k=K)
    exact_sets = [set(row) for row in np.asarray(ix_exact)]
    del exact

    for rerank in (16, 32, 64, 128, 256):
        idx = RetrievalIndex(gal, paths, quantize="int8", screen_dim=256,
                             rerank=rerank, auto_exact=False)
        _, ix = idx.query_vectors(q, k=K)
        rec = float(np.mean([
            len(set(row) & exact_sets[i]) / K
            for i, row in enumerate(np.asarray(ix))
        ]))
        print(json.dumps({
            "config": f"int8_screen256_rerank{rerank}",
            "recall_at_5_vs_exact": round(rec, 4),
        }), flush=True)
        del idx
    print(json.dumps({"mode": "recall", "n": gal.shape[0], "d": gal.shape[1],
                      "queries": int(q.shape[0]), "encode_build_s":
                      round(build_s, 1)}))


def main() -> None:
    gallery = _make_gallery()
    rtt = _rtt()
    q1 = _make_queries(gallery, 1)
    q8 = _make_queries(gallery, 8)
    paths = [str(i) for i in range(N)]
    true_top1 = np.arange(8) * 7  # planted neighbors of q8

    def report(name, idx, exact_idx8=None):
        row = {
            "config": name,
            "q1_ms": round(_time_queries(idx, q1, rtt), 2),
            "q8_ms": round(_time_queries(idx, q8, rtt), 2),
        }
        got = np.asarray(idx._query(q8, K)[1])
        row["planted_top1"] = round(float(np.mean(got[:, 0] == true_top1)), 3)
        if exact_idx8 is not None:
            inter = [
                len(set(got[i]) & set(exact_idx8[i])) / K
                for i in range(got.shape[0])
            ]
            row["recall_at_5_vs_exact"] = round(float(np.mean(inter)), 3)
        print(json.dumps(row), flush=True)
        return got

    exact = RetrievalIndex(gallery, paths, _assume_normalized=True)
    exact_idx8 = report("exact_f32", exact)
    del exact

    idx8 = RetrievalIndex(gallery, paths, quantize="int8",
                          _assume_normalized=True)
    report("int8", idx8, exact_idx8)
    del idx8

    scr = RetrievalIndex(gallery, paths, screen_dim=256, rerank=64,
                         auto_exact=False,  # measure the SCREENED kernel
                         _assume_normalized=True)
    report("screen256_rerank64", scr, exact_idx8)
    scr.rerank = 256
    report("screen256_rerank256", scr, exact_idx8)
    del scr

    scr8 = RetrievalIndex(gallery, paths, quantize="int8", screen_dim=256,
                          rerank=64, auto_exact=False,
                          _assume_normalized=True)
    report("int8_screen256_rerank64", scr8, exact_idx8)
    scr8.rerank = 128  # the shipped default (recall-sized, --recall mode)
    report("int8_screen256_rerank128", scr8, exact_idx8)
    del scr8

    print(json.dumps({"rtt_ms": round(rtt * 1e3, 1), "n": N, "d": D,
                      "steps": STEPS, "query_cos": QUERY_COS}))


if __name__ == "__main__":
    if "--big" in sys.argv:
        main_big()
    elif "--recall" in sys.argv:
        main_recall()
    else:
        main()
