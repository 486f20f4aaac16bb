"""Adversarial combination sweep: unusual-but-legal public-API combos.

Runs each combo on the 8-device virtual CPU mesh and reports PASS/FAIL —
a bug-hunting harness, not a test file (crashes found here graduate into
tests/). Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/adversarial_sweep.py
"""
import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pyvisim_tpu.encoders import (
    FisherVectorEncoder,
    Pipeline,
    VLADEncoder,
)
from pyvisim_tpu.features import SIFT, DeepConvFeature, Lambda, RootSIFT
from pyvisim_tpu.ops import GmmCodebook, KMeansCodebook, PcaProjector
from pyvisim_tpu.parallel import make_mesh

RNG = np.random.default_rng(0)
RESULTS = []


def combo(name):
    def deco(fn):
        RESULTS.append((name, fn))
        return fn

    return deco


def imgs(n, h=72, w=96):
    return RNG.integers(0, 255, size=(n, h, w, 3), dtype=np.uint8).astype(
        np.uint8
    )


def km(k=8, d=128):
    c = RNG.normal(size=(k, d)).astype(np.float32)
    return KMeansCodebook(centers=c)


def gmm(k=8, d=128):
    w = np.full((k,), 1.0 / k, np.float32)
    m = RNG.normal(size=(k, d)).astype(np.float32)
    v = np.ones((k, d), np.float32)
    return GmmCodebook(weights=w, means=m, covariances=v)


def pca(d_in=128, d_out=32):
    comp = RNG.normal(size=(d_out, d_in)).astype(np.float32)
    mean = RNG.normal(size=(d_in,)).astype(np.float32)
    return PcaProjector(mean=mean, components=comp)


DC_MESH = make_mesh(8, axis_names=("data", "cluster"), shape=(2, 4))
D_MESH = make_mesh(8, axis_names=("data",))


@combo("pipeline + cluster mesh + non-divisible batch")
def _(n=5):
    ext = SIFT(mesh=DC_MESH, max_keypoints=64, process_size=128)
    enc = VLADEncoder(feature_extractor=ext, kmeans_model=km())
    out = Pipeline([enc]).encode(imgs(n))
    assert out.shape[0] == n, out.shape


@combo("cluster mesh + PCA (VLAD) equals replicated")
def _():
    cb, pj, batch = km(d=32), pca(), imgs(3)
    ext = SIFT(mesh=DC_MESH, max_keypoints=64, process_size=128)
    enc = VLADEncoder(feature_extractor=ext, kmeans_model=cb, pca=pj)
    ref = VLADEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        kmeans_model=cb,
        pca=pj,
    )
    a = enc.encode(batch)
    b = ref.encode(batch)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@combo("cluster mesh + PCA (FV) equals replicated (non-divisible batch)")
def _():
    gb, pj, batch = gmm(d=32), pca(), imgs(5)
    ext = SIFT(mesh=DC_MESH, max_keypoints=64, process_size=128)
    enc = FisherVectorEncoder(feature_extractor=ext, gmm_model=gb, pca=pj)
    ref = FisherVectorEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        gmm_model=gb,
        pca=pj,
    )
    a = enc.encode(batch)
    b = ref.encode(batch)
    assert a.shape[0] == 5 and np.all(np.isfinite(a))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@combo("blank images (zero descriptors) through cluster-sharded encode")
def _():
    ext = SIFT(mesh=DC_MESH, max_keypoints=64, process_size=128)
    enc = VLADEncoder(feature_extractor=ext, kmeans_model=km())
    blank = np.zeros((3, 72, 96, 3), np.uint8)
    out = enc.encode(blank)
    assert np.all(np.isfinite(out))


@combo("Lambda extractor + data mesh encoder")
def _():
    def fn(image):
        return RNG.normal(size=(17, 16)).astype(np.float32)

    enc = VLADEncoder(
        feature_extractor=Lambda(fn, output_dim=16), kmeans_model=km(d=16)
    )
    out = enc.encode(imgs(3))
    assert out.shape[0] == 3


@combo("learn() with mesh-aware extractor")
def _():
    ext = SIFT(mesh=D_MESH, max_keypoints=64, process_size=128)
    enc = VLADEncoder(feature_extractor=ext)
    enc.learn(list(imgs(6)), n_clusters=4)
    out = enc.encode(imgs(2))
    assert out.shape[0] == 2


@combo("similarity_score single 3-D images, mesh encoder")
def _():
    ext = SIFT(mesh=D_MESH, max_keypoints=64, process_size=128)
    enc = VLADEncoder(feature_extractor=ext, kmeans_model=km())
    s = enc.similarity_score(imgs(1)[0], imgs(1)[0])
    assert np.isfinite(np.asarray(s)).all()


@combo("setter change after first encode (jit cache key)")
def _():
    enc = VLADEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        kmeans_model=km(),
    )
    a = enc.encode(imgs(2))
    enc.power_norm_weight = 0.5
    b = enc.encode(imgs(2))
    assert not np.allclose(a, b), "power norm change must retrace"
    enc.norm_order = 1.0
    c = enc.encode(imgs(2))
    assert not np.allclose(b, c), "norm order change must retrace"


@combo("flatten=False through Pipeline (must restore)")
def _():
    enc = VLADEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        kmeans_model=km(),
        flatten=False,
    )
    p = Pipeline([enc])
    out = p.encode(imgs(2))
    assert out.ndim == 2
    assert enc.flatten is False, "Pipeline must restore flatten"
    # reference parity: unflattened encode np.vstack's per-image (K, D)
    solo = enc.encode(imgs(2))
    assert solo.shape == (2 * 8, 128), solo.shape


@combo("Pipeline.generate_encoding_map -> HDF5 -> RetrievalIndex")
def _():
    import tempfile

    import cv2

    from pyvisim_tpu.index import RetrievalIndex

    enc = VLADEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        kmeans_model=km(),
    )
    p = Pipeline([enc])
    with tempfile.TemporaryDirectory() as d:
        jpgs = []
        for i, im in enumerate(imgs(4)):
            path = os.path.join(d, f"{i}.jpg")
            cv2.imwrite(path, im)
            jpgs.append(path)
        h5 = os.path.join(d, "map.h5")
        p.generate_encoding_map(jpgs, save_path=h5)
        idx = RetrievalIndex.from_encoding_map(h5)
        assert len(idx) == 4


@combo("DeepConvFeature mesh + FV + PCA, ragged non-divisible batch")
def _():
    ext = DeepConvFeature(mesh=D_MESH)
    d = ext.output_dim
    enc = FisherVectorEncoder(
        feature_extractor=ext,
        gmm_model=gmm(d=32),
        pca=pca(d_in=d, d_out=32),
    )
    ragged = [imgs(1, 64, 80)[0], imgs(1, 96, 64)[0], imgs(1, 72, 72)[0]]
    out = enc.encode(ragged)
    assert out.shape[0] == 3 and np.all(np.isfinite(out))


@combo("encoder mesh inheritance then extractor mesh mutated")
def _():
    batch = imgs(2)
    ext = SIFT(mesh=D_MESH, max_keypoints=64, process_size=128)
    enc = VLADEncoder(feature_extractor=ext, kmeans_model=km())
    a = enc.encode(batch)
    ext.mesh = None  # user detaches the mesh afterwards
    b = enc.encode(batch)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@combo("cluster mesh VLAD equals replicated (non-divisible batch)")
def _():
    cb, batch = km(), imgs(5)
    ext_m = SIFT(mesh=DC_MESH, max_keypoints=64, process_size=128)
    ext_0 = SIFT(max_keypoints=64, process_size=128)
    a = VLADEncoder(feature_extractor=ext_m, kmeans_model=cb).encode(batch)
    b = VLADEncoder(feature_extractor=ext_0, kmeans_model=cb).encode(batch)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@combo("generate_encoding_map on mesh encoder with odd gallery size")
def _():
    import tempfile

    import cv2

    ext = SIFT(mesh=D_MESH, max_keypoints=64, process_size=128)
    enc = VLADEncoder(feature_extractor=ext, kmeans_model=km())
    with tempfile.TemporaryDirectory() as d:
        jpgs = []
        for i, im in enumerate(imgs(7)):
            path = os.path.join(d, f"{i}.jpg")
            cv2.imwrite(path, im)
            jpgs.append(path)
        m = enc.generate_encoding_map(jpgs)
        assert len(m) == 7


@combo("torch CHW input rejected cleanly")
def _():
    import torch

    enc = VLADEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        kmeans_model=km(),
    )
    try:
        enc.encode(torch.rand(3, 64, 64))
    except Exception as e:  # noqa: BLE001 - any *clean* error is fine
        assert "image" in str(e).lower() or "numpy" in str(e).lower(), e


# -- part 2: Siamese / eval / checkpoint / training corners -----------------


def _siamese():
    import optax

    from pyvisim_tpu.encoders.siamese import SiameseEncoder
    from pyvisim_tpu.models.siamese import SiameseEmbedder, create_train_state

    model = SiameseEmbedder(cfg_name="vgg11", embed_dim=16, trunk_convs=2)
    state = create_train_state(
        model, optax.adamw(1e-3), image_size=64, seed=0
    )
    return SiameseEncoder(model, state.params, image_size=64), model, state


@combo("siamese: embedding independent of batchmates' shapes")
def _():
    enc, _, _ = _siamese()
    a = imgs(1, 60, 60)[0]
    uniform = enc.encode([a, a.copy()])
    ragged = enc.encode([a, imgs(1, 90, 40)[0]])
    np.testing.assert_allclose(uniform[0], ragged[0], rtol=2e-4, atol=2e-5)
    single = enc.encode(a)
    np.testing.assert_allclose(uniform[0], single[0], rtol=2e-4, atol=2e-5)


@combo("siamese -> encoding map -> RetrievalIndex -> eval.top_k_map")
def _():
    import tempfile

    import cv2

    from pyvisim_tpu.eval import top_k_accuracy, top_k_map
    from pyvisim_tpu.index import RetrievalIndex

    enc, _, _ = _siamese()
    with tempfile.TemporaryDirectory() as d:
        jpgs = []
        for i, im in enumerate(imgs(6, 64, 64)):
            path = os.path.join(d, f"{i}.jpg")
            cv2.imwrite(path, im)
            jpgs.append(path)
        emap = enc.generate_encoding_map(jpgs)
        idx = RetrievalIndex.from_encoding_map(emap)
        assert len(idx) == 6
        queries = [imgs(1, 64, 64)[0] for _ in range(2)]
        labels = [0, 1]
        gal_labels = {p: i % 2 for i, p in enumerate(jpgs)}
        m = top_k_map(queries, labels, emap, gal_labels, enc, k=3)
        acc = top_k_accuracy(queries, labels, emap, gal_labels, enc, k=3)
        assert 0.0 <= float(m) <= 1.0 and 0.0 <= float(acc) <= 1.0


@combo("sharded train -> checkpoint roundtrip -> SiameseEncoder parity")
def _():
    import tempfile

    import optax

    from pyvisim_tpu.checkpoint import restore_train_state, save_train_state
    from pyvisim_tpu.encoders.siamese import SiameseEncoder
    from pyvisim_tpu.models.siamese import create_train_state
    from pyvisim_tpu.parallel.train import make_sharded_trainer

    mesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    model, state, step = make_sharded_trainer(
        mesh, cfg_name="vgg11", embed_dim=16, trunk_convs=2,
        image_size=32, loss="nt_xent",
    )
    x = np.clip(
        RNG.normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.25 + 0.5, 0, 1
    )
    y = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    state, _ = step(state, x, y)
    template = create_train_state(model, optax.adamw(1e-3), image_size=32)
    with tempfile.TemporaryDirectory() as d:
        save_train_state(d, state)
        restored = restore_train_state(d, template)
    a = SiameseEncoder(model, jax.device_get(state.params), image_size=32)
    b = SiameseEncoder(model, jax.device_get(restored.params), image_size=32)
    batch = imgs(3, 32, 32)
    np.testing.assert_allclose(
        a.encode(batch), b.encode(batch), rtol=2e-4, atol=2e-5
    )


@combo("learn() FV with pca factor on mesh extractor")
def _():
    ext = SIFT(mesh=D_MESH, max_keypoints=64, process_size=128)
    enc = FisherVectorEncoder(feature_extractor=ext)
    enc.learn(list(imgs(6)), n_clusters=4, dim_reduction_factor=4)
    out = enc.encode(imgs(3))
    assert out.shape[0] == 3 and np.all(np.isfinite(out))


@combo("image query through screened int8 index (encoder compose)")
def _():
    from pyvisim_tpu.index import RetrievalIndex

    cb = km()
    enc = VLADEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        kmeans_model=cb,
    )
    gal = imgs(40)
    vecs = enc.encode(gal)
    idx = RetrievalIndex(
        vecs, [f"g{i}" for i in range(40)], quantize="int8",
        screen_dim=64, rerank=8, auto_exact=False,
    )
    res = idx.query(enc, gal[3], k=3)
    assert res[0][0][0] == "g3", res[0][:2]  # self-match must rank first


@combo("custom similarity_func with bad signature falls back")
def _():
    def bad(a, b):
        return float(np.dot(a.ravel()[:4], b.ravel()[:4]))  # scalar, wrong

    enc = VLADEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        kmeans_model=km(),
        similarity_func=bad,
    )
    batch = imgs(2)
    s = enc.similarity_score(batch[0], batch[1])
    assert np.isfinite(np.asarray(s, dtype=np.float32)).all()


@combo("two encoders share ONE extractor through Pipeline on cluster mesh")
def _():
    ext = SIFT(mesh=DC_MESH, max_keypoints=64, process_size=128)
    v = VLADEncoder(feature_extractor=ext, kmeans_model=km())
    f = FisherVectorEncoder(feature_extractor=ext, gmm_model=gmm())
    batch = imgs(5)
    out = Pipeline([v, f]).encode(batch)
    solo = np.hstack([v.encode(batch), f.encode(batch)])
    np.testing.assert_allclose(out, solo, rtol=2e-4, atol=2e-5)


@combo("tiny 8x8 images through SIFT and deep encoders")
def _():
    tiny = imgs(2, 8, 8)
    enc = VLADEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        kmeans_model=km(),
    )
    out = enc.encode(tiny)
    assert np.all(np.isfinite(out))
    ext = DeepConvFeature()
    enc2 = FisherVectorEncoder(
        feature_extractor=ext,
        gmm_model=gmm(d=ext.output_dim),
    )
    out2 = enc2.encode(tiny)
    assert np.all(np.isfinite(out2))


@combo("hdf5 encoding-map roundtrip through _utils persistence")
def _():
    import tempfile

    from pyvisim_tpu._utils import load_hdf5, save_to_hdf5

    m = {
        "a.jpg": RNG.normal(size=(16,)).astype(np.float32),
        "nested": {"b": np.int64(3), "c": "text", "d": [1.0, 2.0]},
    }
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.h5")
        save_to_hdf5(p, m)
        back = load_hdf5(p)
    np.testing.assert_allclose(back["a.jpg"], m["a.jpg"])
    assert int(back["nested"]["b"]) == 3


# -- part 3: error paths / persistence robustness ---------------------------

_OLD_MAIN = True  # marker: combos below registered after part 2


@combo("errors: corrupt/truncated index file fails cleanly")
def _():
    import tempfile

    from pyvisim_tpu.index import RetrievalIndex

    vecs = RNG.normal(size=(10, 16)).astype(np.float32)
    idx = RetrievalIndex(vecs, [f"p{i}" for i in range(10)])
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "idx.npz")
        idx.save(p)
        raw = open(p, "rb").read()
        open(p, "wb").write(raw[: len(raw) // 2])  # truncate
        try:
            RetrievalIndex.load(p)
            raise AssertionError("truncated npz load did not raise")
        except AssertionError:
            raise
        except Exception:
            pass  # any clean exception (zipfile/OSError/ValueError) is fine
        open(p, "wb").write(b"not an npz at all")
        try:
            RetrievalIndex.load(p)
            raise AssertionError("garbage npz load did not raise")
        except AssertionError:
            raise
        except Exception:
            pass


@combo("errors: learn() with fewer descriptors than clusters")
def _():
    enc = VLADEncoder(
        feature_extractor=Lambda(
            lambda im: RNG.normal(size=(3, 16)).astype(np.float32),
            output_dim=16,
        )
    )
    # 2 images x 3 descriptors = 6 total < 8 clusters: must either raise
    # a clear error or produce a usable (possibly degenerate) vocabulary
    # — not crash with an opaque shape error.
    try:
        enc.learn(list(imgs(2)), n_clusters=8)
    except Exception as e:  # noqa: BLE001
        msg = str(e).lower()
        assert ("descriptor" in msg or "cluster" in msg or "sample" in msg), (
            f"opaque error: {type(e).__name__}: {e}"
        )
        return
    out = enc.encode(imgs(2))
    assert np.all(np.isfinite(out))


@combo("errors: eval with k larger than the gallery")
def _():
    from pyvisim_tpu.eval import retrieve_top_k_similar, top_k_accuracy

    enc = VLADEncoder(
        feature_extractor=SIFT(max_keypoints=64, process_size=128),
        kmeans_model=km(),
    )
    batch = imgs(3)
    emap = {f"g{i}": np.asarray(v) for i, v in enumerate(enc.encode(batch))}
    res = retrieve_top_k_similar(batch[0], emap, enc, k=50)  # k > 3
    assert len(res) == 3  # clamped to gallery size
    acc = top_k_accuracy(
        [batch[0]], [0], emap, {p: 0 for p in emap}, enc, k=50
    )
    assert 0.0 <= float(acc) <= 1.0


@combo("index saved with mesh loads without one (and vice versa)")
def _():
    import tempfile

    from pyvisim_tpu.index import RetrievalIndex

    vecs = RNG.normal(size=(24, 16)).astype(np.float32)
    paths = [f"p{i}" for i in range(24)]
    q = RNG.normal(size=(2, 16)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.npz")
        RetrievalIndex(vecs, paths, mesh=D_MESH).save(p)
        plain = RetrievalIndex.load(p)  # no mesh
        meshy = RetrievalIndex.load(p, mesh=D_MESH)
        np.testing.assert_array_equal(
            plain.query_vectors(q, 3)[1], meshy.query_vectors(q, 3)[1]
        )


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    selected = [(n, f) for n, f in RESULTS if only in n]
    failures = 0
    for name, fn in selected:
        try:
            fn()
            print(f"PASS  {name}")
        except Exception:
            failures += 1
            print(f"FAIL  {name}")
            traceback.print_exc()
    print(f"\n{len(selected) - failures}/{len(selected)} combos pass")
    raise SystemExit(1 if failures else 0)
