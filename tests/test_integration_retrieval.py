"""End-to-end retrieval integration: the full TPU stack vs reference-style
stacks on synthetic mini-datasets.

These are the environment-local stand-ins for the Oxford-102 parity gates
(BASELINE.md): the dataset cannot be downloaded in a zero-egress image, so
quality parity is gated *cross-stack*:

1. SIFT family — our TPU SIFT feeding the TPU VLAD/FV encoders must
   retrieve as well as OpenCV SIFT feeding the same encoders on identical
   images (20 classes x 10 images, 80 queries, gate ±0.05: one flipped
   query is 0.0125, so a 1-in-20-query regression trips the gate —
   VERDICT r2 weak #4).
2. Deep family — a torch VGG16 trunk (the reference's stack, random
   weights) and our Flax trunk carrying the SAME converted weights must
   produce near-identical VLAD retrieval (gate ±0.02), validating the
   whole deep descriptor chain cross-framework (reference anchor:
   examples/m_ap_and_top_k_accuracy.ipynb cell 14, whose numbers these
   gates stand in for).
"""
import jax
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pyvisim_tpu.encoders import FisherVectorEncoder, VLADEncoder
from pyvisim_tpu.eval import top_k_accuracy, top_k_map
from pyvisim_tpu.features import Lambda, RootSIFT

N_CLASSES = 20
N_GALLERY = 6  # per class
N_QUERY = 4  # per class -> 80 queries total


from pyvisim_tpu.datasets import make_class_images  # noqa: E402


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("minids")
    gallery_paths, gallery_labels = [], {}
    queries, query_labels = [], []
    for cls in range(N_CLASSES):
        imgs = make_class_images(seed=100 + cls, n=N_GALLERY + N_QUERY)
        for i, img in enumerate(imgs[:N_GALLERY]):
            p = str(d / f"c{cls}_{i}.png")
            cv2.imwrite(p, img)
            gallery_paths.append(p)
            gallery_labels[p] = cls
        for img in imgs[N_GALLERY:]:
            queries.append(img)
            query_labels.append(cls)
    return gallery_paths, gallery_labels, queries, query_labels


def _extract_all(backend, mini_dataset):
    """RootSIFT descriptors for every gallery+query image, extracted ONCE
    per backend and served through a Lambda extractor — at 200 images the
    extraction dominates, and VLAD/FV must see identical descriptors
    anyway."""
    from pyvisim_tpu.io import imread_rgb

    gallery_paths, _, queries, _ = mini_dataset
    imgs = [imread_rgb(p) for p in gallery_paths] + list(queries)
    ext = RootSIFT(backend=backend, max_keypoints=512, process_size=256)
    cache = {}
    if backend == "tpu":
        bsz = 16
        for i in range(0, len(imgs), bsz):
            chunk = imgs[i : i + bsz]
            d, m = ext.extract_batch(chunk)
            d, m = np.asarray(d, np.float32), np.asarray(m) > 0.5
            for j, img in enumerate(chunk):
                cache[img.tobytes()] = d[j][m[j]]
    else:
        for img in imgs:
            cache[img.tobytes()] = np.asarray(ext(img), np.float32)
    return cache


@pytest.fixture(scope="module")
def tpu_cache(mini_dataset):
    return _extract_all("tpu", mini_dataset)


@pytest.fixture(scope="module")
def cv_cache(mini_dataset):
    return _extract_all("opencv", mini_dataset)


def run_stack(cache, mini_dataset, encoder_cls):
    gallery_paths, gallery_labels, queries, query_labels = mini_dataset
    ext = Lambda(lambda im: cache[im.tobytes()], output_dim=128)
    enc = encoder_cls(feature_extractor=ext)
    from pyvisim_tpu.io import imread_rgb

    train_imgs = [imread_rgb(p) for p in gallery_paths]
    enc.learn(train_imgs, n_clusters=16)
    emap = enc.generate_encoding_map(gallery_paths)
    top1 = top_k_accuracy(queries, query_labels, emap, gallery_labels, enc, k=1)
    m = top_k_map(queries, query_labels, emap, gallery_labels, enc, k=5)
    return top1, m


@pytest.mark.parametrize("encoder_cls", [VLADEncoder, FisherVectorEncoder])
def test_tpu_stack_matches_opencv_stack(
    tpu_cache, cv_cache, mini_dataset, encoder_cls
):
    tpu_top1, tpu_map = run_stack(tpu_cache, mini_dataset, encoder_cls)
    cv_top1, cv_map = run_stack(cv_cache, mini_dataset, encoder_cls)
    # both stacks must clearly beat the 0.05 random baseline …
    assert cv_top1 > 0.5, f"opencv stack failed sanity: top1={cv_top1}"
    assert tpu_top1 > 0.5, f"tpu stack failed sanity: top1={tpu_top1}"
    # … and the TPU stack must match the opencv stack to 4 queries / 0.05
    assert tpu_top1 >= cv_top1 - 0.05, f"tpu {tpu_top1} vs cv {cv_top1}"
    assert tpu_map >= cv_map - 0.05, f"tpu {tpu_map} vs cv {cv_map}"


def _run_reference_stack(mini_dataset, encoder_name):
    """End-to-end run of the LIVE reference implementation: reference
    RootSIFT (cv2), reference learn/encode, reference eval — no code from
    pyvisim_tpu on this side (VERDICT r3 task 1d)."""
    import _reference_oracle

    ref = _reference_oracle.load_reference()
    import pyvisim.eval as ref_eval

    gallery_paths, gallery_labels, queries, query_labels = mini_dataset
    enc_cls = getattr(ref.encoders, encoder_name)
    enc = enc_cls()
    train_imgs = [
        cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in gallery_paths
    ]
    enc.learn(train_imgs, n_clusters=16)
    emap = enc.generate_encoding_map(gallery_paths)
    top1 = ref_eval.top_k_accuracy(
        queries, query_labels, emap, gallery_labels, enc, k=1
    )
    m = ref_eval.top_k_map(queries, query_labels, emap, gallery_labels, enc, k=5)
    return top1, m


@pytest.mark.parametrize("encoder_cls", [VLADEncoder, FisherVectorEncoder])
def test_tpu_stack_matches_live_reference_stack(
    tpu_cache, mini_dataset, encoder_cls
):
    """The strongest quality gate available in a zero-egress image: the
    actual reference package runs end to end (its own SIFT, vocabulary
    training, encoding and eval) and our TPU stack must retrieve at least
    as well minus 0.05 on the identical mini-dataset."""
    import _reference_oracle

    if not _reference_oracle.reference_available():
        pytest.skip("reference package not mounted")
    ref_top1, ref_map = _run_reference_stack(mini_dataset, encoder_cls.__name__)
    tpu_top1, tpu_map = run_stack(tpu_cache, mini_dataset, encoder_cls)
    assert ref_top1 > 0.5, f"reference stack failed sanity: top1={ref_top1}"
    assert tpu_top1 >= ref_top1 - 0.05, f"tpu {tpu_top1} vs ref {ref_top1}"
    assert tpu_map >= ref_map - 0.05, f"tpu {tpu_map} vs ref {ref_map}"


# ---------------------------------------------------------------------------
# Deep family: torch trunk (reference stack) vs Flax trunk, same weights
# ---------------------------------------------------------------------------
def _torch_descriptor_cache(imgs, image_size):
    """Reference-style deep descriptors: torch VGG16 forward, post-ReLU
    last-conv fmap (what the reference's hook observably captures under
    inplace ReLU), flattened row-major with (x/Wf, y/Hf) coords appended
    (reference _features.py:263-300). Images must already be
    (image_size, image_size, 3) so no resize enters the comparison."""
    import torch
    import torch.nn as tnn

    from pyvisim_tpu.models.vgg import VGG_CFGS

    def build_torch_vgg_features(cfg_name):
        layers, in_ch = [], 3
        for item in VGG_CFGS[cfg_name]:
            if item == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(in_ch, item, 3, padding=1))
                layers.append(tnn.ReLU(inplace=True))
                in_ch = item
        return tnn.Sequential(*layers)

    def torch_conv_output(features, x_nchw, conv_index):
        out = {}
        convs = [m for m in features if isinstance(m, tnn.Conv2d)]
        handle = convs[conv_index].register_forward_hook(
            lambda module, inp, output: out.setdefault("x", output.detach())
        )
        with torch.no_grad():
            features(x_nchw)
        handle.remove()
        return out["x"]  # post-ReLU under torchvision's inplace ReLU

    torch.manual_seed(0)
    tmodel = build_torch_vgg_features("vgg16")
    tmodel.eval()
    sd = {
        f"features.{k}": v.detach().numpy()
        for k, v in tmodel.state_dict().items()
    }
    x = np.stack([i.astype(np.float32) / 255.0 for i in imgs])
    fmap = (
        torch_conv_output(
            tmodel, torch.from_numpy(x.transpose(0, 3, 1, 2)), 12
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )  # (B, Hf, Wf, 512)
    b, hf, wf, c = fmap.shape
    desc = fmap.reshape(b, hf * wf, c)
    coords = np.array(
        [[xx / wf, yy / hf] for yy in range(hf) for xx in range(wf)],
        np.float32,
    )
    desc = np.concatenate(
        [desc, np.broadcast_to(coords, (b, hf * wf, 2))], axis=-1
    )
    cache = {i.tobytes(): desc[j] for j, i in enumerate(imgs)}
    return cache, sd


def test_deep_stack_cross_framework_retrieval(tmp_path):
    """The torch trunk and our Flax trunk (same converted weights) must
    yield near-identical VLAD retrieval — the cross-framework gate for the
    deep descriptor chain (VERDICT r2 next-round #2)."""
    from pyvisim_tpu.features import DeepConvFeature
    from pyvisim_tpu.models.vgg import params_from_torch_state_dict

    size = 128  # blob scenes need >=128 px to stay class-distinctive
    n_classes, n_gal, n_q = 10, 5, 3
    gallery_paths, gallery_labels = [], {}
    gallery_imgs, queries, query_labels = [], [], []
    for cls in range(n_classes):
        imgs = make_class_images(seed=500 + cls, n=n_gal + n_q, h=size, w=size)
        for i, img in enumerate(imgs[:n_gal]):
            p = str(tmp_path / f"d{cls}_{i}.png")
            cv2.imwrite(p, img)
            gallery_paths.append(p)
            gallery_labels[p] = cls
            gallery_imgs.append(img)
        for img in imgs[n_gal:]:
            queries.append(img)
            query_labels.append(cls)

    all_imgs = gallery_imgs + queries
    t_cache, sd = _torch_descriptor_cache(all_imgs, size)
    t_ext = Lambda(lambda im: t_cache[im.tobytes()], output_dim=514)
    t_enc = VLADEncoder(feature_extractor=t_ext)
    t_enc.learn(gallery_imgs, n_clusters=16)

    params = params_from_torch_state_dict(sd, "vgg16", layer_index=-1)
    f_ext = DeepConvFeature(
        cfg_name="vgg16", params=params, image_size=size, spatial_encoding=True
    )
    # identical vocabulary: any retrieval delta comes from the descriptors
    f_enc = VLADEncoder(
        feature_extractor=f_ext, kmeans_model=t_enc.clustering_model
    )

    t_emap = t_enc.generate_encoding_map(gallery_paths)
    t_top1 = top_k_accuracy(
        queries, query_labels, t_emap, gallery_labels, t_enc, k=1
    )
    t_map = top_k_map(queries, query_labels, t_emap, gallery_labels, t_enc, k=5)
    # This is a STACK-parity gate against torch's f32 CPU convs: pin full
    # f32 conv arithmetic so the comparison isolates framework
    # differences. On TPU, f32 convs otherwise default to single-pass
    # bf16 MXU arithmetic, which alone moves mAP on this 130-image set by
    # ~0.03 (measured on chip; the intended-precision production path is
    # gated separately by the int8/bf16 fidelity tests).
    with jax.default_matmul_precision("highest"):
        f_emap = f_enc.generate_encoding_map(gallery_paths)
        f_top1 = top_k_accuracy(
            queries, query_labels, f_emap, gallery_labels, f_enc, k=1
        )
        f_map = top_k_map(
            queries, query_labels, f_emap, gallery_labels, f_enc, k=5)
    # the stacks must agree with each other …
    assert abs(f_top1 - t_top1) <= 0.02, f"flax {f_top1} vs torch {t_top1}"
    assert abs(f_map - t_map) <= 0.02, f"flax {f_map} vs torch {t_map}"
    # … and beat the 0.1 random baseline so the agreement is meaningful
    assert t_top1 > 0.5, f"torch deep stack failed sanity: top1={t_top1}"


# ---------------------------------------------------------------------------
# Serving scale: streamed HDF5 gallery -> quantized sharded index -> query
# ---------------------------------------------------------------------------
def test_serving_scale_streamed_quantized_index(tmp_path):
    """VERDICT r2 next-round #8: the serving pieces must compose at scale —
    a 10k-image gallery streamed to HDF5 by generate_encoding_map(save_path=),
    loaded into a mesh-sharded RetrievalIndex with int8 quantization, and
    queried with recall@5 within eps of the f32 index."""
    import jax.numpy as jnp

    from pyvisim_tpu.encoders import VLADEncoder
    from pyvisim_tpu.features import Lambda
    from pyvisim_tpu.index import RetrievalIndex
    from pyvisim_tpu.ops import KMeansCodebook
    from pyvisim_tpu.parallel import make_mesh

    rng = np.random.default_rng(7)
    n_classes, per = 100, 100  # 10_000 gallery images
    d = 16
    ext = Lambda(
        lambda im: im.reshape(-1, d).astype(np.float32), output_dim=d
    )
    cb = KMeansCodebook(
        centers=jnp.asarray(rng.normal(scale=80, size=(8, d)) + 128,
                            jnp.float32)
    )
    enc = VLADEncoder(feature_extractor=ext, kmeans_model=cb)

    bases = rng.integers(0, 255, size=(n_classes, 16, 16, 3)).astype(
        np.float32
    )
    paths, labels = [], []
    for c in range(n_classes):
        for i in range(per):
            img = np.clip(
                bases[c] + rng.normal(0, 20, bases[c].shape), 0, 255
            ).astype(np.uint8)
            p = str(tmp_path / f"g{c:03d}_{i:03d}.png")
            cv2.imwrite(p, img[:, :, ::-1])  # store as BGR -> decodes to RGB
            paths.append(p)
            labels.append(c)

    h5 = str(tmp_path / "gallery.h5")
    out = enc.generate_encoding_map(paths, batch_size=512, save_path=h5)
    assert out is None  # streamed, not materialized

    queries = [
        np.clip(bases[c] + rng.normal(0, 20, bases[c].shape), 0, 255).astype(
            np.uint8
        )
        for c in range(n_classes)
    ]
    qvecs = enc.encode(queries)

    mesh = make_mesh(8, axis_names=("data",))
    idx_f32 = RetrievalIndex.from_encoding_map(h5, labels=labels, mesh=mesh)
    idx_int8 = RetrievalIndex.from_encoding_map(
        h5, labels=labels, mesh=mesh, quantize="int8"
    )
    assert len(idx_f32) == len(idx_int8) == n_classes * per

    lbl = np.asarray(labels)

    def recall_at_5(index):
        _, ids = index.query_vectors(qvecs, k=5)
        return float(
            np.mean([c in lbl[ids[c]] for c in range(n_classes)])
        )

    r_f32 = recall_at_5(idx_f32)
    r_int8 = recall_at_5(idx_int8)
    assert r_f32 > 0.9, f"f32 recall@5={r_f32}"
    assert r_int8 >= r_f32 - 0.02, f"int8 {r_int8} vs f32 {r_f32}"


# ---------------------------------------------------------------------------
# Serving-index recall on REAL structured encodings (VERDICT r3 weak #4)
# ---------------------------------------------------------------------------
def test_screened_index_recall_on_real_vlad_gallery(tpu_cache, mini_dataset):
    """The production serving config (int8 + screen + rerank) must recover
    the exact scan's top-5 on a gallery with REALISTIC margin structure —
    mini-dataset VLAD encodings expanded along their class manifolds — not
    just on planted-synthetic i.i.d. galleries (docs/PERF.md round 3j
    finding 3)."""
    from pyvisim_tpu.datasets import expand_encodings
    from pyvisim_tpu.index import RetrievalIndex

    gallery_paths, gallery_labels, queries, query_labels = mini_dataset
    ext = Lambda(lambda im: tpu_cache[im.tobytes()], output_dim=128)
    enc = VLADEncoder(feature_extractor=ext)
    from pyvisim_tpu.io import imread_rgb

    train_imgs = [imread_rgb(p) for p in gallery_paths]
    enc.learn(train_imgs, n_clusters=16)
    base = enc.encode(train_imgs)  # (120, 2048) real VLAD vectors
    labels = np.array([gallery_labels[p] for p in gallery_paths])
    gal, _ = expand_encodings(base, labels, n_total=4096, seed=0)
    q = enc.encode(queries)  # 80 real query encodings

    paths = [f"g{i}" for i in range(gal.shape[0])]
    exact = RetrievalIndex(gal, paths, quantize="int8")
    k = 5
    _, ix_exact = exact.query_vectors(q, k=k)
    exact_sets = [set(row) for row in np.asarray(ix_exact)]

    def recall_at_k(rerank):
        idx = RetrievalIndex(
            gal, paths, quantize="int8", screen_dim=256, rerank=rerank,
            auto_exact=False,  # pin the screened kernel
        )
        _, ix = idx.query_vectors(q, k=k)
        # set-intersection vs the SAME-quantization exact scan, so the
        # measurement isolates screening loss (the screened rescorer uses
        # the float query where the int8 scan quantizes it — sub-1e-3
        # score ties would dominate a score-threshold metric here)
        return float(np.mean([
            len(set(row) & exact_sets[i]) / k
            for i, row in enumerate(np.asarray(ix))
        ]))

    r128 = recall_at_k(128)  # the shipped default (max(4k, 128))
    assert r128 >= 0.99, f"recall@5 at default rerank=128: {r128}"
    # tighter screening degrades gracefully, and more rerank never hurts
    r64, r256 = recall_at_k(64), recall_at_k(256)
    assert r64 >= 0.9, f"recall@5 at rerank=64: {r64}"
    assert r256 >= r128 - 1e-6, (r256, r128)
