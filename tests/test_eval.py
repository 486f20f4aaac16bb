"""Retrieval evaluation parity tests.

Golden values from a straight transcription of the reference's per-query
loops (pyvisim/eval.py:49-145), run on random data with a stub encoder.
"""
import numpy as np
import pytest

from pyvisim_tpu.eval import retrieve_top_k_similar, top_k_accuracy, top_k_map


class StubEncoder:
    """Returns precomputed vectors keyed by the image's first element."""

    def __init__(self, table):
        self.table = table

    def encode(self, images):
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        return np.stack([self.table[int(img.ravel()[0])] for img in images])


def golden_map(q_vecs, q_labels, g_vecs, g_paths, path_labels, k):
    """Reference eval.py:49-100 loop, transcribed."""
    aps = []
    for qv, ql in zip(q_vecs, q_labels):
        sims = (
            qv
            / np.linalg.norm(qv)
            @ (g_vecs / np.linalg.norm(g_vecs, axis=1, keepdims=True)).T
        )
        order = np.argsort(-sims)
        if k is not None:
            order = order[:k]
        labels = [path_labels[g_paths[i]] for i in order]
        rel_count, prec_sum = 0, 0.0
        for rank, lab in enumerate(labels, start=1):
            if lab == ql:
                rel_count += 1
                prec_sum += rel_count / rank
        r = sum(lab == ql for lab in labels)
        aps.append(prec_sum / r if r > 0 else 0.0)
    return float(np.mean(aps))


@pytest.fixture
def retrieval_setup(rng):
    n_gallery, n_query, dim = 40, 10, 32
    g_vecs = rng.normal(size=(n_gallery, dim)).astype(np.float32)
    g_paths = [f"/g/{i}.jpg" for i in range(n_gallery)]
    path_labels = {p: int(i % 5) for i, p in enumerate(g_paths)}
    encoding_map = dict(zip(g_paths, g_vecs))
    q_vecs = rng.normal(size=(n_query, dim)).astype(np.float32)
    q_labels = [int(i % 5) for i in range(n_query)]
    images = [np.full((2, 2, 3), i, np.uint8) for i in range(n_query)]
    table = {i: q_vecs[i] for i in range(n_query)}
    return StubEncoder(table), images, q_labels, encoding_map, path_labels, q_vecs, g_vecs, g_paths


@pytest.mark.parametrize("k", [None, 5, 15])
def test_top_k_map_matches_reference_loop(retrieval_setup, k):
    enc, images, q_labels, emap, plabels, q_vecs, g_vecs, g_paths = retrieval_setup
    got = top_k_map(images, q_labels, emap, plabels, enc, k=k)
    want = golden_map(q_vecs, q_labels, g_vecs, g_paths, plabels, k)
    assert got == pytest.approx(want, abs=1e-5)


@pytest.mark.parametrize("k", [1, 5])
def test_top_k_accuracy_matches_reference_loop(retrieval_setup, k):
    enc, images, q_labels, emap, plabels, q_vecs, g_vecs, g_paths = retrieval_setup
    got = top_k_accuracy(images, q_labels, emap, plabels, enc, k=k)
    correct = 0
    for qv, ql in zip(q_vecs, q_labels):
        sims = (
            qv
            / np.linalg.norm(qv)
            @ (g_vecs / np.linalg.norm(g_vecs, axis=1, keepdims=True)).T
        )
        order = np.argsort(-sims)[:k]
        if any(plabels[g_paths[i]] == ql for i in order):
            correct += 1
    assert got == pytest.approx(correct / len(q_vecs), abs=1e-6)


def test_retrieve_top_k_similar(retrieval_setup):
    enc, images, _, emap, _, q_vecs, g_vecs, g_paths = retrieval_setup
    res = retrieve_top_k_similar(images[0], emap, enc, k=3)
    assert len(res) == 3
    sims = (
        q_vecs[0]
        / np.linalg.norm(q_vecs[0])
        @ (g_vecs / np.linalg.norm(g_vecs, axis=1, keepdims=True)).T
    )
    want_order = np.argsort(-sims)[:3]
    assert [p for p, _ in res] == [g_paths[i] for i in want_order]
    assert res[0][1] >= res[1][1] >= res[2][1]


def test_perfect_retrieval_scores_one(rng):
    # queries identical to same-label gallery vectors -> top-1 accuracy 1.0
    dim = 16
    g_vecs = np.eye(4, dim, dtype=np.float32) + 0.01
    g_paths = [f"/g/{i}" for i in range(4)]
    plabels = {p: i for i, p in enumerate(g_paths)}
    emap = dict(zip(g_paths, g_vecs))
    images = [np.full((2, 2, 3), i, np.uint8) for i in range(4)]
    enc = StubEncoder({i: g_vecs[i] for i in range(4)})
    assert top_k_accuracy(images, list(range(4)), emap, plabels, enc, k=1) == 1.0
    assert top_k_map(images, list(range(4)), emap, plabels, enc) == 1.0


def test_eval_with_mesh_matches_no_mesh(retrieval_setup):
    from pyvisim_tpu.parallel import make_mesh

    mesh = make_mesh(8, axis_names=("data",))
    enc, images, q_labels, emap, plabels, *_ = retrieval_setup
    a = top_k_map(images, q_labels, emap, plabels, enc, k=5)
    b = top_k_map(images, q_labels, emap, plabels, enc, k=5, mesh=mesh)
    assert a == pytest.approx(b, abs=1e-5)
    c = top_k_accuracy(images, q_labels, emap, plabels, enc, k=3)
    d = top_k_accuracy(images, q_labels, emap, plabels, enc, k=3, mesh=mesh)
    assert c == d


def test_encode_queries_bucketed_padding(retrieval_setup):
    """Ragged tails pad to power-of-two buckets; results identical and the
    encoder only ever sees log2(batch_size) distinct batch shapes."""
    from pyvisim_tpu.eval import _bucket_size, _encode_queries

    assert [_bucket_size(n, 8) for n in (1, 2, 3, 5, 8, 9, 64)] == [
        1, 2, 4, 8, 8, 8, 8,
    ]

    encoder, images, *_ , q_vecs, _, _ = retrieval_setup
    seen_shapes = []
    real_encode = encoder.encode

    def spy(imgs):
        seen_shapes.append(len(imgs))
        return real_encode(imgs)

    encoder.encode = spy
    out = _encode_queries(encoder, images[:7], batch_size=4)
    np.testing.assert_allclose(out, q_vecs[:7])
    # 7 images -> one full chunk of 4, then a 3-tail padded to bucket 4
    assert seen_shapes == [4, 4]


def test_eval_accepts_streamed_gallery_file(retrieval_setup, tmp_path):
    """top_k_map/accuracy accept the HDF5 path written by
    generate_encoding_map(save_path=) in place of the in-memory dict."""
    import h5py

    encoder, images, q_labels, encoding_map, path_labels, *_ = retrieval_setup
    h5p = str(tmp_path / "gal.h5")
    paths = list(encoding_map)
    with h5py.File(h5p, "w") as f:
        f.create_dataset(
            "vectors", data=np.stack([encoding_map[p] for p in paths])
        )
        f.create_dataset("paths", data=paths, dtype=h5py.string_dtype())
    a = top_k_map(images, q_labels, encoding_map, path_labels, encoder, k=5)
    b = top_k_map(images, q_labels, h5p, path_labels, encoder, k=5)
    assert a == b
