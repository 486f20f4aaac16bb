"""RetrievalIndex serving-path tests."""
import numpy as np
import pytest

from pyvisim_tpu.index import RetrievalIndex


class StubEncoder:
    def __init__(self, table):
        self.table = table

    def encode(self, images):
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        return np.stack([self.table[int(np.asarray(i).ravel()[0])] for i in images])


@pytest.fixture
def index_setup(rng):
    vecs = rng.normal(size=(30, 16)).astype(np.float32)
    paths = [f"/g/{i}.jpg" for i in range(30)]
    labels = [i % 3 for i in range(30)]
    return vecs, paths, labels


def test_query_vectors_match_bruteforce(index_setup, rng):
    vecs, paths, labels = index_setup
    idx = RetrievalIndex(vecs, paths, labels)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    scores, ids = idx.query_vectors(q, k=5)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ vn.T
    want = np.argsort(-sims, axis=1)[:, :5]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(
        scores, np.take_along_axis(sims, want, axis=1), rtol=1e-5, atol=1e-5
    )


def test_query_with_encoder(index_setup):
    vecs, paths, _ = index_setup
    idx = RetrievalIndex(vecs, paths)
    enc = StubEncoder({7: vecs[7]})
    res = idx.query(enc, np.full((2, 2, 3), 7, np.uint8), k=3)
    assert len(res) == 1 and len(res[0]) == 3
    assert res[0][0][0] == paths[7]  # exact match ranks first
    assert res[0][0][1] == pytest.approx(1.0, abs=1e-5)


def test_from_encoding_map_and_save_load(index_setup, tmp_path):
    vecs, paths, labels = index_setup
    emap = dict(zip(paths, vecs))
    idx = RetrievalIndex.from_encoding_map(emap, labels=labels)
    p = str(tmp_path / "index.npz")
    idx.save(p)
    idx2 = RetrievalIndex.load(p)
    assert idx2.paths == idx.paths
    assert len(idx2) == 30
    q = vecs[:2]
    np.testing.assert_array_equal(
        idx.query_vectors(q, 4)[1], idx2.query_vectors(q, 4)[1]
    )


def test_sharded_index_matches_unsharded(index_setup, rng):
    from pyvisim_tpu.parallel import make_mesh

    vecs, paths, _ = index_setup
    mesh = make_mesh(8, axis_names=("data",))
    plain = RetrievalIndex(vecs, paths)
    sharded = RetrievalIndex(vecs, paths, mesh=mesh)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        plain.query_vectors(q, 5)[1], sharded.query_vectors(q, 5)[1]
    )


def test_shape_validation(index_setup):
    vecs, paths, _ = index_setup
    with pytest.raises(ValueError, match="N == len"):
        RetrievalIndex(vecs, paths[:-1])


def test_int8_quantized_index(index_setup, rng):
    vecs, paths, _ = index_setup
    f32 = RetrievalIndex(vecs, paths)
    q8 = RetrievalIndex(vecs, paths, quantize="int8")
    assert q8.vectors.dtype.name == "int8"
    q = rng.normal(size=(6, 16)).astype(np.float32)
    s_f, i_f = f32.query_vectors(q, 5)
    s_q, i_q = q8.query_vectors(q, 5)
    # rank-1 agreement and close scores
    np.testing.assert_array_equal(i_f[:, 0], i_q[:, 0])
    np.testing.assert_allclose(s_f, s_q, atol=0.03)
    # top-5 set overlap high
    overlap = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(i_f, i_q)])
    assert overlap >= 0.8


def test_int8_index_save_load(index_setup, tmp_path, rng):
    vecs, paths, labels = index_setup
    q8 = RetrievalIndex(vecs, paths, labels, quantize="int8")
    p = str(tmp_path / "q8.npz")
    q8.save(p)
    back = RetrievalIndex.load(p)
    assert back.quantize == "int8"
    q = rng.normal(size=(3, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        q8.query_vectors(q, 4)[1], back.query_vectors(q, 4)[1]
    )


def test_index_add_streaming_ingest(index_setup, rng):
    """add() must behave exactly like building the index from the full
    gallery (f32 mode), across a capacity-doubling boundary."""
    vecs, paths, labels = index_setup
    n0 = len(paths) // 2
    idx = RetrievalIndex(vecs[:n0], paths[:n0], labels[:n0])
    idx.add(vecs[n0:], paths[n0:], labels[n0:])
    full = RetrievalIndex(vecs, paths, labels)
    assert len(idx) == len(full) == len(paths)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    s_a, i_a = idx.query_vectors(q, 5)
    s_f, i_f = full.query_vectors(q, 5)
    np.testing.assert_array_equal(i_a, i_f)
    np.testing.assert_allclose(s_a, s_f, atol=1e-6)
    # paths/labels followed the appends
    assert idx.paths == list(paths)
    np.testing.assert_array_equal(idx.labels, np.asarray(labels))


def test_index_add_int8_and_save_roundtrip(index_setup, tmp_path, rng):
    """int8 ingest: appended rows are quantized, existing codes kept, and
    the grown index survives save/load."""
    vecs, paths, labels = index_setup
    n0 = 5
    idx = RetrievalIndex(vecs[:n0], paths[:n0], labels[:n0], quantize="int8")
    idx.add(vecs[n0:], paths[n0:], labels[n0:])
    full = RetrievalIndex(vecs, paths, labels, quantize="int8")
    q = rng.normal(size=(3, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        idx.query_vectors(q, 4)[1], full.query_vectors(q, 4)[1]
    )
    p = str(tmp_path / "grown.npz")
    idx.save(p)
    back = RetrievalIndex.load(p)
    np.testing.assert_array_equal(
        idx.query_vectors(q, 4)[1], back.query_vectors(q, 4)[1]
    )


def test_index_add_label_consistency(index_setup):
    vecs, paths, labels = index_setup
    idx = RetrievalIndex(vecs[:4], paths[:4])  # no labels
    import pytest as _pytest

    with _pytest.raises(ValueError, match="labels"):
        idx.add(vecs[4:6], paths[4:6], labels[4:6])


def test_sharded_index_add_matches_unsharded(index_setup, rng):
    """Streaming ingest on a mesh-sharded index: the capacity/placement
    engine must re-shard grown galleries identically to a from-scratch
    sharded build."""
    from pyvisim_tpu.parallel import make_mesh

    vecs, paths, _ = index_setup
    mesh = make_mesh(8, axis_names=("data",))
    n0 = 6
    idx = RetrievalIndex(vecs[:n0], paths[:n0], mesh=mesh)
    idx.add(vecs[n0:], paths[n0:])
    plain = RetrievalIndex(vecs, paths)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        idx.query_vectors(q, 5)[1], plain.query_vectors(q, 5)[1]
    )


# -- coarse-to-fine screening (JL projection + exact re-rank) ---------------

def test_screened_full_rerank_matches_exact(index_setup, rng):
    """rerank >= n rescans every row exactly, so indices must match the
    exact path bit-for-bit (scores are the same einsum math)."""
    vecs, paths, labels = index_setup
    exact = RetrievalIndex(vecs, paths, labels)
    scr = RetrievalIndex(vecs, paths, labels, screen_dim=8, rerank=64,
                         auto_exact=False)  # pin the screened kernel
    q = rng.normal(size=(5, 16)).astype(np.float32)
    s0, i0 = exact.query_vectors(q, k=4)
    s1, i1 = scr.query_vectors(q, k=4)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-6)


def test_screened_recall_on_clustered_gallery(rng):
    """Tight screening (rerank << n) must still recover the true top-1 on
    a clustered gallery — queries are near-duplicates of gallery rows."""
    base = rng.normal(size=(40, 4, 64)).astype(np.float32)  # 40 clusters
    gal = (base + 0.05 * rng.normal(size=base.shape)).reshape(160, 64)
    gal = gal.astype(np.float32)
    paths = [f"p{i}" for i in range(160)]
    idx = RetrievalIndex(gal, paths, screen_dim=16, rerank=8,
                         auto_exact=False)  # pin the screened kernel
    q = gal[::4] + 0.01 * rng.normal(size=(40, 64)).astype(np.float32)
    _, top = idx.query_vectors(q, k=1)
    hits = np.mean(top[:, 0] // 4 == np.arange(40))
    assert hits >= 0.9, hits


def test_screened_add_save_load_and_int8(index_setup, tmp_path, rng):
    """Screen mode composes with int8 + streaming add + persistence; the
    JL projection is seed-fixed so load() regenerates it."""
    vecs, paths, labels = index_setup
    idx = RetrievalIndex(vecs[:20], paths[:20], labels[:20],
                         quantize="int8", screen_dim=8, rerank=30,
                         auto_exact=False)  # pin the screened kernel
    idx.add(vecs[20:], paths[20:], labels[20:])
    q = rng.normal(size=(3, 16)).astype(np.float32)
    s0, i0 = idx.query_vectors(q, k=5)
    p = str(tmp_path / "scr.npz")
    idx.save(p)
    idx2 = RetrievalIndex.load(p)
    assert idx2.screen_dim == 8 and idx2.rerank == 30
    s1, i1 = idx2.query_vectors(q, k=5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-4, atol=1e-5)
    # rerank covers every live row here, so int8-screened == int8-exact
    plain = RetrievalIndex(vecs, paths, labels, quantize="int8")
    np.testing.assert_array_equal(plain.query_vectors(q, k=5)[1], i0)


def test_add_rejects_dim_mismatch_and_stays_consistent(index_setup, rng):
    """add() with the wrong feature dim must raise BEFORE mutating any
    state — dynamic_update_slice would legally accept a narrower update
    and silently write corrupted partial rows, and a post-mutation error
    would leave _n ahead of the device rows (index->path skew)."""
    vecs, paths, labels = index_setup
    idx = RetrievalIndex(vecs[:20], paths[:20], labels[:20])
    q = rng.normal(size=(2, 16)).astype(np.float32)
    s0, i0 = idx.query_vectors(q, k=3)
    bad = rng.normal(size=(4, 8)).astype(np.float32)  # D=8 != 16
    with pytest.raises(ValueError, match="feature dim"):
        idx.add(bad, [f"bad{i}" for i in range(4)],
                labels=np.zeros(4, np.int64))
    assert len(idx) == 20 and len(idx.paths) == 20
    s1, i1 = idx.query_vectors(q, k=3)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1)


def test_auto_exact_routes_big_batches_to_the_exact_scan(rng):
    """Default auto_exact routing: once Q*rerank*15 >= n the screened
    index answers with the exact full scan (bit-identical indices AND
    scores), while small-Q queries still take the screened kernel."""
    gal = rng.normal(size=(2048, 32)).astype(np.float32)
    paths = [f"p{i}" for i in range(2048)]
    exact = RetrievalIndex(gal, paths)
    auto = RetrievalIndex(gal, paths, screen_dim=4, rerank=8)   # default on
    pinned = RetrievalIndex(gal, paths, screen_dim=4, rerank=8,
                            auto_exact=False)

    # Big batch: 64 * 8 * 15 = 7680 >= 2048 -> exact route.
    qb = rng.normal(size=(64, 32)).astype(np.float32)
    sa, ia = auto.query_vectors(qb, k=5)
    se, ie = exact.query_vectors(qb, k=5)
    np.testing.assert_array_equal(ia, ie)
    np.testing.assert_allclose(sa, se, rtol=1e-6, atol=1e-7)
    # Sanity: the routing mattered — the pinned aggressive screen (4-dim
    # JL, rerank 8) visibly disagrees with exact on a random gallery.
    _, ip = pinned.query_vectors(qb, k=5)
    assert not np.array_equal(ip, ie)

    # Small batch: 1 * 8 * 15 = 120 < 2048 -> stays on the screened
    # kernel (matches the pinned index exactly).
    q1 = rng.normal(size=(1, 32)).astype(np.float32)
    s_auto, i_auto = auto.query_vectors(q1, k=5)
    s_pin, i_pin = pinned.query_vectors(q1, k=5)
    np.testing.assert_array_equal(i_auto, i_pin)
    np.testing.assert_allclose(s_auto, s_pin, rtol=1e-6, atol=1e-7)


def test_screened_rejects_bad_config(index_setup):
    vecs, paths, labels = index_setup
    with pytest.raises(ValueError, match="screen_dim"):
        RetrievalIndex(vecs, paths, rerank=8)
    with pytest.raises(ValueError, match="screen_dim"):
        RetrievalIndex(vecs, paths, screen_dim=16)  # >= vector dim


def test_screened_sharded_matches_unsharded(index_setup, rng):
    from pyvisim_tpu.parallel import make_mesh

    vecs, paths, _ = index_setup
    mesh = make_mesh(8, axis_names=("data",))
    a = RetrievalIndex(vecs, paths, screen_dim=8, rerank=12,
                       auto_exact=False)
    b = RetrievalIndex(vecs, paths, mesh=mesh, screen_dim=8, rerank=12,
                       auto_exact=False)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        a.query_vectors(q, 3)[1], b.query_vectors(q, 3)[1]
    )
