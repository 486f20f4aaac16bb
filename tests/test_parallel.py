"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyvisim_tpu.ops import GmmCodebook, KMeansCodebook, cosine_similarity_matrix
from pyvisim_tpu.ops.kmeans import kmeans_fit
from pyvisim_tpu.parallel import (
    distributed_gmm_fit,
    distributed_kmeans_fit,
    make_mesh,
    sharded_cosine_similarity,
    sharded_encode,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh(8, axis_names=("data",))


def test_sharded_cosine_matches_single(mesh, rng):
    x = rng.normal(size=(19, 32)).astype(np.float32)  # non-divisible Q
    y = rng.normal(size=(40, 32)).astype(np.float32)
    got = np.asarray(sharded_cosine_similarity(jnp.asarray(x), jnp.asarray(y), mesh))
    want = np.asarray(cosine_similarity_matrix(x, y))
    assert got.shape == (19, 40)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_encode_matches_single(mesh, rng):
    from pyvisim_tpu.ops.vlad import vlad_encode
    import jax as _jax

    centers = rng.normal(size=(8, 16)).astype(np.float32)
    cb = KMeansCodebook(centers=centers)
    desc = rng.normal(size=(13, 100, 16)).astype(np.float32)
    mask = np.ones((13, 100), np.float32)

    def core(d, m, model, pca):
        return _jax.vmap(lambda dd, mm: vlad_encode(dd, mm, model.centers))(d, m)

    got = np.asarray(sharded_encode(core, desc, mask, cb, None, mesh))
    want = np.stack(
        [np.asarray(vlad_encode(desc[i], None, centers)) for i in range(13)]
    )
    assert got.shape == (13, 8 * 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_distributed_kmeans_matches_quality(mesh, rng):
    centers = rng.normal(scale=8.0, size=(4, 8)).astype(np.float32)
    labels = rng.integers(0, 4, size=400)
    x = (centers[labels] + rng.normal(scale=0.2, size=(400, 8))).astype(np.float32)
    cb, inertia = distributed_kmeans_fit(x, 4, mesh, n_iters=30, seed=0)
    single_cb, single_inertia = kmeans_fit(x, 4, seed=0, n_init=2)
    assert inertia <= single_inertia * 1.05
    got = np.sort(np.asarray(cb.centers), axis=0)
    want = np.sort(centers, axis=0)
    np.testing.assert_allclose(got, want, atol=0.3)


def test_distributed_gmm_quality(mesh, rng):
    centers = rng.normal(scale=8.0, size=(3, 6)).astype(np.float32)
    labels = rng.integers(0, 3, size=300)
    x = (centers[labels] + rng.normal(scale=0.2, size=(300, 6))).astype(np.float32)
    gmm, ll = distributed_gmm_fit(x, 3, mesh, n_iters=20, seed=0)
    assert np.isfinite(ll)
    got = np.sort(np.asarray(gmm.means), axis=0)
    np.testing.assert_allclose(got, np.sort(centers, axis=0), atol=0.3)
    assert np.asarray(gmm.weights).sum() == pytest.approx(1.0, abs=1e-4)


def test_sharded_siamese_train_step(mesh, rng):
    from pyvisim_tpu.parallel import make_sharded_trainer

    model, state, step_fn = make_sharded_trainer(
        mesh, cfg_name="vgg11", embed_dim=32, trunk_convs=2, image_size=32
    )
    images = jnp.asarray(rng.random((16, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=16))
    state, loss0 = step_fn(state, images, labels)
    losses = [float(loss0)]
    for _ in range(5):
        state, loss = step_fn(state, images, labels)
        losses.append(float(loss))
    assert int(state.step) == 6
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizes on a fixed batch


def test_tp_mesh_train_step(rng):
    from pyvisim_tpu.parallel import make_sharded_trainer

    mesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    model, state, step_fn = make_sharded_trainer(
        mesh, cfg_name="vgg11", embed_dim=32, trunk_convs=2, image_size=32
    )
    images = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=8))
    state, loss = step_fn(state, images, labels)
    assert np.isfinite(float(loss))
    # head Dense kernels actually sharded over 'model'
    dense_kernel = state.params["params"]["Dense_0"]["kernel"]
    spec = dense_kernel.sharding.spec
    assert "model" in str(spec)


def test_arcface_train_step(mesh, rng):
    from pyvisim_tpu.parallel import make_sharded_trainer

    model, state, step_fn = make_sharded_trainer(
        mesh, cfg_name="vgg11", embed_dim=16, trunk_convs=1, image_size=16,
        loss="arcface", n_classes=4, margin=0.3,
    )
    images = jnp.asarray(rng.random((8, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=8))
    losses = []
    for _ in range(6):
        state, loss = step_fn(state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
