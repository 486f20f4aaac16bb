"""Auxiliary subsystems: checkpoint/resume, profiling counters."""
import numpy as np
import pytest


def test_throughput_meter():
    from pyvisim_tpu.profiling import Throughput

    m = Throughput()
    m.update(10)
    m.update(5)
    assert m.count == 15
    assert m.rate > 0
    m.reset()
    assert m.count == 0


def test_timed_and_trace_smoke(tmp_path):
    from pyvisim_tpu.profiling import timed

    with timed("test-block"):
        pass


def test_siamese_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    import optax

    from pyvisim_tpu.checkpoint import (
        latest_step,
        restore_train_state,
        save_train_state,
    )
    from pyvisim_tpu.models.siamese import (
        SiameseEmbedder,
        create_train_state,
        train_step,
    )

    model = SiameseEmbedder(cfg_name="vgg11", embed_dim=16, trunk_convs=1)
    opt = optax.adam(1e-3)
    state = create_train_state(model, opt, image_size=16)
    step = train_step(model, opt)
    images = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray([0, 0, 1, 1])
    state, _ = step(state, images, labels)
    state, _ = step(state, images, labels)

    d = str(tmp_path / "ckpt")
    save_train_state(d, state)
    assert latest_step(d) == 2

    template = create_train_state(model, opt, image_size=16)
    restored = restore_train_state(d, template)
    assert int(restored.step) == 2
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # restored state continues training
    restored, loss = step(restored, images, labels)
    assert np.isfinite(float(loss))


import jax  # noqa: E402  (used in test body)


def test_extractor_reentrancy_under_threads(rng):
    """The reference's DeepConvFeature shares a hook buffer across calls
    (reference _features.py:260 — not thread-safe). Ours is stateless:
    concurrent extractions from one instance must match serial results."""
    from concurrent.futures import ThreadPoolExecutor

    from pyvisim_tpu.features import DeepConvFeature

    ext = DeepConvFeature(image_size=32, cfg_name="vgg11")
    imgs = [(rng.random((32, 32, 3)) * 255).astype(np.uint8) for _ in range(8)]
    serial = [ext(im) for im in imgs]
    with ThreadPoolExecutor(max_workers=4) as pool:
        parallel = list(pool.map(ext, imgs))
    for s, p in zip(serial, parallel):
        np.testing.assert_allclose(s, p, rtol=1e-5, atol=1e-6)
