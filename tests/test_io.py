"""Host IO layer tests: native C++ JPEG loader vs OpenCV golden."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pyvisim_tpu.io import imread_rgb, imread_rgb_batch, native_loader_available


@pytest.fixture
def jpegs(tmp_path, rng):
    paths = []
    for i in range(5):
        img = (rng.random((60 + 7 * i, 90, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)
    return paths


def test_native_loader_built():
    # tools/build_native.py output ships with the repo build
    assert native_loader_available()


def test_single_decode_matches_opencv(jpegs):
    for p in jpegs:
        ours = imread_rgb(p)
        want = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert ours.shape == want.shape
        np.testing.assert_array_equal(ours, want)


def test_batch_decode_resize(jpegs):
    batch = imread_rgb_batch(jpegs, target_size=(32, 48))
    assert isinstance(batch, np.ndarray)
    assert batch.shape == (5, 32, 48, 3) and batch.dtype == np.uint8
    # within rounding of OpenCV's INTER_LINEAR
    want = cv2.resize(
        cv2.cvtColor(cv2.imread(jpegs[0]), cv2.COLOR_BGR2RGB),
        (48, 32),
        interpolation=cv2.INTER_LINEAR,
    )
    diff = np.abs(batch[0].astype(int) - want.astype(int))
    assert diff.max() <= 2


def test_batch_without_resize_returns_list(jpegs):
    out = imread_rgb_batch(jpegs)
    assert isinstance(out, list) and len(out) == 5
    assert out[0].shape[2] == 3


def test_non_jpeg_fallback(tmp_path, rng):
    img = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    out = imread_rgb(p)
    np.testing.assert_array_equal(out, img)


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        imread_rgb("/nonexistent/path.png")


def test_prefetch_iterator_order_and_completion(rng):
    from pyvisim_tpu.io import prefetch_to_device

    batches = [
        (np.full((2, 4, 4, 3), i, np.uint8), np.array([i, i])) for i in range(6)
    ]
    out = list(prefetch_to_device(iter(batches), depth=3))
    assert len(out) == 6
    for i, (imgs, labels) in enumerate(out):
        assert int(np.asarray(labels)[0]) == i
        assert hasattr(imgs, "devices") or hasattr(imgs, "sharding")  # on device


def test_prefetch_propagates_producer_error():
    from pyvisim_tpu.io import PrefetchIterator

    def bad_source():
        yield np.zeros((1,))
        raise RuntimeError("decode failed")

    it = PrefetchIterator(bad_source(), to_device=False)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetch_overlaps_producer(rng):
    import time

    from pyvisim_tpu.io import PrefetchIterator

    # wall-clock sensitive on this 1-CPU image: under a loaded full-suite
    # run the producer thread can be starved past any fixed deadline, so
    # retry the whole scenario a few times before declaring failure
    for attempt in range(3):
        def slow_source():
            for i in range(4):
                time.sleep(0.05)
                yield i

        it = PrefetchIterator(slow_source(), depth=4, to_device=False)
        time.sleep(0.25)  # producer should have finished everything by now
        t0 = time.perf_counter()
        items = list(it)
        waited = time.perf_counter() - t0
        assert items == [0, 1, 2, 3]
        if waited < 0.05:  # consumed from the queue, no waiting
            return
    raise AssertionError(
        f"prefetch never overlapped the producer (last drain {waited:.3f}s)")


def test_prefetch_close_joins_blocked_producer():
    """ADVICE r1: a producer blocked in queue.put could outlive close()."""
    import itertools
    import time

    from pyvisim_tpu.io import prefetch_to_device

    it = prefetch_to_device(itertools.count(), depth=1)
    next(it)  # producer is now blocked refilling the depth-1 queue
    time.sleep(0.05)
    it.close()
    it._thread.join(timeout=2.0)
    assert not it._thread.is_alive()
    assert it._queue.empty()
