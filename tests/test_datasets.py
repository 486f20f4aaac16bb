"""OxfordFlowerDataset semantics tests on a fabricated local dataset
(no network): swapped splits, purpose filtering, integrity checks,
batch iteration."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
scipy_io = pytest.importorskip("scipy.io")

from pyvisim_tpu.datasets import datasets as ds


@pytest.fixture
def fake_oxford(tmp_path, monkeypatch):
    """A 12-image mini-Oxford: tstid=6 (-> train), valid=3, trnid=3 (-> test)."""
    root = tmp_path / "oxford_flower_dataset"
    img_dir = root / "images" / "jpg"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(1, 13):
        img = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"image_{i:05d}.jpg"), img)
    labels = np.arange(1, 13) % 4 + 1
    scipy_io.savemat(str(root / "labels.mat"), {"labels": labels.reshape(1, -1)})
    scipy_io.savemat(
        str(root / "setid.mat"),
        {
            "tstid": np.array([[1, 2, 3, 4, 5, 6]]),
            "valid": np.array([[7, 8, 9]]),
            "trnid": np.array([[10, 11, 12]]),
        },
    )
    monkeypatch.setattr(ds, "_DATASET_ROOT", str(root))
    monkeypatch.setattr(ds, "_IMAGE_DIR", str(img_dir))
    monkeypatch.setattr(ds, "_IMAGE_LABEL_FILE", str(root / "labels.mat"))
    monkeypatch.setattr(ds, "_SETID_FILE", str(root / "setid.mat"))
    monkeypatch.setattr(ds, "OXFORD_NUM_IMAGES", 12)
    monkeypatch.setattr(ds, "NUM_TEST_IMG", 6)
    monkeypatch.setattr(ds, "NUM_VAL_IMG", 3)
    monkeypatch.setattr(ds, "NUM_TRAIN_IMG", 3)
    return root, labels


def test_swapped_splits(fake_oxford):
    _, labels = fake_oxford
    train = ds.OxfordFlowerDataset(purpose="train")
    # the reference swaps tstid into train (datasets.py:234-236)
    assert len(train) == 6
    assert [os.path.basename(p) for p in train.image_paths] == [
        f"image_{i:05d}.jpg" for i in range(1, 7)
    ]
    test = ds.OxfordFlowerDataset(purpose="test")
    assert len(test) == 3
    assert [os.path.basename(p) for p in test.image_paths] == [
        f"image_{i:05d}.jpg" for i in (10, 11, 12)
    ]


def test_combined_purposes_and_labels(fake_oxford):
    _, labels = fake_oxford
    both = ds.OxfordFlowerDataset(purpose=["validation", "test"])
    assert len(both) == 6
    for path, label in zip(both.image_paths, both.labels):
        i = int(os.path.basename(path)[6:11])
        assert label == labels[i - 1]


def test_duplicate_purpose_rejected(fake_oxford):
    with pytest.raises(ValueError, match="Duplicate purposes"):
        ds.OxfordFlowerDataset(purpose=["train", "train"])
    with pytest.raises(ValueError, match="Unknown purpose"):
        ds.OxfordFlowerDataset(purpose="banana")


def test_getitem_and_transform(fake_oxford):
    data = ds.OxfordFlowerDataset(purpose="validation")
    img, label, path = data[0]
    assert img.ndim == 3 and img.shape[2] == 3
    assert isinstance(label, (int, np.integer))
    transformed = ds.OxfordFlowerDataset(
        purpose="validation", transform=lambda im: im[:5, :5]
    )
    img2, _, _ = transformed[0]
    assert img2.shape[:2] == (5, 5)


def test_iter_batches(fake_oxford):
    data = ds.OxfordFlowerDataset(purpose="train")
    batches = list(data.iter_batches(batch_size=4, image_size=16))
    assert len(batches) == 2
    imgs, labels, paths = batches[0]
    assert imgs.shape == (4, 16, 16, 3) and imgs.dtype == np.uint8
    assert len(labels) == len(paths) == 4
    drop = list(data.iter_batches(batch_size=4, image_size=16, drop_remainder=True))
    assert len(drop) == 1


def test_integrity_failure_triggers_download(fake_oxford, monkeypatch):
    root, _ = fake_oxford
    # corrupt: delete one image -> count mismatch -> download attempted
    imgs = sorted((root / "images" / "jpg").glob("*.jpg"))
    imgs[0].unlink()
    called = {}

    def fake_download():
        called["yes"] = True
        raise RuntimeError("no network in test")

    monkeypatch.setattr(ds, "download_oxford_flowers_data", fake_download)
    with pytest.raises(RuntimeError, match="no network"):
        ds.OxfordFlowerDataset(purpose="train")
    assert called.get("yes")


def test_download_retries_on_failure(tmp_path, monkeypatch):
    """The reference never checks HTTP status (datasets.py:56); our
    downloader retries transient failures and raises after exhaustion."""
    calls = {"n": 0}

    class FakeResponse:
        def __init__(self, ok):
            self.ok = ok

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def raise_for_status(self):
            if not self.ok:
                raise RuntimeError("HTTP 503")

        def iter_content(self, chunk_size):
            yield b"payload"

    def fake_get(url, stream=True, timeout=60):
        calls["n"] += 1
        return FakeResponse(ok=calls["n"] >= 3)

    import types

    monkeypatch.setitem(
        __import__("sys").modules, "requests", types.SimpleNamespace(get=fake_get)
    )
    dest = str(tmp_path / "file.bin")
    ds._download_file("http://example/file.bin", dest, retries=3)
    assert calls["n"] == 3
    assert open(dest, "rb").read() == b"payload"

    calls["n"] = -10  # will keep failing for all retries
    with pytest.raises(RuntimeError, match="HTTP 503"):
        ds._download_file("http://example/file.bin", dest, retries=2)
