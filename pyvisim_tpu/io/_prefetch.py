"""Host→device prefetching for the input pipeline.

The reference decodes images inline in its encode loops, serializing host
IO with compute (reference: pyvisim/encoders/_base_encoder.py:344-359).
This module overlaps them: a background thread decodes/produces the next
batches while the device computes on the current one, keeping the TPU fed.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

from .._config import get_logger

logger = get_logger("io.prefetch")

__all__ = ["prefetch_to_device", "PrefetchIterator"]

_SENTINEL = object()


class PrefetchIterator:
    """Iterate batches produced by ``source`` with ``depth`` batches
    decoded ahead on a background thread and (optionally) already
    transferred to the device.

    Exceptions in the producer propagate to the consumer; the thread shuts
    down cleanly when the iterator is exhausted, closed, or garbage
    collected.
    """

    def __init__(
        self,
        source: Iterable,
        depth: int = 2,
        to_device: bool = True,
        transform: Callable | None = None,
    ):
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._to_device = to_device
        self._transform = transform
        self._closed = False
        self._thread = threading.Thread(
            target=self._produce, args=(iter(source),), daemon=True
        )
        self._thread.start()

    def _produce(self, it: Iterator) -> None:
        try:
            for item in it:
                if self._closed:
                    return
                if self._transform is not None:
                    item = self._transform(item)
                if self._to_device:
                    item = jax.tree_util.tree_map(
                        lambda a: jax.device_put(a) if hasattr(a, "shape") else a,
                        item,
                        is_leaf=lambda a: hasattr(a, "shape"),
                    )
                if not self._put(item):
                    return
            self._put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 - surfaced to the consumer
            self._put(e)

    def _put(self, item) -> bool:
        """Enqueue, waking periodically to recheck ``_closed`` so a producer
        blocked on a full queue can't outlive close() (and keep device-put
        arrays pinned in HBM)."""
        while not self._closed:
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self) -> None:
        self._closed = True
        # Drain until the producer thread has actually exited — a single
        # drain could race a producer that re-enqueues and re-blocks.
        while self._thread.is_alive():
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=0.05)
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):  # pragma: no cover - GC timing
        self.close()


def prefetch_to_device(source: Iterable, depth: int = 2) -> PrefetchIterator:
    """Wrap any batch iterable (e.g. ``OxfordFlowerDataset.iter_batches``)
    so decode + host→device transfer overlap device compute.

    >>> for images, labels, paths in prefetch_to_device(
    ...         dataset.iter_batches(128, image_size=224)):
    ...     encodings = encoder.encode(images)
    """
    return PrefetchIterator(source, depth=depth, to_device=True)
