"""Image decoding: native C++ loader with OpenCV fallback.

The native loader (``native/image_loader.cpp``) decodes JPEGs with libjpeg
on a thread pool and optionally resizes — replacing the serial
``cv2.imread`` + ``cv2.cvtColor`` host loop of the reference
(pyvisim/encoders/_base_encoder.py:357). Falls back to OpenCV if the
shared library has not been built (``python tools/build_native.py``).
"""
from __future__ import annotations

import ctypes
import os
import pathlib
from typing import Iterable, List, Optional

import numpy as np

_LIB_PATH = pathlib.Path(__file__).parent / "libpyvisim_io.so"
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.pvs_decode_batch.restype = ctypes.c_int
    lib.pvs_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # paths
        ctypes.c_int,  # n
        ctypes.c_int,  # target_h (0 = native size; then n must be 1)
        ctypes.c_int,  # target_w
        ctypes.POINTER(ctypes.c_uint8),  # out buffer
        ctypes.POINTER(ctypes.c_int),  # out heights
        ctypes.POINTER(ctypes.c_int),  # out widths
        ctypes.c_int,  # n_threads
    ]
    _lib = lib
    return lib


def native_loader_available() -> bool:
    return _load_native() is not None


def imread_rgb(path: str) -> np.ndarray:
    """Decode one image file to an RGB uint8 (H, W, 3) array."""
    lib = _load_native()
    if lib is not None and str(path).lower().endswith((".jpg", ".jpeg")):
        # Probe pass: decode at native size (single image).
        h = ctypes.c_int(0)
        w = ctypes.c_int(0)
        # First call with a null buffer to get dimensions.
        paths = (ctypes.c_char_p * 1)(str(path).encode())
        rc = lib.pvs_decode_batch(
            paths, 1, -1, -1, None, ctypes.byref(h), ctypes.byref(w), 1
        )
        if rc == 0 and h.value > 0:
            buf = np.empty((h.value, w.value, 3), np.uint8)
            rc = lib.pvs_decode_batch(
                paths,
                1,
                h.value,
                w.value,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(h),
                ctypes.byref(w),
                1,
            )
            if rc == 0:
                return buf
    import cv2

    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(f"Could not read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def imread_rgb_batch(
    paths: Iterable[str],
    target_size: Optional[tuple[int, int]] = None,
    n_threads: int | None = None,
) -> List[np.ndarray] | np.ndarray:
    """Decode a batch of images; with ``target_size=(H, W)`` the native
    loader decodes + bilinear-resizes on a thread pool and returns a single
    (B, H, W, 3) uint8 array."""
    paths = [str(p) for p in paths]
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    lib = _load_native()
    if (
        lib is not None
        and target_size is not None
        and all(p.lower().endswith((".jpg", ".jpeg")) for p in paths)
    ):
        th, tw = target_size
        n = len(paths)
        buf = np.empty((n, th, tw, 3), np.uint8)
        hs = (ctypes.c_int * n)()
        ws = (ctypes.c_int * n)()
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = lib.pvs_decode_batch(
            arr,
            n,
            th,
            tw,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            hs,
            ws,
            n_threads,
        )
        if rc == 0:
            return buf
    imgs = [imread_rgb(p) for p in paths]
    if target_size is not None:
        import cv2

        th, tw = target_size
        imgs = [
            cv2.resize(i, (tw, th), interpolation=cv2.INTER_AREA) for i in imgs
        ]
        return np.stack(imgs)
    return imgs
