"""Separable Gaussian blur on TPU.

TPU-native replacement for ``cv2.GaussianBlur`` (reference:
pyvisim/_utils.py:884-905) and the workhorse of the SIFT Gaussian pyramid
(ops/sift.py). A 2-D Gaussian is separable, so the blur is two 1-D
convolutions — each a depthwise conv XLA maps onto the MXU/VPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_kernel1d", "gaussian_blur", "gaussian_blur_batch"]


def gaussian_kernel1d(sigma: float, kernel_size: int | None = None) -> np.ndarray:
    """Sampled-Gaussian 1-D kernel, matching OpenCV's ``getGaussianKernel``
    for sizes where OpenCV computes (rather than looks up) coefficients."""
    if kernel_size is None:
        kernel_size = 2 * int(3.0 * sigma) + 1
    if kernel_size % 2 != 1:
        raise ValueError(f"kernel_size must be odd, got {kernel_size}")
    r = (kernel_size - 1) // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _band_matrix(k: jnp.ndarray, kernel_size: int, n: int) -> jnp.ndarray:
    """(n + 2r, n) banded matrix B with B[j+t, j] = k[t]: contracting the
    padded axis against it is the 1-D correlation. Built on-device from
    iota comparisons (no multi-MB jit-closure constants; see CLAUDE.md)."""
    r = (kernel_size - 1) // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (n + 2 * r, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n + 2 * r, n), 1)
    acc = jnp.zeros((n + 2 * r, n), jnp.float32)
    for t in range(kernel_size):
        acc = acc + jnp.where(rows - cols == t, k[t], 0.0)
    return acc


@partial(jax.jit, static_argnames=("kernel_size", "sigma"))
def _blur_hw(img: jnp.ndarray, sigma: float, kernel_size: int) -> jnp.ndarray:
    """Blur a (B, H, W) stack along H then W with REFLECT_101 padding
    (OpenCV's default border mode).

    TPU-first formulation: each 1-D correlation is a banded-matrix matmul
    on the MXU at ``precision="high"`` (3-pass bf16: ~1e-4 absolute
    error at 0..255 image scale, far inside the DoG detection
    thresholds; the 6-pass "highest" costs 2x MXU time and measured
    ~0.45 ms/img of the SIFT pipeline for no parity gain — on-chip
    OpenCV descriptor cosine is 0.9992 either way, docs/PERF.md round
    3e). Single-pass default precision IS too coarse here (~0.4/255
    error reshuffles weak extrema). A single-channel
    ``conv_general_dilated`` runs ~9x slower on v5e (K=1 starves the
    MXU). The ~80x FLOP padding of the band is far cheaper than the
    VPU-bound conv at every size the pyramid uses.
    """
    k = jnp.asarray(gaussian_kernel1d(sigma, kernel_size))
    r = (kernel_size - 1) // 2
    _, h, w = img.shape

    bh = _band_matrix(k, kernel_size, h)
    bw = _band_matrix(k, kernel_size, w)
    xp = jnp.pad(img, ((0, 0), (r, r), (0, 0)), mode="reflect")
    y = jnp.einsum("ph,bpw->bhw", bh, xp, precision="high")
    yp = jnp.pad(y, ((0, 0), (0, 0), (r, r)), mode="reflect")
    return jnp.einsum("bhp,pw->bhw", yp, bw, precision="high")


def gaussian_blur_batch(
    images: jnp.ndarray, sigma: float, kernel_size: int | None = None
) -> jnp.ndarray:
    """Blur a batch: (B, H, W) or (B, H, W, C) float array."""
    if kernel_size is None:
        kernel_size = 2 * int(3.0 * sigma) + 1
    if images.ndim == 4:
        b, h, w, c = images.shape
        x = jnp.moveaxis(images, -1, 1).reshape(b * c, h, w)
        out = _blur_hw(x, float(sigma), int(kernel_size))
        return jnp.moveaxis(out.reshape(b, c, h, w), 1, -1)
    return _blur_hw(images, float(sigma), int(kernel_size))


def gaussian_blur(
    image: jnp.ndarray, sigma: float = 1.0, kernel_size: int | None = None
) -> jnp.ndarray:
    """Blur one (H, W) or (H, W, C) image."""
    return gaussian_blur_batch(image[None], sigma, kernel_size)[0]
