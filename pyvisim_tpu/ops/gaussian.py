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


@partial(jax.jit, static_argnames=("kernel_size", "sigma"))
def _blur_hw(img: jnp.ndarray, sigma: float, kernel_size: int) -> jnp.ndarray:
    """Blur a (B, H, W) stack along H then W with REFLECT_101 padding
    (OpenCV's default border mode)."""
    k = jnp.asarray(gaussian_kernel1d(sigma, kernel_size))
    r = (kernel_size - 1) // 2

    def conv1d(x, axis):
        # reflect-101 padding: cv2.BORDER_REFLECT_101 == np.pad mode="reflect"
        pad = [(0, 0)] * x.ndim
        pad[axis] = (r, r)
        xp = jnp.pad(x, pad, mode="reflect")
        # depthwise conv via conv_general_dilated on a singleton channel
        if axis == 1:
            lhs = xp[:, None, :, :]  # (B, 1, H+2r, W)
            rhs = k.reshape(1, 1, kernel_size, 1)
        else:
            lhs = xp[:, None, :, :]
            rhs = k.reshape(1, 1, 1, kernel_size)
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out[:, 0]

    return conv1d(conv1d(img, 1), 2)


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
