"""Basic image ops: pyramid resize, Gaussian blur, gradients.

TPU-first equivalents of the OpenCV calls the reference makes
(``cv::resize`` in ORBextractor::ComputePyramid /root/reference/src/
ORBextractor.cc:1107-1132, ``cv::GaussianBlur(7,7,2,2)`` at :1084).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float):
    """Static per-level (h, w) like the reference's mvScaleFactor pyramid."""
    shapes = []
    for l in range(n_levels):
        s = scale**l
        shapes.append((int(round(h / s)), int(round(w / s))))
    return shapes


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize with half-pixel centers (cv::INTER_LINEAR semantics)."""
    return jax.image.resize(img, out_hw, method="linear", antialias=False)


def build_pyramid(img: jax.Array, n_levels: int, scale: float) -> list[jax.Array]:
    """Image pyramid; level l is resized from level l-1 (like the reference)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[l]))
    return levels


def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with reflect-101 borders (OpenCV default)."""
    k = jnp.asarray(_gaussian_kernel_1d(ksize, sigma))
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    # rows
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, None, :], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    # cols
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, :, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x


def sobel_gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sobel dx, dy with reflect borders. Returns (gx, gy), same shape."""
    kx = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    ky = kx.T
    x = jnp.pad(img, 1, mode="reflect")[None, None]
    gx = jax.lax.conv_general_dilated(
        x, kx[None, None], (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )[0, 0]
    gy = jax.lax.conv_general_dilated(
        x, ky[None, None], (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )[0, 0]
    return gx, gy
