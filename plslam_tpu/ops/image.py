"""Basic image ops: pyramid resize, Gaussian blur, gradients.

TPU-first equivalents of the OpenCV calls the reference makes
(``cv::resize`` in ORBextractor::ComputePyramid /root/reference/src/
ORBextractor.cc:1107-1132, ``cv::GaussianBlur(7,7,2,2)`` at :1084).
"""

from __future__ import annotations


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


def _sep_stencil(img: jax.Array, k: np.ndarray, axis: int) -> jax.Array:
    """1D stencil along an axis as shifted adds — single-channel convs map
    terribly onto the TPU conv unit (MXU wants many channels), while a
    handful of pad-shift-multiply-adds fuse into one VPU pass under XLA."""
    r = len(k) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="reflect")
    h, w = img.shape
    out = None
    for i, kv in enumerate(k):
        if axis == 0:
            s = jax.lax.dynamic_slice(x, (i, 0), (h, w))
        else:
            s = jax.lax.dynamic_slice(x, (0, i), (h, w))
        term = s * float(kv)
        out = term if out is None else out + term
    return out


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with reflect-101 borders (OpenCV default)."""
    k = _gaussian_kernel_1d(ksize, sigma)
    x = _sep_stencil(img, k, 1)
    return _sep_stencil(x, k, 0)


def sobel_gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sobel dx, dy with reflect borders. Returns (gx, gy), same shape."""
    d = np.array([-1.0, 0.0, 1.0], np.float32)
    s = np.array([1.0, 2.0, 1.0], np.float32)
    gx = _sep_stencil(_sep_stencil(img, d, 1), s, 0)
    gy = _sep_stencil(_sep_stencil(img, s, 1), d, 0)
    return gx, gy
