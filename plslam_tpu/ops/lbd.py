"""Line Band Descriptor (LBD) — batched, int8-quantized float descriptor.

TPU-native equivalent of the OpenCV ``BinaryDescriptor::compute`` (LBD,
Zhang & Koch 2013) the reference calls in ``LineExtractor::ExtractLineSegment``
(/root/reference/src/LineExtractor.cpp:21,56). For each segment, gradients
are sampled on a line-aligned band grid (9 bands x rows x S columns),
accumulated into per-band mean/std statistics of the four half-wave
gradient projections — the classic LBD 72-dim float descriptor.

Unlike round 1's 256-bit binarization (band-pair inequality bits), the
descriptor is kept as the 72-dim vector, unit-normalized and quantized to
uint8 in [0, 127]: measured on rendered scenes with ground-truth
association, binarized true-pair Hamming distances were near-random
(median 48/256 at a 1-frame gap, ~96 at 10 frames) while the float
vector separates cleanly (squared-L2 ~0.15 true vs ~1.0 wrong). Matching
is a quantized squared-L2 computed as an integer dot product — one MXU
matmul, the exact machinery ORB Hamming matching uses.

``lbd_distance_matrix`` additionally takes the minimum against the
FLIPPED query descriptor: LSD endpoint order is canonicalized by mean
gradient polarity (ops/lsd.py), but lines whose mean normal gradient is
near zero still flip between frames, and a flip permutes the descriptor
deterministically (band order reversed, +/- channels swapped) — so
flip-invariance costs one extra matmul instead of lost matches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LineConfig
from . import image

_S = 12          # samples along the line
_ROWS_PER_BAND = 3  # perpendicular samples per band (band rows are ~7 px but
                    # the gradient maps are pre-blurred, so a 2.3 px sampling
                    # stride loses little; gathers are the TPU cost — this is
                    # an 8x reduction vs sampling every row/column)

LBD_DIM = 72     # 9 bands x (4 mean + 4 std) channels
_QSCALE = 127.0  # unit-norm halves quantized to [0, 127] uint8


def _flip_perm(nb: int = 9) -> np.ndarray:
    """Index permutation mapping desc(line) -> desc(line with endpoints
    swapped): band order reverses, and the +/- half-wave channels swap
    within both the mean block (0..3) and the std block (4..7)."""
    chan = np.array([1, 0, 3, 2, 5, 4, 7, 6], np.int32)
    perm = np.zeros(nb * 8, np.int32)
    for b in range(nb):
        perm[b * 8 : b * 8 + 8] = (nb - 1 - b) * 8 + chan
    return perm


_FLIP_PERM = jnp.asarray(_flip_perm())


def _sample_nearest(imgmap: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Nearest-neighbor sampling via one linearized gather. The gradient
    maps are pre-blurred (sigma 1) and band statistics average ~100 samples,
    so bilinear's sub-pixel precision buys nothing here — and gathers are
    the whole cost of LBD on TPU (4x fewer with nearest)."""
    h, w = imgmap.shape
    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
    return imgmap.ravel()[yi * w + xi]


@functools.partial(jax.jit, static_argnames=("cfg",))
def lbd_descriptors(
    gx: jax.Array,
    gy: jax.Array,
    endpoints: jax.Array,  # (NL, 2, 2)
    valid: jax.Array,      # (NL,)
    cfg: LineConfig,
) -> jax.Array:
    """Quantized LBD descriptors (NL, 72) uint8 from precomputed gradients.

    Layout: band-major, [mean+, mean-, meanpar+, meanpar-,
    std+, std-, stdpar+, stdpar-] per band; each 36-dim half is
    unit-normalized then scaled by 127."""
    nb, bw = cfg.lbd_n_bands, cfg.lbd_band_width
    rpb = _ROWS_PER_BAND
    rows = nb * rpb  # perpendicular SAMPLES (bands span nb*bw px)

    s = endpoints[:, 0]  # (NL, 2)
    e = endpoints[:, 1]
    d = e - s
    length = jnp.sqrt(jnp.sum(d**2, -1, keepdims=True)) + 1e-6
    d = d / length                      # unit along-line dir (NL, 2)
    n = jnp.stack([-d[:, 1], d[:, 0]], -1)  # unit normal

    ts = (jnp.arange(_S) + 0.5) / _S    # (S,)
    # per-band sample offsets in px: rpb evenly spaced rows inside each
    # bw-px band, bands centered on the line
    stride = bw / rpb
    offs = (jnp.arange(rows) + 0.5) * stride - (nb * bw) / 2.0  # (rows,)

    # sample positions: (NL, S, rows, 2)
    base = s[:, None, :] + ts[None, :, None] * (e - s)[:, None, :]
    pos = base[:, :, None, :] + offs[None, None, :, None] * n[:, None, None, :]
    x = pos[..., 0]
    y = pos[..., 1]
    sg_x = _sample_nearest(gx, x, y)  # (NL, S, rows)
    sg_y = _sample_nearest(gy, x, y)
    g_par = sg_x * d[:, None, None, 0] + sg_y * d[:, None, None, 1]
    g_perp = sg_x * n[:, None, None, 0] + sg_y * n[:, None, None, 1]

    # global Gaussian row weighting (LBD paper f_g)
    sigma_g = 0.5 * (nb * bw - 1)
    wg = jnp.exp(-(offs**2) / (2 * sigma_g**2))  # (rows,)

    # half-wave rectified projections, band-accumulated over rows
    feats = jnp.stack(
        [
            jnp.maximum(g_perp, 0.0),
            jnp.maximum(-g_perp, 0.0),
            jnp.maximum(g_par, 0.0),
            jnp.maximum(-g_par, 0.0),
        ],
        axis=-1,
    )  # (NL, S, rows, 4)
    feats = feats * wg[None, None, :, None]
    nl = endpoints.shape[0]
    band = feats.reshape(nl, _S, nb, rpb, 4).sum(axis=3)  # (NL, S, nb, 4)

    mean = band.mean(axis=1)                       # (NL, nb, 4)
    std = band.std(axis=1)                         # (NL, nb, 4)
    # normalize mean-part and std-part separately (LBD paper)
    mean = mean / (jnp.linalg.norm(mean.reshape(nl, -1), axis=1)[:, None, None] + 1e-6)
    std = std / (jnp.linalg.norm(std.reshape(nl, -1), axis=1)[:, None, None] + 1e-6)
    desc = jnp.concatenate([mean, std], axis=-1)   # (NL, nb, 8) in [0, 1]
    q = jnp.clip(jnp.round(desc * _QSCALE), 0, 255).astype(jnp.uint8)
    return jnp.where(valid[:, None], q.reshape(nl, LBD_DIM), 0)


def lbd_distance_matrix(a_u8: jax.Array, b_u8: jax.Array) -> jax.Array:
    """(N, M) int32 flip-invariant squared-L2 between quantized descriptors.

    Normalized units: divide by 127^2 (config thresholds are stored in
    normalized squared-L2 — see LineConfig.desc_dist_th). The dot products
    run on the MXU (int32 accumulate); the flip costs one extra matmul."""
    a = a_u8.astype(jnp.int32)
    b = b_u8.astype(jnp.int32)
    af = a[:, _FLIP_PERM]
    na = jnp.sum(a * a, -1)           # flip preserves the norm
    nb_ = jnp.sum(b * b, -1)
    d = na[:, None] + nb_[None, :] - 2 * jnp.einsum(
        "nk,mk->nm", a, b, preferred_element_type=jnp.int32)
    df = na[:, None] + nb_[None, :] - 2 * jnp.einsum(
        "nk,mk->nm", af, b, preferred_element_type=jnp.int32)
    return jnp.minimum(d, df)


def quantize_distance_threshold(th_normalized: float) -> int:
    """Normalized squared-L2 threshold -> quantized int32 units."""
    return int(round(th_normalized * _QSCALE * _QSCALE))


def extract_lbd(img: jax.Array, endpoints, valid, cfg: LineConfig):
    """Convenience: gradients + descriptors from a grayscale image."""
    gx, gy = image.sobel_gradients(image.gaussian_blur(img.astype(jnp.float32), 5, 1.0))
    return lbd_descriptors(gx, gy, endpoints, valid, cfg)
