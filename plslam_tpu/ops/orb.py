"""ORB feature extraction as one jitted array program.

TPU-native re-design of the reference's ``ORBextractor``
(/root/reference/src/ORBextractor.cc): 8-level pyramid, FAST-9 with per-cell
threshold fallback, spatially-balanced top-k selection (replacing the
sequential quadtree ``DistributeOctTree`` :539), intensity-centroid
orientation (:77-105), 7x7 Gaussian blur and the 256-pair rotated-BRIEF
descriptor (:108-144, pattern table :150-447 → ``orb_pattern.npy``).

Descriptors are bit-compatible with OpenCV's ORB (same pattern, same
rounding), validated in tests against cv2.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OrbConfig
from . import fast, image

HALF_PATCH = 15

_PATTERN = np.load(os.path.join(os.path.dirname(__file__), "orb_pattern.npy"))


def _umax_table() -> np.ndarray:
    """Row half-widths of the discrete radius-15 circle, exactly as the
    reference builds them (ORBextractor.cc ctor) so moments match OpenCV."""
    umax = np.zeros(HALF_PATCH + 2, np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(HALF_PATCH * HALF_PATCH - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[: HALF_PATCH + 1]


def _circular_mask() -> np.ndarray:
    """(31, 31) boolean mask of the IC-angle patch."""
    umax = _umax_table()
    m = np.zeros((2 * HALF_PATCH + 1, 2 * HALF_PATCH + 1), bool)
    for v in range(-HALF_PATCH, HALF_PATCH + 1):
        d = umax[abs(v)]
        m[v + HALF_PATCH, HALF_PATCH - d : HALF_PATCH + d + 1] = True
    return m


_MASK = _circular_mask()


class OrbFeatures(NamedTuple):
    """Padded per-frame keypoint arrays (level-0 pixel coordinates)."""

    xy: jax.Array        # (N, 2) float32, raw (distorted) image coords
    response: jax.Array  # (N,) float32
    octave: jax.Array    # (N,) int32
    angle: jax.Array     # (N,) float32 degrees, [0, 360)
    desc: jax.Array      # (N, 32) uint8 — OpenCV-compatible byte layout
    valid: jax.Array     # (N,) bool

    @property
    def n(self) -> int:
        return self.xy.shape[0]


def _per_level_budget(cfg: OrbConfig) -> list[int]:
    """Distribute nFeatures over levels by 1/scale per level
    (ORBextractor.cc:52-75 semantics)."""
    f = 1.0 / cfg.scale_factor
    n_desired = cfg.n_features * (1 - f) / (1 - f**cfg.n_levels)
    budget = []
    acc = 0
    for l in range(cfg.n_levels - 1):
        n = int(round(n_desired * f**l))
        budget.append(n)
        acc += n
    budget.append(max(cfg.n_features - acc, 0))
    return budget


def ic_moment_maps(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dense intensity-centroid moment maps (m10, m01) over the whole image.

    Replaces the per-keypoint 31x31 patch gather (1M scattered reads — slow
    on TPU) with windowed row sums from x-prefix sums: for each patch row v
    the circular mask has half-width umax[|v|], so

        m10(y,x) = sum_v [ Sx(y+v, x; d) - x * S(y+v, x; d) ]
        m01(y,x) = sum_v  v * S(y+v, x; d),   d = umax[|v|]

    where S / Sx are width-(2d+1) windowed sums of I and x*I, O(1) per pixel
    via cumsum differences. Pure VPU passes, zero gathers.
    """
    h, w = img.shape
    umax = _umax_table()
    r = HALF_PATCH
    # pad x for window reads, y for row shifts
    xpad = jnp.pad(img, ((r, r), (r + 1, r)))
    xs = jnp.arange(-(r + 1), w + r, dtype=jnp.float32)
    cum = jnp.cumsum(xpad, axis=1)
    cumx = jnp.cumsum(xpad * xs[None, :], axis=1)

    def winsum(c, d):
        # window [x-d, x+d] of the original image, for all x in [0, w)
        hi = jax.lax.dynamic_slice(c, (0, r + 1 + d), (h + 2 * r, w))
        lo = jax.lax.dynamic_slice(c, (0, r - d), (h + 2 * r, w))
        return hi - lo

    x_coord = jnp.arange(w, dtype=jnp.float32)[None, :]
    # precompute per distinct half-width
    uniq = sorted(set(int(v) for v in umax))
    S = {d: winsum(cum, d) for d in uniq}          # (h+2r, w)
    SxI = {d: winsum(cumx, d) for d in uniq}
    m10 = jnp.zeros((h, w), jnp.float32)
    m01 = jnp.zeros((h, w), jnp.float32)
    for v in range(-r, r + 1):
        d = int(umax[abs(v)])
        s_row = jax.lax.dynamic_slice(S[d], (v + r, 0), (h, w))
        sx_row = jax.lax.dynamic_slice(SxI[d], (v + r, 0), (h, w))
        m10 = m10 + (sx_row - x_coord * s_row)
        m01 = m01 + float(v) * s_row
    return m10, m01


def ic_angles(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Intensity-centroid orientation (degrees) for keypoints at integer
    (ys, xs) on ``img``."""
    m10, m01 = ic_moment_maps(img)
    h, w = img.shape
    yc = jnp.clip(ys, 0, h - 1)
    xc = jnp.clip(xs, 0, w - 1)
    ang = jnp.degrees(jnp.arctan2(m01[yc, xc], m10[yc, xc]))
    return jnp.where(ang < 0, ang + 360.0, ang)


def _rotated_offsets(angles_deg: jax.Array) -> tuple[jax.Array, jax.Array]:
    """OpenCV GET_VALUE rotation: x' = round(px·a − py·b), y' = round(px·b +
    py·a) for every pattern point (ORBextractor.cc:108-144)."""
    theta = jnp.radians(angles_deg)
    a, b = jnp.cos(theta), jnp.sin(theta)  # (N,)
    px = jnp.asarray(_PATTERN[:, 0], jnp.float32)  # (512,)
    py = jnp.asarray(_PATTERN[:, 1], jnp.float32)
    rx = jnp.round(px[None, :] * a[:, None] - py[None, :] * b[:, None]).astype(jnp.int32)
    ry = jnp.round(px[None, :] * b[:, None] + py[None, :] * a[:, None]).astype(jnp.int32)
    return rx, ry


def _pack_bits(vals: jax.Array) -> jax.Array:
    """(N, 512) sampled values → (N, 32) uint8, OpenCV byte layout: byte j
    bit b (LSB-first) encodes pattern pair 8j+b; bit set iff I(p1) < I(p2)."""
    t0 = vals[:, 0::2]
    t1 = vals[:, 1::2]
    bits = (t0 < t1).astype(jnp.uint8)  # (N, 256)
    weights = (1 << jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint8)
    return jnp.sum(
        bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1, dtype=jnp.uint8
    )


# max rotated pattern offset: the 512 learned points lie within radius
# |(px,py)| <= 13*sqrt(2) = 18.4 of the keypoint, rounded <= 19
_BRIEF_R = 19


def _brief_gather(blurred, ys, xs, angles_deg) -> jax.Array:
    """Direct per-sample gather — fast on CPU, slow on TPU (512 random
    gathers per keypoint)."""
    h, w = blurred.shape
    rx, ry = _rotated_offsets(angles_deg)
    yy = jnp.clip(ys[:, None] + ry, 0, h - 1)
    xx = jnp.clip(xs[:, None] + rx, 0, w - 1)
    # linearized 1D gather: lowers ~1.4x faster than 2D gather on TPU
    vals = blurred.ravel()[yy * w + xx]  # (N, 512)
    return _pack_bits(vals)


def _brief_onehot(blurred, ys, xs, angles_deg) -> jax.Array:
    """MXU formulation for TPU (~7x faster than the gather lowering):
    structured row gather → per-keypoint patch via column one-hot matmul →
    rotated sampling via row one-hot matmul + masked column reduce. Values
    are rounded to integers first so bf16 one-hot products select exactly
    (and match OpenCV, which compares uint8-blurred pixels)."""
    h, w = blurred.shape
    R = _BRIEF_R
    P = 2 * R + 1
    blur_i = jnp.round(blurred)
    rx, ry = _rotated_offsets(angles_deg)
    rx = rx + R
    ry = ry + R
    rows = jnp.clip(ys[:, None] + jnp.arange(-R, R + 1)[None, :], 0, h - 1)
    rowg = blur_i[rows]  # (N, P, w): contiguous-row gather, cheap
    cols = jnp.clip(xs[:, None] + jnp.arange(-R, R + 1)[None, :], 0, w - 1)
    colOH = (cols[:, None, :] == jnp.arange(w)[None, :, None]).astype(jnp.bfloat16)
    patches = jnp.einsum(
        "nrw,nwc->nrc", rowg.astype(jnp.bfloat16), colOH,
        preferred_element_type=jnp.float32,
    )  # (N, P, P)
    rOH = (ry[:, :, None] == jnp.arange(P)[None, None, :]).astype(jnp.bfloat16)
    T = jnp.einsum(
        "njr,nrc->njc", rOH, patches.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (N, 512, P)
    cOH = rx[:, :, None] == jnp.arange(P)[None, None, :]
    vals = jnp.sum(jnp.where(cOH, T, 0.0), axis=-1)  # (N, 512)
    return _pack_bits(vals)


def brief_descriptors(
    blurred: jax.Array, ys: jax.Array, xs: jax.Array, angles_deg: jax.Array
) -> jax.Array:
    """Rotated-BRIEF 256-bit descriptors (OpenCV-compatible bytes)."""
    if jax.default_backend() == "tpu":
        return _brief_onehot(blurred, ys, xs, angles_deg)
    return _brief_gather(blurred, ys, xs, angles_deg)


@functools.partial(jax.jit, static_argnames=("cfg", "hw"))
def extract_orb(img: jax.Array, cfg: OrbConfig, hw: tuple[int, int]) -> OrbFeatures:
    """Full ORB extraction for one grayscale frame (float32, 0..255).

    Returns fixed-capacity ``OrbFeatures`` (cfg.max_keypoints rows).
    """
    img = img.astype(jnp.float32)
    levels = image.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budget = _per_level_budget(cfg)

    xs_all, ys_all, resp_all, oct_all, ang_all, desc_all, valid_all = (
        [], [], [], [], [], [], []
    )
    for l, lvl in enumerate(levels):
        if cfg.use_pallas_fast and jax.default_backend() == "tpu":
            from .pallas_fast import fast_score_nms

            score = fast_score_nms(lvl, float(cfg.min_th_fast))
        else:
            score = fast.nms3x3(fast.fast_score_map(lvl, float(cfg.min_th_fast)))
        cys, cxs, cresp = fast.detect_cellwise(
            score,
            float(cfg.ini_th_fast),
            cfg.cell_size,
            cfg.max_kp_per_cell,
            cfg.edge_threshold,
        )
        ys, xs, resp, valid = fast.top_n_keypoints(cys, cxs, cresp, budget[l])
        ang = ic_angles(lvl, ys, xs)
        blurred = image.gaussian_blur(lvl)
        desc = brief_descriptors(blurred, ys, xs, ang)
        s = cfg.scale_factor**l
        xs_all.append(xs.astype(jnp.float32) * s)
        ys_all.append(ys.astype(jnp.float32) * s)
        resp_all.append(resp)
        oct_all.append(jnp.full((budget[l],), l, jnp.int32))
        ang_all.append(ang)
        desc_all.append(desc)
        valid_all.append(valid)

    xy = jnp.stack([jnp.concatenate(xs_all), jnp.concatenate(ys_all)], axis=-1)
    resp = jnp.concatenate(resp_all)
    octv = jnp.concatenate(oct_all)
    ang = jnp.concatenate(ang_all)
    desc = jnp.concatenate(desc_all)
    valid = jnp.concatenate(valid_all)

    n = cfg.max_keypoints
    pad = n - xy.shape[0]
    if pad < 0:
        raise ValueError("max_keypoints smaller than per-level budget sum")
    return OrbFeatures(
        xy=jnp.pad(xy, ((0, pad), (0, 0))),
        response=jnp.pad(resp, (0, pad)),
        octave=jnp.pad(octv, (0, pad)),
        angle=jnp.pad(ang, (0, pad)),
        desc=jnp.pad(desc, ((0, pad), (0, 0))),
        valid=jnp.pad(valid, (0, pad)),
    )


def scale_factors(cfg: OrbConfig) -> np.ndarray:
    return np.array([cfg.scale_factor**l for l in range(cfg.n_levels)], np.float32)


def level_sigma2(cfg: OrbConfig) -> np.ndarray:
    return scale_factors(cfg) ** 2
