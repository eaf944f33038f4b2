"""Per-frame perception: one jitted program from (gray, depth) to FrameData.

TPU-native equivalent of the reference ``Frame`` RGB-D constructor
(/root/reference/src/Frame.cc:97-205): where the reference spawns two
pthreads for ORB and line extraction (:152-155), here both are subgraphs of
one XLA program and the compiler overlaps them. Depth association follows
``ComputeStereoFromRGBD`` (:1065-1117): virtual-right coordinate
u_r = u - bf/d for keypoints, endpoint depths for keylines. Undistortion
follows ``UndistortKeyPoints/KeyLines`` (:737-845).

The 64x48 point grid (``AssignFeaturesToGrid``) is not reproduced: windowed
searches use dense gate matrices (see ops.matching — cheaper on TPU than any
bucketing). ``GetLinesInArea``'s brute force (:490-525) becomes the same
dense pattern.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import projection
from ..ops import image, lbd, lsd, orb


class FrameData(NamedTuple):
    """All per-frame arrays (fixed capacity, mask-padded)."""

    # points
    kp_xy: jax.Array        # (N, 2) raw keypoint coords
    kp_xy_un: jax.Array     # (N, 2) undistorted coords
    kp_resp: jax.Array      # (N,)
    kp_octave: jax.Array    # (N,) int32
    kp_angle: jax.Array     # (N,) degrees
    kp_desc: jax.Array      # (N, 32) uint8
    kp_depth: jax.Array     # (N,) metres; <=0 when unknown
    kp_ur: jax.Array        # (N,) virtual right u; -1 when no depth
    kp_valid: jax.Array     # (N,) bool
    # lines
    ln_ep: jax.Array        # (NL, 2, 2) raw endpoints
    ln_ep_un: jax.Array     # (NL, 2, 2) undistorted endpoints
    ln_angle: jax.Array     # (NL,)
    ln_length: jax.Array    # (NL,)
    ln_coeff: jax.Array     # (NL, 3) from undistorted endpoints
    ln_desc: jax.Array      # (NL, 72) uint8 (quantized LBD, ops/lbd.py)
    ln_depth: jax.Array     # (NL, 2) endpoint depths; <=0 when unknown
    ln_valid: jax.Array     # (NL,) bool


def _uncumsum2(a: jax.Array, dtype) -> jax.Array:
    """Invert the host 2-D gradient wire filter (tracking._grad2):
    cumsum along rows then columns in uint32, truncating casts give the
    exact mod-2^k reconstruction."""
    b = jnp.cumsum(a.astype(jnp.uint32), axis=0)
    return jnp.cumsum(b, axis=1).astype(dtype)


def _unquantize_gray(gray: jax.Array, cfg: SlamConfig) -> jax.Array:
    """Undo the wire's bit-depth reduction: shift back up and add the
    half-step so intensities stay centred (tracking._quantize_inputs)."""
    shift = 8 - cfg.tracking.gray_wire_bits
    if shift <= 0:
        return gray
    return (gray << shift) + jnp.uint8(1 << (shift - 1))


def _sample_depth(depth: jax.Array, xy: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """Depth at rounded pixel coords (reference samples the raw map directly,
    Frame.cc:1080). ``depth`` may be shipped at a coarser resolution than the
    image (the half-res wire format halves the dominant host->device copy);
    coordinates are scaled to its grid."""
    h, w = depth.shape
    sx = w / hw[1]
    sy = h / hw[0]
    x = jnp.clip(jnp.round(xy[..., 0] * sx).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(xy[..., 1] * sy).astype(jnp.int32), 0, h - 1)
    return depth[y, x]


@functools.partial(jax.jit, static_argnames=("cfg", "wire"))
def build_frame(gray: jax.Array, depth: jax.Array, cfg: SlamConfig,
                wire: bool = False) -> FrameData:
    cam = cfg.camera
    hw = (cam.height, cam.width)
    # Compact wire formats: the networked-TPU transport falls off a cliff for
    # >1 MB host->device copies, so callers ship gray as uint8 and depth as
    # TUM-quantized uint16 (metres * depth_map_factor); both convert here.
    # wire=True additionally means the rows arrive horizontally differenced
    # (PNG Sub filter — the transport compresses, and gradient rows have much
    # lower entropy than pixels); undo with an exact mod-2^k cumulative sum.
    if wire:
        gray = _unquantize_gray(_uncumsum2(gray, jnp.uint8), cfg)
        depth = _uncumsum2(depth, jnp.uint16)
    if gray.dtype == jnp.uint8:
        gray = gray.astype(jnp.float32)
    if depth.dtype == jnp.uint16:
        depth = depth.astype(jnp.float32) * jnp.float32(
            1.0 / cfg.tracking.depth_map_factor
        )
    feats = orb.extract_orb(gray, cfg.orb, hw)
    xy_un = projection.undistort_points(cam, feats.xy)
    d = _sample_depth(depth, feats.xy, hw)
    has_d = (d > 0) & feats.valid
    ur = jnp.where(has_d, xy_un[:, 0] - cam.bf / jnp.where(has_d, d, 1.0), -1.0)

    if cfg.use_lines:
        lf = lsd.detect_lines(gray, cfg.lines, hw)
        gxy = image.sobel_gradients(image.gaussian_blur(gray.astype(jnp.float32), 5, 1.0))
        ldesc = lbd.lbd_descriptors(gxy[0], gxy[1], lf.endpoints, lf.valid, cfg.lines)
        ep_un = projection.undistort_points(cam, lf.endpoints)
        ld = _sample_depth(depth, lf.endpoints, hw) * lf.valid[:, None]
        from ..geometry.lines import line_equation_2d

        coeff = line_equation_2d(ep_un[:, 0], ep_un[:, 1])
        ln = dict(
            ln_ep=lf.endpoints, ln_ep_un=ep_un, ln_angle=lf.angle,
            ln_length=lf.length, ln_coeff=coeff, ln_desc=ldesc,
            ln_depth=ld, ln_valid=lf.valid,
        )
    else:
        nl = cfg.lines.max_lines
        z = jnp.zeros
        ln = dict(
            ln_ep=z((nl, 2, 2), jnp.float32), ln_ep_un=z((nl, 2, 2), jnp.float32),
            ln_angle=z((nl,), jnp.float32), ln_length=z((nl,), jnp.float32),
            ln_coeff=z((nl, 3), jnp.float32), ln_desc=z((nl, lbd.LBD_DIM), jnp.uint8),
            ln_depth=z((nl, 2), jnp.float32), ln_valid=z((nl,), bool),
        )

    return FrameData(
        kp_xy=feats.xy,
        kp_xy_un=xy_un,
        kp_resp=feats.response,
        kp_octave=feats.octave,
        kp_angle=feats.angle,
        kp_desc=feats.desc,
        kp_depth=jnp.where(has_d, d, 0.0),
        kp_ur=ur,
        kp_valid=feats.valid,
        **ln,
    )


def backproject_keypoints(cam, fd: FrameData) -> tuple[jax.Array, jax.Array]:
    """Camera-frame 3D for keypoints with depth (UnprojectStereo semantics,
    Frame.cc:1124-1140). Returns (p3d (N,3), ok (N,))."""
    ok = fd.kp_valid & (fd.kp_depth > 0)
    p = projection.backproject(cam, fd.kp_xy_un, fd.kp_depth)
    return p, ok


def backproject_lines(cam, fd: FrameData) -> tuple[jax.Array, jax.Array]:
    """Camera-frame 3D endpoints for keylines with both depths
    (UnprojectStereoLineStart/End — with the reference's read-wrong-array
    bug at Frame.cc:1192 fixed). Returns (ep3d (NL,2,3), ok (NL,))."""
    ok = fd.ln_valid & (fd.ln_depth[:, 0] > 0) & (fd.ln_depth[:, 1] > 0)
    p0 = projection.backproject(cam, fd.ln_ep_un[:, 0], fd.ln_depth[:, 0])
    p1 = projection.backproject(cam, fd.ln_ep_un[:, 1], fd.ln_depth[:, 1])
    return jnp.stack([p0, p1], 1), ok


@functools.partial(jax.jit, static_argnames=("cfg", "wire"))
def build_frame_stereo(gray_l: jax.Array, gray_r: jax.Array, cfg: SlamConfig,
                       wire: bool = False) -> FrameData:
    """Stereo frame construction (Frame stereo ctor, Frame.cc:88-133 +
    ComputeStereoMatches :888-1062): ORB on BOTH images, row-banded
    descriptor matching left->right, SAD subpixel disparity refinement,
    depth = bf / disparity. Lines are RGB-D-only in the reference (the
    stereo ctor never extracts them), so the line block is empty.

    TPU shape: both extractions batch through the same kernels; the
    reference's per-row candidate buckets become one (N_L x N_R) gate on
    |row_L - row_R| and the disparity band; the per-keypoint sliding SAD
    (11x11 window, +-5 px) is a gathered (N, 11, 21) strip correlation —
    no loops."""
    cam = cfg.camera
    hw = (cam.height, cam.width)
    if wire:
        gray_l = _unquantize_gray(_uncumsum2(gray_l, jnp.uint8), cfg)
        gray_r = _unquantize_gray(_uncumsum2(gray_r, jnp.uint8), cfg)
    gl = gray_l.astype(jnp.float32)
    gr = gray_r.astype(jnp.float32)

    fl = orb.extract_orb(gl, cfg.orb, hw)
    fr = orb.extract_orb(gr, cfg.orb, hw)

    scale = cfg.orb.scale_factor
    min_z = cam.bf / cam.fx  # minZ (Frame.cc:905)
    min_d = 0.0
    max_d = cam.fx  # maxD = fx (disparity upper bound ~ bf/minZ)

    # row band: |vL - vR| <= 2 * sigma(octave_L) (Frame.cc:930-940)
    band = 2.0 * scale ** fl.octave.astype(jnp.float32)
    dv = jnp.abs(fl.xy[:, None, 1] - fr.xy[None, :, 1])
    disp = fl.xy[:, None, 0] - fr.xy[None, :, 0]
    gate = ((dv <= band[:, None]) & (disp > min_d) & (disp < max_d)
            & fl.valid[:, None] & fr.valid[None, :]
            & (jnp.abs(fl.octave[:, None] - fr.octave[None, :]) <= 1))
    from ..ops import matching as _matching

    m = _matching.match_descriptors(fl.desc, fr.desc, gate, 100)
    ridx = jnp.clip(m.idx, 0, fr.xy.shape[0] - 1)
    u_r0 = fr.xy[ridx, 0]

    # --- SAD subpixel refinement (Frame.cc:986-1050), full-res variant ----
    W = 5   # 11x11 window
    L = 5   # +-5 px search
    ys = jnp.clip(jnp.round(fl.xy[:, 1]).astype(jnp.int32), W, hw[0] - W - 1)
    xl = jnp.clip(jnp.round(fl.xy[:, 0]).astype(jnp.int32), W + L,
                  hw[1] - W - L - 1)
    xr = jnp.clip(jnp.round(u_r0).astype(jnp.int32), W + L, hw[1] - W - L - 1)
    dy, dx = jnp.meshgrid(jnp.arange(-W, W + 1), jnp.arange(-W, W + 1),
                          indexing="ij")
    patch_l = gl[ys[:, None, None] + dy[None], xl[:, None, None] + dx[None]]
    offs = jnp.arange(-L, L + 1)
    # right strips: (N, 11, 11, 11 offsets) via broadcasted gather
    px = (xr[:, None, None, None] + offs[None, :, None, None]
          + dx[None, None])  # (N, 2L+1, 11, 11)
    py = (ys[:, None, None, None] + jnp.zeros_like(offs)[None, :, None, None]
          + dy[None, None])
    strips = gr[py, px]  # (N, 2L+1, 11, 11)
    # mean-normalized SAD like the reference (it subtracts window centers)
    pl = patch_l - patch_l.mean((-2, -1), keepdims=True)
    ps = strips - strips.mean((-2, -1), keepdims=True)
    sad = jnp.abs(ps - pl[:, None]).sum((-2, -1))  # (N, 2L+1)
    best = jnp.argmin(sad, -1)
    # parabola subpixel fit (Frame.cc:1030-1043)
    bi = jnp.clip(best, 1, 2 * L - 1)
    s0 = jnp.take_along_axis(sad, (bi - 1)[:, None], 1)[:, 0]
    s1 = jnp.take_along_axis(sad, bi[:, None], 1)[:, 0]
    s2 = jnp.take_along_axis(sad, (bi + 1)[:, None], 1)[:, 0]
    denom = jnp.maximum(s0 + s2 - 2 * s1, 1e-6)
    delta = jnp.clip((s0 - s2) / (2 * denom), -1.0, 1.0)
    u_r = xr.astype(jnp.float32) + (bi - L).astype(jnp.float32) + delta

    disparity = fl.xy[:, 0] - u_r
    ok = m.ok & (disparity > 0.01) & (disparity < max_d)
    depth = jnp.where(ok, cam.bf / jnp.maximum(disparity, 1e-6), 0.0)

    xy_un = projection.undistort_points(cam, fl.xy)
    ur = jnp.where(ok, xy_un[:, 0] - cam.bf / jnp.maximum(depth, 1e-6), -1.0)

    nl = cfg.lines.max_lines
    z = jnp.zeros
    return FrameData(
        kp_xy=fl.xy, kp_xy_un=xy_un, kp_resp=fl.response,
        kp_octave=fl.octave, kp_angle=fl.angle, kp_desc=fl.desc,
        kp_depth=depth, kp_ur=ur, kp_valid=fl.valid,
        ln_ep=z((nl, 2, 2), jnp.float32), ln_ep_un=z((nl, 2, 2), jnp.float32),
        ln_angle=z((nl,), jnp.float32), ln_length=z((nl,), jnp.float32),
        ln_coeff=z((nl, 3), jnp.float32), ln_desc=z((nl, lbd.LBD_DIM), jnp.uint8),
        ln_depth=z((nl, 2), jnp.float32), ln_valid=z((nl,), bool),
    )
