"""Line association: project map lines, clip, gate, match.

TPU-native re-design of the reference's ``LineMatcher``
(/root/reference/src/LineMatcher.cpp). The reference iterates map lines one
by one (visibility cases :125-179, Liang–Barsky clip :1389-1460, then an
all-pairs gate cascade ``LineMatching``: descriptor distance → angle →
length ratio → axis-projection overlap :1508-1559 → endpoint-to-line
reprojection error :1579-1596, with a relaxed retry when fewer than 20% of
frame lines matched :235-261). Here the whole thing is a fixed-shape
(N_map, N_frame) gate matrix + masked argmin; the relaxed retry is computed
branchlessly and selected by match count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import LineConfig
from ..geometry import lines as glines
from ..geometry import se3
from . import lbd as lbd_mod
from . import matching


class ProjectedLines(NamedTuple):
    uv: jax.Array      # (N, 2, 2) clipped projected endpoints
    coeff: jax.Array   # (N, 3) projected infinite line (normalized)
    angle: jax.Array   # (N,) radians of projected direction
    length: jax.Array  # (N,)
    ok: jax.Array      # (N,) bool


def project_lines(
    cam, R: jax.Array, t: jax.Array, ep_w: jax.Array, valid: jax.Array,
    z_near: float = 0.05,
) -> ProjectedLines:
    """Project world-space 3D segments (N, 2, 3) into the image.

    Reference visibility cases (LineMatcher.cpp:125-179): both endpoints
    behind → drop; one behind → clip the 3D segment at z = z_near; then
    project and Liang–Barsky clip to the image rectangle.
    """
    p0 = se3.apply(R, t, ep_w[:, 0])  # (N, 3) camera frame
    p1 = se3.apply(R, t, ep_w[:, 1])
    z0, z1 = p0[:, 2], p1[:, 2]
    both_behind = (z0 < z_near) & (z1 < z_near)
    # clip the segment against the z = z_near plane
    denom = z1 - z0
    s = (z_near - z0) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    s = jnp.clip(s, 0.0, 1.0)
    cut = p0 + s[:, None] * (p1 - p0)
    p0c = jnp.where((z0 < z_near)[:, None], cut, p0)
    p1c = jnp.where((z1 < z_near)[:, None], cut, p1)

    def proj(p):
        z = jnp.maximum(p[:, 2], 1e-6)
        return jnp.stack(
            [cam.fx * p[:, 0] / z + cam.cx, cam.fy * p[:, 1] / z + cam.cy], -1
        )

    uv0 = proj(p0c)
    uv1 = proj(p1c)
    q0, q1, in_img = glines.liang_barsky(
        uv0, uv1, 0.0, 0.0, float(cam.width - 1), float(cam.height - 1)
    )
    d = q1 - q0
    length = jnp.sqrt(jnp.sum(d**2, -1))
    ok = valid & ~both_behind & in_img & (length > 1.0)
    coeff = glines.line_equation_2d(q0, q1)
    angle = jnp.arctan2(d[:, 1], d[:, 0])
    return ProjectedLines(jnp.stack([q0, q1], 1), coeff, angle, length, ok)


def _angle_diff(a, b):
    """Direction-invariant angular difference between LINE directions
    (mod pi): a segment and its endpoint-swapped twin are the same line.
    The LBD distance is flip-invariant (ops/lbd.py) — a direction-
    sensitive angle gate would veto exactly the flipped matches the
    descriptor machinery exists to keep."""
    d = jnp.abs(a[:, None] - b[None, :]) % jnp.pi
    return jnp.minimum(d, jnp.pi - d)


def _axis_overlap(ep_a: jax.Array, ep_b: jax.Array, angle_a: jax.Array):
    """Overlap ratio along the dominant axis of line a (LineOverLap,
    LineMatcher.cpp:1508-1559). ep_*: (N,2,2), (M,2,2)."""
    use_x = (jnp.abs(jnp.cos(angle_a)) >= jnp.abs(jnp.sin(angle_a)))[:, None]
    a0 = jnp.where(use_x, ep_a[:, 0, 0:1], ep_a[:, 0, 1:2])  # (N,1)
    a1 = jnp.where(use_x, ep_a[:, 1, 0:1], ep_a[:, 1, 1:2])
    b0 = jnp.where(use_x, ep_b[None, :, 0, 0], ep_b[None, :, 0, 1])  # (N,M)
    b1 = jnp.where(use_x, ep_b[None, :, 1, 0], ep_b[None, :, 1, 1])
    return glines.segment_overlap(a0, a1, b0, b1)


def _gate_and_match(
    proj: ProjectedLines,
    f_ep: jax.Array,
    f_angle: jax.Array,
    f_length: jax.Array,
    f_valid: jax.Array,
    dist: jax.Array,
    angle_th: jax.Array,
    len_ratio_th: jax.Array,
    overlap_th: jax.Array,
    desc_th: jax.Array,
    reproj_th: jax.Array,
) -> matching.MatchResult:
    d_ang = _angle_diff(proj.angle, f_angle)
    len_ratio = jnp.minimum(proj.length[:, None], f_length[None, :]) / jnp.maximum(
        jnp.maximum(proj.length[:, None], f_length[None, :]), 1e-6
    )
    ov = _axis_overlap(proj.uv, f_ep, proj.angle)
    # endpoint-to-projected-line distances (ReprojectionError semantics)
    d0 = jnp.abs(
        proj.coeff[:, None, 0] * f_ep[None, :, 0, 0]
        + proj.coeff[:, None, 1] * f_ep[None, :, 0, 1]
        + proj.coeff[:, None, 2]
    )
    d1 = jnp.abs(
        proj.coeff[:, None, 0] * f_ep[None, :, 1, 0]
        + proj.coeff[:, None, 1] * f_ep[None, :, 1, 1]
        + proj.coeff[:, None, 2]
    )
    reproj = jnp.maximum(d0, d1)
    gate = (
        proj.ok[:, None]
        & f_valid[None, :]
        & (d_ang < angle_th)
        & (len_ratio > len_ratio_th)
        & (ov > overlap_th)
        & (reproj < reproj_th)
    )
    m = matching.best_matches(dist, gate, max_dist=1 << 19)
    ok = m.ok & (m.dist <= desc_th.astype(jnp.int32))
    m = matching.MatchResult(
        jnp.where(ok, m.idx, matching.INVALID),
        jnp.where(ok, m.dist, matching.BIG),
        ok,
    )
    return matching.dedupe_targets(m, f_ep.shape[0])


def match_lines(
    proj: ProjectedLines,
    map_desc: jax.Array,    # (N, 32) uint8
    f_ep: jax.Array,        # (M, 2, 2) frame keyline endpoints
    f_angle: jax.Array,     # (M,)
    f_length: jax.Array,    # (M,)
    f_desc: jax.Array,      # (M, 32)
    f_valid: jax.Array,     # (M,)
    cfg: LineConfig,
    allow_relax: bool = True,
) -> matching.MatchResult:
    """Gate-cascade line matching with the reference's relaxed retry.

    If matches / n_frame_lines < cfg.low_match_ratio, thresholds are relaxed
    by cfg.relax_offsets = (angle+10deg, ratio-0.1, overlap-0.1, desc+0.2,
    reproj+10) (LineMatcher.cpp:235-261). Both passes are computed; the
    relaxed result is selected branchlessly when the strict pass is weak.

    Descriptor distance: flip-invariant quantized squared-L2 over the
    72-dim LBD (ops/lbd.py) — the reference's Hamming-over-bits gate with
    a descriptor that actually separates at viewpoint change.
    """
    # scale the quantized squared-L2 into the Hamming-era range (<=504)
    # so the shared match machinery's constants (BIG, the dedupe key
    # clamp) stay valid; granularity 256/127^2 ~ 0.016 normalized units
    dist = lbd_mod.lbd_distance_matrix(map_desc, f_desc) // 256
    q = float(lbd_mod.quantize_distance_threshold(1.0)) / 256.0
    deg = jnp.pi / 180.0
    strict = _gate_and_match(
        proj, f_ep, f_angle, f_length, f_valid, dist,
        jnp.float32(cfg.angle_th_deg * deg),
        jnp.float32(cfg.length_ratio_th),
        jnp.float32(cfg.overlap_th),
        jnp.float32(cfg.desc_dist_th * q),
        jnp.float32(cfg.reproj_err_th),
    )
    if not allow_relax:  # fusion wants the conservative cascade only
        return strict
    ra, rl, ro, rd, rr = cfg.relax_offsets
    relaxed = _gate_and_match(
        proj, f_ep, f_angle, f_length, f_valid, dist,
        jnp.float32((cfg.angle_th_deg + ra) * deg),
        jnp.float32(cfg.length_ratio_th + rl),
        jnp.float32(cfg.overlap_th + ro),
        jnp.float32((cfg.desc_dist_th + rd) * q),
        jnp.float32(cfg.reproj_err_th + rr),
    )
    n_frame = jnp.maximum(jnp.sum(f_valid.astype(jnp.int32)), 1)
    weak = strict.count < cfg.low_match_ratio * n_frame.astype(jnp.float32)
    pick = lambda a, b: jnp.where(weak, b, a)
    return matching.MatchResult(
        pick(strict.idx, relaxed.idx),
        pick(strict.dist, relaxed.dist),
        pick(strict.ok, relaxed.ok),
    )
