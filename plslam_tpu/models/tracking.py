"""Frontend tracking: the per-frame state machine and its jitted steps.

Re-design of the reference ``Tracking`` thread (/root/reference/src/
Tracking.cc) as a host-side state machine around ONE fused device program
per frame (``fused_track_step``), covering:

- Frame construction (Frame.cc RGB-D ctor — perception),
- TrackWithMotionModel (:1212-1330) + UpdateLastFrame temporal landmarks
  (:1044-1210, closest-100/45 caps) + the x2-radius retry (:1255-1259),
- TrackLocalMap (:1332-1420) + SearchLocalPoints/Lines (:1746-1865) +
  IsInFrustum (Frame.cc:345-430), with joint point+line pose LM after each.

The reference crosses its data between pthreads through mutex-guarded
objects; here the frame-to-frame state (previous FrameData, pose, velocity,
landmark bindings) is DEVICE-RESIDENT and the host only downloads a small
result bundle once per frame — under a networked TPU every synchronous
round trip costs ~30 ms, so the design point is one dispatch + one fetch
per frame. Local-map arrays are uploaded only when the keyframe set
changes.

Keyframe decision/creation follows NeedNewKeyFrame / CreateNewKeyFrame
(:1423-1744, RGB-D branch): close-point bookkeeping, depth-sorted new
landmark creation, line creation from endpoint depths.
"""

from __future__ import annotations

import contextlib
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import lines as glines
from ..geometry import se3
from ..ops import line_matching, matching
from ..optim import pose as pose_opt
from ..utils import wire as wirefmt
from . import frame as mframe
from .frame import FrameData
from .map import HostFrame, SlamMap

TH_HIGH = 100
TH_LOW = 50


def _inv_sigma2(octave, scale: float):
    return (1.0 / scale**2) ** octave.astype(jnp.float32)


def _project_points(cam, R, t, p3d):
    pc = p3d @ R.T + t
    z = pc[:, 2]
    safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    u = cam.fx * pc[:, 0] / safe + cam.cx
    v = cam.fy * pc[:, 1] / safe + cam.cy
    uv = jnp.stack([u, v], -1)
    in_img = (z > 0.05) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    return uv, pc, in_img


def _assemble_pose_obs(cfg, fd: FrameData, q_p3d, q_valid, pt_idx, pt_ok,
                       ln_ep3d, ln_valid, ln_idx, ln_ok):
    """Gather matched observations into fixed-shape PoseObs."""
    scale = cfg.orb.scale_factor
    idx = jnp.clip(pt_idx, 0, fd.kp_xy_un.shape[0] - 1)
    obs_uv = fd.kp_xy_un[idx]
    obs_ur = fd.kp_ur[idx]
    obs_is2 = _inv_sigma2(fd.kp_octave[idx], scale)
    valid = pt_ok & q_valid

    lidx = jnp.clip(ln_idx, 0, fd.ln_ep_un.shape[0] - 1)
    nw, vw = glines.plucker_from_endpoints(ln_ep3d[:, 0], ln_ep3d[:, 1])
    ln_uv = fd.ln_ep_un[lidx]
    lvalid = ln_ok & ln_valid
    return pose_opt.PoseObs(
        p3d=q_p3d, uv=obs_uv, u_right=obs_ur, inv_sigma2=obs_is2, valid=valid,
        line_nw=nw, line_vw=vw, line_uv=ln_uv,
        line_inv_sigma2=jnp.ones(ln_ep3d.shape[0], jnp.float32),
        line_valid=lvalid,
    )


# ===========================================================================
# Step cores (traceable functions, shared by the fused step and the
# standalone jitted wrappers used in unit tests)
# ===========================================================================


class MotionStepOut(NamedTuple):
    R: jax.Array
    t: jax.Array
    pt_idx: jax.Array
    pt_inlier: jax.Array
    ln_idx: jax.Array
    ln_inlier: jax.Array
    n_pt_matches: jax.Array
    n_inliers: jax.Array


def _motion_core(cfg, fd, q_p3d, q_desc, q_octave, q_angle, q_valid,
                 ln_ep3d, ln_desc, ln_valid, R_guess, t_guess) -> MotionStepOut:
    cam = cfg.camera
    scale = cfg.orb.scale_factor
    uv_proj, _, in_img = _project_points(cam, R_guess, t_guess, q_p3d)
    q_ok = q_valid & in_img
    sf = scale ** q_octave.astype(jnp.float32)

    def run_match(radius_mult):
        radius = cfg.matcher.search_radius_motion * radius_mult * sf
        gate = (
            matching.window_gate(uv_proj, fd.kp_xy_un, radius)
            & matching.octave_gate(q_octave, fd.kp_octave, -1, 1)
            & q_ok[:, None]
            & fd.kp_valid[None, :]
        )
        return matching.match_descriptors(
            q_desc, fd.kp_desc, gate, TH_HIGH,
            angle_q=q_angle, angle_t=fd.kp_angle,
            histo_length=cfg.matcher.histo_length,
        )

    m1 = run_match(1.0)
    m2 = run_match(2.0)
    use_wide = m1.count < 20
    pick = lambda a, b: jnp.where(use_wide, b, a)
    m = matching.MatchResult(pick(m1.idx, m2.idx), pick(m1.dist, m2.dist),
                             pick(m1.ok, m2.ok))

    proj = line_matching.project_lines(cam, R_guess, t_guess, ln_ep3d, ln_valid)
    lm = line_matching.match_lines(
        proj, ln_desc, fd.ln_ep_un, fd.ln_angle, fd.ln_length,
        fd.ln_desc, fd.ln_valid, cfg.lines,
    )

    obs = _assemble_pose_obs(cfg, fd, q_p3d, q_valid, m.idx, m.ok,
                             ln_ep3d, ln_valid, lm.idx, lm.ok)
    res = pose_opt.optimize_pose(cam, R_guess, t_guess, obs)
    return MotionStepOut(
        res.R, res.t, m.idx, m.ok & res.inlier_pts, lm.idx,
        lm.ok & res.inlier_lines, m.count, res.n_inliers,
    )


class LocalStepOut(NamedTuple):
    R: jax.Array
    t: jax.Array
    pt_idx: jax.Array      # (LM,) final matched feature per local map point
    pt_inlier: jax.Array   # (LM,)
    ln_idx: jax.Array
    ln_inlier: jax.Array
    pt_visible: jax.Array  # (LM,) frustum-visible mask (for found/visible)
    n_inliers: jax.Array


def _local_core(cfg, fd, lm_p3d, lm_desc, lm_normal, lm_mind, lm_maxd,
                lm_valid, lm_pre_feat, lml_ep3d, lml_desc, lml_valid,
                lml_pre_feat, R0, t0) -> LocalStepOut:
    cam = cfg.camera
    scale = cfg.orb.scale_factor
    n_levels = cfg.orb.n_levels

    uv_proj, pc, in_img = _project_points(cam, R0, t0, lm_p3d)
    # IsInFrustum (Frame.cc:345-401): distance band + viewing angle
    cam_center = -(R0.T @ t0)
    po = lm_p3d - cam_center
    dist = jnp.linalg.norm(po, axis=-1)
    dist_ok = (dist >= 0.8 * lm_mind) & (dist <= 1.2 * lm_maxd)
    view_cos = jnp.sum(po * lm_normal, -1) / jnp.maximum(
        dist * jnp.linalg.norm(lm_normal, axis=-1), 1e-6
    )
    view_ok = view_cos > 0.5
    pre_matched = lm_pre_feat >= 0
    # NOTE: unlike the reference (which skips re-searching points already
    # bound by the motion step, an O(N) CPU saving), ALL visible points are
    # re-matched — motion-step bindings were selected at a possibly biased
    # pose, and freezing them feeds that bias forward; re-matching is free
    # on TPU and keeps the correction loop contractive.
    visible = lm_valid & in_img & dist_ok & view_ok

    ratio = jnp.log(jnp.maximum(lm_maxd, 1e-6) / jnp.maximum(dist, 1e-6))
    pred_level = jnp.clip(
        jnp.ceil(ratio / jnp.log(scale)).astype(jnp.int32), 0, n_levels - 1
    )
    base_r = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius = cfg.matcher.search_radius_local * base_r * scale ** pred_level.astype(
        jnp.float32
    )

    gate = (
        matching.window_gate(uv_proj, fd.kp_xy_un, radius)
        & matching.octave_gate(pred_level, fd.kp_octave, -1, 0)
        & visible[:, None]
        & fd.kp_valid[None, :]
    )
    m = matching.match_descriptors(
        lm_desc, fd.kp_desc, gate, TH_HIGH,
        nn_ratio=cfg.matcher.nn_ratio_tracking, dedupe=True,
    )
    # combine fresh matches with motion-step bindings, then RE-DEDUPE: the
    # fallback can route several duplicate landmarks onto one feature, and
    # letting that through collapses the per-feature binding table (and with
    # it observation accumulation / covisibility).
    pt_idx = jnp.where(m.ok, m.idx, lm_pre_feat)
    pt_ok = m.ok | pre_matched
    comb_dist = jnp.where(m.ok, m.dist, 300)  # fresh matches win ties
    comb = matching.dedupe_targets(
        matching.MatchResult(
            jnp.where(pt_ok, pt_idx, matching.INVALID),
            jnp.where(pt_ok, comb_dist, matching.BIG), pt_ok,
        ),
        fd.kp_desc.shape[0],
    )
    pt_idx, pt_ok = comb.idx, comb.ok

    lproj = line_matching.project_lines(cam, R0, t0, lml_ep3d, lml_valid)
    ln_pre = lml_pre_feat >= 0
    lm_res = line_matching.match_lines(
        lproj, lml_desc,
        fd.ln_ep_un, fd.ln_angle, fd.ln_length, fd.ln_desc,
        fd.ln_valid, cfg.lines,
    )
    ln_idx = jnp.where(lm_res.ok, lm_res.idx, lml_pre_feat)
    ln_ok = lm_res.ok | ln_pre
    lcomb = matching.dedupe_targets(
        matching.MatchResult(
            jnp.where(ln_ok, ln_idx, matching.INVALID),
            jnp.where(ln_ok, jnp.where(lm_res.ok, lm_res.dist, 300),
                      matching.BIG), ln_ok,
        ),
        fd.ln_desc.shape[0],
    )
    ln_idx, ln_ok = lcomb.idx, lcomb.ok

    obs = _assemble_pose_obs(cfg, fd, lm_p3d, lm_valid, pt_idx, pt_ok,
                             lml_ep3d, lml_valid, ln_idx, ln_ok)
    res = pose_opt.optimize_pose(cam, R0, t0, obs)
    return LocalStepOut(
        res.R, res.t, pt_idx, pt_ok & res.inlier_pts, ln_idx,
        ln_ok & res.inlier_lines, visible | pre_matched, res.n_inliers,
    )


# standalone jitted wrappers (unit tests / diagnostics)
motion_track_step = functools.partial(jax.jit, static_argnames=("cfg",))(
    lambda cfg, fd, *a: _motion_core(cfg, fd, *a)
)
local_map_track_step = functools.partial(jax.jit, static_argnames=("cfg",))(
    lambda cfg, fd, *a: _local_core(cfg, fd, *a)
)


# ===========================================================================
# Fused per-frame step
# ===========================================================================


class FusedOut(NamedTuple):
    fd: FrameData            # stays on device as next frame's "prev"
    R: jax.Array
    t: jax.Array
    R_vel: jax.Array
    t_vel: jax.Array
    feat_slot_pt: jax.Array  # (N,) local-map slot bound to each cur feature
    feat_slot_ln: jax.Array  # (NL,)
    lm_feat: jax.Array       # (LM,) matched cur feature per slot (-1)
    lm_inlier: jax.Array     # (LM,)
    lm_visible: jax.Array    # (LM,)
    lml_feat: jax.Array      # (LL,)
    lml_inlier: jax.Array
    stats: jax.Array         # (6,) int32: [n_motion_matches,
                             # n_track_inliers (motion or rescue),
                             # n_local_inliers, tracked_close,
                             # creatable_close, n_rescue_inliers (0 when
                             # the rescue stage didn't fire/win)]
    wire: jax.Array = None   # (B,) uint8: every host-bound result (stats,
                             # pose, bindings, the full FrameData snapshot)
                             # packed into ONE buffer so the per-frame fetch
                             # is a single device->host message


def _wire_arrays(out: "FusedOut"):
    """Host-bound fields in wire order (see utils.wire) — the TRIMMED set.

    Only what the host actually consumes crosses the wire: pose, stats,
    bindings (as int16 — feature indices fit), and the FrameData fields the
    keyframe path reads (kp_xy_un/octave/depth/valid, line endpoints/desc/
    depth/valid). Descriptors, responses, angles, raw coords, kp_ur and
    ln_coeff stay on device: kp_ur is recomputed on host from xy_un+depth,
    descriptors live in the map's device arenas, the rest has no host
    consumer. This halves the per-frame download (and removes its only
    incompressible block, kp_desc)."""
    fd = out.fd
    return [out.stats, out.R, out.t,
            out.lm_feat.astype(jnp.int16), out.lm_inlier, out.lm_visible,
            out.lml_feat.astype(jnp.int16), out.lml_inlier,
            fd.kp_xy_un, fd.kp_octave.astype(jnp.uint8), fd.kp_depth,
            fd.kp_valid, fd.ln_ep_un, fd.ln_desc, fd.ln_depth, fd.ln_valid]


def _wire_spec(out: "FusedOut"):
    """(shape, dtype) list matching _wire_arrays, computed WITHOUT touching
    device arrays (unpack happens on the host thread every frame)."""
    fd = out.fd
    LM = out.lm_feat.shape[0]
    LL = out.lml_feat.shape[0]
    N = fd.kp_valid.shape[0]
    NL = fd.ln_valid.shape[0]
    return [((6,), np.int32), ((3, 3), np.float32), ((3,), np.float32),
            ((LM,), np.int16), ((LM,), np.bool_), ((LM,), np.bool_),
            ((LL,), np.int16), ((LL,), np.bool_),
            ((N, 2), np.float32), ((N,), np.uint8), ((N,), np.float32),
            ((N,), np.bool_), ((NL, 2, 2), np.float32), ((NL, 72), np.uint8),
            ((NL, 2), np.float32), ((NL,), np.bool_)]


@functools.partial(jax.jit, static_argnames=("cfg", "stereo"))
def fused_track_step(
    cfg: SlamConfig,
    gray: jax.Array,
    depth: jax.Array,        # depth map (rgbd/mono) or RIGHT image (stereo)
    prev: FrameData,
    prev_slot_pt: jax.Array,  # (N,) lm slot per prev feature or -1
    prev_slot_ln: jax.Array,  # (NL,)
    pt_remap: jax.Array,      # (LM,) old-slot -> current-slot (identity when
    ln_remap: jax.Array,      # (LL,)  the local map didn't change) — lets the
                              # pipelined tracker refresh the local map while
                              # a frame is in flight without a host rebind
    R_prev: jax.Array,
    t_prev: jax.Array,
    R_vel: jax.Array,
    t_vel: jax.Array,
    has_vel: jax.Array,       # () bool
    lm_p3d, lm_desc, lm_normal, lm_mind, lm_maxd, lm_valid,
    lml_ep3d, lml_desc, lml_valid,
    stereo: bool = False,
) -> FusedOut:
    cam = cfg.camera
    LM = lm_p3d.shape[0]
    LL = lml_ep3d.shape[0]
    prev_slot_pt = jnp.where(
        prev_slot_pt >= 0, pt_remap[jnp.clip(prev_slot_pt, 0, LM - 1)], -1
    )
    prev_slot_ln = jnp.where(
        prev_slot_ln >= 0, ln_remap[jnp.clip(prev_slot_ln, 0, LL - 1)], -1
    )

    fd = (mframe.build_frame_stereo(gray, depth, cfg, wire=True)
          if stereo else mframe.build_frame(gray, depth, cfg, wire=True))

    # velocity-model pose guess
    Rv, tv = se3.compose(R_vel, t_vel, R_prev, t_prev)
    Rg = jnp.where(has_vel, Rv, R_prev)
    tg = jnp.where(has_vel, tv, t_prev)

    # ---- queries from the previous frame -------------------------------
    Rwc = R_prev.T
    c_prev = -(Rwc @ t_prev)
    slot = prev_slot_pt
    bound = (slot >= 0) & lm_valid[jnp.clip(slot, 0, LM - 1)]
    p_map = lm_p3d[jnp.clip(slot, 0, LM - 1)]
    from ..geometry import projection as gproj

    pc_prev = gproj.backproject(cam, prev.kp_xy_un, prev.kp_depth)
    p_temp = pc_prev @ Rwc.T + c_prev
    has_d = prev.kp_depth > 0
    t_cand = prev.kp_valid & has_d & ~bound
    # UpdateLastFrame (Tracking.cc:1044-1210): ALL close points (depth <
    # ThDepth) become temporal candidates, with the closest-``cap`` as a
    # floor when close points are scarce. A pure closest-``cap`` rule
    # starves VO when the nearest surface is texture-poor: the cap crowds
    # onto it and excludes matchable mid-range features.
    cap = cfg.tracking.temporal_points_cap
    dsel = jnp.where(t_cand, prev.kp_depth, jnp.inf)
    kth = -jax.lax.top_k(-dsel, cap)[0][cap - 1]
    t_sel = t_cand & ((dsel <= kth) | (dsel <= cfg.tracking.th_depth))
    q_p3d = jnp.where(bound[:, None], p_map, p_temp)
    q_valid = bound | t_sel

    lslot = prev_slot_ln
    lbound = (lslot >= 0) & lml_valid[jnp.clip(lslot, 0, LL - 1)]
    l_map = lml_ep3d[jnp.clip(lslot, 0, LL - 1)]
    l_temp = jnp.stack(
        [
            gproj.backproject(cam, prev.ln_ep_un[:, k], prev.ln_depth[:, k])
            @ Rwc.T + c_prev
            for k in (0, 1)
        ],
        axis=1,
    )
    lt_cand = prev.ln_valid & (prev.ln_depth > 0).all(1) & ~lbound
    lcap = cfg.tracking.temporal_lines_cap
    ldsel = jnp.where(lt_cand, prev.ln_depth.max(1), jnp.inf)
    lkth = -jax.lax.top_k(-ldsel, lcap)[0][lcap - 1]
    lt_sel = lt_cand & ((ldsel <= lkth) | (ldsel <= cfg.tracking.th_depth))
    l_ep3d = jnp.where(lbound[:, None, None], l_map, l_temp)
    l_valid = lbound | lt_sel

    # ---- motion step ----------------------------------------------------
    mo = _motion_core(cfg, fd, q_p3d, prev.kp_desc, prev.kp_octave,
                      prev.kp_angle, q_valid, l_ep3d, prev.ln_desc, l_valid,
                      Rg, tg)

    # ---- rescue step ----------------------------------------------------
    # TrackReferenceKeyFrame equivalent (Tracking.cc:335-337,942-1032):
    # when the motion stage starves (no velocity prior yet, or the prior
    # was wrong and every window missed), match the LOCAL MAP's
    # distinctive descriptors against the whole frame with NO spatial
    # window — the reference's BoW-binned global match, done here as one
    # MXU popcount matmul — then LM the pose from the LAST pose (the
    # reference seeds with mLastFrame.mTcw, not the velocity guess).
    # lax.cond keeps the pose LM off the common path.
    def _rescue(_):
        gate = lm_valid[:, None] & fd.kp_valid[None, :]
        m = matching.match_descriptors(
            lm_desc, fd.kp_desc, gate, TH_LOW,
            nn_ratio=cfg.matcher.nn_ratio_reloc, dedupe=True)
        obs = _assemble_pose_obs(
            cfg, fd, lm_p3d, lm_valid, m.idx, m.ok,
            lml_ep3d, lml_valid, jnp.zeros((LL,), jnp.int32),
            jnp.zeros((LL,), bool))
        res = pose_opt.optimize_pose(cam, R_prev, t_prev, obs)
        return (res.R, res.t, jnp.where(m.ok & res.inlier_pts, m.idx, -1),
                m.ok & res.inlier_pts, res.n_inliers.astype(jnp.int32))

    def _no_rescue(_):
        return (mo.R, mo.t, jnp.full((LM,), -1, jnp.int32),
                jnp.zeros((LM,), bool), jnp.int32(0))

    need_rescue = mo.n_inliers < cfg.tracking.rescue_min_inliers
    r_R, r_t, r_idx, r_ok, r_n = jax.lax.cond(
        need_rescue, _rescue, _no_rescue, None)
    use_rescue = need_rescue & (r_n > mo.n_inliers)

    # pre-bindings for local step: slot -> matched cur feature
    ok_pre = bound & mo.pt_inlier
    pre_feat_mo = jnp.full((LM,), -1, jnp.int32).at[
        jnp.where(ok_pre, slot, LM)
    ].set(mo.pt_idx, mode="drop")
    pre_feat = jnp.where(use_rescue, jnp.where(r_ok, r_idx, -1), pre_feat_mo)
    lok_pre = lbound & mo.ln_inlier
    lpre_feat_mo = jnp.full((LL,), -1, jnp.int32).at[
        jnp.where(lok_pre, lslot, LL)
    ].set(mo.ln_idx, mode="drop")
    lpre_feat = jnp.where(use_rescue, -1, lpre_feat_mo)
    R_mid = jnp.where(use_rescue, r_R, mo.R)
    t_mid = jnp.where(use_rescue, r_t, mo.t)
    n_track = jnp.where(use_rescue, r_n, mo.n_inliers.astype(jnp.int32))

    # ---- local-map step -------------------------------------------------
    lo = _local_core(cfg, fd, lm_p3d, lm_desc, lm_normal, lm_mind, lm_maxd,
                     lm_valid, pre_feat, lml_ep3d, lml_desc, lml_valid,
                     lpre_feat, R_mid, t_mid)
    # trust the local-map refinement only when it has real support: with
    # the local map starved (localization-only VO through a weakly-mapped
    # region — the reference SKIPS TrackLocalMap while mbVO,
    # Tracking.cc:303-335) a handful of stale or aliased map matches would
    # yank an otherwise-healthy motion/VO pose
    use_local = lo.n_inliers >= cfg.tracking.min_inliers_local_map
    R_fin = jnp.where(use_local, lo.R, R_mid)
    t_fin = jnp.where(use_local, lo.t, t_mid)
    lo = lo._replace(R=R_fin, t=t_fin)

    ok_slot = lo.pt_inlier & (lo.pt_idx >= 0)
    n = fd.kp_valid.shape[0]
    feat_slot_pt = jnp.full((n,), -1, jnp.int32).at[
        jnp.where(ok_slot, lo.pt_idx, n)
    ].set(jnp.arange(LM, dtype=jnp.int32), mode="drop")
    nl = fd.ln_valid.shape[0]
    lok_slot = lo.ln_inlier & (lo.ln_idx >= 0)
    feat_slot_ln = jnp.full((nl,), -1, jnp.int32).at[
        jnp.where(lok_slot, lo.ln_idx, nl)
    ].set(jnp.arange(LL, dtype=jnp.int32), mode="drop")

    # velocity for next frame: T_cur ∘ T_prev^-1
    Rpi, tpi = se3.inverse(R_prev, t_prev)
    Rvn, tvn = se3.compose(lo.R, lo.t, Rpi, tpi)

    # close-point stats for the keyframe decision (NeedNewKeyFrame)
    close = fd.kp_valid & (fd.kp_depth > 0) & (
        fd.kp_depth < cfg.tracking.th_depth
    )
    tracked_close = jnp.sum((close & (feat_slot_pt >= 0)).astype(jnp.int32))
    creatable_close = jnp.sum((close & (feat_slot_pt < 0)).astype(jnp.int32))

    out = FusedOut(
        fd=fd, R=lo.R, t=lo.t, R_vel=Rvn, t_vel=tvn,
        feat_slot_pt=feat_slot_pt, feat_slot_ln=feat_slot_ln,
        lm_feat=jnp.where(ok_slot, lo.pt_idx, -1), lm_inlier=ok_slot,
        lm_visible=lo.pt_visible,
        lml_feat=jnp.where(lok_slot, lo.ln_idx, -1), lml_inlier=lok_slot,
        stats=jnp.stack([
            mo.n_pt_matches.astype(jnp.int32), n_track,
            lo.n_inliers.astype(jnp.int32), tracked_close, creatable_close,
            jnp.where(use_rescue, r_n, 0),
        ]),
    )
    return out._replace(wire=wirefmt.pack(_wire_arrays(out)))


def _grad2(a: np.ndarray) -> np.ndarray:
    """2-D wraparound gradient (PNG Sub then Up filters, exact mod-2^k):
    the transport's compressor sees near-zero rows for natural images.
    Inverse = cumsum(axis=0) then cumsum(axis=1) (build_frame wire=True)."""
    b = a.copy()
    b[:, 1:] -= a[:, :-1]
    c = b.copy()
    c[1:] -= b[:-1]
    return c

def _host_frame_from_wire(cfg, kp_xy_un, kp_octave, kp_depth, kp_valid,
                          ln_ep_un, ln_desc, ln_depth, ln_valid) -> HostFrame:
    """Rebuild the keyframe snapshot from the trimmed wire record.

    Derived fields are recomputed (kp_ur from xy_un+depth — the same
    formula the device used, Frame.cc:1065-1117 semantics); fields with no
    host consumer (descriptors, responses, angles, raw coords, ln_coeff)
    are zero-filled — the device arenas hold the real values."""
    cam = cfg.camera
    n = kp_valid.shape[0]
    nl = ln_valid.shape[0]
    has_d = kp_depth > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        ur = np.where(has_d, kp_xy_un[:, 0] - cam.bf / np.where(
            has_d, kp_depth, 1.0), -1.0).astype(np.float32)
    z = np.zeros
    fd = FrameData(
        kp_xy=kp_xy_un, kp_xy_un=kp_xy_un, kp_resp=z(n, np.float32),
        kp_octave=kp_octave.astype(np.int32), kp_angle=z(n, np.float32),
        kp_desc=z((n, 32), np.uint8), kp_depth=kp_depth, kp_ur=ur,
        kp_valid=kp_valid,
        ln_ep=ln_ep_un, ln_ep_un=ln_ep_un, ln_angle=z(nl, np.float32),
        ln_length=np.linalg.norm(
            ln_ep_un[:, 1] - ln_ep_un[:, 0], axis=-1).astype(np.float32),
        ln_coeff=z((nl, 3), np.float32), ln_desc=ln_desc,
        ln_depth=ln_depth, ln_valid=ln_valid,
    )
    return HostFrame(fd)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mono_init_match(cfg: SlamConfig, q_xy, q_desc, q_valid,
                    t_xy, t_desc, t_valid):
    """SearchForInitialization (ORBmatcher.cc:573-727): 100px window,
    ratio 0.9, TH_LOW, deduped — one dense batch."""
    gate = (matching.window_gate(q_xy, t_xy, jnp.full(q_xy.shape[0], 100.0))
            & q_valid[:, None] & t_valid[None, :])
    m = matching.match_descriptors(q_desc, t_desc, gate, TH_LOW,
                                   nn_ratio=0.9, dedupe=True)
    return m.idx, m.ok


# ===========================================================================
# Host-side tracker
# ===========================================================================

NOT_INITIALIZED = 0
OK = 1
LOST = 2


class Tracker:
    """Host state machine driving the fused device step and the map."""

    LM_CAP = 8192
    LL_CAP = 512
    # max frames between local-map harvests when no keyframe event fires
    # (the reference harvests every frame; see _finish)
    REFRESH_MAX_FRAMES = 12

    def __init__(self, cfg: SlamConfig, slam_map: SlamMap,
                 local_mapper=None, loop_closer=None, voc=None, kfdb=None,
                 sensor: str = "rgbd", tracer=None):
        from ..utils import tracing

        self.cfg = cfg
        self.map = slam_map
        self.tracer = tracer or tracing.NULL
        self.sensor = sensor            # "rgbd" | "mono" (System eSensor)
        self._mono_ref = None           # (fd_dev, HostFrame, timestamp)
        self.local_mapper = local_mapper
        self.loop_closer = loop_closer
        self.voc = voc
        self.kfdb = kfdb
        # map-update lock (Map::mMutexMapUpdate equivalent) when the local
        # mapper runs on a worker thread; no-op otherwise
        self._map_lock = getattr(local_mapper, "lock", None) or \
            contextlib.nullcontext()
        self.state = NOT_INITIALIZED
        self.frame_id = -1
        self.last_kf_id = -1
        self.last_kf = -1
        self.ref_kf = -1
        self.trajectory: list[tuple[float, np.ndarray, np.ndarray]] = []
        # per-frame (ref_kf, R_cr, t_cr): pose RELATIVE to the reference
        # keyframe at track time (Tracking.cc:578-597 mlRelativeFramePoses /
        # mlpReferences). Composing against the reference keyframe's CURRENT
        # pose at save time lets loop closures and GBA retroactively heal
        # the whole frame trajectory (System::SaveTrajectoryTUM semantics,
        # System.cc:337-396). Parallel to ``trajectory`` (same length/order).
        self.traj_refs: list[tuple[int, np.ndarray, np.ndarray]] = []
        self.n_lost_frames = 0
        self.only_tracking = False   # localization-only mode (mbOnlyTracking)
        # degraded visual-odometry mode inside localization-only tracking
        # (mbVO, Tracking.cc:344-445): map matches starved, pose carried by
        # temporal points; relocalization is retried until the map is
        # reacquired
        self.vo_mode = False
        self.debug: dict = {}
        # device-resident state
        self._prev_fd: FrameData | None = None
        self._prev_slot_pt = None
        self._prev_slot_ln = None
        self._R = None
        self._t = None
        self._R_vel = jnp.eye(3, dtype=jnp.float32)
        self._t_vel = jnp.zeros(3, jnp.float32)
        self._has_vel = jnp.asarray(False)
        # cached local map (device arrays + host id tables)
        self._lm_args = None
        self._lp_ids = np.zeros(0, np.int32)
        self._ll_ids = np.zeros(0, np.int32)
        self._refresh_frame = -1  # frame id of the last local-map harvest
        self._refresh_inl = 0     # inlier baseline at that harvest
        # measured per-frame camera-center displacement while tracking is
        # confident (metres/frame, decayed max — see _finish); scales the
        # short-lost relocalization gate's jump budget. None until two
        # consecutive retired poses exist.
        self._speed_est: float | None = None
        # host mirrors for the current/last frame
        self.last_pose: tuple[np.ndarray, np.ndarray] | None = None
        self.last_pt_ids: np.ndarray | None = None
        self.last_ln_ids: np.ndarray | None = None
        # --- pipelining: the fused step for frame k is dispatched before
        # older frames' results are fetched, so the networked TPU's fetch
        # latency (~25 ms RTT; result copies land ~one-way-latency after
        # compute ends) overlaps newer frames' device compute. Depth 2:
        # results are fetched `depth` frames later. The tunneled TPU's
        # end-to-end latency (upload flight + compute + result flight) is
        # ~40 ms while pipelined throughput is ~13 ms/frame, so depth 3-4
        # is needed to hide it (measured: depth 1 -> ~33 fps, depth 4 ->
        # ~78 fps). On a local backend the latency being hidden doesn't
        # exist, and the lagged keyframe decisions/local-map refreshes cost
        # tracking quality under fast motion — so auto-depth is backend-
        # keyed. ``_queue`` holds in-flight frames; slot remaps reconcile
        # local-map refreshes with already-dispatched frames.
        pd = cfg.tracking.pipeline_depth
        if pd <= 0:
            pd = 4 if jax.default_backend() == "tpu" else 1
        self.pipeline_depth = pd
        self._queue: list[dict] = []
        # --- gauge-correction protocol (loop closing / GBA): a correction
        # rewrites keyframe poses while this tracker (and possibly frames
        # in flight) still live in the PRE-correction gauge. The corrector
        # never touches tracker state directly — it publishes the rigid
        # delta D = T_kf1_old^-1 ∘ T_kf1_new under the map lock
        # (apply_gauge_correction); the tracker thread applies it at the
        # next process() call: device pose state is right-composed with D,
        # the local map re-uploads corrected landmarks, and frames
        # dispatched BEFORE the correction have their fetched poses
        # composed at retirement (epoch counter). The reference instead
        # stalls Tracking on Map::mMutexMapUpdate for the whole correction.
        self._pending_gauge: tuple[np.ndarray, np.ndarray] | None = None
        self._corr_epoch = 0
        self._corr_deltas: list[tuple[np.ndarray, np.ndarray]] = []
        self._id_pt = jnp.arange(self.LM_CAP, dtype=jnp.int32)
        self._id_ln = jnp.arange(self.LL_CAP, dtype=jnp.int32)
        self._pt_remap = self._id_pt
        self._ln_remap = self._id_ln

    # ------------------------------------------------------------------ API
    def process(self, gray: np.ndarray, depth: np.ndarray, timestamp: float,
                precomputed_out: "FusedOut | None" = None):
        """Track one RGB-D frame.

        Pipelined lag-1: returns the PREVIOUS frame's (R, t) world-to-camera
        (or None). Call :meth:`flush` to drain the last in-flight frame.
        ``precomputed_out``: a FusedOut computed externally (the batched
        multi-sequence frontend vmaps the fused step over sequences and
        hands each tracker its slice)."""
        self.frame_id += 1
        if self.state == OK and self._pending_gauge is not None:
            self._apply_pending_gauge()
        if self.state == OK and self.vo_mode and self.frame_id % 2 == 0:
            self._try_reacquire_map()
        if precomputed_out is None:
            gray, depth = self._quantize_inputs(gray, depth)
            gray = jnp.asarray(gray)
            depth = jnp.asarray(depth)
        if self.state == NOT_INITIALIZED:
            fd = (mframe.build_frame_stereo(gray, depth, self.cfg, wire=True)
                  if self.sensor == "stereo" else
                  mframe.build_frame(gray, depth, self.cfg, wire=True))
            init = (self._monocular_initialization
                    if self.sensor == "mono" else
                    self._stereo_initialization)
            if init(fd, timestamp):
                self.state = OK
                return self.last_pose
            return None
        if self.state == LOST:
            self._prev_fd = (
                mframe.build_frame_stereo(gray, depth, self.cfg, wire=True)
                if self.sensor == "stereo" else
                mframe.build_frame(gray, depth, self.cfg, wire=True))
            if self._try_relocalize(timestamp):
                return self.last_pose
            # reference: reset if lost right after init (Tracking.cc:560-568)
            if self.map.n_kf <= self.cfg.tracking.reset_if_lost_with_kfs_leq \
                    and self.n_lost_frames > 20:
                self.reset()
            self.n_lost_frames += 1
            return None
        # OK: dispatch this frame, then retire the oldest in-flight one —
        # the fetch latency rides on top of the newer frames' device compute
        out = self._dispatch(gray, depth, out=precomputed_out)
        result = None
        if len(self._queue) >= self.pipeline_depth:
            pending = self._queue.pop(0)
            ok = self._finish(pending)
            if ok:
                result = self.last_pose
                self.n_lost_frames = 0
            else:
                # an old frame failed: every newer dispatch (queued + this
                # one) used its bad pose — discard them all, keep this
                # frame's perception for relocalization
                self._queue.clear()
                self.n_lost_frames += 1
                self.state = LOST
                self._prev_slot_pt = jnp.full_like(self._prev_slot_pt, -1)
                self._prev_slot_ln = jnp.full_like(self._prev_slot_ln, -1)
                self._has_vel = jnp.asarray(False)
                if self._try_relocalize(timestamp):
                    return self.last_pose
                return None
        self._queue.append(dict(
            out=out, timestamp=timestamp, frame_id=self.frame_id,
            lp_ids=self._lp_ids, ll_ids=self._ll_ids,
            epoch=self._corr_epoch,
        ))
        return result

    def process_mono(self, gray: np.ndarray, timestamp: float):
        """Track one monocular frame (System::TrackMonocular ->
        GrabImageMonocular, Tracking.cc:244-281). The shared fused step
        runs with an all-zero depth map: temporal depth candidates vanish,
        landmarks come from two-view bootstrap + epipolar triangulation."""
        h, w = self.cfg.camera.height // 2, self.cfg.camera.width // 2
        return self.process(gray, np.zeros((h, w), np.uint16), timestamp)

    def process_stereo(self, gray_l: np.ndarray, gray_r: np.ndarray,
                       timestamp: float):
        """Track one stereo pair (System::TrackStereo ->
        GrabImageStereo, Tracking.cc:170-208)."""
        return self.process(gray_l, gray_r, timestamp)

    def flush(self):
        """Drain all in-flight frames (call before reading the trajectory)."""
        while self._queue:
            pending = self._queue.pop(0)
            if self._finish(pending):
                self.n_lost_frames = 0
            else:
                self._queue.clear()
                self.state = LOST
                self.n_lost_frames += 1

    def apply_gauge_correction(self, R_delta: np.ndarray,
                               t_delta: np.ndarray):
        """Publish a rigid gauge delta (T_old^-1 ∘ T_new of a corrected
        anchor keyframe) for the tracker thread to apply. Called by the
        loop closer — possibly from a worker thread — under the map lock."""
        if self._pending_gauge is None:
            self._pending_gauge = (np.asarray(R_delta, np.float32),
                                   np.asarray(t_delta, np.float32))
        else:  # compose with a not-yet-consumed delta: D = D_prev ∘ D_new
            Rp, tp = self._pending_gauge
            self._pending_gauge = (
                (Rp @ R_delta).astype(np.float32),
                (Rp @ t_delta + tp).astype(np.float32))

    def _apply_pending_gauge(self):
        """Tracker thread: fold the published correction into device pose
        state (T ∘ D), re-upload the corrected local map, and remember the
        delta so frames dispatched before the correction retire in the new
        gauge."""
        with self._map_lock:
            if self._pending_gauge is None:
                return
            dR, dt = self._pending_gauge
            self._pending_gauge = None
            self._corr_deltas.append((dR, dt))
            self._corr_epoch += 1
            R = np.asarray(self._R)
            t = np.asarray(self._t)
            self._R = jnp.asarray(R @ dR)
            self._t = jnp.asarray(R @ dt + t)
            # velocity T_cur ∘ T_prev^-1 is gauge-invariant under a right
            # composition; last_pose mirrors the device state
            if self.last_pose is not None:
                Rl, tl = self.last_pose
                self.last_pose = (Rl @ dR, Rl @ dt + tl)
            if self.last_pt_ids is not None and self._lm_args is not None:
                self._refresh_local_map(self.last_pt_ids, self.last_ln_ids,
                                        rebind=False)

    def _record_pose(self, timestamp: float, R: np.ndarray, t: np.ndarray,
                     ref: int | None = None):
        """Append a frame pose to the trajectory, both as-tracked (absolute)
        and relative to the reference keyframe (healable)."""
        self.trajectory.append((timestamp, R.copy(), t.copy()))
        if ref is None:
            ref = self.ref_kf
        if ref >= 0:
            # T_cr = T_cw ∘ T_wr with T_rw = the ref KF's pose right now
            Rr, tr = self.map.kf_R[ref], self.map.kf_t[ref]
            Rcr = R @ Rr.T
            tcr = t - Rcr @ tr
        else:  # no keyframe yet (cannot happen in OK state); store absolute
            Rcr, tcr = R.copy(), t.copy()
        self.traj_refs.append((int(ref), Rcr.astype(np.float32),
                               tcr.astype(np.float32)))

    def healed_trajectory(self) -> list[tuple[float, np.ndarray, np.ndarray]]:
        """(timestamp, R, t) per frame with every pose re-composed against
        the CURRENT pose of its reference keyframe — i.e. with loop-closure
        and GBA corrections applied retroactively (SaveTrajectoryTUM
        composition, System.cc:350-396). Culled reference keyframes chain
        through the frozen cull-time relative poses to a surviving
        ancestor."""
        m = self.map
        out = []
        for (ts, R_abs, t_abs), (ref, Rcr, tcr) in zip(
                self.trajectory, self.traj_refs):
            if ref < 0 or ref >= m.kf_R.shape[0]:
                out.append((ts, R_abs, t_abs))
                continue
            kf = ref
            Rc, tc = Rcr, tcr
            # walk the cull chain: T_cp = T_cr ∘ T_rp (KF0 never culled)
            while kf > 0 and not m.kf_valid[kf]:
                tc = Rc @ m.kf_cull_tcp[kf] + tc
                Rc = Rc @ m.kf_cull_Rcp[kf]
                kf = int(m.kf_cull_parent[kf])
            Rr, tr = m.kf_R[kf], m.kf_t[kf]
            R = Rc @ Rr
            t = Rc @ tr + tc
            out.append((ts, R.astype(np.float32), t.astype(np.float32)))
        return out

    def dispatch_args(self):
        """The fused step's array arguments for this tracker's next frame
        (minus the images) — the batched frontend stacks these across
        sequences."""
        return (self._prev_fd, self._prev_slot_pt, self._prev_slot_ln,
                self._pt_remap, self._ln_remap,
                self._R, self._t, self._R_vel, self._t_vel, self._has_vel,
                *self._lm_args)

    def _dispatch(self, gray, depth, out: FusedOut | None = None) -> FusedOut:
        """Dispatch the fused step and optimistically advance device state."""
        if out is None:
            out = fused_track_step(
                self.cfg, gray, depth, self._prev_fd,
                self._prev_slot_pt, self._prev_slot_ln,
                self._pt_remap, self._ln_remap,
                self._R, self._t, self._R_vel, self._t_vel, self._has_vel,
                *self._lm_args,
                stereo=(self.sensor == "stereo"),
            )
        self._pt_remap = self._id_pt
        self._ln_remap = self._id_ln
        self._pt_remap_np = None
        self._ln_remap_np = None
        # start the host copy now; it completes during this frame's compute.
        # ONE message: the wire buffer packs every host-bound result — pose,
        # bindings, stats, and the full FrameData snapshot (needed if this
        # frame becomes a keyframe) — because the tunneled transport charges
        # fixed per-message overhead that dwarfs the payload for small arrays.
        out.wire.copy_to_host_async()
        self._prev_fd = out.fd
        self._prev_slot_pt = out.feat_slot_pt
        self._prev_slot_ln = out.feat_slot_ln
        self._R = out.R
        self._t = out.t
        self._R_vel = out.R_vel
        self._t_vel = out.t_vel
        self._has_vel = jnp.asarray(True)
        return out

    def _quantize_inputs(self, gray, depth):
        """Pack images into compact wire formats: uint8 gray and HALF-RES
        uint16 depth (TUM depth_map_factor units, 2x2 min-of-nonzero pool),
        both horizontally DIFFERENCED (PNG Sub filter, exact mod-2^k).
        The tunneled TPU's ordered transport makes upload bytes the frame
        loop's floor — depth is only ever sampled at feature coordinates, so
        shipping it at (H/2, W/2) cuts the dominant copy 4x with sub-pixel
        sampling error comparable to the depth sensor's own edge noise; and
        the transport compresses, so shipping 2-D gradients (low entropy)
        instead of pixels cuts real-image bytes ~35%. build_frame
        (wire=True) reconstructs exactly via two wraparound cumsums."""
        gray = np.asarray(gray)
        depth = np.asarray(depth)
        if gray.dtype != np.uint8:
            gray = np.clip(gray, 0, 255).astype(np.uint8)
        gbits = self.cfg.tracking.gray_wire_bits
        if gbits < 8:
            gray = gray >> (8 - gbits)
        if self.sensor == "stereo":
            # second input is the RIGHT image: same uint8 wire format
            if depth.dtype != np.uint8:
                depth = np.clip(depth, 0, 255).astype(np.uint8)
            if gbits < 8:
                depth = depth >> (8 - gbits)
            return _grad2(gray), _grad2(depth)
        h, w = depth.shape
        if depth.dtype != np.uint16:
            f = self.cfg.tracking.depth_map_factor
            depth = np.clip(depth * f, 0, 65535).astype(np.uint16)
        if (h, w) == (self.cfg.camera.height, self.cfg.camera.width) \
                and h % 2 == 0 and w % 2 == 0:
            blocks = depth.reshape(h // 2, 2, w // 2, 2)
            # min over nonzero values; 0 (no depth) only if all 4 are 0.
            # uint16 wraparound: x-1 maps 0 -> 65535 (loses every min
            # against a real depth), +1 maps it back — no temporaries.
            depth = blocks - np.uint16(1)
            depth = np.minimum(depth[:, 0], depth[:, 1])
            depth = np.minimum(depth[..., 0], depth[..., 1])
            depth += np.uint16(1)
        return _grad2(gray), _grad2(depth)

    def _try_relocalize(self, timestamp: float) -> bool:
        """Relocalization against the keyframe database (Tracking.cc:2049)."""
        from .relocalization import try_relocalize

        out = try_relocalize(self, self._prev_fd)
        if out is None:
            return False
        R, t, cur_pt_ids = out
        # motion-prior gate on SHORT-lost relocalization: right after a
        # transient tracking failure the camera is within motion-model
        # reach of the last confident pose; a relocalization that lands
        # far away has latched onto an inconsistent (badly-drifted) sector
        # of the map — reject it and stay LOST. (The reference accepts any
        # reloc pose, Tracking.cc:2049-2269; measured here: a 34 cm drift
        # island captured the tracker through exactly this door.) The
        # budget is scaled by the MEASURED per-frame camera speed at the
        # time tracking was last confident — a fast camera legitimately
        # travels multiples of any fixed metric budget per lost frame —
        # and the gate is skipped entirely when no speed estimate exists
        # (right after init there is nothing to predict displacement with)
        # or in localization-only mode (the map is frozen — drift islands
        # form during MAPPING; a kidnapped localizer must reacquire
        # instantly, as the reference does).
        if (self.last_pose is not None and self.n_lost_frames < 10
                and self._speed_est is not None and not self.only_tracking):
            Rl, tl = self.last_pose
            c_new = -(np.asarray(R).T @ np.asarray(t))
            c_old = -(Rl.T @ tl)
            jump = float(np.linalg.norm(c_new - c_old))
            budget = 0.06 + 3.0 * self._speed_est * (self.n_lost_frames + 1)
            if jump > budget:
                return False
        # the relocalized pose comes from the CURRENT map gauge; drop any
        # correction published for the abandoned pre-LOST state
        self._pending_gauge = None
        if self.tracer.enabled:
            self.tracer.emit("reloc", frame=int(self.frame_id), ts=timestamp,
                             n_lost=int(self.n_lost_frames))
        self.state = OK
        self.vo_mode = False
        self.n_lost_frames = 0
        self.last_pose = (R, t)
        self.last_pt_ids = cur_pt_ids
        self.last_ln_ids = np.full(self.cfg.lines.max_lines, -1, np.int32)
        self._R = jnp.asarray(R)
        self._t = jnp.asarray(t)
        self._has_vel = jnp.asarray(False)
        self._refresh_local_map(cur_pt_ids, self.last_ln_ids)
        self._record_pose(timestamp, R, t)  # after refresh: ref_kf current
        return True

    def _try_reacquire_map(self) -> bool:
        """Relocalize WHILE tracking on VO (the mbVO retry loop,
        Tracking.cc:393-445): on success, rebind the local map to the
        relocalized pose; the VO pose estimate is replaced. Unlike the
        LOST-state path this appends no trajectory entry — the current
        frame's retirement records the (now map-consistent) pose."""
        from .relocalization import try_relocalize

        if self._prev_fd is None:
            return False
        out = try_relocalize(self, self._prev_fd)
        if out is None:
            return False
        R, t, cur_pt_ids = out
        # consistency gate: unlike the LOST path, VO mode still HAS a pose
        # estimate (drift-scale error) — a reloc result that disagrees
        # wildly is perceptual aliasing (similar-looking distinct views),
        # not recovery. The reference trusts its 1M-word vocabulary's
        # discrimination here; with smaller vocabularies the gate is what
        # keeps a false positive from teleporting a healthy VO track.
        R_vo = np.asarray(self._R)
        t_vo = np.asarray(self._t)
        dc = np.linalg.norm((-R.T @ t) - (-R_vo.T @ t_vo))
        dang = np.arccos(np.clip((np.trace(R @ R_vo.T) - 1) / 2, -1, 1))
        if dc > 0.5 or dang > np.deg2rad(30.0):
            return False
        self._R = jnp.asarray(R)
        self._t = jnp.asarray(t)
        self._has_vel = jnp.asarray(False)
        self.last_pose = (R, t)
        self.last_pt_ids = cur_pt_ids
        self.last_ln_ids = np.full(self.cfg.lines.max_lines, -1, np.int32)
        # frames still in flight were dispatched on the VO pose; their
        # retirements are VO-quality, the next dispatch is map-anchored
        self._refresh_local_map(cur_pt_ids, self.last_ln_ids)
        self.vo_mode = False
        return True

    def reset(self):
        """Full system reset (Tracking::Reset, Tracking.cc:2271-2317)."""
        self.map.reset()
        if self.kfdb is not None:
            self.kfdb.clear()
        if self.local_mapper is not None:
            self.local_mapper.recent_points.clear()
            self.local_mapper.recent_lines.clear()
        self.state = NOT_INITIALIZED
        self.last_kf_id = -1
        self.last_kf = -1
        self.ref_kf = -1
        self.n_lost_frames = 0
        self._speed_est = None
        self._has_vel = jnp.asarray(False)
        self._lm_args = None
        self._pending_gauge = None
        self.vo_mode = False

    # ------------------------------------------------------ initialization
    def _stereo_initialization(self, fd: FrameData, timestamp: float) -> bool:
        """Tracking::StereoInitialization (Tracking.cc:608-727)."""
        host = HostFrame(jax.device_get(fd))
        n_depth = int(((host.kp_depth > 0) & host.kp_valid).sum())
        if n_depth < 300:
            return False
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        kf = self.map.add_keyframe(host, R, t, self.frame_id, timestamp,
                                   fd_dev=fd)
        pt_ids = self._create_landmarks_from_depth(
            kf, host, R, t, np.full(host.kp_valid.shape, -1, np.int32),
            close_only=False,
        )
        ln_ids = self._create_lines_from_depth(
            kf, host, R, t, np.full(host.ln_valid.shape, -1, np.int32)
        )
        feats = np.nonzero(pt_ids >= 0)[0]
        self.map.scatter_point_descs_from(fd.kp_desc, feats, pt_ids[feats])
        lfeats = np.nonzero(ln_ids >= 0)[0]
        self.map.scatter_line_descs_from(fd.ln_desc, lfeats, ln_ids[lfeats])
        self.last_kf_id = self.frame_id
        self.last_kf = kf
        self.ref_kf = kf
        self.last_pose = (R, t)
        self.last_pt_ids = pt_ids
        self.last_ln_ids = ln_ids
        self._record_pose(timestamp, R, t, ref=kf)
        if self.local_mapper is not None:
            self.local_mapper.on_new_landmarks(kf, pt_ids, ln_ids)
            self.local_mapper.process_keyframe(kf)
        self._register_bow(kf, fd)
        # device state
        self._prev_fd = fd
        self._R = jnp.asarray(R)
        self._t = jnp.asarray(t)
        self._has_vel = jnp.asarray(False)
        self._refresh_local_map(pt_ids, ln_ids)
        return True


    def _monocular_initialization(self, fd: FrameData, timestamp: float) -> bool:
        """MonocularInitialization + CreateInitialMapMonocular
        (Tracking.cc:729-903): hold a reference frame, match wide, RANSAC
        H and F concurrently, pick by score ratio, reconstruct, build the
        two-keyframe map scaled to median depth 1."""
        from ..ops import initializer as mono_init_ops

        host = HostFrame(jax.device_get(fd))
        n_kp = int(host.kp_valid.sum())
        if n_kp <= 100:
            self._mono_ref = None
            return False
        if self._mono_ref is None:
            self._mono_ref = (fd, host, timestamp)
            return False
        rfd, rhost, rts = self._mono_ref
        idx, ok = mono_init_match(
            self.cfg, rfd.kp_xy_un, rfd.kp_desc, rfd.kp_valid,
            fd.kp_xy_un, fd.kp_desc, fd.kp_valid)
        idx, ok = jax.device_get((idx, ok))
        if int(ok.sum()) < 100:  # Tracking.cc:774-780: drop the ref frame
            self._mono_ref = (fd, host, timestamp)
            return False
        uv1 = rhost.kp_xy_un
        uv2 = host.kp_xy_un[np.clip(idx, 0, len(host.kp_xy_un) - 1)]
        H, sh, F, sf, okh, okf = mono_init_ops.find_models(
            jnp.asarray(uv1), jnp.asarray(uv2.astype(np.float32)),
            jnp.asarray(ok), jax.random.PRNGKey(self.frame_id))
        sh_f, sf_f = float(sh), float(sf)
        K = jnp.asarray(np.array(
            [[self.cfg.camera.fx, 0, self.cfg.camera.cx],
             [0, self.cfg.camera.fy, self.cfg.camera.cy],
             [0, 0, 1]], np.float32))
        if sh_f / max(sh_f + sf_f, 1e-9) > 0.40:  # Tracking.cc:129-136
            R, t, pw, good, clear = mono_init_ops.reconstruct_h(
                H, K, jnp.asarray(uv1), jnp.asarray(uv2.astype(np.float32)),
                okh)
        else:
            R, t, pw, good, clear = mono_init_ops.reconstruct_f(
                F, K, jnp.asarray(uv1), jnp.asarray(uv2.astype(np.float32)),
                okf)
        if not bool(clear):
            return False
        R, t, pw, good = jax.device_get((R, t, pw, good))
        good = good & ok
        if good.sum() < 80:
            return False
        # scale: median depth -> 1 (CreateInitialMapMonocular :860-880)
        med = float(np.median(pw[good][:, 2]))
        if med <= 0:
            return False
        t = (t / med).astype(np.float32)
        pw = (pw / med).astype(np.float32)

        m = self.map
        I = np.eye(3, dtype=np.float32)
        z3 = np.zeros(3, np.float32)
        kf0 = m.add_keyframe(rhost, I, z3, self.frame_id - 1, rts, fd_dev=rfd)
        kf1 = m.add_keyframe(host, R, t, self.frame_id, timestamp, fd_dev=fd)
        cur_pt_ids = np.full(self.cfg.orb.max_keypoints, -1, np.int32)
        new_feats, new_pids = [], []
        c1 = np.zeros(3)
        for f in np.nonzero(good)[0]:
            p = pw[f]
            dist = float(np.linalg.norm(p - c1))
            level = int(rhost.kp_octave[f])
            max_d = dist * self.cfg.orb.scale_factor ** level
            min_d = max_d / self.cfg.orb.scale_factor ** (
                self.cfg.orb.n_levels - 1)
            normal = (p - c1) / max(dist, 1e-6)
            pid = m.add_point(p, None, normal, min_d, max_d, kf0)
            f2 = int(idx[f])
            m.add_point_obs(pid, kf0, int(f))
            m.add_point_obs(pid, kf1, f2)
            cur_pt_ids[f2] = pid
            new_feats.append(int(f))
            new_pids.append(pid)
        m.scatter_point_descs_from(rfd.kp_desc,
                                   np.array(new_feats, np.int32),
                                   np.array(new_pids, np.int32))
        self.last_kf_id = self.frame_id
        self.last_kf = kf1
        self.ref_kf = kf1
        self.last_pose = (R, t)
        self.last_pt_ids = cur_pt_ids
        self.last_ln_ids = np.full(self.cfg.lines.max_lines, -1, np.int32)
        self._record_pose(rts, I, z3, ref=kf0)
        self._record_pose(timestamp, R, t, ref=kf1)
        if self.local_mapper is not None:
            self.local_mapper.on_new_landmarks(
                kf1, np.array(new_pids, np.int32), np.zeros(0, np.int32))
            self.local_mapper.process_keyframe(kf1)
        self._register_bow(kf0, rfd)
        self._register_bow(kf1, fd)
        self._mono_ref = None
        # device state
        self._prev_fd = fd
        self._R = jnp.asarray(R)
        self._t = jnp.asarray(t)
        self._has_vel = jnp.asarray(False)
        self._refresh_local_map(cur_pt_ids, self.last_ln_ids)
        return True

    # ------------------------------------------------------------- tracking
    def _finish(self, pending: dict) -> bool:
        """Fetch and retire a dispatched frame (bookkeeping + KF decision)."""
        cfg = self.cfg
        out: FusedOut = pending["out"]
        timestamp = pending["timestamp"]
        frame_id = pending["frame_id"]
        lp_ids = pending["lp_ids"]
        ll_ids = pending["ll_ids"]
        # the async copy was started at dispatch; this get is ~free
        buf = jax.device_get(out.wire)
        vals = wirefmt.unpack(buf, _wire_spec(out))
        (stats, R, t, lm_feat, lm_inlier, lm_vis, lml_feat, lml_inlier,
         kp_xy_un, kp_octave, kp_depth, kp_valid,
         ln_ep_un, ln_desc, ln_depth, ln_valid) = vals
        fd_host = _host_frame_from_wire(
            self.cfg, kp_xy_un, kp_octave, kp_depth, kp_valid,
            ln_ep_un, ln_desc, ln_depth, ln_valid)
        R = np.array(R)  # own the pose (the views borrow the wire buffer)
        t = np.array(t)
        # frames dispatched before a gauge correction retire in the NEW
        # gauge: right-compose every delta published since dispatch
        for dR, dt in self._corr_deltas[pending.get("epoch",
                                                    self._corr_epoch):]:
            R, t = R @ dR, R @ dt + t
        n_mm, n_mi, n_li, tc, cc, n_rs = (int(v) for v in stats)
        self.debug = {
            "motion_matches": int(n_mm), "motion_inliers": int(n_mi),
            "local_inliers": int(n_li), "local_points": len(lp_ids),
            "rescue_inliers": int(n_rs),
        }
        n_in = int(n_li)
        track_ok = int(n_mi) >= 10 and n_in >= cfg.tracking.min_inliers_local_map
        if not track_ok:
            # mbVO (Tracking.cc:344-445, :512-520): in localization-only
            # mode the fused step's motion stage matches TEMPORAL points
            # (depth-backprojected from the previous frame) for every
            # feature the map failed to bind — so a healthy motion-inlier
            # count means visual odometry is carrying the pose even though
            # map localization starved. Keep tracking, flag VO mode, and
            # retry relocalization until the map is reacquired.
            if self.only_tracking and int(n_mi) >= 20:
                self.vo_mode = True
            else:
                return False
        elif self.vo_mode and n_in >= 2 * cfg.tracking.min_inliers_local_map:
            self.vo_mode = False  # map reacquired by matching alone

        # host bookkeeping (ids resolved against the DISPATCH-time snapshot:
        # a KF refresh may have rewritten self._lp_ids since)
        self._map_lock.__enter__()
        k = len(lp_ids)
        lm_inlier = lm_inlier.copy()
        lm_inlier[k:] = False
        vis = lm_vis.copy()
        vis[k:] = False
        self.map.pt_visible[lp_ids[vis[:k]]] += 1
        self.map.pt_found[lp_ids[lm_inlier[:k]]] += 1
        n = self.cfg.orb.max_keypoints
        cur_pt_ids = np.full(n, -1, np.int32)
        sel = np.nonzero(lm_inlier[:k])[0]
        cur_pt_ids[lm_feat[sel]] = lp_ids[sel]
        kl = len(ll_ids)
        lml_inlier = lml_inlier.copy()
        lml_inlier[kl:] = False
        nl = self.cfg.lines.max_lines
        cur_ln_ids = np.full(nl, -1, np.int32)
        lsel = np.nonzero(lml_inlier[:kl])[0]
        cur_ln_ids[lml_feat[lsel]] = ll_ids[lsel]
        self.map.ln_visible[ll_ids[lsel]] += 1
        self.map.ln_found[ll_ids[lsel]] += 1

        if self.last_pose is not None:
            Rl, tl = self.last_pose
            disp = float(np.linalg.norm(-(R.T @ t) + (Rl.T @ tl)))
            # decayed max: a momentary stop must not shrink the reloc
            # budget below the scale of recent motion; the decay bleeds
            # off one-frame spikes (e.g. a gauge-correction jump). Clamp
            # keeps a pathological jump from disabling the gate for good.
            self._speed_est = min(max(disp, 0.8 * (self._speed_est or 0.0)),
                                  2.0)
        self.last_pose = (R, t)
        self.last_pt_ids = cur_pt_ids
        self.last_ln_ids = cur_ln_ids
        self._record_pose(timestamp, R, t)

        need = self._need_new_keyframe(int(tc), int(cc), n_in,
                                       frame_id=frame_id)
        if self.tracer.enabled:
            self.tracer.emit(
                "frame", frame=int(frame_id), ts=timestamp,
                state=self.state, motion_inliers=int(n_mi),
                rescue_inliers=int(n_rs),
                local_inliers=n_in, tracked_close=int(tc),
                points=len(lp_ids), lines=len(ll_ids),
                kf=bool(need), n_kf=self.map.n_kf,
            )
        self._map_lock.__exit__(None, None, None)
        if need:
            with self._map_lock:
                self._create_new_keyframe(out.fd, R, t, cur_pt_ids,
                                          cur_ln_ids, timestamp,
                                          frame_id=frame_id, host=fd_host)
        elif (frame_id - self._refresh_frame >= self.REFRESH_MAX_FRAMES
              or n_in < 0.5 * self._refresh_inl):
            # the local map normally refreshes at keyframe events; when the
            # camera keeps moving WITHOUT minting keyframes (e.g. re-
            # entering well-mapped territory after a loop closure) the
            # device local map goes stale and inliers starve — the
            # reference re-harvests EVERY frame (UpdateLocalKeyFrames,
            # Tracking.cc:1867-2035); a bounded cadence + inlier-decay
            # trigger is the pipelined equivalent
            with self._map_lock:
                self._refresh_local_map(cur_pt_ids, cur_ln_ids,
                                        rebind=False)
            self._refresh_inl = n_in
        if need:
            self._refresh_inl = n_in
            # the spawning frame references its OWN keyframe (the
            # reference sets mpReferenceKF = pKFnew inside
            # CreateNewKeyFrame before the trajectory bookkeeping,
            # Tracking.cc:1664, :578-597) — healed poses at keyframe
            # timestamps then equal the corrected keyframe poses exactly;
            # relative-to-own-KF is identity BY CONSTRUCTION (the KF was
            # minted from this very frame pose) — don't recompute from
            # kf_R (a BA step inside process_keyframe may already have
            # nudged it, which would bake the nudge's inverse in)
            with self._map_lock:
                self.traj_refs[-1] = (int(self.last_kf),
                                      np.eye(3, dtype=np.float32),
                                      np.zeros(3, np.float32))
        return True

    # --------------------------------------------------- local map handling
    def _refresh_local_map(self, cur_pt_ids, cur_ln_ids, rebind: bool = True):
        """Harvest the covisibility-local map and upload device arrays
        (UpdateLocalKeyFrames/Points/Lines, Tracking.cc:1867-2035). Called
        at keyframe events — between keyframes the set barely changes and
        re-uploading every frame would cost a round trip.

        ``rebind=True`` (sync paths: init, relocalization) rewrites the
        device feature→slot tables from ``cur_*_ids``. ``rebind=False``
        (pipelined KF events) instead uploads old-slot→new-slot remap
        vectors: the in-flight frame was dispatched against the OLD slot
        space and its device-resident slot tables are reconciled inside the
        next fused step."""
        old_lp = self._lp_ids
        old_ll = self._ll_ids
        self._refresh_frame = self.frame_id
        lkfs = self._local_keyframes(cur_pt_ids)
        lp_ids, ll_ids = self._local_landmarks(lkfs)
        self._lp_ids = lp_ids
        self._ll_ids = ll_ids
        m = self.map
        LM, LL = self.LM_CAP, self.LL_CAP
        k = len(lp_ids)
        p3d = np.zeros((LM, 3), np.float32)
        normal = np.zeros((LM, 3), np.float32)
        mind = np.zeros(LM, np.float32)
        maxd = np.zeros(LM, np.float32)
        valid = np.zeros(LM, bool)
        pid_pad = np.zeros(LM, np.int32)
        p3d[:k] = m.pt_pos[lp_ids]
        normal[:k] = m.pt_normal[lp_ids]
        mind[:k] = m.pt_min_dist[lp_ids]
        maxd[:k] = m.pt_max_dist[lp_ids]
        valid[:k] = True
        pid_pad[:k] = lp_ids
        kl = len(ll_ids)
        lep = np.zeros((LL, 2, 3), np.float32)
        lvalid = np.zeros(LL, bool)
        lid_pad = np.zeros(LL, np.int32)
        lep[:kl] = m.ln_ep[ll_ids]
        lvalid[:kl] = True
        lid_pad[:kl] = ll_ids
        # descriptors are gathered from the device arenas by id — the ids
        # compress to nothing on the wire, the descriptor bytes never leave
        # HBM (the reference's pointer-chase becomes an indexed gather)
        desc = m.point_desc_arena()[jnp.asarray(pid_pad)]
        ldesc = m.line_desc_arena()[jnp.asarray(lid_pad)]
        self._lm_args = tuple(
            jnp.asarray(a)
            for a in (p3d, desc, normal, mind, maxd, valid, lep, ldesc, lvalid)
        )
        # id -> slot lookup tables (vectorized: the python dict builds +
        # per-feature loops here were the KF-event host hot spot — ~2300
        # scalar iterations per refresh)
        slot_lut_pt = np.full(m.pt_pos.shape[0], -1, np.int32)
        slot_lut_pt[lp_ids] = np.arange(len(lp_ids), dtype=np.int32)
        slot_lut_ln = np.full(m.ln_ep.shape[0], -1, np.int32)
        slot_lut_ln[ll_ids] = np.arange(len(ll_ids), dtype=np.int32)
        if rebind:
            # bindings: per current-frame feature -> slot
            fs = np.where(cur_pt_ids >= 0,
                          slot_lut_pt[np.clip(cur_pt_ids, 0, None)], -1)
            fsl = np.where(cur_ln_ids >= 0,
                           slot_lut_ln[np.clip(cur_ln_ids, 0, None)], -1)
            self._prev_slot_pt = jnp.asarray(fs)
            self._prev_slot_ln = jnp.asarray(fsl)
            self._pt_remap = self._id_pt
            self._ln_remap = self._id_ln
            self._pt_remap_np = None
            self._ln_remap_np = None
        else:
            # old-slot -> new-slot remaps for the in-flight frames
            rm = np.full(self.LM_CAP, -1, np.int32)
            if len(old_lp):
                rm[: len(old_lp)] = slot_lut_pt[old_lp]
            rml = np.full(self.LL_CAP, -1, np.int32)
            if len(old_ll):
                rml[: len(old_ll)] = slot_lut_ln[old_ll]
            # compose with a not-yet-consumed remap (two refreshes can land
            # between dispatches, e.g. while flushing a depth-2 pipeline)
            if self._pt_remap_np is not None:
                prev = self._pt_remap_np
                rm = np.where(prev >= 0, rm[np.clip(prev, 0, None)], -1)
            if self._ln_remap_np is not None:
                prev = self._ln_remap_np
                rml = np.where(prev >= 0, rml[np.clip(prev, 0, None)], -1)
            self._pt_remap_np = rm
            self._ln_remap_np = rml
            self._pt_remap = jnp.asarray(rm)
            self._ln_remap = jnp.asarray(rml)

    def _local_keyframes(self, cur_pt_ids: np.ndarray) -> list[int]:
        """KFs observing current points + covisible neighbors (cap 80).
        The observer count is a vectorized membership join over the
        kf_pt_idx match matrix (see SlamMap.covisibility_counts)."""
        m = self.map
        cur = cur_pt_ids[cur_pt_ids >= 0]
        counts: dict[int, int] = {}
        if len(cur) and m.n_kf:
            lut = np.zeros(m.pt_pos.shape[0], bool)
            lut[cur] = True
            sub = m.kf_pt_idx[: m.n_kf]
            mask = (sub >= 0) & lut[np.clip(sub, 0, None)]
            carr = mask.sum(1)
            nz = np.nonzero(carr)[0]
            counts = {int(o): int(carr[o]) for o in nz}
        if not counts:
            return [self.ref_kf] if self.ref_kf >= 0 else []
        k1 = sorted(counts, key=counts.get, reverse=True)
        self.ref_kf = k1[0]
        out = list(k1)
        seen = set(out)
        depth = {kf: 0 for kf in out}
        # depth-2 BFS over covisibility neighbors + SPANNING-TREE parent/
        # children (UpdateLocalKeyFrames, Tracking.cc:1966-2025). Tree
        # links bridge chain segments whose covisibility is weak (fast
        # motion, aggressive culling); the second hop lets the harvest
        # walk out of a freshly minted keyframe island (island -> parent
        # -> parent's neighborhood) where a one-hop expansion stops at the
        # island's edge and matching starves. Deeper expansion is harmful:
        # it floods the local map with far-away landmarks that pollute
        # projection matching.
        i = 0
        while i < len(out) and \
                len(out) < self.cfg.tracking.local_map_kf_cap:
            kf = out[i]
            i += 1
            if depth[kf] >= 2:
                continue
            neigh = list(m.covisible_keyframes(kf, 10))
            p = int(m.kf_parent[kf])
            if p >= 0 and m.kf_valid[p]:
                neigh.append(p)
            neigh.extend(c for c in m.kf_children[kf] if m.kf_valid[c])
            for nkf in neigh:
                if nkf not in seen:
                    out.append(nkf)
                    seen.add(nkf)
                    depth[nkf] = depth[kf] + 1
        return out[: self.cfg.tracking.local_map_kf_cap]

    def _local_landmarks(self, lkfs: list[int]):
        if not lkfs:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        pts = np.unique(self.map.kf_pt_idx[lkfs])
        pts = pts[(pts >= 0) & self.map.pt_valid[np.clip(pts, 0, None)]]
        lns = np.unique(self.map.kf_ln_idx[lkfs])
        lns = lns[(lns >= 0) & self.map.ln_valid[np.clip(lns, 0, None)]]
        return (pts[: self.LM_CAP].astype(np.int32),
                lns[: self.LL_CAP].astype(np.int32))

    # -------------------------------------------------------- keyframe logic
    def _need_new_keyframe(self, tracked_close, creatable_close, n_inliers,
                           frame_id: int | None = None):
        """NeedNewKeyFrame RGB-D branch (Tracking.cc:1423-1557)."""
        if self.only_tracking:
            return False
        if frame_id is None:
            frame_id = self.frame_id
        cfg = self.cfg.tracking
        mono = self.sensor == "mono"
        # mono has no depth to mint close points from (Tracking.cc:1488)
        need_close = (not mono) and (tracked_close < 100) and (
            creatable_close > 70)
        min_obs = 2 if self.map.n_kf <= 2 else 3
        ref_tracked = 1
        ref = self.ref_kf
        if ref >= 0 and not self.map.kf_valid[ref]:
            # the reference keyframe can be CULLED under us (e.g. the loop
            # fusion made it redundant); a culled row reads 0 tracked and
            # would wedge c2 into `n_in < 0.75` = never — fall back to the
            # newest surviving keyframe (the reference re-picks
            # mpReferenceKF every frame in UpdateLocalKeyFrames)
            ref = max((q for q in range(self.map.n_kf)
                       if self.map.kf_valid[q]), default=-1)
            self.ref_kf = ref
        if ref >= 0:
            pids = self.map.kf_pt_idx[ref]
            pids = pids[pids >= 0]
            cnt = sum(1 for p in pids if len(self.map.pt_obs[p]) >= min_obs)
            ref_tracked = max(cnt if cnt > 0 else len(pids), 1)
        c1a = frame_id >= self.last_kf_id + cfg.max_frames_between_kf
        c1b = frame_id >= self.last_kf_id + max(cfg.min_frames_between_kf, 1)
        c1c = (not mono) and ((n_inliers < ref_tracked * 0.25) or need_close)
        th_ref = 0.9 if mono else 0.75  # Tracking.cc:1504-1509
        c2 = ((n_inliers < ref_tracked * th_ref) or need_close) \
            and n_inliers > 15
        return bool((c1a or c1b or c1c) and c2)

    def _create_new_keyframe(self, fd: FrameData, R, t, cur_pt_ids,
                             cur_ln_ids, ts, frame_id: int | None = None,
                             host: HostFrame | None = None):
        """CreateNewKeyFrame (Tracking.cc:1567-1744)."""
        if frame_id is None:
            frame_id = self.frame_id
        if host is None:  # the retired frame (normally unpacked from wire)
            host = HostFrame(jax.device_get(fd))
        kf = self.map.add_keyframe(host, R, t, frame_id, ts, fd_dev=fd)
        for feat, pid in enumerate(cur_pt_ids):
            if pid >= 0 and self.map.pt_valid[pid]:
                self.map.add_point_obs(int(pid), kf, feat)
        for feat, lid in enumerate(cur_ln_ids):
            if lid >= 0 and self.map.ln_valid[lid]:
                self.map.add_line_obs(int(lid), kf, feat)
        new_pt = self._create_landmarks_from_depth(kf, host, R, t, cur_pt_ids,
                                                   close_only=True)
        cur_pt_ids = cur_pt_ids.copy()
        cur_pt_ids[new_pt >= 0] = new_pt[new_pt >= 0]
        new_ln = self._create_lines_from_depth(kf, host, R, t, cur_ln_ids)
        cur_ln_ids = cur_ln_ids.copy()
        cur_ln_ids[new_ln >= 0] = new_ln[new_ln >= 0]
        # new landmarks take their descriptors straight from the keyframe's
        # device snapshot — descriptors never cross the wire
        feats = np.nonzero(new_pt >= 0)[0]
        self.map.scatter_point_descs_from(fd.kp_desc, feats, new_pt[feats])
        lfeats = np.nonzero(new_ln >= 0)[0]
        self.map.scatter_line_descs_from(fd.ln_desc, lfeats, new_ln[lfeats])
        self.last_kf_id = frame_id
        self.last_kf = kf
        self.ref_kf = kf
        if self.local_mapper is not None:
            self.local_mapper.on_new_landmarks(kf, new_pt, new_ln)
            self.local_mapper.process_keyframe(kf)
        self._register_bow(kf, fd)
        if self.loop_closer is not None:
            self.loop_closer.process_keyframe(kf)
        self.last_pt_ids = cur_pt_ids
        self.last_ln_ids = cur_ln_ids
        self._refresh_local_map(cur_pt_ids, cur_ln_ids, rebind=False)

    def _register_bow(self, kf: int, fd: FrameData):
        if self.kfdb is not None and self.voc is not None:
            _, bow = self.voc.transform(fd.kp_desc, fd.kp_valid)
            self.kfdb.add(kf, np.asarray(bow))

    def _create_landmarks_from_depth(self, kf, host, R, t, cur_pt_ids,
                                     close_only: bool) -> np.ndarray:
        """New map points from depth, closest-first; close ones always, far
        ones only up to the 100-point floor (Tracking.cc:1630-1700)."""
        cfg = self.cfg
        cam = cfg.camera
        out = np.full(host.kp_valid.shape, -1, np.int32)
        cand = host.kp_valid & (host.kp_depth > 0) & (cur_pt_ids < 0)
        idxs = np.nonzero(cand)[0]
        if len(idxs) == 0:
            return out
        order = idxs[np.argsort(host.kp_depth[idxs])]
        n_existing = int((cur_pt_ids >= 0).sum())
        Rwc = R.T
        c = -Rwc @ t
        # vectorized world positions
        uv = host.kp_xy_un[order]
        d = host.kp_depth[order]
        pc = _backproject_np(cam, uv, d)
        pw = pc @ Rwc.T + c
        dist = np.linalg.norm(pw - c, axis=1)
        level = host.kp_octave[order]
        max_d = dist * cfg.orb.scale_factor**level
        min_d = max_d / cfg.orb.scale_factor ** (cfg.orb.n_levels - 1)
        normal = (pw - c) / np.maximum(dist[:, None], 1e-6)
        created = 0
        for j, feat in enumerate(order):
            if close_only and d[j] > cfg.tracking.th_depth and (
                n_existing + created >= 100
            ):
                break
            pid = self.map.add_point(pw[j], None, normal[j],
                                     min_d[j], max_d[j], kf)
            self.map.add_point_obs(pid, kf, int(feat))
            out[feat] = pid
            created += 1
        return out

    def _create_lines_from_depth(self, kf, host, R, t, cur_ln_ids) -> np.ndarray:
        """New map lines from endpoint depths (Tracking.cc:1700-1735)."""
        cfg = self.cfg
        cam = cfg.camera
        out = np.full(host.ln_valid.shape, -1, np.int32)
        cand = (
            host.ln_valid
            & (host.ln_depth > 0).all(1)
            & (host.ln_depth < cfg.tracking.th_depth * 2).all(1)
            & (cur_ln_ids < 0)
        )
        Rwc = R.T
        c = -Rwc @ t
        feats = np.nonzero(cand)[0]
        if len(feats):
            # batched endpoint unprojection (one einsum for all candidates;
            # only the arena-slot bookkeeping stays per-line)
            pc = _backproject_np(cam, host.ln_ep_un[feats].reshape(-1, 2),
                                 host.ln_depth[feats].reshape(-1))
            ep_w = (pc @ Rwc.T + c).reshape(-1, 2, 3).astype(np.float32)
            for i, feat in enumerate(feats):
                lid = self.map.add_line(ep_w[i], None, kf)
                self.map.add_line_obs(lid, kf, int(feat))
                out[feat] = lid
        return out


def _backproject_np(cam, uv: np.ndarray, depth: np.ndarray) -> np.ndarray:
    x = (uv[:, 0] - cam.cx) / cam.fx
    y = (uv[:, 1] - cam.cy) / cam.fy
    return np.stack([x * depth, y * depth, depth], -1).astype(np.float32)
