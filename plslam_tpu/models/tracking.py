"""Frontend tracking: the per-frame state machine and its jitted steps.

Re-design of the reference ``Tracking`` thread (/root/reference/src/
Tracking.cc) as a host-side state machine around two fixed-shape device
programs:

- ``motion_track_step``: project the previous frame's 3D (map points +
  temporal depth points, 3D lines) with the constant-velocity guess, match
  in windows, joint point+line pose LM.  Covers TrackWithMotionModel
  (:1212-1330) + UpdateLastFrame (:1044-1210) + the x2-radius retry
  (:1255-1259), computed branchlessly.
- ``local_map_track_step``: frustum-cull the local map, scale-predicted
  window matching with ratio test, second pose LM.  Covers TrackLocalMap
  (:1332-1420) + SearchLocalPoints/Lines (:1746-1865) + IsInFrustum
  (Frame.cc:345-430).

Keyframe decision/creation follows NeedNewKeyFrame / CreateNewKeyFrame
(:1423-1744, RGB-D branch): close-point bookkeeping, depth-sorted new
landmark creation, line creation from endpoint depths.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import lines as glines
from ..geometry import se3
from ..ops import line_matching, matching
from ..optim import pose as pose_opt
from . import frame as mframe
from .frame import FrameData
from .map import HostFrame, SlamMap

TH_HIGH = 100
TH_LOW = 50


class MotionStepOut(NamedTuple):
    R: jax.Array
    t: jax.Array
    pt_idx: jax.Array       # (Q,) matched current-frame feature per query
    pt_inlier: jax.Array    # (Q,) bool
    ln_idx: jax.Array       # (L,)
    ln_inlier: jax.Array    # (L,)
    n_pt_matches: jax.Array
    n_inliers: jax.Array


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
    """Gather matched observations into fixed-shape PoseObs (capacity = Q, L)."""
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


@functools.partial(jax.jit, static_argnames=("cfg",))
def motion_track_step(
    cfg: SlamConfig,
    fd: FrameData,
    q_p3d: jax.Array,     # (Q, 3) world 3D of last-frame features
    q_desc: jax.Array,    # (Q, 32)
    q_octave: jax.Array,  # (Q,)
    q_angle: jax.Array,   # (Q,)
    q_valid: jax.Array,   # (Q,)
    ln_ep3d: jax.Array,   # (L, 2, 3) world 3D line endpoints of last frame
    ln_desc: jax.Array,   # (L, 32)
    ln_valid: jax.Array,  # (L,)
    R_guess: jax.Array,
    t_guess: jax.Array,
) -> MotionStepOut:
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

    # lines: project last-frame 3D lines and run the gate cascade
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


@functools.partial(jax.jit, static_argnames=("cfg",))
def local_map_track_step(
    cfg: SlamConfig,
    fd: FrameData,
    lm_p3d: jax.Array,      # (LM, 3)
    lm_desc: jax.Array,     # (LM, 32)
    lm_normal: jax.Array,   # (LM, 3)
    lm_mind: jax.Array,     # (LM,)
    lm_maxd: jax.Array,     # (LM,)
    lm_valid: jax.Array,    # (LM,)
    lm_pre_feat: jax.Array, # (LM,) feature idx matched by motion step or -1
    lml_ep3d: jax.Array,    # (LL, 2, 3)
    lml_desc: jax.Array,
    lml_valid: jax.Array,
    lml_pre_feat: jax.Array,
    R0: jax.Array,
    t0: jax.Array,
) -> LocalStepOut:
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
    # re-matched here — motion-step bindings were selected at a possibly
    # biased pose, and freezing them feeds that bias forward; re-matching is
    # free on TPU and keeps the correction loop contractive.
    visible = lm_valid & in_img & dist_ok & view_ok

    # PredictScale (MapPoint.cc): level from distance ratio
    ratio = jnp.log(jnp.maximum(lm_maxd, 1e-6) / jnp.maximum(dist, 1e-6))
    pred_level = jnp.clip(
        jnp.ceil(ratio / jnp.log(scale)).astype(jnp.int32), 0, n_levels - 1
    )
    # RadiusByViewingCos x th x scaleFactor^level (ORBmatcher.cc:72-180)
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
    # fresh matches win; motion-step bindings only fill gaps
    pt_idx = jnp.where(m.ok, m.idx, lm_pre_feat)
    pt_ok = m.ok | pre_matched

    # lines (same re-match-everything policy as points)
    lproj = line_matching.project_lines(cam, R0, t0, lml_ep3d, lml_valid)
    ln_pre = lml_pre_feat >= 0
    lm_res = line_matching.match_lines(
        lproj, lml_desc,
        fd.ln_ep_un, fd.ln_angle, fd.ln_length, fd.ln_desc,
        fd.ln_valid, cfg.lines,
    )
    ln_idx = jnp.where(lm_res.ok, lm_res.idx, lml_pre_feat)
    ln_ok = lm_res.ok | ln_pre

    obs = _assemble_pose_obs(cfg, fd, lm_p3d, lm_valid, pt_idx, pt_ok,
                             lml_ep3d, lml_valid, ln_idx, ln_ok)
    res = pose_opt.optimize_pose(cam, R0, t0, obs)
    return LocalStepOut(
        res.R, res.t, pt_idx, pt_ok & res.inlier_pts, ln_idx,
        ln_ok & res.inlier_lines, visible | pre_matched, res.n_inliers,
    )


# ===========================================================================
# Host-side tracker
# ===========================================================================

NOT_INITIALIZED = 0
OK = 1
LOST = 2


@dataclass
class LastFrame:
    fd_host: HostFrame
    R: np.ndarray
    t: np.ndarray
    pt_ids: np.ndarray      # (N,) map point id per feature or -1
    ln_ids: np.ndarray      # (NL,) map line id per line or -1


class Tracker:
    """Host state machine driving the jitted steps and the map."""

    def __init__(self, cfg: SlamConfig, slam_map: SlamMap,
                 local_mapper=None, loop_closer=None):
        self.cfg = cfg
        self.map = slam_map
        self.local_mapper = local_mapper
        self.loop_closer = loop_closer
        self.state = NOT_INITIALIZED
        self.last: LastFrame | None = None
        self.velocity: tuple[np.ndarray, np.ndarray] | None = None
        self.frame_id = -1
        self.last_kf_id = -1          # frame id at last KF insertion
        self.last_kf = -1             # keyframe index
        self.ref_kf = -1
        self.trajectory: list[tuple[float, np.ndarray, np.ndarray]] = []
        self.relative_poses: list = []  # (ref_kf, T_cr) for final trajectory
        self.n_lost_frames = 0
        # capacities for local-map device buffers
        self._lm_cap = 8192
        self._ll_cap = 512

    # ------------------------------------------------------------------ API
    def process(self, gray: np.ndarray, depth: np.ndarray, timestamp: float):
        """Track one RGB-D frame. Returns (R, t) world-to-camera or None."""
        self.frame_id += 1
        fd = mframe.build_frame(jnp.asarray(gray), jnp.asarray(depth), self.cfg)
        if self.state == NOT_INITIALIZED:
            ok = self._stereo_initialization(fd, timestamp)
            if ok:
                self.state = OK
            return (self.last.R, self.last.t) if ok else None
        ok = self._track(fd, timestamp)
        if not ok:
            self.n_lost_frames += 1
            if self.state == OK:
                self.state = LOST
        else:
            self.state = OK
            self.n_lost_frames = 0
        return (self.last.R, self.last.t) if self.last else None

    # ------------------------------------------------------ initialization
    def _stereo_initialization(self, fd: FrameData, timestamp: float) -> bool:
        """Tracking::StereoInitialization (Tracking.cc:608-727)."""
        host = HostFrame(fd)
        n_depth = int(((host.kp_depth > 0) & host.kp_valid).sum())
        if n_depth < 300:
            return False
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        kf = self.map.add_keyframe(host, R, t, self.frame_id, timestamp)
        pt_ids = self._create_landmarks_from_depth(
            kf, host, R, t, np.full(host.kp_valid.shape, -1, np.int32),
            close_only=False,
        )
        ln_ids = self._create_lines_from_depth(
            kf, host, R, t, np.full(host.ln_valid.shape, -1, np.int32)
        )
        self.last = LastFrame(host, R, t, pt_ids, ln_ids)
        self.last_kf_id = self.frame_id
        self.last_kf = kf
        self.ref_kf = kf
        self.trajectory.append((timestamp, R.copy(), t.copy()))
        if self.local_mapper is not None:
            self.local_mapper.process_keyframe(kf)
        return True

    # ------------------------------------------------------------- tracking
    def _track(self, fd: FrameData, timestamp: float) -> bool:
        cfg = self.cfg
        cam = cfg.camera
        last = self.last

        # pose guess from constant velocity
        if self.velocity is not None:
            Rv, tv = self.velocity
            Rg, tg = se3.compose(
                jnp.asarray(Rv), jnp.asarray(tv),
                jnp.asarray(last.R), jnp.asarray(last.t),
            )
        else:
            Rg, tg = jnp.asarray(last.R), jnp.asarray(last.t)

        # --- queries from the last frame: map points + temporal depth points
        h = last.fd_host
        n = h.kp_valid.shape[0]
        q_p3d = np.zeros((n, 3), np.float32)
        q_valid = np.zeros(n, bool)
        has_map = last.pt_ids >= 0
        valid_map = has_map & self.map.pt_valid[np.clip(last.pt_ids, 0, None)]
        q_p3d[valid_map] = self.map.pt_pos[last.pt_ids[valid_map]]
        q_valid |= valid_map
        # temporal points: unmatched features with depth (UpdateLastFrame),
        # capped at the closest `temporal_points_cap` so they can never
        # outvote real map points in the pose optimization (Tracking.cc:1136;
        # uncapped temporal points feed pose bias back and diverge tracking)
        temporal = h.kp_valid & (h.kp_depth > 0) & ~valid_map
        cap = cfg.tracking.temporal_points_cap
        if temporal.sum() > cap:
            idxs = np.nonzero(temporal)[0]
            keep = idxs[np.argsort(h.kp_depth[idxs])[:cap]]
            temporal = np.zeros_like(temporal)
            temporal[keep] = True
        if temporal.any():
            pc = _backproject_np(cam, h.kp_xy_un[temporal], h.kp_depth[temporal])
            Rwc = last.R.T
            q_p3d[temporal] = pc @ Rwc.T + (-Rwc @ last.t)
            q_valid |= temporal

        # --- 3D lines of the last frame (map lines or endpoint depths)
        nl = h.ln_valid.shape[0]
        l_ep3d = np.zeros((nl, 2, 3), np.float32)
        l_valid = np.zeros(nl, bool)
        has_lmap = last.ln_ids >= 0
        valid_lmap = has_lmap & self.map.ln_valid[np.clip(last.ln_ids, 0, None)]
        l_ep3d[valid_lmap] = self.map.ln_ep[last.ln_ids[valid_lmap]]
        l_valid |= valid_lmap
        tline = h.ln_valid & (h.ln_depth > 0).all(1) & ~valid_lmap
        lcap = cfg.tracking.temporal_lines_cap
        if tline.sum() > lcap:
            idxs = np.nonzero(tline)[0]
            keep = idxs[np.argsort(h.ln_depth[idxs].max(1))[:lcap]]
            tline = np.zeros_like(tline)
            tline[keep] = True
        if tline.any():
            Rwc = last.R.T
            c = -Rwc @ last.t
            for k in (0, 1):
                pc = _backproject_np(cam, h.ln_ep_un[tline, k], h.ln_depth[tline, k])
                l_ep3d[tline, k] = pc @ Rwc.T + c
            l_valid |= tline

        out = motion_track_step(
            cfg, fd,
            jnp.asarray(q_p3d), jnp.asarray(h.kp_desc),
            jnp.asarray(h.kp_octave), jnp.asarray(h.kp_angle),
            jnp.asarray(q_valid),
            jnp.asarray(l_ep3d), jnp.asarray(h.ln_desc), jnp.asarray(l_valid),
            Rg, tg,
        )
        n_in = int(out.n_inliers)
        self.debug = {
            "queries": int(q_valid.sum()), "motion_matches": int(out.n_pt_matches),
            "motion_inliers": n_in,
        }
        if n_in < 10:
            return False

        # map-point bindings for the current frame from the motion step
        cur_pt_ids = np.full(n, -1, np.int32)
        pt_idx = np.asarray(out.pt_idx)
        pt_in = np.asarray(out.pt_inlier)
        src = valid_map & pt_in
        cur_pt_ids[pt_idx[src]] = last.pt_ids[src]
        cur_ln_ids = np.full(nl, -1, np.int32)
        ln_idx = np.asarray(out.ln_idx)
        ln_in = np.asarray(out.ln_inlier)
        lsrc = valid_lmap & ln_in
        cur_ln_ids[ln_idx[lsrc]] = last.ln_ids[lsrc]

        # ------------------------------------------------- track local map
        R1, t1 = out.R, out.t
        lkfs = self._local_keyframes(cur_pt_ids)
        lp_ids, ll_ids = self._local_landmarks(lkfs)
        host_cur = None
        if len(lp_ids) > 0:
            (lm_arrays, lml_arrays) = self._gather_local_arrays(
                lp_ids, ll_ids, cur_pt_ids, cur_ln_ids, pt_idx, ln_idx)
            lout = local_map_track_step(cfg, fd, *lm_arrays, *lml_arrays, R1, t1)
            n_in = int(lout.n_inliers)
            self.debug.update(
                local_kfs=len(lkfs), local_points=len(lp_ids),
                local_inliers=n_in,
            )
            threshold = cfg.tracking.min_inliers_local_map
            if n_in < threshold:
                return False
            R1, t1 = lout.R, lout.t
            # final bindings: local map matches
            lpt_idx = np.array(lout.pt_idx)
            lpt_in = np.array(lout.pt_inlier)
            okm = lpt_in & (lpt_idx >= 0)
            okm[len(lp_ids):] = False
            sel = np.nonzero(okm)[0]
            cur_pt_ids = np.full(n, -1, np.int32)
            cur_pt_ids[lpt_idx[sel]] = lp_ids[sel]
            # found/visible counters (MapPoint::IncreaseVisible/Found)
            vis = np.asarray(lout.pt_visible)[: len(lp_ids)]
            self.map.pt_visible[lp_ids[vis]] += 1
            self.map.pt_found[lp_ids[sel]] += 1
            lln_idx = np.array(lout.ln_idx)
            lln_in = np.array(lout.ln_inlier)
            okl = lln_in & (lln_idx >= 0)
            okl[len(ll_ids):] = False
            lsel = np.nonzero(okl)[0]
            cur_ln_ids = np.full(nl, -1, np.int32)
            cur_ln_ids[lln_idx[lsel]] = ll_ids[lsel]

        R_np = np.asarray(R1)
        t_np = np.asarray(t1)

        # velocity update (Tracking.cc:476-484)
        Rlw, tlw = se3.inverse(jnp.asarray(last.R), jnp.asarray(last.t))
        Rv, tv = se3.compose(jnp.asarray(R_np), jnp.asarray(t_np), Rlw, tlw)
        self.velocity = (np.asarray(Rv), np.asarray(tv))

        host_cur = HostFrame(fd)
        self.last = LastFrame(host_cur, R_np, t_np, cur_pt_ids, cur_ln_ids)
        self.trajectory.append((timestamp, R_np.copy(), t_np.copy()))

        # ----------------------------------------------------- new keyframe
        if self._need_new_keyframe(host_cur, cur_pt_ids, n_in):
            self._create_new_keyframe(host_cur, R_np, t_np, cur_pt_ids,
                                      cur_ln_ids, timestamp)
        return True

    # ----------------------------------------------------- local map harvest
    def _local_keyframes(self, cur_pt_ids: np.ndarray) -> list[int]:
        """KFs observing current points + covisible neighbors (cap 80)."""
        counts: dict[int, int] = {}
        for pid in cur_pt_ids:
            if pid < 0:
                continue
            for kf in self.map.pt_obs[pid]:
                counts[kf] = counts.get(kf, 0) + 1
        if not counts:
            return [self.ref_kf] if self.ref_kf >= 0 else []
        k1 = sorted(counts, key=counts.get, reverse=True)
        self.ref_kf = k1[0]
        out = list(k1)
        seen = set(out)
        for kf in k1:
            if len(out) >= self.cfg.tracking.local_map_kf_cap:
                break
            for nkf in self.map.covisible_keyframes(kf, 10):
                if nkf not in seen:
                    out.append(nkf)
                    seen.add(nkf)
        return out[: self.cfg.tracking.local_map_kf_cap]

    def _local_landmarks(self, lkfs: list[int]):
        if not lkfs:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        pts = np.unique(self.map.kf_pt_idx[lkfs])
        pts = pts[(pts >= 0) & self.map.pt_valid[np.clip(pts, 0, None)]]
        lns = np.unique(self.map.kf_ln_idx[lkfs])
        lns = lns[(lns >= 0) & self.map.ln_valid[np.clip(lns, 0, None)]]
        return pts[: self._lm_cap].astype(np.int32), lns[: self._ll_cap].astype(np.int32)

    def _gather_local_arrays(self, lp_ids, ll_ids, cur_pt_ids, cur_ln_ids,
                             motion_pt_idx, motion_ln_idx):
        m = self.map
        LM, LL = self._lm_cap, self._ll_cap
        k = len(lp_ids)
        p3d = np.zeros((LM, 3), np.float32)
        desc = np.zeros((LM, 32), np.uint8)
        normal = np.zeros((LM, 3), np.float32)
        mind = np.zeros(LM, np.float32)
        maxd = np.zeros(LM, np.float32)
        valid = np.zeros(LM, bool)
        prefeat = np.full(LM, -1, np.int32)
        p3d[:k] = m.pt_pos[lp_ids]
        desc[:k] = m.pt_desc[lp_ids]
        normal[:k] = m.pt_normal[lp_ids]
        mind[:k] = m.pt_min_dist[lp_ids]
        maxd[:k] = m.pt_max_dist[lp_ids]
        valid[:k] = True
        # pre-matched: current features already bound to these points
        feat_of_pid = {int(pid): i for i, pid in enumerate(cur_pt_ids) if pid >= 0}
        for i, pid in enumerate(lp_ids):
            f = feat_of_pid.get(int(pid))
            if f is not None:
                prefeat[i] = f

        kl = len(ll_ids)
        lep = np.zeros((LL, 2, 3), np.float32)
        ldesc = np.zeros((LL, 32), np.uint8)
        lvalid = np.zeros(LL, bool)
        lpre = np.full(LL, -1, np.int32)
        lep[:kl] = m.ln_ep[ll_ids]
        ldesc[:kl] = m.ln_desc[ll_ids]
        lvalid[:kl] = True
        feat_of_lid = {int(lid): i for i, lid in enumerate(cur_ln_ids) if lid >= 0}
        for i, lid in enumerate(ll_ids):
            f = feat_of_lid.get(int(lid))
            if f is not None:
                lpre[i] = f
        lm_arrays = tuple(map(jnp.asarray, (p3d, desc, normal, mind, maxd, valid, prefeat)))
        lml_arrays = tuple(map(jnp.asarray, (lep, ldesc, lvalid, lpre)))
        return lm_arrays, lml_arrays

    # -------------------------------------------------------- keyframe logic
    def _need_new_keyframe(self, host: HostFrame, cur_pt_ids, n_inliers) -> bool:
        """NeedNewKeyFrame RGB-D branch (Tracking.cc:1423-1557)."""
        cfg = self.cfg.tracking
        close = host.kp_valid & (host.kp_depth > 0) & (host.kp_depth < cfg.th_depth)
        tracked_close = int((close & (cur_pt_ids >= 0)).sum())
        creatable_close = int((close & (cur_pt_ids < 0)).sum())
        need_close = (tracked_close < 100) and (creatable_close > 70)
        # reference matches = ref-KF map points with enough observations
        # (KeyFrame::TrackedMapPoints(nMinObs), nMinObs=2 until 3 KFs exist)
        min_obs = 2 if self.map.n_kf <= 2 else 3
        ref_tracked = 1
        if self.ref_kf >= 0:
            pids = self.map.kf_pt_idx[self.ref_kf]
            pids = pids[pids >= 0]
            cnt = sum(1 for p in pids if len(self.map.pt_obs[p]) >= min_obs)
            # right after initialization every point has a single observation;
            # fall back to obs>=1 so the coverage ratio is still meaningful
            ref_tracked = max(cnt if cnt > 0 else len(pids), 1)
        c1a = self.frame_id >= self.last_kf_id + cfg.max_frames_between_kf
        c1b = self.frame_id >= self.last_kf_id + max(cfg.min_frames_between_kf, 1)
        c1c = (n_inliers < ref_tracked * 0.25) or need_close
        c2 = ((n_inliers < ref_tracked * 0.75) or need_close) and n_inliers > 15
        return bool((c1a or c1b or c1c) and c2)

    def _create_new_keyframe(self, host, R, t, cur_pt_ids, cur_ln_ids, ts):
        """CreateNewKeyFrame (Tracking.cc:1567-1744)."""
        kf = self.map.add_keyframe(host, R, t, self.frame_id, ts)
        # attach existing observations
        for feat, pid in enumerate(cur_pt_ids):
            if pid >= 0 and self.map.pt_valid[pid]:
                self.map.add_point_obs(int(pid), kf, feat)
        for feat, lid in enumerate(cur_ln_ids):
            if lid >= 0 and self.map.ln_valid[lid]:
                self.map.add_line_obs(int(lid), kf, feat)
        new_pt = self._create_landmarks_from_depth(kf, host, R, t, cur_pt_ids,
                                                   close_only=True)
        cur_pt_ids[new_pt >= 0] = new_pt[new_pt >= 0]
        new_ln = self._create_lines_from_depth(kf, host, R, t, cur_ln_ids)
        cur_ln_ids[new_ln >= 0] = new_ln[new_ln >= 0]
        self.last_kf_id = self.frame_id
        self.last_kf = kf
        self.ref_kf = kf
        if self.local_mapper is not None:
            self.local_mapper.on_new_landmarks(kf, new_pt, new_ln)
            self.local_mapper.process_keyframe(kf)
        if self.loop_closer is not None:
            self.loop_closer.process_keyframe(kf)

    def _create_landmarks_from_depth(self, kf, host, R, t, cur_pt_ids,
                                     close_only: bool) -> np.ndarray:
        """New map points from depth, closest-first; close ones always,
        far ones only up to the 100-point floor (Tracking.cc:1630-1700)."""
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
        created = 0
        for feat in order:
            d = float(host.kp_depth[feat])
            if close_only and d > cfg.tracking.th_depth and (
                n_existing + created >= 100
            ):
                break
            pc = _backproject_np(cam, host.kp_xy_un[feat : feat + 1],
                                 host.kp_depth[feat : feat + 1])[0]
            pw = Rwc @ pc + c
            dist = float(np.linalg.norm(pw - c))
            level = int(host.kp_octave[feat])
            max_d = dist * cfg.orb.scale_factor**level
            min_d = max_d / cfg.orb.scale_factor ** (cfg.orb.n_levels - 1)
            normal = (pw - c) / max(dist, 1e-6)
            pid = self.map.add_point(pw, host.kp_desc[feat], normal, min_d,
                                     max_d, kf)
            self.map.add_point_obs(pid, kf, int(feat))
            out[feat] = pid
            created += 1
        return out

    def _create_lines_from_depth(self, kf, host, R, t, cur_ln_ids) -> np.ndarray:
        """New map lines from endpoint depths (Tracking.cc:1700-1735
        semantics: both endpoints must carry depth)."""
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
        for feat in np.nonzero(cand)[0]:
            ep_w = np.zeros((2, 3), np.float32)
            for k in (0, 1):
                pc = _backproject_np(cam, host.ln_ep_un[feat, k : k + 1],
                                     host.ln_depth[feat, k : k + 1])[0]
                ep_w[k] = Rwc @ pc + c
            lid = self.map.add_line(ep_w, host.ln_desc[feat], kf)
            self.map.add_line_obs(lid, kf, int(feat))
            out[feat] = lid
        return out


def _backproject_np(cam, uv: np.ndarray, depth: np.ndarray) -> np.ndarray:
    x = (uv[:, 0] - cam.cx) / cam.fx
    y = (uv[:, 1] - cam.cy) / cam.fy
    return np.stack([x * depth, y * depth, depth], -1).astype(np.float32)
