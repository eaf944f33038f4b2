"""Relocalization: recover the pose after tracking loss.

Reference protocol (Tracking::Relocalization, /root/reference/src/
Tracking.cc:2049-2269): BoW candidates from the keyframe database →
per-candidate descriptor matching against the keyframe's map points →
EPnP RANSAC → pose optimization → projection rescue. TPU re-design: the
candidate matching is one dense ratio-test Hamming batch, and — since
RGB-D gives every current keypoint a 3D position — the minimal solver is a
vmapped 3-point Kabsch RANSAC (optim.horn) on 3D-3D pairs, strictly better
conditioned than EPnP's 3D-2D. The final acceptance (inliers >= 50 after
LM refinement) matches the reference (:2240-2260).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import projection as gproj
from ..ops import matching
from ..optim import epnp, horn, pose as pose_opt
from .frame import FrameData

RELOC_ACCEPT_INLIERS = 50


@functools.partial(jax.jit, static_argnames=("cfg",))
def reloc_candidate_step(
    cfg: SlamConfig,
    fd: FrameData,
    kf_desc: jax.Array,    # (N, 32) candidate KF descriptors
    kf_angle: jax.Array,   # (N,) candidate KF keypoint angles (degrees)
    kf_has_pt: jax.Array,  # (N,) feature has a valid map point
    kf_pt_w: jax.Array,    # (N, 3) world position of that map point
    key: jax.Array,
):
    """Match current frame against one candidate KF, Horn-RANSAC + pose LM.

    Returns (R, t, per-feature matched kf-feature idx, inlier mask,
    n_inliers)."""
    cam = cfg.camera
    # dense ratio-test matching over ALL valid current features — depthless
    # ones still vote through the EPnP branch (the reference's solver is
    # 3D-2D EPnP throughout, Tracking.cc:2105-2131). Rotation-consistency
    # histogram on: the reference's reloc SearchByBoW runs with
    # mbCheckOrientation (ORBmatcher.cc:247-421 via Tracking.cc:2090).
    gate = fd.kp_valid[:, None] & kf_has_pt[None, :]
    m = matching.match_descriptors(
        fd.kp_desc, kf_desc, gate, 100,
        nn_ratio=cfg.matcher.nn_ratio_reloc,
        angle_q=fd.kp_angle, angle_t=kf_angle, dedupe=True,
    )
    ok = m.ok
    tgt = jnp.clip(m.idx, 0, kf_desc.shape[0] - 1)

    src_cam = gproj.backproject(cam, fd.kp_xy_un, fd.kp_depth)  # (N,3) cur cam
    dst_w = kf_pt_w[tgt]                                        # (N,3) world
    ok_d = ok & (fd.kp_depth > 0)
    s, R_wc, t_wc, inl, n_inl = horn.ransac_align(
        src_cam, dst_w, ok_d, key, thresh=0.07, n_hyp=256, with_scale=False
    )
    # camera pose: x_c = R x_w + t with R = R_wc^T, t = -R_wc^T t_wc
    R0 = R_wc.T
    t0 = -(R_wc.T @ t_wc)
    # EPnP fallback: when the depth-paired matches starve the 3D-3D solver
    # (shallow scenes, depth dropouts), solve 3D-2D over every match
    k2 = jax.random.fold_in(key, 1)
    R_e, t_e, _, n_e = epnp.ransac_epnp(cam, dst_w, fd.kp_xy_un, ok, k2)
    use_epnp = n_inl < 12
    R0 = jnp.where(use_epnp, R_e, R0)
    t0 = jnp.where(use_epnp, t_e, t0)

    # LM refinement on the matched 3D-2D observations
    obs = pose_opt.make_pose_obs(fd.kp_xy_un.shape[0], 1)
    obs = obs._replace(
        p3d=dst_w,
        uv=fd.kp_xy_un,
        u_right=jnp.where(ok, fd.kp_ur, -1.0),
        inv_sigma2=(1.0 / cfg.orb.scale_factor**2) ** fd.kp_octave.astype(jnp.float32),
        valid=ok,
    )
    res = pose_opt.optimize_pose(cam, R0, t0, obs)
    return res.R, res.t, m.idx, ok & res.inlier_pts, res.n_inliers


def try_relocalize(tracker, fd: FrameData):
    """Host driver: query the database, try candidates, accept per the
    reference's inlier bar. Returns (R, t, cur_pt_ids) or None."""
    if tracker.kfdb is None or tracker.voc is None:
        return None
    words, bow = tracker.voc.transform(fd.kp_desc, fd.kp_valid)
    cands = tracker.kfdb.detect_reloc_candidates(np.asarray(bow), tracker.map)
    if not cands:
        return None
    m = tracker.map
    key = jax.random.PRNGKey(tracker.frame_id)
    for ci, kf in enumerate(cands[:5]):
        host = m.kf_frames[kf]
        pids = m.kf_pt_idx[kf]
        has = (pids >= 0) & m.pt_valid[np.clip(pids, 0, None)] & host.kp_valid
        ptw = np.zeros((len(pids), 3), np.float32)
        ptw[has] = m.pt_pos[pids[has]]
        dkf = m.device_frame(kf)  # descriptors/angles stay in HBM
        R, t, idx, inl, n = reloc_candidate_step(
            tracker.cfg, fd,
            dkf.kp_desc, dkf.kp_angle,
            jnp.asarray(has), jnp.asarray(ptw),
            jax.random.fold_in(key, ci),
        )
        n = int(n)
        if n >= RELOC_ACCEPT_INLIERS:
            idx = np.asarray(idx)
            inl = np.asarray(inl)
            cur_pt_ids = np.full(len(pids), -1, np.int32)
            sel = np.nonzero(inl)[0]
            cur_pt_ids[sel] = pids[idx[sel]]
            return np.asarray(R), np.asarray(t), cur_pt_ids
    return None
