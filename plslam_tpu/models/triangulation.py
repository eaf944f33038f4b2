"""Epipolar triangulation of new map points between keyframe pairs.

Re-design of ``LocalMapping::CreateNewMapPoints`` (/root/reference/src/
LocalMapping.cc:346-667): for the new keyframe and each of its best
covisible neighbors, match features that still lack a landmark under an
epipolar gate (the reference's SearchForTriangulation + CheckDistEpipolarLine,
ORBmatcher.cc:884-1100), DLT-triangulate every match in one vmapped SVD
batch, and keep the ones that pass the reference's acceptance ladder
(parallax, cheirality in both views, reprojection chi2 in both views,
scale-distance band — :558-650).

RGB-D note: depth-seeded creation (models.tracking) covers everything the
sensor reaches; this pass adds the points BEYOND the depth range (the
reference gates on the triangulated-vs-depth choice the same way), so
candidates are features with no valid depth.

TPU shape: the whole neighbor pass is a single jitted program per pair —
dense Hamming matching gated by the fundamental-matrix distance, then a
(N, 4, 4) batched SVD; the reference's per-feature BoW-bucket loops and
sequential cv::SVDecomp calls become two MXU/VPU batches.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import matching

EPI_CHI2 = 3.84     # 1-dof epipolar distance gate (ORBmatcher.cc:1022)
REPROJ_CHI2 = 5.991  # 2-dof reprojection gate (LocalMapping.cc:594,612)
MIN_PARALLAX_COS = 0.9998  # LocalMapping.cc:523


def _kmat(cam):
    return jnp.array([[cam.fx, 0.0, cam.cx],
                      [0.0, cam.fy, cam.cy],
                      [0.0, 0.0, 1.0]], jnp.float32)


def fundamental_from_poses(cam, R1, t1, R2, t2):
    """F12 with x2^T F12 x1 = 0 (pixel coords), cameras world->cam.
    (LocalMapping::ComputeF12, LocalMapping.cc:1106-1126.)"""
    R21 = R2 @ R1.T
    t21 = t2 - R21 @ t1
    tx = jnp.array([[0.0, -t21[2], t21[1]],
                    [t21[2], 0.0, -t21[0]],
                    [-t21[1], t21[0], 0.0]], jnp.float32)
    K = _kmat(cam)
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ tx @ R21 @ Kinv


@functools.partial(jax.jit, static_argnames=("cfg",))
def triangulate_pair_step(
    cfg: SlamConfig,
    # keyframe 1 (the new KF)
    xy1, oct1, desc1, cand1,      # cand: valid & no-depth & unbound
    R1, t1,
    # keyframe 2 (a covisible neighbor)
    xy2, oct2, desc2, cand2,
    R2, t2,
):
    """Match + triangulate one KF pair. Returns (pw (N,3), idx2 (N,),
    ok (N,)) indexed by KF1 features."""
    cam = cfg.camera
    scale = cfg.orb.scale_factor

    # --- epipolar gate in pixel space -----------------------------------
    F12 = fundamental_from_poses(cam, R1, t1, R2, t2)
    h1 = jnp.concatenate([xy1, jnp.ones((xy1.shape[0], 1))], -1)  # (N,3)
    h2 = jnp.concatenate([xy2, jnp.ones((xy2.shape[0], 1))], -1)
    lines2 = h1 @ F12.T            # (N,3) epipolar line of each kp1 in img2
    num = lines2 @ h2.T            # (N,M) signed distances * norm
    den = lines2[:, 0:1] ** 2 + lines2[:, 1:2] ** 2
    dsq = num * num / jnp.maximum(den, 1e-9)
    sigma2_2 = scale ** (2.0 * oct2.astype(jnp.float32))
    epi_ok = dsq <= EPI_CHI2 * sigma2_2[None, :]

    gate = epi_ok & cand1[:, None] & cand2[None, :] \
        & matching.octave_gate(oct1, oct2, -1, 1)
    m = matching.match_descriptors(desc1, desc2, gate, 50, dedupe=True)
    idx2 = jnp.clip(m.idx, 0, xy2.shape[0] - 1)

    # --- batched DLT ------------------------------------------------------
    K = _kmat(cam)
    P1 = K @ jnp.concatenate([R1, t1[:, None]], -1)   # (3,4)
    P2 = K @ jnp.concatenate([R2, t2[:, None]], -1)
    uv1 = xy1
    uv2 = xy2[idx2]

    A = jnp.stack([
        uv1[:, 0:1] * P1[2] - P1[0],
        uv1[:, 1:2] * P1[2] - P1[1],
        uv2[:, 0:1] * P2[2] - P2[0],
        uv2[:, 1:2] * P2[2] - P2[1],
    ], axis=1)                                        # (N,4,4)
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[:, 3, :]                                  # (N,4)
    w = Xh[:, 3]
    pw = Xh[:, :3] / jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)[:, None]

    # --- acceptance ladder -----------------------------------------------
    c1 = -(R1.T @ t1)
    c2 = -(R2.T @ t2)
    r1 = pw - c1
    r2 = pw - c2
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(d1 * d2, 1e-9)

    def reproj_chi2(R, t, uv, octv):
        pc = pw @ R.T + t
        z = jnp.where(jnp.abs(pc[:, 2]) > 1e-6, pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        err = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        inv_s2 = (1.0 / scale ** 2) ** octv.astype(jnp.float32)
        return err * inv_s2, pc[:, 2]

    chi_1, z1 = reproj_chi2(R1, t1, uv1, oct1)
    chi_2, z2 = reproj_chi2(R2, t2, uv2, oct2[idx2])

    # scale-consistency band (LocalMapping.cc:637-650)
    ratio = d1 / jnp.maximum(d2, 1e-9)
    s1 = scale ** oct1.astype(jnp.float32)
    s2 = scale ** oct2[idx2].astype(jnp.float32)
    ratio_oct = s1 / s2
    rf = scale * 1.5
    scale_ok = (ratio < ratio_oct * rf) & (ratio > ratio_oct / rf)

    ok = (m.ok & (cos_par < MIN_PARALLAX_COS) & (cos_par > 0)
          & (z1 > 0.05) & (z2 > 0.05)
          & (chi_1 <= REPROJ_CHI2) & (chi_2 <= REPROJ_CHI2) & scale_ok)
    return pw, idx2, ok


class Triangulator:
    """Host driver over the new KF's covisible neighborhood."""

    def __init__(self, cfg: SlamConfig, slam_map):
        self.cfg = cfg
        self.map = slam_map

    def create_new_points(self, kf: int, mapper=None, lock=None) -> int:
        """Triangulate beyond-depth-range points for a new keyframe against
        its best covisible neighbors. Returns the number created.
        ``lock`` (the mapper's map lock) is held only around snapshotting
        and map mutation — never across the device round trips."""
        m = self.map
        lock = lock or contextlib.nullcontext()
        with lock:
            neighbors = m.covisible_keyframes(
                kf, self.cfg.mapping.triangulation_neighbors)
            if not neighbors:
                return 0
            host1 = m.kf_frames[kf]
            row1 = m.kf_pt_idx[kf]
            cand1_np = (host1.kp_valid & ~(host1.kp_depth > 0) & (row1 < 0))
            if not cand1_np.any():
                return 0
        fd1 = m.device_frame(kf)
        created = 0
        for okf in neighbors:
            if created >= 256:
                break
            fd2 = m.device_frame(okf)
            host2 = m.kf_frames[okf]
            cand2_np = (host2.kp_valid & (m.kf_pt_idx[okf] < 0))
            if not cand2_np.any():
                continue
            pw, idx2, ok = triangulate_pair_step(
                self.cfg,
                fd1.kp_xy_un, fd1.kp_octave, fd1.kp_desc,
                jnp.asarray(cand1_np),
                jnp.asarray(m.kf_R[kf]), jnp.asarray(m.kf_t[kf]),
                fd2.kp_xy_un, fd2.kp_octave, fd2.kp_desc,
                jnp.asarray(cand2_np),
                jnp.asarray(m.kf_R[okf]), jnp.asarray(m.kf_t[okf]),
            )
            pw, idx2, ok = jax.device_get((pw, idx2, ok))
            feats = np.nonzero(ok)[0]
            if len(feats) == 0:
                continue
            c1 = m.kf_camera_center(kf)
            new_feats = []
            new_pids = []
            apply_lock = lock
            apply_lock.__enter__()
            for f in feats:
                if m.kf_pt_idx[kf, f] >= 0:
                    continue  # a previous neighbor already bound it
                f2 = int(idx2[f])
                if m.kf_pt_idx[okf, f2] >= 0:
                    continue
                p = pw[f]
                dist = float(np.linalg.norm(p - c1))
                level = int(host1.kp_octave[f])
                max_d = dist * self.cfg.orb.scale_factor ** level
                min_d = max_d / self.cfg.orb.scale_factor ** (
                    self.cfg.orb.n_levels - 1)
                normal = (p - c1) / max(dist, 1e-6)
                pid = m.add_point(p, None, normal, min_d, max_d, kf)
                m.add_point_obs(pid, kf, int(f))
                m.add_point_obs(pid, okf, f2)
                new_feats.append(int(f))
                new_pids.append(pid)
                cand1_np[f] = False
                created += 1
            apply_lock.__exit__(None, None, None)
            if new_pids:
                m.scatter_point_descs_from(
                    fd1.kp_desc, np.array(new_feats, np.int32),
                    np.array(new_pids, np.int32))
                if mapper is not None:
                    mapper.on_new_landmarks(
                        kf, np.array(new_pids, np.int32),
                        np.zeros(0, np.int32))
        return created


# LBD gate for triangulation matching, normalized squared-L2 over the
# quantized 72-dim descriptor (the reference's SearchForTriangulation uses
# a MAD-adaptive Hamming threshold, KeyFrame.cc:773-798; a fixed gate on
# the well-separated float descriptor fills the same role)
LINE_DESC_TH = 0.6
LINE_ANGLE_TH = 15.0 * np.pi / 180.0


@functools.partial(jax.jit, static_argnames=("cfg",))
def triangulate_lines_pair_step(
    cfg: SlamConfig,
    # keyframe 1 (the new KF): lines
    ep1, coeff1, angle1, desc1, cand1,
    R1, t1,
    # keyframe 2: lines
    ep2, coeff2, angle2, desc2, cand2,
    R2, t2,
    median_depth2,
):
    """CreateNewMapLines (LocalMapping.cc:668-916) for one KF pair: match
    lines (LBD + angle gate), then triangulate EACH endpoint of line1 from
    the two back-projected line planes (coeff^T K [R|t]) plus the
    endpoint's own ray rows — the reference's two sequential 4x4
    cv::SVD::compute calls become one (NL, 2, 4, 4) batch. Acceptance:
    scene-median-depth ratios and cheirality in both views (:816-900)."""
    cam = cfg.camera

    # --- match (desc + angle) -------------------------------------------
    from ..ops import lbd as lbd_mod

    # flip-invariant quantized L2, scaled into the shared matcher's range
    dist = lbd_mod.lbd_distance_matrix(desc1, desc2) // 256
    th = int(lbd_mod.quantize_distance_threshold(LINE_DESC_TH) // 256)
    da = jnp.abs(angle1[:, None] - angle2[None, :])
    da = jnp.minimum(da, jnp.pi - da)
    gate = (cand1[:, None] & cand2[None, :] & (da < LINE_ANGLE_TH))
    m = matching.best_matches(dist, gate, max_dist=th, nn_ratio=0.9)
    m = matching.dedupe_targets(m, ep2.shape[0])
    idx2 = jnp.clip(m.idx, 0, ep2.shape[0] - 1)

    K = _kmat(cam)
    M1 = K @ jnp.concatenate([R1, t1[:, None]], -1)   # (3,4)
    M2 = K @ jnp.concatenate([R2, t2[:, None]], -1)
    row_l1 = coeff1 @ M1                               # (NL, 4)
    row_l2 = coeff2[idx2] @ M2                         # (NL, 4)

    def endpoint_rows(uv):
        # normalized ray rows for an endpoint observed in KF1
        x = (uv[:, 0] - cam.cx) / cam.fx
        y = (uv[:, 1] - cam.cy) / cam.fy
        Tcw1 = jnp.concatenate([R1, t1[:, None]], -1)  # (3,4)
        r0 = x[:, None] * Tcw1[2] - Tcw1[0]
        r1 = y[:, None] * Tcw1[2] - Tcw1[1]
        return r0, r1

    pts = []
    for k in (0, 1):
        r0, r1 = endpoint_rows(ep1[:, k])
        A = jnp.stack([row_l1, row_l2, r0, r1], axis=1)  # (NL, 4, 4)
        _, _, vt = jnp.linalg.svd(A)
        Xh = vt[:, 3, :]
        w = Xh[:, 3]
        pts.append(Xh[:, :3] / jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)[:, None])
    s3d, e3d = pts

    c1 = -(R1.T @ t1)
    c2 = -(R2.T @ t2)
    md = jnp.maximum(median_depth2, 1e-6)
    ratio1 = jnp.linalg.norm(s3d - c1, axis=-1) / md
    ratio2 = jnp.linalg.norm(s3d - c2, axis=-1) / md
    ratio3 = jnp.linalg.norm(e3d - s3d, axis=-1) / md

    def z_in(R, t, p):
        return p @ R[2] + t[2]

    ok = (m.ok
          & (ratio1 >= 0.3) & (ratio2 >= 0.3) & (ratio3 <= 1.0)
          & (z_in(R1, t1, s3d) > 0) & (z_in(R2, t2, s3d) > 0)
          & (z_in(R1, t1, e3d) > 0) & (z_in(R2, t2, e3d) > 0))
    ep_w = jnp.stack([s3d, e3d], axis=1)               # (NL, 2, 3)
    return ep_w, idx2, ok


def scene_median_depth(m, kf: int) -> float:
    """KeyFrame::ComputeSceneMedianDepth(2): median z (in the keyframe's
    camera frame) of its observed map points."""
    pids = m.kf_pt_idx[kf]
    pids = pids[pids >= 0]
    pids = pids[m.pt_valid[pids]]
    if len(pids) == 0:
        return 0.0
    z = m.pt_pos[pids] @ m.kf_R[kf][2] + m.kf_t[kf][2]
    return float(np.median(z))


def create_new_lines(cfg, m, kf: int, mapper=None, lock=None) -> int:
    """CreateNewMapLines host driver: triangulate unbound lines of the new
    keyframe against its covisible neighbors (LocalMapping.cc:668-916).
    Baseline gate: skip neighbors closer than ~1% of scene depth. ``lock``
    is held only around snapshots and mutation, not device round trips."""
    import contextlib as _ctx

    lock = lock or _ctx.nullcontext()
    with lock:
        neighbors = m.covisible_keyframes(
            kf, cfg.mapping.triangulation_neighbors)
        if not neighbors:
            return 0
        host1 = m.kf_frames[kf]
        if host1 is None or not host1.ln_valid.any():
            return 0
        cand1_np = host1.ln_valid & (m.kf_ln_idx[kf] < 0)
        if not cand1_np.any():
            return 0
    fd1 = m.device_frame(kf)
    c1 = m.kf_camera_center(kf)
    created = 0
    for okf in neighbors:
        if created >= 64:
            break
        host2 = m.kf_frames[okf]
        if host2 is None or not host2.ln_valid.any():
            continue
        md2 = scene_median_depth(m, okf)
        baseline = float(np.linalg.norm(m.kf_camera_center(okf) - c1))
        if md2 <= 0 or baseline / md2 < 0.01:
            continue
        fd2 = m.device_frame(okf)
        cand2_np = host2.ln_valid & (m.kf_ln_idx[okf] < 0)
        if not cand2_np.any():
            continue
        ep_w, idx2, ok = triangulate_lines_pair_step(
            cfg,
            fd1.ln_ep_un, fd1.ln_coeff, fd1.ln_angle, fd1.ln_desc,
            jnp.asarray(cand1_np),
            jnp.asarray(m.kf_R[kf]), jnp.asarray(m.kf_t[kf]),
            fd2.ln_ep_un, fd2.ln_coeff, fd2.ln_angle, fd2.ln_desc,
            jnp.asarray(cand2_np),
            jnp.asarray(m.kf_R[okf]), jnp.asarray(m.kf_t[okf]),
            jnp.float32(md2),
        )
        ep_w, idx2, ok = jax.device_get((ep_w, idx2, ok))
        feats = np.nonzero(ok)[0]
        if len(feats) == 0:
            continue
        new_feats, new_lids = [], []
        lock.__enter__()
        for f in feats:
            if m.kf_ln_idx[kf, f] >= 0:
                continue
            f2 = int(idx2[f])
            if m.kf_ln_idx[okf, f2] >= 0:
                continue
            lid = m.add_line(ep_w[f], None, kf)
            m.add_line_obs(lid, kf, int(f))
            m.add_line_obs(lid, okf, f2)
            new_feats.append(int(f))
            new_lids.append(lid)
            cand1_np[f] = False
            created += 1
        lock.__exit__(None, None, None)
        if new_lids:
            m.scatter_line_descs_from(fd1.ln_desc,
                                      np.array(new_feats, np.int32),
                                      np.array(new_lids, np.int32))
            if mapper is not None:
                mapper.on_new_landmarks(kf, np.zeros(0, np.int32),
                                        np.array(new_lids, np.int32))
    return created
