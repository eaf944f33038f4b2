"""Epipolar triangulation (LocalMapping::CreateNewMapPoints parity)."""

import jax.numpy as jnp
import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models import triangulation
from plslam_tpu.models.frame import FrameData
from plslam_tpu.models.map import HostFrame, SlamMap

CFG = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                               bf=40.0))


def _project(R, t, pw):
    cam = CFG.camera
    pc = pw @ R.T + t
    return np.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                     cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1), pc[:, 2]


def _frame_arrays(uv, desc):
    n = CFG.orb.max_keypoints
    nl = CFG.lines.max_lines
    z = np.zeros
    kp_xy = z((n, 2), np.float32)
    kp_desc = z((n, 32), np.uint8)
    kp_valid = z(n, bool)
    k = len(uv)
    kp_xy[:k] = uv
    kp_desc[:k] = desc
    kp_valid[:k] = True
    return FrameData(
        kp_xy=kp_xy, kp_xy_un=kp_xy, kp_resp=z(n, np.float32),
        kp_octave=z(n, np.int32), kp_angle=z(n, np.float32),
        kp_desc=kp_desc, kp_depth=z(n, np.float32),  # no depth anywhere
        kp_ur=np.full(n, -1, np.float32), kp_valid=kp_valid,
        ln_ep=z((nl, 2, 2), np.float32), ln_ep_un=z((nl, 2, 2), np.float32),
        ln_angle=z(nl, np.float32), ln_length=z(nl, np.float32),
        ln_coeff=z((nl, 3), np.float32), ln_desc=z((nl, 72), np.uint8),
        ln_depth=z((nl, 2), np.float32), ln_valid=z(nl, bool),
    )


def test_triangulates_far_points():
    rng = np.random.default_rng(0)
    n_pts = 60
    pw = rng.uniform([-3, -2, 8.0], [3, 2, 14.0], (n_pts, 3)).astype(
        np.float32)  # beyond any RGB-D range
    desc = rng.integers(0, 256, (n_pts, 32), np.uint8)

    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    R2 = np.eye(3, dtype=np.float32)
    t2 = np.array([-0.8, 0.0, 0.0], np.float32)  # wide baseline

    uv1, z1 = _project(R1, t1, pw)
    uv2, z2 = _project(R2, t2, pw)
    vis = (uv1[:, 0] > 0) & (uv1[:, 0] < 640) & (uv2[:, 0] > 0) & \
        (uv2[:, 0] < 640) & (uv1[:, 1] > 0) & (uv1[:, 1] < 480)
    pw, uv1, uv2, desc = pw[vis], uv1[vis], uv2[vis], desc[vis]

    m = SlamMap(CFG)
    fd1 = _frame_arrays(uv1.astype(np.float32), desc)
    fd2 = _frame_arrays(uv2.astype(np.float32), desc)
    kf1 = m.add_keyframe(HostFrame(fd1), R1, t1, 0, 0.0)
    kf2 = m.add_keyframe(HostFrame(fd2), R2, t2, 1, 1.0)
    # covisibility needs shared points: seed one dummy shared landmark
    pid = m.add_point([0, 0, 10.0], np.zeros(32, np.uint8), [0, 0, 1],
                      0.1, 50.0, kf1)
    for i in range(20):
        m.add_point_obs(pid, kf1, CFG.orb.max_keypoints - 1 - i)
    m.add_point_obs(pid, kf2, CFG.orb.max_keypoints - 1)

    tri = triangulation.Triangulator(CFG, m)
    created = tri.create_new_points(kf2)
    assert created >= 0.8 * len(pw)

    # positions must match ground truth
    err = []
    for f in range(len(pw)):
        p2 = m.kf_pt_idx[kf2, f]
        if p2 >= 0 and m.pt_valid[p2]:
            err.append(np.linalg.norm(m.pt_pos[p2] - pw[f]))
    assert len(err) >= 0.8 * len(pw)
    assert np.median(err) < 0.02


def test_no_candidates_is_cheap_noop():
    m = SlamMap(CFG)
    rng = np.random.default_rng(1)
    fd = _frame_arrays(rng.uniform(0, 600, (10, 2)).astype(np.float32),
                       rng.integers(0, 256, (10, 32), np.uint8))
    # give every feature depth -> no triangulation candidates
    fd = fd._replace(kp_depth=np.full(CFG.orb.max_keypoints, 2.0, np.float32))
    kf = m.add_keyframe(HostFrame(fd), np.eye(3, dtype=np.float32),
                        np.zeros(3, np.float32), 0, 0.0)
    tri = triangulation.Triangulator(CFG, m)
    assert tri.create_new_points(kf) == 0


def test_triangulates_lines():
    """Two keyframes with matched 2D lines triangulate correct 3D
    endpoints (CreateNewMapLines parity)."""
    rng = np.random.default_rng(2)
    cam = CFG.camera
    n_ln = 12
    # random 3D segments in front of both cameras
    mid = rng.uniform([-1.5, -1, 4.0], [1.5, 1, 7.0], (n_ln, 3))
    d = rng.normal(size=(n_ln, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ep = np.stack([mid - 0.4 * d, mid + 0.4 * d], 1).astype(np.float32)

    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    R2 = np.eye(3, dtype=np.float32)
    t2 = np.array([-0.6, 0.05, 0.0], np.float32)

    def proj(R, t, p):
        pc = p @ R.T + t
        return np.stack([cam.fx * pc[..., 0] / pc[..., 2] + cam.cx,
                         cam.fy * pc[..., 1] / pc[..., 2] + cam.cy], -1)

    from plslam_tpu.geometry.lines import line_equation_2d
    import jax.numpy as jnp

    NL = CFG.lines.max_lines
    descs = rng.integers(0, 128, (n_ln, 72), np.uint8)

    def frame(R, t):
        uv = proj(R, t, ep).astype(np.float32)          # (n_ln, 2, 2)
        z = np.zeros
        ln_ep = z((NL, 2, 2), np.float32)
        ln_desc = z((NL, 72), np.uint8)
        ln_valid = z(NL, bool)
        ln_angle = z(NL, np.float32)
        ln_ep[:n_ln] = uv
        ln_desc[:n_ln] = descs
        ln_valid[:n_ln] = True
        dxy = uv[:, 1] - uv[:, 0]
        ln_angle[:n_ln] = np.arctan2(dxy[:, 1], dxy[:, 0])
        coeff = np.asarray(line_equation_2d(jnp.asarray(ln_ep[:, 0]),
                                            jnp.asarray(ln_ep[:, 1])))
        n = CFG.orb.max_keypoints
        return FrameData(
            kp_xy=z((n, 2), np.float32), kp_xy_un=z((n, 2), np.float32),
            kp_resp=z(n, np.float32), kp_octave=z(n, np.int32),
            kp_angle=z(n, np.float32), kp_desc=z((n, 32), np.uint8),
            kp_depth=z(n, np.float32), kp_ur=z(n, np.float32),
            kp_valid=z(n, bool),
            ln_ep=ln_ep, ln_ep_un=ln_ep, ln_angle=ln_angle,
            ln_length=z(NL, np.float32),
            ln_coeff=coeff.astype(np.float32), ln_desc=ln_desc,
            ln_depth=z((NL, 2), np.float32), ln_valid=ln_valid,
        )

    m = SlamMap(CFG)
    f1 = frame(R1, t1)
    f2 = frame(R2, t2)
    kf1 = m.add_keyframe(HostFrame(f1), R1, t1, 0, 0.0)
    kf2 = m.add_keyframe(HostFrame(f2), R2, t2, 1, 1.0)
    # shared map points for covisibility + median depth
    for i in range(25):
        pid = m.add_point(mid[i % n_ln], np.zeros(32, np.uint8), [0, 0, 1],
                          0.1, 50.0, kf1)
        m.add_point_obs(pid, kf1, i)
        m.add_point_obs(pid, kf2, i)

    from plslam_tpu.models.triangulation import create_new_lines

    created = create_new_lines(CFG, m, kf2)
    assert created >= 0.6 * n_ln
    errs = []
    for f in range(n_ln):
        lid = m.kf_ln_idx[kf2, f]
        if lid >= 0 and m.ln_valid[lid]:
            errs.append(np.linalg.norm(m.ln_ep[lid] - ep[f], axis=-1).max())
    assert len(errs) >= 0.6 * n_ln
    assert np.median(errs) < 0.05
