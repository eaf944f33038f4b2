"""Matrix-free PCG Schur BA (optim.ba_cg) vs the dense solver and vs
ground truth — the global-BA-scale replacement for g2o's sparse solve
(/root/reference/src/Optimizer.cc:60-374)."""

import numpy as np

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from plslam_tpu.optim import ba_cg, local_ba
from tests.test_local_ba import CAM, build_problem, pose_errors


def _run_cg(prob, **kw):
    return ba_cg.bundle_adjust_cg_stepped(CAM, prob, **kw)


def test_cg_matches_dense_solution():
    """Same problem, both solvers: converged poses agree to sub-mm."""
    rng = np.random.default_rng(0)
    prob, poses, pts, _ = build_problem(rng, noise=0.2)
    dense = local_ba.bundle_adjust(CAM, prob)
    cg = _run_cg(prob)
    err_d = pose_errors(dense.cam_R, dense.cam_t, poses)
    err_c = pose_errors(cg.cam_R, cg.cam_t, poses)
    assert err_c.max() < 0.01, f"CG pose err {err_c.max()*100:.2f}cm"
    # both reach the same noise-limited optimum
    assert abs(err_c.mean() - err_d.mean()) < 5e-3
    assert float(cg.cost) <= float(dense.cost) * 1.05


def test_cg_reduces_error_and_classifies_outliers():
    rng = np.random.default_rng(2)
    prob, poses, pts, _ = build_problem(rng, n_lines=2)
    ov = np.array(prob.obs_valid)
    uv = np.array(prob.obs_uv)
    n_out = int(0.1 * len(uv))
    bad = rng.choice(len(uv), n_out, replace=False)
    uv[bad] += rng.uniform(30, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    res = _run_cg(prob)
    inl = np.asarray(res.obs_inlier)
    bad_valid = bad[ov[bad]]
    assert (~inl[bad_valid]).mean() > 0.95
    assert pose_errors(res.cam_R, res.cam_t, poses).max() < 0.01


def test_cg_line_endpoints_improve():
    rng = np.random.default_rng(1)
    prob, poses, pts, (ls, le) = build_problem(rng, n_pts=100, n_lines=40)
    res = _run_cg(prob)

    def line_dist(ep, s, e):
        d = e - s
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        for k in (0, 1):
            v = ep[:, k] - s
            perp = v - (v * d).sum(1, keepdims=True) * d
            yield np.linalg.norm(perp, axis=1)

    d0 = np.concatenate(list(line_dist(np.asarray(prob.ln_ep), ls, le)))
    d1 = np.concatenate(list(line_dist(np.asarray(res.ln_ep), ls, le)))
    assert np.median(d1) < 0.7 * np.median(d0)


def test_cg_fixed_camera_untouched():
    rng = np.random.default_rng(3)
    prob, poses, _, _ = build_problem(rng, n_lines=2)
    res = _run_cg(prob)
    np.testing.assert_allclose(
        np.asarray(res.cam_R[0]), np.asarray(prob.cam_R[0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.cam_t[0]), np.asarray(prob.cam_t[0]), atol=1e-6)


def test_cg_large_camera_count():
    """C=96 (beyond comfortable dense-Schur territory on a memory budget):
    CG must still converge. Cameras densely sample a short arc so every
    view keeps the cloud in frame (build_problem's 0.1 rad/camera spacing
    would wrap the full circle at this count)."""
    from plslam_tpu.geometry import se3
    from plslam_tpu.geometry.projection import project

    rng = np.random.default_rng(5)
    n_cams, n_pts = 96, 400
    poses = []
    for i in range(n_cams):
        ang = 0.8 * (i / n_cams - 0.5)
        Rwc = np.asarray(se3.so3_exp(jnp.asarray([0.0, ang, 0.0],
                                                 jnp.float32)))
        c = np.array([1.5 * np.sin(ang), 0.01 * i, -0.5 * np.cos(ang)],
                     np.float32)
        R = Rwc.T
        poses.append((R, -R @ c))
    pts = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0],
                      (n_pts, 3)).astype(np.float32)
    O = n_cams * n_pts
    prob = local_ba.make_problem(n_cams, n_pts, O)
    oc, op, ouv, our, oval = [], [], [], [], []
    for ci, (R, t) in enumerate(poses):
        pc = pts @ R.T + t
        uv = np.array(project(CAM, jnp.asarray(pc)))
        ok = (pc[:, 2] > 0.3) & (uv[:, 0] > 10) & (uv[:, 0] < 630) & \
             (uv[:, 1] > 10) & (uv[:, 1] < 470)
        uv = uv + rng.normal(0, 0.2, uv.shape)
        ur = uv[:, 0] - CAM.bf / pc[:, 2] + rng.normal(0, 0.2, n_pts)
        oc += [ci] * n_pts
        op += list(range(n_pts))
        ouv += list(uv)
        our += list(ur)
        oval += list(ok)
    cam_R = np.zeros((n_cams, 3, 3), np.float32)
    cam_t = np.zeros((n_cams, 3), np.float32)
    for i, (R, t) in enumerate(poses):
        if i == 0:
            cam_R[i], cam_t[i] = R, t
        else:
            xi = rng.standard_normal(6).astype(np.float32) * 0.01
            Rn, tn = se3.left_update(jnp.asarray(xi), jnp.asarray(R),
                                     jnp.asarray(t))
            cam_R[i], cam_t[i] = np.asarray(Rn), np.asarray(tn)
    prob = prob._replace(
        cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
        cam_fixed=jnp.asarray(np.arange(n_cams) == 0),
        cam_valid=jnp.ones(n_cams, bool),
        pt_xyz=jnp.asarray(
            pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)),
        pt_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(oc, jnp.int32), obs_pt=jnp.asarray(op, jnp.int32),
        obs_uv=jnp.asarray(np.array(ouv), jnp.float32),
        obs_ur=jnp.asarray(np.array(our), jnp.float32),
        obs_valid=jnp.asarray(oval),
    )
    err0 = pose_errors(prob.cam_R, prob.cam_t, poses)
    res = _run_cg(prob, iters1=5, iters2=10, cg_iters=64)
    err1 = pose_errors(res.cam_R, res.cam_t, poses)
    assert err1.mean() < 0.3 * err0.mean(), f"{err0.mean()} -> {err1.mean()}"
    assert err1.max() < 0.02
