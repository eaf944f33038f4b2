import jax.numpy as jnp
import numpy as np

from plslam_tpu.geometry import se3
from plslam_tpu.geometry.projection import Camera, project
from plslam_tpu.optim import local_ba

CAM = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, bf=40.0)


def build_problem(rng, n_cams=8, n_pts=300, n_lines=24, noise=0.4,
                  pose_pert=0.02, pt_pert=0.02, obs_per_pt=None):
    """Cameras on an arc looking at a point/line cloud; GT obs + noise;
    perturbed initial values."""
    # GT poses
    poses = []
    for i in range(n_cams):
        ang = 0.1 * (i - n_cams / 2)
        Rwc = np.asarray(se3.so3_exp(jnp.asarray([0.0, ang, 0.0], jnp.float32)))
        c = np.array([1.5 * np.sin(ang), 0.1 * i, -0.5 * np.cos(ang)], np.float32)
        R = Rwc.T
        t = -R @ c
        poses.append((R, t))
    pts = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n_pts, 3)).astype(np.float32)
    ls = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 5.0], (n_lines, 3)).astype(np.float32)
    le = ls + rng.uniform(-1, 1, (n_lines, 3)).astype(np.float32)

    C, P, L = n_cams, n_pts, n_lines
    O = n_cams * n_pts
    OL = n_cams * n_lines
    prob = local_ba.make_problem(C, P, O, L, OL)

    obs_cam, obs_pt, obs_uv, obs_ur, obs_valid = [], [], [], [], []
    for ci, (R, t) in enumerate(poses):
        pc = pts @ R.T + t
        uv = np.array(project(CAM, jnp.asarray(pc)))
        ok = (pc[:, 2] > 0.3) & (uv[:, 0] > 10) & (uv[:, 0] < 630) & \
             (uv[:, 1] > 10) & (uv[:, 1] < 470)
        uv = uv + rng.normal(0, noise, uv.shape)
        ur = uv[:, 0] - CAM.bf / pc[:, 2] + rng.normal(0, noise, n_pts)
        for pi in range(n_pts):
            obs_cam.append(ci)
            obs_pt.append(pi)
            obs_uv.append(uv[pi])
            obs_ur.append(ur[pi])
            obs_valid.append(bool(ok[pi]))

    lobs_cam, lobs_ln, lobs_uv, lobs_valid = [], [], [], []
    for ci, (R, t) in enumerate(poses):
        sc = ls @ R.T + t
        ec = le @ R.T + t
        uv_s = np.array(project(CAM, jnp.asarray(sc))) + rng.normal(0, noise, (n_lines, 2))
        uv_e = np.array(project(CAM, jnp.asarray(ec))) + rng.normal(0, noise, (n_lines, 2))
        ok = (sc[:, 2] > 0.3) & (ec[:, 2] > 0.3)
        for li in range(n_lines):
            lobs_cam.append(ci)
            lobs_ln.append(li)
            lobs_uv.append(np.stack([uv_s[li], uv_e[li]]))
            lobs_valid.append(bool(ok[li]))

    # perturbed initial state (first camera fixed at GT)
    cam_R = np.zeros((C, 3, 3), np.float32)
    cam_t = np.zeros((C, 3), np.float32)
    for i, (R, t) in enumerate(poses):
        if i == 0:
            cam_R[i], cam_t[i] = R, t
        else:
            xi = rng.standard_normal(6).astype(np.float32) * pose_pert
            Rn, tn = se3.left_update(jnp.asarray(xi), jnp.asarray(R), jnp.asarray(t))
            cam_R[i], cam_t[i] = np.asarray(Rn), np.asarray(tn)
    pts0 = pts + rng.normal(0, pt_pert, pts.shape).astype(np.float32)
    ls0 = ls + rng.normal(0, pt_pert, ls.shape).astype(np.float32)
    le0 = le + rng.normal(0, pt_pert, le.shape).astype(np.float32)

    prob = prob._replace(
        cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        cam_valid=jnp.ones(C, bool),
        pt_xyz=jnp.asarray(pts0), pt_valid=jnp.ones(P, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(np.array(obs_uv), jnp.float32),
        obs_ur=jnp.asarray(np.array(obs_ur), jnp.float32),
        obs_valid=jnp.asarray(obs_valid),
        ln_ep=jnp.asarray(np.stack([ls0, le0], 1)), ln_valid=jnp.ones(L, bool),
        lobs_cam=jnp.asarray(lobs_cam, jnp.int32),
        lobs_ln=jnp.asarray(lobs_ln, jnp.int32),
        lobs_uv=jnp.asarray(np.array(lobs_uv), jnp.float32),
        lobs_valid=jnp.asarray(lobs_valid),
    )
    return prob, poses, pts, (ls, le)


def pose_errors(cam_R, cam_t, poses):
    errs = []
    for i, (R, t) in enumerate(poses):
        ce = np.linalg.norm(
            -np.asarray(cam_R[i]).T @ np.asarray(cam_t[i]) - (-R.T @ t)
        )
        errs.append(ce)
    return np.array(errs)


class TestBundleAdjustment:
    def test_reduces_pose_and_point_error(self):
        rng = np.random.default_rng(0)
        prob, poses, pts, _ = build_problem(rng, noise=0.2)
        err0 = pose_errors(prob.cam_R, prob.cam_t, poses)
        res = local_ba.bundle_adjust(CAM, prob)
        err1 = pose_errors(res.cam_R, res.cam_t, poses)
        assert err1.mean() < 0.25 * err0.mean(), f"{err0.mean()} -> {err1.mean()}"
        assert err1.max() < 0.01, f"max pose err {err1.max()*100:.2f}cm"
        pt_err0 = np.linalg.norm(np.asarray(prob.pt_xyz) - pts, axis=1)
        pt_err1 = np.linalg.norm(np.asarray(res.pt_xyz) - pts, axis=1)
        assert np.median(pt_err1) < 0.6 * np.median(pt_err0)

    def test_finds_noise_limited_optimum(self):
        """The converged cost must not exceed the cost at the ground-truth
        configuration (i.e. BA reaches the ML optimum, it does not stall)."""
        rng = np.random.default_rng(7)
        prob, poses, pts, (ls, le) = build_problem(rng)
        res = local_ba.bundle_adjust(CAM, prob)
        gt = prob._replace(
            cam_R=jnp.asarray(np.stack([R for R, _ in poses])),
            cam_t=jnp.asarray(np.stack([t for _, t in poses])),
            pt_xyz=jnp.asarray(pts),
            ln_ep=jnp.asarray(np.stack([ls, le], 1)),
        )
        gt_cost = local_ba.bundle_adjust(CAM, gt, iters1=0, iters2=0).cost
        assert float(res.cost) <= float(gt_cost) * 1.02

    def test_line_endpoints_improve(self):
        rng = np.random.default_rng(1)
        prob, poses, pts, (ls, le) = build_problem(rng, n_pts=100, n_lines=40)
        res = local_ba.bundle_adjust(CAM, prob)
        # line residual: perpendicular distance of endpoints to GT 3D lines
        def line_dist(ep, s, e):
            d = e - s
            d = d / np.linalg.norm(d, axis=1, keepdims=True)
            for k in (0, 1):
                v = ep[:, k] - s
                perp = v - (v * d).sum(1, keepdims=True) * d
                yield np.linalg.norm(perp, axis=1)
        d0 = np.concatenate(list(line_dist(np.asarray(prob.ln_ep), ls, le)))
        d1 = np.concatenate(list(line_dist(np.asarray(res.ln_ep), ls, le)))
        assert np.median(d1) < 0.7 * np.median(d0), f"{np.median(d0)} -> {np.median(d1)}"

    def test_outliers_classified(self):
        rng = np.random.default_rng(2)
        prob, poses, pts, _ = build_problem(rng, n_lines=2)
        # corrupt 10% of point obs
        ov = np.array(prob.obs_valid)
        uv = np.array(prob.obs_uv)
        n_out = int(0.1 * len(uv))
        bad = rng.choice(len(uv), n_out, replace=False)
        uv[bad] += rng.uniform(30, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        prob = prob._replace(obs_uv=jnp.asarray(uv))
        res = local_ba.bundle_adjust(CAM, prob)
        inl = np.asarray(res.obs_inlier)
        bad_valid = bad[ov[bad]]
        assert (~inl[bad_valid]).mean() > 0.95, "outliers not rejected"
        err = pose_errors(res.cam_R, res.cam_t, poses)
        assert err.max() < 0.01

    def test_fixed_camera_untouched(self):
        rng = np.random.default_rng(3)
        prob, poses, _, _ = build_problem(rng, n_lines=2)
        res = local_ba.bundle_adjust(CAM, prob)
        np.testing.assert_allclose(
            np.asarray(res.cam_R[0]), np.asarray(prob.cam_R[0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res.cam_t[0]), np.asarray(prob.cam_t[0]), atol=1e-6
        )
