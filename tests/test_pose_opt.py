import jax.numpy as jnp
import numpy as np

from plslam_tpu.geometry import se3, lines as glines
from plslam_tpu.geometry.projection import Camera, project
from plslam_tpu.optim import pose as pose_opt

CAM = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, bf=40.0)


def synth_scene(rng, n_pts=200, n_lines=30):
    """Random 3D points/lines in front of a ground-truth camera."""
    xi = rng.standard_normal(6).astype(np.float32) * np.array([0.1] * 3 + [0.5] * 3, np.float32)
    R_gt, t_gt = se3.se3_exp(jnp.asarray(xi))
    p3d = rng.uniform([-2, -1.5, 2.5], [2, 1.5, 8], (n_pts, 3)).astype(np.float32)
    # put points into world coords such that they are in front of the camera:
    Rw, tw = se3.inverse(R_gt, t_gt)
    p_world = np.asarray(se3.apply(Rw, tw, jnp.asarray(p3d)))

    ls = rng.uniform([-2, -1.5, 2.5], [2, 1.5, 7], (n_lines, 3)).astype(np.float32)
    le = ls + rng.uniform(-1, 1, (n_lines, 3)).astype(np.float32)
    ls_w = np.asarray(se3.apply(Rw, tw, jnp.asarray(ls)))
    le_w = np.asarray(se3.apply(Rw, tw, jnp.asarray(le)))
    return (R_gt, t_gt), p_world, (ls_w, le_w), (p3d, (ls, le))


def build_obs(rng, cam, R_gt, t_gt, p_world, lines_w, noise=0.5, outlier_frac=0.2,
              n_cap=256, nl_cap=64, stereo=True):
    n = p_world.shape[0]
    pc = np.asarray(se3.apply(R_gt, t_gt, jnp.asarray(p_world)))
    uv = np.array(project(cam, jnp.asarray(pc)))
    uv += rng.normal(0, noise, uv.shape)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(15, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    ur = uv[:, 0] - cam.bf / pc[:, 2] + rng.normal(0, noise, n)
    if not stereo:
        ur = np.full(n, -1.0)

    ls_w, le_w = lines_w
    nl = ls_w.shape[0]
    lsc = np.asarray(se3.apply(R_gt, t_gt, jnp.asarray(ls_w)))
    lec = np.asarray(se3.apply(R_gt, t_gt, jnp.asarray(le_w)))
    uv_s = np.array(project(cam, jnp.asarray(lsc))) + rng.normal(0, noise, (nl, 2))
    uv_e = np.array(project(cam, jnp.asarray(lec))) + rng.normal(0, noise, (nl, 2))
    nw, vw = glines.plucker_from_endpoints(jnp.asarray(ls_w), jnp.asarray(le_w))

    obs = pose_opt.make_pose_obs(n_cap, nl_cap)
    obs = obs._replace(
        p3d=obs.p3d.at[:n].set(jnp.asarray(p_world, jnp.float32)),
        uv=obs.uv.at[:n].set(jnp.asarray(uv, jnp.float32)),
        u_right=obs.u_right.at[:n].set(jnp.asarray(ur, jnp.float32)),
        valid=obs.valid.at[:n].set(True),
        line_nw=obs.line_nw.at[:nl].set(nw),
        line_vw=obs.line_vw.at[:nl].set(vw),
        line_uv=obs.line_uv.at[:nl].set(
            jnp.stack([jnp.asarray(uv_s, jnp.float32), jnp.asarray(uv_e, jnp.float32)], 1)
        ),
        line_valid=obs.line_valid.at[:nl].set(True),
    )
    return obs, out_idx


def pose_error(Ra, ta, Rb, tb):
    dR = np.asarray(Ra).T @ np.asarray(Rb)
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    dt = np.linalg.norm(np.asarray(ta) - np.asarray(tb))
    return ang, dt


class TestPoseOptimization:
    def test_converges_points_only(self):
        rng = np.random.default_rng(0)
        (R_gt, t_gt), p_world, lines_w, _ = synth_scene(rng)
        obs, _ = build_obs(rng, CAM, R_gt, t_gt, p_world, lines_w, outlier_frac=0.0)
        obs = obs._replace(line_valid=jnp.zeros_like(obs.line_valid))
        # perturb initial pose
        xi = jnp.asarray(rng.standard_normal(6) * [0.02, 0.02, 0.02, 0.1, 0.1, 0.1], jnp.float32)
        R0, t0 = se3.left_update(xi, R_gt, t_gt)
        res = pose_opt.optimize_pose(CAM, R0, t0, obs)
        ang, dt = pose_error(res.R, t_gt, R_gt, t_gt)
        ang, dt = pose_error(res.R, res.t, R_gt, t_gt)
        assert ang < 0.1, f"rot err {ang} deg"
        assert dt < 0.01, f"trans err {dt} m"
        assert int(res.n_inliers) > 180

    def test_outlier_rejection(self):
        rng = np.random.default_rng(1)
        (R_gt, t_gt), p_world, lines_w, _ = synth_scene(rng)
        obs, out_idx = build_obs(rng, CAM, R_gt, t_gt, p_world, lines_w, outlier_frac=0.25)
        xi = jnp.asarray(rng.standard_normal(6) * [0.02, 0.02, 0.02, 0.1, 0.1, 0.1], jnp.float32)
        R0, t0 = se3.left_update(xi, R_gt, t_gt)
        res = pose_opt.optimize_pose(CAM, R0, t0, obs)
        ang, dt = pose_error(res.R, res.t, R_gt, t_gt)
        assert ang < 0.2, f"rot err {ang} deg"
        assert dt < 0.02, f"trans err {dt} m"
        inl = np.asarray(res.inlier_pts)
        # the injected outliers must be classified out
        assert not inl[out_idx].any()
        assert inl.sum() > 0.9 * (200 - len(out_idx))

    def test_lines_improve_or_hold(self):
        rng = np.random.default_rng(2)
        (R_gt, t_gt), p_world, lines_w, _ = synth_scene(rng, n_pts=30, n_lines=40)
        obs, _ = build_obs(rng, CAM, R_gt, t_gt, p_world, lines_w, outlier_frac=0.0)
        xi = jnp.asarray(rng.standard_normal(6) * [0.03, 0.03, 0.03, 0.15, 0.15, 0.15], jnp.float32)
        R0, t0 = se3.left_update(xi, R_gt, t_gt)
        res = pose_opt.optimize_pose(CAM, R0, t0, obs)
        ang, dt = pose_error(res.R, res.t, R_gt, t_gt)
        assert ang < 0.2 and dt < 0.02
        assert int(jnp.sum(res.inlier_lines)) > 30

    def test_mono_only(self):
        rng = np.random.default_rng(3)
        (R_gt, t_gt), p_world, lines_w, _ = synth_scene(rng)
        obs, _ = build_obs(rng, CAM, R_gt, t_gt, p_world, lines_w,
                           outlier_frac=0.1, stereo=False)
        obs = obs._replace(line_valid=jnp.zeros_like(obs.line_valid))
        xi = jnp.asarray(rng.standard_normal(6) * [0.02, 0.02, 0.02, 0.08, 0.08, 0.08], jnp.float32)
        R0, t0 = se3.left_update(xi, R_gt, t_gt)
        res = pose_opt.optimize_pose(CAM, R0, t0, obs)
        ang, dt = pose_error(res.R, res.t, R_gt, t_gt)
        assert ang < 0.3 and dt < 0.05

    def test_empty_obs_keeps_pose(self):
        obs = pose_opt.make_pose_obs(64, 16)
        R0, t0 = jnp.eye(3), jnp.zeros(3)
        res = pose_opt.optimize_pose(CAM, R0, t0, obs)
        np.testing.assert_allclose(np.asarray(res.R), np.eye(3), atol=1e-5)
        assert int(res.n_inliers) == 0
