import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from plslam_tpu.geometry import se3
from plslam_tpu.geometry.projection import Camera, project
from plslam_tpu.parallel import ba as pba
from plslam_tpu.parallel.mesh import make_mesh

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0)


def small_problem(rng, n_cams=6, n_pts=200):
    poses = []
    for i in range(n_cams):
        ang = 0.08 * (i - n_cams / 2)
        Rwc = np.asarray(se3.so3_exp(jnp.asarray([0.0, ang, 0.0], jnp.float32)))
        c = np.array([np.sin(ang), 0.05 * i, -0.3 * np.cos(ang)], np.float32)
        R = Rwc.T
        poses.append((R, (-R @ c).astype(np.float32)))
    pts = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n_pts, 3)).astype(np.float32)
    obs_cam, obs_pt, obs_uv, obs_ur, obs_w, obs_val = [], [], [], [], [], []
    for ci, (R, t) in enumerate(poses):
        pc = pts @ R.T + t
        uv = np.array(project(CAM, jnp.asarray(pc)))
        uv += rng.normal(0, 0.3, uv.shape)
        for pi in range(n_pts):
            obs_cam.append(ci)
            obs_pt.append(pi)
            obs_uv.append(uv[pi])
            obs_ur.append(-1.0)
            obs_w.append(1.0)
            obs_val.append(bool(pc[pi, 2] > 0.3))
    cam_R = np.stack([p[0] for p in poses])
    cam_t = np.stack([p[1] for p in poses])
    # perturb all but cam0
    for i in range(1, n_cams):
        xi = rng.standard_normal(6).astype(np.float32) * 0.01
        Rn, tn = se3.left_update(jnp.asarray(xi), jnp.asarray(cam_R[i]),
                                 jnp.asarray(cam_t[i]))
        cam_R[i], cam_t[i] = np.asarray(Rn), np.asarray(tn)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    pts0 = pts + rng.normal(0, 0.01, pts.shape).astype(np.float32)
    return (cam_R, cam_t, fixed, pts0, np.ones(n_pts, bool),
            np.array(obs_cam), np.array(obs_pt), np.array(obs_uv, np.float32),
            np.array(obs_ur, np.float32), np.array(obs_w, np.float32),
            np.array(obs_val)), poses, pts


class TestDistributedBA:
    def test_sharded_matches_single(self):
        """The psum-reduced camera system must give the SAME update as the
        single-shard computation (exactness of the Schur decomposition over
        landmark blocks)."""
        rng = np.random.default_rng(0)
        args, poses, pts_gt = small_problem(rng)

        mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1), ("obs",))
        prob1 = pba.shard_problem(*args, n_shards=1)
        R1, t1, X1 = pba.distributed_gn_step(CAM, prob1, mesh1)

        n_dev = min(4, len(jax.devices()))
        mesh4 = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("obs",))
        prob4 = pba.shard_problem(*args, n_shards=n_dev)
        R4, t4, X4 = pba.distributed_gn_step(CAM, prob4, mesh4)

        np.testing.assert_allclose(np.asarray(R1), np.asarray(R4), atol=2e-4)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t4), atol=2e-3)

    def test_step_reduces_error(self):
        rng = np.random.default_rng(1)
        args, poses, pts_gt = small_problem(rng)
        n_dev = min(4, len(jax.devices()))
        mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("obs",))
        prob = pba.shard_problem(*args, n_shards=n_dev)

        def cam_err(cam_R, cam_t):
            errs = []
            for i, (R, t) in enumerate(poses):
                errs.append(np.linalg.norm(
                    -np.asarray(cam_R[i]).T @ np.asarray(cam_t[i]) - (-R.T @ t)
                ))
            return np.mean(errs)

        e0 = cam_err(prob.cam_R, prob.cam_t)
        Rn, tn, Xn = pba.distributed_gn_step(CAM, prob, mesh)
        for _ in range(3):
            prob = prob._replace(cam_R=Rn, cam_t=tn, pt_xyz=Xn)
            Rn, tn, Xn = pba.distributed_gn_step(CAM, prob, mesh)
        e1 = cam_err(Rn, tn)
        assert e1 < 0.3 * e0, f"{e0} -> {e1}"


class TestDistributedCG:
    def test_cg_matches_dense_schur(self):
        """The matrix-free sharded PCG step must produce the same camera
        update as the dense psum'd Schur solve (same normal equations)."""
        rng = np.random.default_rng(2)
        args, poses, pts_gt = small_problem(rng)
        n_dev = min(4, len(jax.devices()))
        mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("obs",))
        prob = pba.shard_problem(*args, n_shards=n_dev)
        Rd, td, Xd = pba.distributed_gn_step(CAM, prob, mesh)
        Rc, tc, Xc = pba.distributed_cg_step(CAM, prob, mesh, cg_iters=64)
        np.testing.assert_allclose(np.asarray(Rd), np.asarray(Rc), atol=5e-4)
        np.testing.assert_allclose(np.asarray(td), np.asarray(tc), atol=5e-3)

    def test_cg_step_reduces_error(self):
        rng = np.random.default_rng(3)
        args, poses, pts_gt = small_problem(rng)
        n_dev = min(4, len(jax.devices()))
        mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("obs",))
        prob = pba.shard_problem(*args, n_shards=n_dev)

        def cam_err(cam_R, cam_t):
            return np.mean([
                np.linalg.norm(-np.asarray(cam_R[i]).T @ np.asarray(cam_t[i])
                               - (-poses[i][0].T @ poses[i][1]))
                for i in range(len(poses))])

        e0 = cam_err(prob.cam_R, prob.cam_t)
        R, t, X = pba.distributed_cg_step(CAM, prob, mesh, cg_iters=64)
        e1 = cam_err(R, t)
        assert e1 < 0.5 * e0, f"{e0} -> {e1}"


class TestEngineDistributedGBA:
    """The engine's own GBA routed through the mesh (round-2 gap: the
    distributed kernels were tested but unreachable from LocalMapper)."""

    def _run_gba(self, use_distributed: bool, seed=3):
        from plslam_tpu.config import SlamConfig
        from plslam_tpu.models.local_mapping import LocalMapper
        from plslam_tpu.utils.synthetic import make_synthetic_ba_map
        import dataclasses

        cfg = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5,
                                       cy=239.5, bf=40.0))
        cfg = dataclasses.replace(
            cfg, mapping=dataclasses.replace(
                cfg.mapping, use_distributed_ba=use_distributed))
        m, gt_poses, gt_pts = make_synthetic_ba_map(
            cfg, n_kf=72, n_pts=260, obs_per_kf=72, seed=seed)
        lm = LocalMapper(cfg, m)
        # window >= n_kf selects the GBA branch; 72 cams > dense cap 64
        # routes CG — distributed over the 8 virtual devices when enabled
        lm.run_local_ba(0, window=128, obs_cap=1 << 14, point_cap=512)
        return cfg, m, gt_poses

    @staticmethod
    def _pose_err(m, gt_poses):
        errs = []
        for k, (R, t) in enumerate(gt_poses):
            if not m.kf_valid[k]:
                continue
            errs.append(np.linalg.norm(-(m.kf_R[k].T @ m.kf_t[k]) -
                                       (-(R.T @ t))))
        return np.array(errs)

    def test_engine_gba_distributed_matches_single_device(self):
        assert jax.device_count() >= 2  # conftest forces 8 virtual devices
        cfg_d, m_d, gt = self._run_gba(True)
        cfg_s, m_s, _ = self._run_gba(False)
        # both must land near ground truth...
        err_d = self._pose_err(m_d, gt)
        err_s = self._pose_err(m_s, gt)
        assert err_d.mean() < 0.01, f"distributed GBA err {err_d.mean():.4f}"
        assert err_s.mean() < 0.01, f"single-dev GBA err {err_s.mean():.4f}"
        # ...and agree with each other to solver tolerance
        dd = np.array([np.linalg.norm(m_d.kf_t[k] - m_s.kf_t[k])
                       for k in range(m_d.n_kf)])
        assert dd.max() < 5e-3, f"distributed vs single max dt {dd.max():.4f}"

    def test_engine_gba_distributed_improves_initial(self):
        from plslam_tpu.config import SlamConfig
        from plslam_tpu.utils.synthetic import make_synthetic_ba_map

        cfg = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5,
                                       cy=239.5, bf=40.0))
        m0, gt, _ = make_synthetic_ba_map(cfg, n_kf=72, n_pts=260,
                                          obs_per_kf=72, seed=3)
        err0 = self._pose_err(m0, gt)
        _, m1, _ = self._run_gba(True)
        err1 = self._pose_err(m1, gt)
        assert err1.mean() < 0.5 * err0.mean(), (
            f"GBA did not improve: {err0.mean():.4f} -> {err1.mean():.4f}")


def test_distributed_gba_aborts_on_signal(monkeypatch):
    """mbStopGBA semantics on the distributed path (round-3 gap: the
    single-device stepped BA honored should_abort but
    distributed_bundle_adjust ran to completion): an abort signal raised
    after the first step must stop the iteration early and still return a
    usable (partially optimized) result."""
    from plslam_tpu.optim import local_ba

    rng = np.random.default_rng(5)
    args, poses, pts_gt = small_problem(rng)
    (cam_R, cam_t, fixed, pts0, pt_valid,
     obs_cam, obs_pt, obs_uv, obs_ur, obs_w, obs_val) = args
    C, Pn, O = len(cam_R), len(pts0), len(obs_cam)
    prob = local_ba.make_problem(C, Pn, O, 1, 1)
    prob = prob._replace(
        cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
        cam_fixed=jnp.asarray(fixed), cam_valid=jnp.ones(C, bool),
        pt_xyz=jnp.asarray(pts0), pt_valid=jnp.asarray(pt_valid),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(obs_uv), obs_ur=jnp.asarray(obs_ur),
        obs_w=jnp.asarray(obs_w), obs_valid=jnp.asarray(obs_val),
    )
    mesh = make_mesh(min(4, jax.device_count()))
    calls = []
    real_step = pba.distributed_cg_step

    def counting_step(*a, **kw):
        calls.append(1)
        return real_step(*a, **kw)

    monkeypatch.setattr(pba, "distributed_cg_step", counting_step)
    Rn, tn, Xn, inl = pba.distributed_bundle_adjust(
        CAM, prob, mesh, iters=8, cg_iters=16,
        should_abort=lambda: len(calls) >= 2)
    assert len(calls) == 2, f"ran {len(calls)} steps, abort ignored"
    assert Rn.shape == (C, 3, 3) and Xn.shape == (Pn, 3)
    assert inl.sum() > 0
