import jax.numpy as jnp
import numpy as np

from plslam_tpu.geometry import se3
from plslam_tpu.optim import pose_graph


def circle_poses(n, radius=2.0):
    """World-to-camera poses on a circle, camera looking outward."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        c = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)], np.float32)
        yaw = -a
        Rwc = np.asarray(se3.so3_exp(jnp.asarray([0.0, yaw, 0.0], jnp.float32)))
        R = Rwc.T
        t = -R @ c
        poses.append((R.astype(np.float32), t))
    return poses


class TestPoseGraph:
    def test_loop_drift_correction(self):
        """Odometry chain with small per-edge drift + one loop edge: the
        graph optimization must distribute the accumulated error."""
        rng = np.random.default_rng(0)
        n = 24
        gt = circle_poses(n)
        # build drifted estimates by chaining noisy relative measurements
        est = [gt[0]]
        for i in range(1, n):
            Rrel, trel = pose_graph.relative_pose(
                jnp.asarray(gt[i][0]), jnp.asarray(gt[i][1]),
                jnp.asarray(gt[i - 1][0]), jnp.asarray(gt[i - 1][1]),
            )
            xi = rng.standard_normal(6).astype(np.float32) * np.array(
                [0.004] * 3 + [0.015] * 3, np.float32
            )
            Rn, tn = se3.left_update(jnp.asarray(xi), Rrel, trel)
            Rp, tp = se3.compose(Rn, tn, jnp.asarray(est[-1][0]),
                                 jnp.asarray(est[-1][1]))
            est.append((np.asarray(Rp), np.asarray(tp)))

        drift0 = np.linalg.norm(
            -est[-1][0].T @ est[-1][1] - (-gt[-1][0].T @ gt[-1][1])
        )
        assert drift0 > 0.05, "test setup: no drift accumulated"

        K, E = 32, 32
        prob = pose_graph.make_problem(K, E)
        R = np.array(prob.R)
        t = np.array(prob.t)
        for i, (Ri, ti) in enumerate(est):
            R[i], t[i] = Ri, ti
        valid = np.zeros(K, bool)
        valid[:n] = True
        fixed = np.zeros(K, bool)
        fixed[0] = True
        ei = np.zeros(E, np.int32)
        ej = np.zeros(E, np.int32)
        Rm = np.array(prob.R_meas)
        tm = np.array(prob.t_meas)
        w = np.zeros(E, np.float32)
        ev = np.zeros(E, bool)
        # odometry edges measured from the drifted chain (consistent)
        for i in range(1, n):
            ei[i - 1], ej[i - 1] = i, i - 1
            Rr, tr = pose_graph.relative_pose(
                jnp.asarray(est[i][0]), jnp.asarray(est[i][1]),
                jnp.asarray(est[i - 1][0]), jnp.asarray(est[i - 1][1]),
            )
            Rm[i - 1], tm[i - 1] = np.asarray(Rr), np.asarray(tr)
            w[i - 1], ev[i - 1] = 1.0, True
        # loop edge with the TRUE relative pose (n-1 -> 0)
        Rr, tr = pose_graph.relative_pose(
            jnp.asarray(gt[n - 1][0]), jnp.asarray(gt[n - 1][1]),
            jnp.asarray(gt[0][0]), jnp.asarray(gt[0][1]),
        )
        ei[n - 1], ej[n - 1] = n - 1, 0
        Rm[n - 1], tm[n - 1] = np.asarray(Rr), np.asarray(tr)
        w[n - 1], ev[n - 1] = 5.0, True

        prob = prob._replace(
            R=jnp.asarray(R), t=jnp.asarray(t),
            fixed=jnp.asarray(fixed), valid=jnp.asarray(valid),
            ei=jnp.asarray(ei), ej=jnp.asarray(ej),
            R_meas=jnp.asarray(Rm), t_meas=jnp.asarray(tm),
            w=jnp.asarray(w), e_valid=jnp.asarray(ev),
        )
        Rn, tn = pose_graph.optimize_pose_graph(prob, iters=30)
        Rn, tn = np.asarray(Rn), np.asarray(tn)
        errs = [
            np.linalg.norm(-Rn[i].T @ tn[i] - (-gt[i][0].T @ gt[i][1]))
            for i in range(n)
        ]
        drift1 = errs[-1]
        assert drift1 < 0.35 * drift0, f"loop edge not honored: {drift0} -> {drift1}"
        assert np.mean(errs) < 0.6 * drift0

    def test_fixed_nodes_stay(self):
        prob = pose_graph.make_problem(8, 8)
        prob = prob._replace(
            valid=jnp.ones(8, bool),
            fixed=jnp.asarray([True] + [False] * 7),
            e_valid=jnp.zeros(8, bool),
        )
        Rn, tn = pose_graph.optimize_pose_graph(prob, iters=3)
        np.testing.assert_allclose(np.asarray(Rn[0]), np.eye(3), atol=1e-6)
