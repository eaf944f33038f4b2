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


def test_sim3_pose_graph_corrects_scale_drift():
    """Monocular essential graph: a loop edge with the true scale pulls
    drifted per-node scales back (OptimizeEssentialGraph fix_scale=false)."""
    import jax.numpy as jnp
    import numpy as np

    from plslam_tpu.geometry import sim3
    from plslam_tpu.optim import pose_graph

    rng = np.random.default_rng(0)
    K = 8
    # ground truth: cameras on a circle, unit scale
    angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
    gt_R = []
    gt_t = []
    for a in angles:
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        c = np.array([np.cos(a), 0.0, np.sin(a)], np.float32) * 2.0
        gt_R.append(R)
        gt_t.append((-R @ c).astype(np.float32))
    gt_R = np.stack(gt_R)
    gt_t = np.stack(gt_t)

    # drifted estimate: scale grows 5%/step (mono scale drift)
    est_s = (1.05 ** np.arange(K)).astype(np.float32)
    est_R = gt_R.copy()
    est_t = (gt_t * est_s[:, None]).astype(np.float32)

    E = 16
    prob = pose_graph.make_sim3_problem(K, E)
    ei, ej, Rm, tm, sm, ev = [], [], [], [], [], []

    def rel_true(i, j):  # S_ij from GROUND TRUTH (odometry measurements)
        si, Ri, ti = 1.0, gt_R[i], gt_t[i]
        sji, Rji, tji = sim3.inverse(1.0, jnp.asarray(gt_R[j]),
                                     jnp.asarray(gt_t[j]))
        return sim3.compose(si, jnp.asarray(Ri), jnp.asarray(ti),
                            sji, Rji, tji)

    for k in range(K - 1):  # chain
        s_, R_, t_ = rel_true(k, k + 1)
        ei.append(k); ej.append(k + 1)
        sm.append(float(s_)); Rm.append(np.asarray(R_)); tm.append(np.asarray(t_))
        ev.append(True)
    # loop edge K-1 -> 0 with the true metric
    s_, R_, t_ = rel_true(K - 1, 0)
    ei.append(K - 1); ej.append(0)
    sm.append(float(s_)); Rm.append(np.asarray(R_)); tm.append(np.asarray(t_))
    ev.append(True)

    n = len(ei)
    prob = prob._replace(
        R=jnp.asarray(est_R), t=jnp.asarray(est_t), s=jnp.asarray(est_s),
        fixed=jnp.asarray(np.eye(1, K, 0, bool)[0]),
        valid=jnp.ones(K, bool),
        ei=jnp.asarray(np.pad(ei, (0, E - n)).astype(np.int32)),
        ej=jnp.asarray(np.pad(ej, (0, E - n)).astype(np.int32)),
        R_meas=jnp.asarray(np.pad(np.stack(Rm), ((0, E - n), (0, 0), (0, 0)))
                           + np.eye(3) * np.pad(np.zeros(n), (0, E - n),
                                                constant_values=1.0
                                                )[:, None, None]),
        t_meas=jnp.asarray(np.pad(np.stack(tm), ((0, E - n), (0, 0)))),
        s_meas=jnp.asarray(np.pad(sm, (0, E - n), constant_values=1.0
                                  ).astype(np.float32)),
        e_valid=jnp.asarray(np.pad(ev, (0, E - n)).astype(bool)),
    )
    R, t, s = pose_graph.optimize_pose_graph_sim3(prob, iters=30)
    R, t, s = np.asarray(R), np.asarray(t), np.asarray(s)
    # scales pulled back to ~1, poses back to ground truth
    assert np.abs(s - 1.0).max() < 0.02
    assert np.abs(t - gt_t).max() < 0.05
    assert np.abs(R - gt_R).max() < 0.05
