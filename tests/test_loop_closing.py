import os

import numpy as np
import jax.numpy as jnp

from plslam_tpu.bow.database import KeyFrameDatabase
from plslam_tpu.bow.vocabulary import Vocabulary
from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry import se3
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.local_mapping import LocalMapper
from plslam_tpu.models.loop_closing import LoopCloser
from plslam_tpu.models.map import SlamMap
from plslam_tpu.models.tracking import Tracker
from plslam_tpu.utils.synthetic import RoomScene

VOC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plslam_tpu", "bow", "vocab_synth.npz",
)
CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)


def orbit_poses(n, radius=0.45):
    """Camera orbiting the room center, yawing a full turn — returns to the
    starting view at the end (a guaranteed loop)."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / (n - 30)  # completes the turn well before the
                                      # end: a sustained revisit phase
        c = np.array(
            [radius * np.sin(a), 0.0, 1.25 + radius * np.cos(a)], np.float32
        )
        Rwc = np.asarray(se3.so3_exp(jnp.asarray([0.0, a, 0.0], jnp.float32)))
        R = Rwc.T.astype(np.float32)
        t = (-R @ c).astype(np.float32)
        poses.append((R, t))
    return poses


def build_system(use_lines=False):
    cfg = SlamConfig(camera=CAM, use_lines=use_lines)
    voc = Vocabulary.load(VOC_PATH)
    m = SlamMap(cfg)
    kfdb = KeyFrameDatabase(voc, max_kf=cfg.capacity.max_keyframes)
    lm = LocalMapper(cfg, m)
    lc = LoopCloser(cfg, m, kfdb, voc, local_mapper=lm)
    tr = Tracker(cfg, m, local_mapper=lm, loop_closer=lc, voc=voc, kfdb=kfdb)
    lc.tracker = tr
    return cfg, m, lm, lc, tr


def inject_drift(m, tr, kf_cut, W_R, W_t):
    """Displace the OLD map sector (keyframes < kf_cut and their landmarks)
    by a world transform — emulating accumulated drift between the first
    visit and the revisit, exactly the discontinuity loop closing exists to
    heal. New-sector content and the tracker state stay untouched."""
    for k in range(kf_cut):
        if not m.kf_valid[k]:
            continue
        R, t = m.kf_R[k], m.kf_t[k]
        m.set_kf_pose(k, R @ W_R, R @ W_t + t)
    pids = m.point_ids()
    sel = pids[m.pt_first_kf[pids] < kf_cut]
    m.pt_pos[sel] = (m.pt_pos[sel] - W_t) @ W_R
    lids = m.line_ids()
    lsel = lids[m.ln_first_kf[lids] < kf_cut]
    for i in (0, 1):
        m.ln_ep[lsel, i] = (m.ln_ep[lsel, i] - W_t) @ W_R


def _rel_err_vs_gt(m, tr, poses):
    """Camera-center error of (last pose relative to KF0) vs ground truth —
    invariant to any world-gauge motion from corrections."""
    Re, te = tr.last_pose
    R0e, t0e = m.kf_R[0], m.kf_t[0]
    Rrel_e = Re @ R0e.T
    trel_e = te - Rrel_e @ t0e
    Rg, tg = poses[-1]
    R0g, t0g = poses[0]
    Rrel_g = Rg @ R0g.T
    trel_g = tg - Rrel_g @ t0g
    return float(
        np.linalg.norm(-Rrel_e.T @ trel_e - (-Rrel_g.T @ trel_g))
    )


class TestLoopClosing:
    def test_full_orbit_stays_connected(self):
        """Without drift, revisiting is absorbed by fusion — tracking must
        survive the whole orbit and keep the pose consistent."""
        cfg, m, lm, lc, tr = build_system()
        scene = RoomScene(3)
        n = 150
        poses = orbit_poses(n)
        R0g, t0g = poses[0]
        tracked = 0
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            if tr.process(g, d, i / 30.0) is not None:
                tracked += 1
        assert tracked > 0.95 * n, f"tracked {tracked}/{n}"
        err = _rel_err_vs_gt(m, tr, poses)
        # a full fast orbit (3 deg/frame = 90 deg/s — 3-4x faster than TUM
        # handheld motion) accumulates real drift; the bound checks the
        # revisit pulled the estimate back together
        assert err < 0.25, f"final pose err {err*100:.1f}cm"

    def test_loop_detected_and_corrected_under_drift(self):
        """Inject an ~8 cm / 2 deg world offset into the first-visited map
        sector mid-run: fusion can no longer reconnect, so the loop pipeline
        (BoW candidates → consistency → Kabsch RANSAC → correction +
        essential graph) must fire and heal the discontinuity."""
        cfg, m, lm, lc, tr = build_system()
        scene = RoomScene(3)
        n = 150
        poses = orbit_poses(n)
        R0g, t0g = poses[0]
        drift_at = 90
        W_R = np.asarray(
            se3.so3_exp(jnp.asarray([0.0, 0.035, 0.0], jnp.float32))
        ).astype(np.float32)
        W_t = np.array([0.06, 0.0, -0.05], np.float32)
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            tr.process(g, d, i / 30.0)
            if i == drift_at:
                kf_cut = max(m.n_kf - 12, 1)
                inject_drift(m, tr, kf_cut, W_R, W_t)
                tr._refresh_local_map(tr.last_pt_ids, tr.last_ln_ids)
        assert lc.n_loops_closed >= 1, "loop closure never fired"
        # after correction old and new sectors share one frame again; the
        # gauge-invariant check is the final pose RELATIVE TO KF0 vs ground
        # truth (the injected offset moved the world gauge itself)
        err = _rel_err_vs_gt(m, tr, poses)
        assert err < 0.25, f"KF0-relative pose err {err*100:.1f}cm after loop"


class TestTrajectoryHealing:
    def _track_short(self, n=60):
        cfg, m, lm, lc, tr = build_system()
        scene = RoomScene(3)
        poses = orbit_poses(150)[:n]
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            tr.process(g, d, i / 30.0)
        tr.flush()
        return m, tr, poses

    def test_healing_follows_map_corrections_exactly(self):
        """Mechanism check: applying a rigid world transform to every
        keyframe (what a GBA/loop correction does to the map gauge) must
        move every healed frame pose by exactly that transform, while the
        as-tracked poses stay put."""
        m, tr, _ = self._track_short()
        assert len(tr.traj_refs) == len(tr.trajectory)
        before = tr.healed_trajectory()
        W_R = np.asarray(
            se3.so3_exp(jnp.asarray([0.02, -0.03, 0.01], jnp.float32))
        ).astype(np.float32)
        W_t = np.array([0.15, -0.08, 0.30], np.float32)
        for k in range(m.n_kf):
            if m.kf_valid[k]:
                R, t = m.kf_R[k], m.kf_t[k]
                m.set_kf_pose(k, R @ W_R, R @ W_t + t)
        after = tr.healed_trajectory()
        for (_, Rb, tb), (_, Ra, ta) in zip(before, after):
            np.testing.assert_allclose(Ra, Rb @ W_R, atol=1e-5)
            np.testing.assert_allclose(ta, Rb @ W_t + tb, atol=1e-5)

    def test_healing_survives_reference_kf_culling(self):
        """Culling a reference keyframe must leave healed poses unchanged
        (the cull-time relative pose chains to a surviving ancestor —
        KeyFrame::mTcp semantics, System.cc:355-365)."""
        m, tr, _ = self._track_short()
        before = tr.healed_trajectory()
        refs = sorted({r for r, _, _ in tr.traj_refs if r > 0})
        assert refs, "no non-root reference keyframes recorded"
        victim = refs[len(refs) // 2]
        m.erase_keyframe(victim)
        assert not m.kf_valid[victim]
        after = tr.healed_trajectory()
        for (_, Rb, tb), (_, Ra, ta) in zip(before, after):
            np.testing.assert_allclose(Ra, Rb, atol=1e-4)
            np.testing.assert_allclose(ta, tb, atol=1e-4)

    def test_saved_trajectory_healed_through_loop_correction(self):
        """End-to-end (the round-2 gap): on a full orbit the loop pipeline
        fires naturally; frames tracked BEFORE the loop closure keep their
        drifted absolute poses in the as-tracked list, but the healed
        (saved) trajectory re-composes them against corrected keyframe
        poses — its ATE must not be worse."""
        from plslam_tpu.utils.evaluate import ate_rmse, trajectory_positions

        cfg, m, lm, lc, tr = build_system()
        scene = RoomScene(3)
        n = 150
        poses = orbit_poses(n)
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            tr.process(g, d, i / 30.0)
        tr.flush()
        assert lc.n_loops_closed >= 1, "loop closure never fired"
        gt_ts = np.array([i / 30.0 for i in range(n)])
        gt_pos = np.array([-(R.T @ t) for R, t in poses])
        raw_ts, raw_pos = trajectory_positions(tr.trajectory)
        heal_ts, heal_pos = trajectory_positions(tr.healed_trajectory())
        raw_rmse, _, _ = ate_rmse(gt_ts, gt_pos, raw_ts, raw_pos)
        heal_rmse, n_heal, _ = ate_rmse(gt_ts, gt_pos, heal_ts, heal_pos)
        assert n_heal > 0.9 * n
        assert heal_rmse <= raw_rmse + 0.002, (
            f"healed {heal_rmse*100:.2f}cm !<= as-tracked {raw_rmse*100:.2f}cm")
        assert heal_rmse < 0.12, f"healed ATE {heal_rmse*100:.2f}cm"


def test_refine_sim3_recovers_similarity():
    """Sim3 reprojection LM (Optimizer::OptimizeSim3 parity) sharpens a
    perturbed RANSAC estimate to the true similarity."""
    import jax.numpy as jnp
    import numpy as np

    from plslam_tpu.geometry.projection import Camera
    from plslam_tpu.optim import horn

    cam = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)
    rng = np.random.default_rng(0)
    N = 512
    n = 200
    x2 = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n, 3)).astype(
        np.float32)
    # true S12: rotation + translation + scale
    aa = np.array([0.03, -0.05, 0.02])
    th = np.linalg.norm(aa)
    k = aa / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R_true = (np.eye(3) + np.sin(th) * K
              + (1 - np.cos(th)) * K @ K).astype(np.float32)
    t_true = np.array([0.2, -0.1, 0.05], np.float32)
    s_true = 1.08
    x1 = (s_true * x2 @ R_true.T + t_true).astype(np.float32)

    def proj(p):
        return np.stack([cam.fx * p[:, 0] / p[:, 2] + cam.cx,
                         cam.fy * p[:, 1] / p[:, 2] + cam.cy], -1)

    uv1 = np.zeros((N, 2), np.float32)
    uv2 = np.zeros((N, 2), np.float32)
    X1 = np.zeros((N, 3), np.float32)
    X2 = np.zeros((N, 3), np.float32)
    val = np.zeros(N, bool)
    uv1[:n] = proj(x1)
    uv2[:n] = proj(x2)
    X1[:n] = x1
    X2[:n] = x2
    val[:n] = True

    # perturbed initialization (what RANSAC would hand over)
    R0 = R_true @ (np.eye(3) + np.array(
        [[0, -0.01, 0], [0.01, 0, 0], [0, 0, 0]])).astype(np.float32)
    s, R, t, inl, n_in = horn.refine_sim3(
        cam, 1.0, jnp.asarray(R0.astype(np.float32)),
        jnp.asarray(t_true + np.float32([0.03, -0.02, 0.01])),
        jnp.asarray(X1), jnp.asarray(uv1),
        jnp.asarray(X2), jnp.asarray(uv2), jnp.asarray(val))
    assert int(n_in) > 0.9 * n
    assert abs(float(s) - s_true) < 0.01
    assert np.abs(np.asarray(R) - R_true).max() < 5e-3
    assert np.abs(np.asarray(t) - t_true).max() < 2e-2
