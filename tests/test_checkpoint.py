"""Map checkpoint / resume (utils.checkpoint): save after mapping, reload,
relocalize in localization-only mode."""

import pytest

pytestmark = pytest.mark.slow  # system-level e2e tier

import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.system import System
from plslam_tpu.utils import checkpoint
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory


def _cfg():
    return SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                                    bf=40.0))


def test_save_load_roundtrip(tmp_path):
    cfg = _cfg()
    scene = RoomScene(0)
    n = 15
    poses = smooth_trajectory(2 * n)[:n]
    slam = System(cfg)
    for i, (R, t) in enumerate(poses):
        g, d = scene.render(cfg.camera, R, t)
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()
    path = str(tmp_path / "map.npz")
    slam.save_map(path)

    m2 = checkpoint.load_map(cfg, path)
    m1 = slam.map
    assert m2.n_kf == m1.n_kf
    assert m2.n_points() == m1.n_points()
    assert m2.n_lines() == m1.n_lines()
    np.testing.assert_array_equal(m2.kf_valid, m1.kf_valid)
    np.testing.assert_allclose(m2.kf_R[: m1.n_kf], m1.kf_R[: m1.n_kf])
    pid = m1.point_ids()[0]
    assert m2.pt_obs[pid] == m1.pt_obs[pid]
    # descriptors came back from the device arena (host mirror was zeros)
    import jax

    d1 = np.asarray(jax.device_get(m1.point_desc_arena()))[pid]
    d2 = np.asarray(jax.device_get(m2.point_desc_arena()))[pid]
    assert d1.any()
    np.testing.assert_array_equal(d1, d2)
    # keyframe snapshots restored with full descriptor content
    kf = int(np.nonzero(m1.kf_valid)[0][0])
    assert m2.kf_frames[kf].kp_desc.any()


def test_localization_against_loaded_map(tmp_path):
    cfg = _cfg()
    scene = RoomScene(0)
    n = 15
    poses = smooth_trajectory(2 * n)[:n]
    slam = System(cfg)
    for i, (R, t) in enumerate(poses):
        g, d = scene.render(cfg.camera, R, t)
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()
    path = str(tmp_path / "map.npz")
    slam.save_map(path)

    slam2 = System(cfg, localization_only=True)
    slam2.load_map(path)
    assert slam2.tracker.state == 2  # LOST: must relocalize
    ok = 0
    for i, (R, t) in enumerate(poses):
        g, d = scene.render(cfg.camera, R, t)
        out = slam2.track_rgbd(g, d, 10.0 + i / 30.0)
        if out is not None:
            ok += 1
    slam2.shutdown()
    assert slam2.tracker.state == 1  # relocalized and tracking
    assert ok >= 5
    # final pose matches ground truth expressed in the MAP's world frame
    # (the map world frame is the first mapping camera: x_map = R0 x + t0)
    R, t = slam2.tracker.last_pose
    R0, t0 = poses[0]
    gt_R, gt_t = poses[n - 1]
    c_est = -R.T @ t
    c_gt = R0 @ (-gt_R.T @ gt_t) + t0
    assert np.linalg.norm(c_est - c_gt) < 0.05


def test_arena_compaction_mid_run():
    """compact_map reclaims erased slots and tracking continues."""
    cfg = _cfg()
    scene = RoomScene(0)
    n = 24
    poses = smooth_trajectory(2 * n)[:n]
    slam = System(cfg)
    for i, (R, t) in enumerate(poses[: n // 2]):
        g, d = scene.render(cfg.camera, R, t)
        slam.track_rgbd(g, d, i / 30.0)
    m = slam.map
    before_next = m._pt_next
    n_valid = m.n_points()
    assert before_next > n_valid  # some points were culled/merged
    slam.compact_map()
    assert m._pt_next == m.n_points() == n_valid
    # observations still consistent
    for pid in m.point_ids()[:50]:
        for kf, feat in m.pt_obs[pid].items():
            assert m.kf_pt_idx[kf, feat] == pid
    # tracking continues cleanly after compaction
    ok = 0
    for i, (R, t) in enumerate(poses[n // 2:]):
        g, d = scene.render(cfg.camera, R, t)
        if slam.track_rgbd(g, d, (n // 2 + i) / 30.0) is not None:
            ok += 1
    slam.shutdown()
    assert slam.tracker.state == 1
    assert ok >= n // 2 - 4
