import pytest

pytestmark = pytest.mark.slow  # system-level e2e tier

import os

import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.system import System
from plslam_tpu.utils import tum_io
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)


class TestSystem:
    def test_full_pipeline_and_savers(self, tmp_path):
        cfg = SlamConfig(camera=CAM, use_lines=True)
        slam = System(cfg, enable_loop_closing=True, enable_dense_cloud=True)
        scene = RoomScene(0)
        n = 30
        poses = smooth_trajectory(2 * n)[:n]
        gt_rows = []
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            out = slam.track_rgbd(g, d, i / 30.0)
            # pipelined tracker: the first `pipeline_depth` post-init
            # frames return None (their poses arrive with later calls)
            if i == 0 or i > slam.tracker.pipeline_depth:
                assert out is not None
            c = -R.T @ t
            gt_rows.append((i / 30.0, c))
        assert slam.tracking_state == 1
        assert slam.map.n_kf >= 2

        traj = tmp_path / "CameraTrajectory.txt"
        kf_traj = tmp_path / "KeyFrameTrajectory.txt"
        kitti = tmp_path / "KITTI.txt"
        pcd = tmp_path / "result.pcd"
        slam.save_trajectory_tum(str(traj))
        slam.save_keyframe_trajectory_tum(str(kf_traj))
        slam.save_trajectory_kitti(str(kitti))
        slam.save_pcd(str(pcd))

        # TUM format: ts tx ty tz qx qy qz qw
        ts, pos, quat = tum_io.load_trajectory_tum(str(traj))
        assert len(ts) == n
        assert np.all(np.abs(np.linalg.norm(quat, axis=1) - 1) < 1e-3)

        # ATE vs ground truth using our evaluator (first frame is origin so
        # align like the TUM protocol does)
        gt_ts = np.array([r[0] for r in gt_rows])
        gt_pos = np.array([r[1] for r in gt_rows])
        rmse = tum_io.ate_rmse(ts, pos, gt_ts, gt_pos)
        assert rmse < 0.03, f"ATE RMSE {rmse*100:.2f}cm"

        # KITTI: 12 floats per line
        with open(kitti) as f:
            row = f.readline().split()
        assert len(row) == 12

        # PCD sanity
        with open(pcd) as f:
            head = f.read(400)
        assert "POINTS" in head and "DATA ascii" in head
        pts, inten = slam.cloud.cloud()
        assert len(pts) > 10000

    def test_localization_mode(self):
        cfg = SlamConfig(camera=CAM, use_lines=False)
        slam = System(cfg, enable_loop_closing=False)
        scene = RoomScene(0)
        poses = smooth_trajectory(40)[:12]
        for i, (R, t) in enumerate(poses[:8]):
            g, d = scene.render(CAM, R, t)
            slam.track_rgbd(g, d, i / 30.0)
        n_kf = slam.map.n_kf
        n_pt = slam.map.n_points()
        slam.activate_localization_mode()
        for i, (R, t) in enumerate(poses[8:]):
            g, d = scene.render(CAM, R, t)
            out = slam.track_rgbd(g, d, (8 + i) / 30.0)
            assert out is not None or i == 0
        # map must not grow in localization mode
        assert slam.map.n_kf == n_kf
        assert abs(slam.map.n_points() - n_pt) <= 2

    def test_viewer_outputs(self, tmp_path):
        from plslam_tpu.utils import viewer

        cfg = SlamConfig(camera=CAM, use_lines=True)
        slam = System(cfg, enable_loop_closing=False)
        scene = RoomScene(0)
        poses = smooth_trajectory(40)[:6]
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            slam.track_rgbd(g, d, i / 30.0)
        out = tmp_path / "map.png"
        viewer.draw_map(slam.map, slam.tracker.trajectory, str(out),
                        show_graph=True)
        assert out.exists() and out.stat().st_size > 1000
        bar = viewer.status_text(slam.tracker, slam.map)
        assert "KFs:" in bar and "MPs:" in bar


def test_structured_tracing(tmp_path):
    import json

    import numpy as np

    from plslam_tpu.config import SlamConfig
    from plslam_tpu.geometry.projection import Camera
    from plslam_tpu.models.system import System
    from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

    cfg = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                                   bf=40.0))
    path = str(tmp_path / "trace.jsonl")
    slam = System(cfg, trace_path=path)
    scene = RoomScene(0)
    poses = smooth_trajectory(20)[:10]
    for i, (R, t) in enumerate(poses):
        g, d = scene.render(cfg.camera, R, t)
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()
    recs = [json.loads(l) for l in open(path)]
    frames = [r for r in recs if r["kind"] == "frame"]
    assert len(frames) >= 4
    assert all({"frame", "state", "local_inliers", "n_kf"} <= set(r)
               for r in frames)
    assert any(r["kf"] for r in frames) or frames[-1]["n_kf"] >= 1


def test_mono_system_uses_sim3_graph():
    """System(sensor='mono') must run the 7-dof (Sim3) essential graph:
    mbFixScale = sensor != MONOCULAR (/root/reference/src/LoopClosing.cc:
    37-43); RGB-D keeps the fixed-scale SE3 graph."""
    cfg = SlamConfig(camera=CAM)
    slam = System(cfg, sensor="mono")
    assert slam.cfg.loop.fix_scale is False
    cfg2 = SlamConfig(camera=CAM)
    slam2 = System(cfg2, sensor="rgbd")
    assert slam2.cfg.loop.fix_scale is True
