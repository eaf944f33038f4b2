"""Dense-cloud mapper: unprojection, voxel dedup, loop-triggered rebuild
(PointCloudMapping.cc semantics)."""

import numpy as np
import pytest

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.pointcloud import PointCloudMapper

CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)


class FakeMap:
    def __init__(self, n):
        self.kf_R = np.broadcast_to(np.eye(3, dtype=np.float32),
                                    (n, 3, 3)).copy()
        self.kf_t = np.zeros((n, 3), np.float32)
        self.kf_valid = np.ones(n, bool)


def _flat_depth(val=2.0):
    gray = np.full((480, 640), 100.0, np.float32)
    depth = np.full((480, 640), val, np.float32)
    return gray, depth


def test_unproject_accumulate_and_dedup():
    cfg = SlamConfig(camera=CAM)
    pcm = PointCloudMapper(cfg)
    gray, depth = _flat_depth()
    pcm.insert_keyframe(0, gray, depth, np.eye(3, dtype=np.float32),
                        np.zeros(3, np.float32))
    pts, inten = pcm.cloud()
    assert len(pts) > 1000
    # a flat plane at z=2: all world z ~= 2
    assert np.allclose(pts[:, 2], 2.0, atol=0.02)
    n1 = len(pts)
    # same keyframe again: voxel dedup keeps the cloud size stable
    pcm._accumulate(*pcm.kf_inputs[0], np.eye(3, dtype=np.float32),
                    np.zeros(3, np.float32))
    assert len(pcm.cloud()[0]) == n1


def test_rebuild_follows_corrected_poses():
    """The loop-rebuild contract (PointCloudMapping.cc:168-176): after the
    map's keyframe poses move, rebuild() re-projects every kept frame from
    the CORRECTED poses — a landmark's position in the cloud must move by
    exactly the pose correction."""
    cfg = SlamConfig(camera=CAM)
    pcm = PointCloudMapper(cfg)
    gray, depth = _flat_depth()
    m = FakeMap(1)
    pcm.insert_keyframe(0, gray, depth, m.kf_R[0], m.kf_t[0])
    before, _ = pcm.cloud()
    zb = np.median(before[:, 2])
    # correction: shift the keyframe 30 cm along +z (camera pulls back, the
    # world geometry it saw moves forward in world coords)
    m.kf_t[0, 2] = 0.3
    pcm.rebuild(m)
    after, _ = pcm.cloud()
    za = np.median(after[:, 2])
    assert abs((za - zb) - (-0.3)) < 0.02, (zb, za)
    # invalidated keyframes drop out of the rebuild
    m.kf_valid[0] = False
    pcm.rebuild(m)
    assert len(pcm.cloud()[0]) == 0


def test_amortized_rebuild_steps():
    """mark_dirty snapshots poses and clears; step() re-accumulates a
    bounded number of keyframes per call; drain() finishes the rest."""
    cfg = SlamConfig(camera=CAM)
    pcm = PointCloudMapper(cfg)
    gray, depth = _flat_depth()
    m = FakeMap(3)
    for k in range(3):
        pcm.insert_keyframe(k, gray, depth, m.kf_R[k], m.kf_t[k])
    m.kf_t[:, 2] = 0.3
    pcm.mark_dirty(m)
    assert len(pcm.cloud()[0]) == 0  # cleared, rebuild pending
    pcm.step(budget=1)
    assert pcm._rebuild_queue  # amortized: not finished in one step
    # pose edits AFTER mark_dirty must not affect the snapshot
    m.kf_t[:, 2] = 99.0
    pcm.drain()
    assert not pcm._rebuild_queue
    pts, _ = pcm.cloud()
    assert abs(np.median(pts[:, 2]) - 1.7) < 0.02


def test_system_polls_big_change(monkeypatch):
    """System.track_rgbd polls map.big_change_idx (System::MapChanged
    semantics) and SCHEDULES a dense-cloud rebuild (mark_dirty + amortized
    step calls) when a loop/GBA moved the gauge — the rebuild itself is
    spread over subsequent frames so the frame loop never stalls."""
    from plslam_tpu.models.system import System

    cfg = SlamConfig(camera=CAM, use_lines=False)
    slam = System(cfg, enable_loop_closing=False, enable_dense_cloud=True)
    calls = []
    monkeypatch.setattr(slam.cloud, "mark_dirty",
                        lambda m: calls.append(True))
    from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

    scene = RoomScene(0)
    poses = smooth_trajectory(20)[:4]
    for i, (R, t) in enumerate(poses):
        g, d = scene.render(CAM, R, t)
        slam.track_rgbd(g, d, i / 30.0)
    assert not calls
    slam.map.big_change_idx += 1  # what _correct_loop publishes
    g, d = scene.render(CAM, *poses[-1])
    slam.track_rgbd(g, d, len(poses) / 30.0)
    assert calls
