"""Multi-sequence batched tracking (parallel.multiseq): one vmapped fused
step drives B independent SLAM sessions with identical per-sequence
semantics."""

import pytest

pytestmark = pytest.mark.slow  # system-level e2e tier

import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.local_mapping import LocalMapper
from plslam_tpu.models.map import SlamMap
from plslam_tpu.models.tracking import Tracker
from plslam_tpu.parallel.multiseq import MultiTracker
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory
from plslam_tpu.utils import tum_io


def _cfg():
    return SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                                    bf=40.0))


def test_batched_tracking_matches_solo():
    cfg = _cfg()
    n = 25
    B = 3
    scenes = [RoomScene(s) for s in range(B)]
    poses = smooth_trajectory(2 * n)[:n]
    seqs = []
    for s in range(B):
        frames = []
        for R, t in poses:
            g, d = scenes[s].render(cfg.camera, R, t)
            frames.append((g, d))
        seqs.append(frames)

    trackers = [
        Tracker(cfg, (m := SlamMap(cfg)), local_mapper=LocalMapper(cfg, m))
        for _ in range(B)
    ]
    mt = MultiTracker(trackers)
    for i in range(n):
        mt.process([seqs[s][i] for s in range(B)], [i / 30.0] * B)
    mt.flush()

    gt = np.array([-R.T @ t for R, t in poses])
    for s, tr in enumerate(trackers):
        assert tr.state == 1, f"seq {s} lost"
        ts = np.array([x for x, _, _ in tr.trajectory])
        est = np.array([-R.T @ t for _, R, t in tr.trajectory])
        assert len(est) >= n - 2
        ate = tum_io.ate_rmse(ts, est, np.arange(n) / 30.0, gt)
        assert ate < 0.03, f"seq {s} ATE {ate}"
        assert tr.map.n_kf >= 1
