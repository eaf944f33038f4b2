"""End-to-end RGB-D SLAM test on the synthetic room (the TUM stand-in).

Tracks a rendered sequence with exact ground truth and checks ATE — the
same protocol as the reference's golden-trajectory evaluation
(/root/reference/results/CameraTrajectory.txt + TUM evaluate_ate), minus
the dataset (not available in this environment).
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # system-level e2e tier

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.local_mapping import LocalMapper
from plslam_tpu.models.map import SlamMap
from plslam_tpu.models.tracking import Tracker
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)


def run_sequence(cfg, n_frames=40, seed=0):
    scene = RoomScene(seed)
    poses = smooth_trajectory(n_frames * 2)[:n_frames]  # gentler motion
    m = SlamMap(cfg)
    lm = LocalMapper(cfg, m)
    tr = Tracker(cfg, m, local_mapper=lm)
    R0g, t0g = poses[0]
    for i, (R, t) in enumerate(poses):
        g, d = scene.render(cfg.camera, R, t)
        tr.process(g, d, i / 30.0)
    tr.flush()  # drain the lag-1 pipeline
    # every frame must have produced a trajectory entry; evaluate by timestamp
    assert len(tr.trajectory) == n_frames, (
        f"only {len(tr.trajectory)}/{n_frames} frames tracked"
    )
    errs = []
    for ts, Re, te in tr.trajectory:
        i = int(round(ts * 30.0))
        R, t = poses[i]
        Rrel = R @ R0g.T
        trel = t - Rrel @ t0g
        errs.append(np.linalg.norm(-Re.T @ te - (-Rrel.T @ trel)))
    return np.array(errs), m, tr


class TestEndToEnd:
    def test_points_only_ate(self):
        cfg = SlamConfig(camera=CAM, use_lines=False)
        errs, m, tr = run_sequence(cfg)
        rmse = float(np.sqrt((errs**2).mean()))
        assert tr.state == 1, "tracking lost"
        assert rmse < 0.03, f"ATE RMSE {rmse*100:.2f}cm"
        assert errs.max() < 0.06, f"worst {errs.max()*100:.2f}cm"
        assert m.n_kf >= 2

    def test_point_and_line_ate(self):
        cfg = SlamConfig(camera=CAM, use_lines=True)
        errs, m, tr = run_sequence(cfg)
        rmse = float(np.sqrt((errs**2).mean()))
        assert tr.state == 1
        assert rmse < 0.03, f"ATE RMSE {rmse*100:.2f}cm"
        assert m.n_lines() > 0, "no map lines created"

    def test_map_stays_bounded(self):
        cfg = SlamConfig(camera=CAM, use_lines=False)
        _, m, _ = run_sequence(cfg, n_frames=30)
        # fusion + culling must keep duplicates under control
        assert m.n_points() < 3000, f"{m.n_points()} points (duplicate blowup)"


def test_post_init_self_sufficient(tmp_path):
    """The first seconds of a sequence must not lean on relocalization:
    the fused step's rescue stage (the TrackReferenceKeyFrame equivalent,
    Tracking.cc:335-337,942-1032) carries any frame whose motion stage
    starves (no velocity prior yet, ~0.15-0.3 m/frame here). Asserts ZERO
    reloc events and >=50 motion-or-rescue inliers on every post-init
    frame — previously the tracker silently round-tripped through
    LOST->instant-reloc every other early frame."""
    import json

    from plslam_tpu.models.system import System

    path = str(tmp_path / "trace.jsonl")
    cfg = SlamConfig(camera=CAM, use_lines=False)
    slam = System(cfg, enable_loop_closing=False, trace_path=path)
    scene = RoomScene(0)
    poses = smooth_trajectory(20)[:10]
    for i, (R, t) in enumerate(poses):
        g, d = scene.render(CAM, R, t)
        slam.track_rgbd(g, d, i / 30.0)
    slam.tracker.flush()
    slam.shutdown()
    recs = [json.loads(line) for line in open(path)]
    relocs = [r for r in recs if r["kind"] == "reloc"]
    assert not relocs, f"hidden LOST round trips: {relocs}"
    frames = [r for r in recs if r["kind"] == "frame"]
    assert len(frames) == 9, f"{len(frames)}/9 frames retired OK"
    for r in frames:
        got = max(r["motion_inliers"], r["rescue_inliers"])
        assert got >= 50, f"frame {r['frame']}: {got} track inliers"
