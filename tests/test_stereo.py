"""Stereo pipeline: ComputeStereoMatches depth + TrackStereo e2e
(Frame.cc:888-1062, Tracking.cc:170-208)."""

import pytest

pytestmark = pytest.mark.slow  # system-level e2e tier

import jax
import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models import frame as mframe
from plslam_tpu.models.local_mapping import LocalMapper
from plslam_tpu.models.map import SlamMap
from plslam_tpu.models.tracking import Tracker
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory


def _cfg():
    return SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                                    bf=40.0))


def _stereo_pair(scene, cam, R, t):
    b = cam.bf / cam.fx
    gl, dl = scene.render(cam, R, t)
    gr, _ = scene.render(cam, R, t - np.array([b, 0, 0], np.float32))
    return (np.clip(gl, 0, 255).astype(np.uint8),
            np.clip(gr, 0, 255).astype(np.uint8), dl)


def test_stereo_depth_accuracy():
    cfg = _cfg()
    scene = RoomScene(0)
    R, t = smooth_trajectory(4)[0]
    gl, gr, dl = _stereo_pair(scene, cfg.camera, R, t)
    fd = mframe.build_frame_stereo(gl, gr, cfg)
    fd = jax.device_get(fd)
    ok = fd.kp_valid & (fd.kp_depth > 0)
    assert ok.sum() > 200  # most keypoints get stereo depth
    xy = np.round(fd.kp_xy[ok]).astype(int)
    gt = dl[np.clip(xy[:, 1], 0, 479), np.clip(xy[:, 0], 0, 639)]
    est = fd.kp_depth[ok]
    rel = np.abs(est - gt) / np.maximum(gt, 1e-6)
    # median relative depth error small (subpixel SAD disparity)
    assert np.median(rel) < 0.03


def test_stereo_tracking_e2e():
    cfg = _cfg()
    scene = RoomScene(0)
    n = 25
    poses = smooth_trajectory(2 * n)[:n]
    m = SlamMap(cfg)
    tr = Tracker(cfg, m, local_mapper=LocalMapper(cfg, m), sensor="stereo")
    for i, (R, t) in enumerate(poses):
        gl, gr, _ = _stereo_pair(scene, cfg.camera, R, t)
        tr.process_stereo(gl, gr, i / 30.0)
    tr.flush()
    assert tr.state == 1
    assert m.n_kf >= 1
    # metric ATE after rigid alignment (map origin = first camera frame)
    from plslam_tpu.utils import tum_io

    ts = np.array([s for s, _, _ in tr.trajectory])
    est = np.array([-R.T @ t for _, R, t in tr.trajectory])
    gt = np.array([-R.T @ t for R, t in poses])
    assert len(est) >= n - 2
    ate = tum_io.ate_rmse(ts, est, np.arange(n) / 30.0, gt)
    assert ate < 0.03  # 3 cm
