"""Monocular pipeline: two-view bootstrap + scale-ambiguous tracking
(Tracking.cc:729-903 MonocularInitialization/CreateInitialMapMonocular)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # system-level e2e tier

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.local_mapping import LocalMapper
from plslam_tpu.models.map import SlamMap
from plslam_tpu.models.tracking import Tracker
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory


def _cfg():
    return SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                                    bf=40.0))


def _sim_align(est, gt):
    """Umeyama similarity alignment residual RMSE (mono is scale-free)."""
    mu_e, mu_g = est.mean(0), gt.mean(0)
    e0, g0 = est - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(e0.T @ g0 / len(est))
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    var = (e0 ** 2).sum() / len(est)
    s = (S * [1, 1, d]).sum() / max(var, 1e-12)
    res = gt - (s * (est @ R.T) + (mu_g - s * R @ mu_e))
    return np.sqrt((res ** 2).sum(-1).mean())


def test_mono_bootstrap_and_tracking():
    cfg = _cfg()
    scene = RoomScene(0)
    n = 40
    poses = smooth_trajectory(2 * n)[:n]
    m = SlamMap(cfg)
    tr = Tracker(cfg, m, local_mapper=LocalMapper(cfg, m), sensor="mono")
    for i, (R, t) in enumerate(poses):
        g, _ = scene.render(cfg.camera, R, t)
        tr.process_mono(g, i / 30.0)
    tr.flush()
    assert tr.state == 1  # OK
    assert m.n_kf >= 2
    assert m.n_points() > 100
    # trajectory correct up to a similarity transform
    ts = np.array([t for t, _, _ in tr.trajectory])
    est = np.array([-R.T @ t for _, R, t in tr.trajectory])
    idx = np.clip((ts * 30).round().astype(int), 0, n - 1)
    gt = np.array([-poses[i][0].T @ poses[i][1] for i in idx])
    assert len(est) >= n - 10  # bootstrap eats a few frames
    assert _sim_align(est, gt) < 0.05  # 5 cm at room scale


def test_mono_rejects_without_parallax():
    cfg = _cfg()
    scene = RoomScene(0)
    R0, t0 = smooth_trajectory(4)[0]
    m = SlamMap(cfg)
    tr = Tracker(cfg, m, sensor="mono")
    g, _ = scene.render(cfg.camera, R0, t0)
    for i in range(3):  # identical frames: no baseline, must not initialize
        tr.process_mono(g, i / 30.0)
    assert tr.state == 0  # NOT_INITIALIZED
    assert m.n_kf == 0
