"""mbVO degraded localization mode (Tracking.cc:344-445).

Round-2 gap: localization-only tracking only suppressed keyframe creation;
passing through a weakly-mapped region dropped the tracker to LOST. Now
temporal (visual-odometry) points carry the pose while map matches starve,
and relocalization retries until the map is reacquired.
"""

import pytest

pytestmark = pytest.mark.slow  # system-level e2e tier

import numpy as np

import tests.conftest  # noqa: F401

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.system import System
from plslam_tpu.models.tracking import LOST, OK
from plslam_tpu.utils.synthetic import RoomScene

from tests.test_loop_closing import orbit_poses

CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)


def test_localization_survives_weakly_mapped_region():
    cfg = SlamConfig(camera=CAM, use_lines=False)
    slam = System(cfg, enable_loop_closing=False)
    scene = RoomScene(3)
    poses = orbit_poses(150)
    n_map = 60
    for i in range(n_map):
        R, t = poses[i]
        g, d = scene.render(CAM, R, t)
        slam.track_rgbd(g, d, i / 30.0)
    slam.tracker.flush()
    assert slam.tracking_state == OK
    m = slam.map
    n_kf = m.n_kf
    assert n_kf >= 6

    # DE-MAP the middle sector: erase every landmark anchored in the
    # middle band of keyframes (at most one observer outside it) — the
    # scene stays visually rich there (temporal VO has texture) but map
    # localization starves. "At most one outside observer" rather than
    # strictly band-exclusive: with the rescue stage the early frames
    # track so well that nearly every band landmark also picks up one
    # boundary observation.
    lo, hi = n_kf // 3, 2 * n_kf // 3
    band = set(range(lo, hi + 1))
    erased = 0
    for pid in m.point_ids():
        obs = m.pt_obs[pid]
        nb = sum(1 for k in obs if k in band)
        if obs and nb > 0 and len(obs) - nb <= 1:
            m.erase_point(pid)
            erased += 1
    assert erased > 50, f"only {erased} points in the band"

    slam.activate_localization_mode()
    tr = slam.tracker
    # replay the orbit through the de-mapped sector; rebuild bindings first
    tr._refresh_local_map(tr.last_pt_ids, tr.last_ln_ids)
    vo_seen = False
    states = []
    for j, i in enumerate(range(2, n_map - 2)):
        R, t = poses[i]
        g, d = scene.render(CAM, R, t)
        slam.track_rgbd(g, d, (n_map + j) / 30.0)
        states.append(slam.tracking_state)
        vo_seen = vo_seen or tr.vo_mode
    tr.flush()
    # VO must have engaged inside the de-mapped sector, the tracker must
    # never drop to LOST, and the map must be reacquired by the end
    assert vo_seen, "vo_mode never engaged in the de-mapped sector"
    assert LOST not in states, "tracker went LOST despite VO fallback"
    assert slam.tracking_state == OK
    assert not tr.vo_mode, "map not reacquired after leaving the sector"
    assert m.n_kf == n_kf  # localization mode: map frozen

    # pose error in the MAP gauge (world = first camera frame): the
    # expected pose is T_gt(i) ∘ T_gt(0)^-1
    R_est, t_est = tr.last_pose
    Rg, tg = poses[n_map - 3]
    R0, t0 = poses[0]
    R_exp = Rg @ R0.T
    t_exp = tg - R_exp @ t0
    err = np.linalg.norm(-(R_est.T @ t_est) - (-(R_exp.T @ t_exp)))
    assert err < 0.30, f"pose err {err*100:.1f}cm after VO + reacquire"
