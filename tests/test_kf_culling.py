"""KeyFrameCulling (LocalMapping.cc:1224-1321) + Map.erase_keyframe."""

import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.local_mapping import LocalMapper
from plslam_tpu.models.map import HostFrame, SlamMap

CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)


class _FakeFrame:
    """Minimal FrameData stand-in for HostFrame construction."""

    def __init__(self, n_kp, n_ln, depth=2.0, octave=0):
        self.kp_xy = np.zeros((n_kp, 2), np.float32)
        self.kp_xy_un = np.zeros((n_kp, 2), np.float32)
        self.kp_resp = np.zeros(n_kp, np.float32)
        self.kp_octave = np.full(n_kp, octave, np.int32)
        self.kp_angle = np.zeros(n_kp, np.float32)
        self.kp_desc = np.zeros((n_kp, 32), np.uint8)
        self.kp_depth = np.full(n_kp, depth, np.float32)
        self.kp_ur = np.full(n_kp, -1.0, np.float32)
        self.kp_valid = np.ones(n_kp, bool)
        self.ln_ep = np.zeros((n_ln, 2, 2), np.float32)
        self.ln_ep_un = np.zeros((n_ln, 2, 2), np.float32)
        self.ln_angle = np.zeros(n_ln, np.float32)
        self.ln_length = np.zeros(n_ln, np.float32)
        self.ln_coeff = np.zeros((n_ln, 3), np.float32)
        self.ln_desc = np.zeros((n_ln, 72), np.uint8)
        self.ln_depth = np.zeros((n_ln, 2), np.float32)
        self.ln_valid = np.zeros(n_ln, bool)


def _build_map(cfg, n_kf=5, n_pts=40):
    """n_kf keyframes all observing the same n_pts points at octave 0."""
    m = SlamMap(cfg)
    R = np.eye(3, dtype=np.float32)
    for k in range(n_kf):
        host = HostFrame(_FakeFrame(cfg.orb.max_keypoints,
                                    cfg.lines.max_lines))
        m.add_keyframe(host, R, np.array([0.1 * k, 0, 0], np.float32), k, k)
    pids = []
    for i in range(n_pts):
        pid = m.add_point(np.array([i * 0.05, 0, 3.0]), np.zeros(32, np.uint8),
                          np.array([0, 0, 1.0]), 0.5, 10.0, 0)
        for k in range(n_kf):
            m.add_point_obs(pid, k, i)
        pids.append(pid)
    return m, pids


class TestKeyFrameCulling:
    def test_redundant_kf_culled(self):
        cfg = SlamConfig(camera=CAM)
        m, pids = _build_map(cfg)
        mapper = LocalMapper(cfg, m, enable_ba=False)
        # every point in KF 2 is seen by 4 other KFs at the same octave and
        # within the close-depth band -> fully redundant
        mapper.cull_keyframes(4)
        assert not m.kf_valid[2] or not m.kf_valid[1] or not m.kf_valid[3]
        assert m.kf_valid[0]          # KF0 never culled
        assert m.kf_valid[4]          # the current KF never culled
        # observations of culled KFs are detached
        for k in np.nonzero(~m.kf_valid[:5])[0]:
            assert (m.kf_pt_idx[k] == -1).all()
            for pid in pids:
                assert k not in m.pt_obs[pid]

    def test_unique_view_survives(self):
        cfg = SlamConfig(camera=CAM)
        m, pids = _build_map(cfg, n_kf=3)
        # KF1 is the ONLY observer of half its points (drop other obs)
        for pid in pids[:30]:
            for k in (0, 2):
                feat = m.pt_obs[pid].pop(k)
                m.kf_pt_idx[k, feat] = -1
        mapper = LocalMapper(cfg, m, enable_ba=False)
        mapper.cull_keyframes(2)
        assert m.kf_valid[1]

    def test_far_points_dont_count(self):
        cfg = SlamConfig(camera=CAM)
        m = SlamMap(cfg)
        R = np.eye(3, dtype=np.float32)
        far = cfg.tracking.th_depth * 2
        for k in range(5):
            host = HostFrame(_FakeFrame(cfg.orb.max_keypoints,
                                        cfg.lines.max_lines, depth=far))
            m.add_keyframe(host, R, np.zeros(3, np.float32), k, k)
        for i in range(40):
            pid = m.add_point(np.array([i * 0.05, 0, far]),
                              np.zeros(32, np.uint8),
                              np.array([0, 0, 1.0]), 0.5, 50.0, 0)
            for k in range(5):
                m.add_point_obs(pid, k, i)
        mapper = LocalMapper(cfg, m, enable_ba=False)
        mapper.cull_keyframes(4)
        # all observations are beyond th_depth -> no point qualifies, no cull
        assert m.kf_valid[:5].all()

    def test_erase_keyframe_reanchors_first_kf(self):
        cfg = SlamConfig(camera=CAM)
        m, pids = _build_map(cfg, n_kf=3)
        assert m.pt_first_kf[pids[0]] == 0
        # KF0 is protected; erase KF1 and check re-anchoring of a point
        # whose first KF is 1
        pid = m.add_point(np.zeros(3), np.zeros(32, np.uint8),
                          np.array([0, 0, 1.0]), 0.5, 10.0, 1)
        m.add_point_obs(pid, 1, 50)
        m.add_point_obs(pid, 2, 50)
        m.erase_keyframe(1)
        assert not m.kf_valid[1]
        assert m.pt_first_kf[pid] == 2
        # a point observed ONLY by the erased KF dies
        pid2 = m.add_point(np.zeros(3), np.zeros(32, np.uint8),
                           np.array([0, 0, 1.0]), 0.5, 10.0, 2)
        m.add_point_obs(pid2, 2, 51)
        m.erase_keyframe(2)
        assert not m.pt_valid[pid2]
