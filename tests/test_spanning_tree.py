"""Spanning-tree bookkeeping (KeyFrame::UpdateConnections tail +
SetBadFlag reparenting, reference KeyFrame.cc:443-451, 526-618)."""

import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.frame import FrameData
from plslam_tpu.models.map import HostFrame, SlamMap


def _cfg():
    return SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                                    bf=40.0))


def _host(cfg):
    n = cfg.orb.max_keypoints
    nl = cfg.lines.max_lines
    z = np.zeros
    return HostFrame(FrameData(
        kp_xy=z((n, 2), np.float32), kp_xy_un=z((n, 2), np.float32),
        kp_resp=z(n, np.float32), kp_octave=z(n, np.int32),
        kp_angle=z(n, np.float32), kp_desc=z((n, 32), np.uint8),
        kp_depth=z(n, np.float32), kp_ur=z(n, np.float32),
        kp_valid=z(n, bool),
        ln_ep=z((nl, 2, 2), np.float32), ln_ep_un=z((nl, 2, 2), np.float32),
        ln_angle=z(nl, np.float32), ln_length=z(nl, np.float32),
        ln_coeff=z((nl, 3), np.float32), ln_desc=z((nl, 72), np.uint8),
        ln_depth=z((nl, 2), np.float32), ln_valid=z(nl, bool),
    ))


def _add_kf(m, cfg, k):
    return m.add_keyframe(_host(cfg), np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32), k, float(k))


def test_parent_is_strongest_covisible():
    cfg = _cfg()
    m = SlamMap(cfg)
    for k in range(3):
        _add_kf(m, cfg, k)
    # kf2 shares 3 points with kf0 and 1 with kf1
    for i in range(3):
        pid = m.add_point([0, 0, 1], np.zeros(32, np.uint8), [0, 0, 1], 0.1,
                          10.0, 0)
        m.add_point_obs(pid, 0, i)
        m.add_point_obs(pid, 2, i)
    pid = m.add_point([0, 0, 1], np.zeros(32, np.uint8), [0, 0, 1], 0.1,
                      10.0, 1)
    m.add_point_obs(pid, 1, 3)
    m.add_point_obs(pid, 2, 3)
    m.update_spanning_tree(2)
    assert m.kf_parent[2] == 0
    assert 2 in m.kf_children[0]


def test_erase_reparents_children():
    cfg = _cfg()
    m = SlamMap(cfg)
    for k in range(4):
        _add_kf(m, cfg, k)
    # chain 0 <- 1 <- 2, and 3 shares points with 1 and 0
    for kf, feats in [(0, (0, 1)), (1, (0, 1)), (2, (0,)), (3, (1,))]:
        pass
    pid = m.add_point([0, 0, 1], np.zeros(32, np.uint8), [0, 0, 1], 0.1,
                      10.0, 0)
    for kf, feat in [(0, 0), (1, 0), (2, 0), (3, 0)]:
        m.add_point_obs(pid, kf, feat)
    for k in (1, 2, 3):
        m.update_spanning_tree(k)
    assert m.kf_parent[1] == 0
    # children of 1 before erase
    kids = set(m.kf_children[1])
    m.erase_keyframe(1)
    assert not m.kf_valid[1]
    assert m.kf_parent[1] == -1
    for ch in kids:
        p = m.kf_parent[ch]
        assert p >= 0 and p != 1 and m.kf_valid[p]


def test_tree_never_attaches_kf0_to_child():
    cfg = _cfg()
    m = SlamMap(cfg)
    _add_kf(m, cfg, 0)
    m.update_spanning_tree(0)
    assert m.kf_parent[0] == -1
