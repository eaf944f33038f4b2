import pytest

pytestmark = pytest.mark.slow  # system-level e2e tier

import numpy as np
import os

from plslam_tpu.bow.database import KeyFrameDatabase
from plslam_tpu.bow.vocabulary import Vocabulary
from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.local_mapping import LocalMapper
from plslam_tpu.models.map import SlamMap
from plslam_tpu.models.tracking import Tracker, OK, LOST
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

VOC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plslam_tpu", "bow", "vocab_synth.npz",
)
CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)


class TestRelocalization:
    def test_recovers_after_blackout(self):
        cfg = SlamConfig(camera=CAM, use_lines=False)
        voc = Vocabulary.load(VOC_PATH)
        m = SlamMap(cfg)
        kfdb = KeyFrameDatabase(voc, max_kf=cfg.capacity.max_keyframes)
        tr = Tracker(cfg, m, local_mapper=LocalMapper(cfg, m), voc=voc, kfdb=kfdb)
        scene = RoomScene(0)
        poses = smooth_trajectory(60)[:30]
        R0g, t0g = poses[0]

        # phase 1: normal tracking (pipelined: the first `pipeline_depth`
        # post-init frames return None — results arrive with later calls)
        for i in range(15):
            g, d = scene.render(CAM, *poses[i])
            out = tr.process(g, d, i / 30.0)
            if i == 0 or i > tr.pipeline_depth:
                assert out is not None
        assert tr.state == OK
        assert m.n_kf >= 2

        # phase 2: blackout (uniform frames, no depth)
        for i in range(15, 19):
            g = np.full((480, 640), 120.0, np.float32)
            d = np.zeros((480, 640), np.float32)
            tr.process(g, d, i / 30.0)
        assert tr.state == LOST

        # phase 3: return to a previously seen viewpoint
        ok = False
        for i in range(19, 26):
            back = poses[max(10 - (i - 19), 2)]
            g, d = scene.render(CAM, *back)
            out = tr.process(g, d, i / 30.0)
            if tr.state == OK:
                Re, te = out
                Rg, tg = back
                Rrel = Rg @ R0g.T
                trel = tg - Rrel @ t0g
                err = np.linalg.norm(-Re.T @ te - (-Rrel.T @ trel))
                assert err < 0.05, f"reloc pose err {err*100:.1f}cm"
                ok = True
                break
        assert ok, "never relocalized"

    def test_recovers_after_blackout_fast_camera(self):
        """Round-4 regression guard: the short-lost relocalization gate
        must scale its jump budget with the MEASURED camera speed. At
        ~2x the nominal trajectory speed a fixed 6 cm budget rejects
        every correct relocalization for 10 frames (permanent LOST); the
        speed-scaled gate accepts it within a few frames (the reference
        accepts any reloc pose, Tracking.cc:2049-2269)."""
        cfg = SlamConfig(camera=CAM, use_lines=False)
        voc = Vocabulary.load(VOC_PATH)
        m = SlamMap(cfg)
        kfdb = KeyFrameDatabase(voc, max_kf=cfg.capacity.max_keyframes)
        tr = Tracker(cfg, m, local_mapper=LocalMapper(cfg, m), voc=voc,
                     kfdb=kfdb)
        scene = RoomScene(0)
        poses = smooth_trajectory(30)[:15]  # ~2x faster than the slow test
        for i in range(15):
            g, d = scene.render(CAM, *poses[i])
            tr.process(g, d, i / 30.0)
        assert tr.state == OK
        assert m.n_kf >= 2

        for i in range(15, 19):  # blackout
            g = np.full((480, 640), 120.0, np.float32)
            d = np.zeros((480, 640), np.float32)
            tr.process(g, d, i / 30.0)
        assert tr.state == LOST

        # return near a previously seen viewpoint: recovery must land
        # within a handful of frames even though the jump from the last
        # confident pose is several times the old fixed budget
        recovered_at = None
        for i in range(19, 27):
            back = poses[max(10 - (i - 19) * 2, 2)]
            g, d = scene.render(CAM, *back)
            tr.process(g, d, i / 30.0)
            if tr.state == OK:
                recovered_at = i - 19
                break
        assert recovered_at is not None, "never relocalized at speed"
        assert recovered_at <= 5, f"took {recovered_at} frames"
