"""System facade: owns the map, all pipeline passes, and the savers.

The TPU-native equivalent of ``ORB_SLAM2::System``
(/root/reference/include/System.h, src/System.cc): construction wires
vocabulary → keyframe database → map → tracking / local-mapping /
loop-closing / dense-cloud passes (the reference launches std::threads,
:86-118; here the passes run sequentially per frame / per keyframe),
``track_rgbd`` is the per-frame entry (TrackRGBD, :175-230), and the savers
emit byte-compatible TUM / KITTI trajectories and a PCD cloud
(:337-487, :507).
"""

from __future__ import annotations

import os

import numpy as np

from ..bow.database import KeyFrameDatabase
from ..bow.vocabulary import Vocabulary
from ..config import SlamConfig
from ..geometry import se3
from ..utils import tum_io
from .local_mapping import LocalMapper
from .loop_closing import LoopCloser
from .map import SlamMap
from .pointcloud import PointCloudMapper
from .tracking import LOST, NOT_INITIALIZED, OK, Tracker

_DEFAULT_VOCAB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bow", "vocab_synth.npz",
)


class System:
    def __init__(self, cfg: SlamConfig, vocabulary_path: str | None = None,
                 enable_loop_closing: bool = True,
                 enable_dense_cloud: bool = False,
                 localization_only: bool = False,
                 async_mapping: bool = False,
                 sensor: str = "rgbd",
                 trace_path: str | None = None,
                 tune_gc: bool = False):
        from ..utils.tracing import Tracer

        if tune_gc:
            # keep CPython's gen-2 collector out of the frame loop (the
            # 0.3-1.6 s pause source, PERF.md §3.1); explicit sweeps run at
            # compaction/shutdown instead (utils.gctune). PROCESS-GLOBAL:
            # gc.freeze() pins every object alive at this call and
            # automatic gen-2 collection is disabled until untune_gc() —
            # that is why this is opt-in (bench.py and the runner scripts
            # enable it; an embedding application decides for itself).
            from ..utils import gctune

            gctune.tune_gc()

        if sensor == "mono" and cfg.loop.fix_scale:
            # monocular scale is unobservable: loop corrections estimate a
            # full Sim3 and the essential graph runs 7-dof so scale drift
            # can be absorbed (mbFixScale = sensor != MONOCULAR,
            # LoopClosing ctor /root/reference/src/LoopClosing.cc:37-43,
            # OptimizeEssentialGraph fix_scale=false Optimizer.cc:1135)
            import dataclasses as _dc

            cfg = cfg.replace(loop=_dc.replace(cfg.loop, fix_scale=False))
        self.cfg = cfg
        self.sensor = sensor  # System eSensor (System.h:58-66)
        self.tracer = Tracer(trace_path)
        vocab_path = vocabulary_path or _DEFAULT_VOCAB
        if vocab_path.endswith(".txt"):
            self.voc = Vocabulary  # pragma: no cover - heavy external file
            from ..bow.vocabulary import load_dbow2_text

            self.voc = load_dbow2_text(vocab_path)
        else:
            self.voc = Vocabulary.load(vocab_path)
        self.map = SlamMap(cfg)
        self.kfdb = KeyFrameDatabase(self.voc, cfg.capacity.max_keyframes)
        self.local_mapper = LocalMapper(cfg, self.map,
                                        enable_ba=not localization_only,
                                        kfdb=self.kfdb)
        if async_mapping:
            from .async_mapping import AsyncLocalMapper

            self.local_mapper = AsyncLocalMapper(self.local_mapper)
        self.loop_closer = (
            LoopCloser(cfg, self.map, self.kfdb, self.voc, self.local_mapper)
            if enable_loop_closing else None
        )
        if async_mapping and self.loop_closer is not None:
            from .async_mapping import AsyncLoopCloser

            self.loop_closer = AsyncLoopCloser(self.loop_closer)
        self.tracker = Tracker(cfg, self.map, local_mapper=self.local_mapper,
                               loop_closer=self.loop_closer, voc=self.voc,
                               kfdb=self.kfdb, sensor=sensor,
                               tracer=self.tracer)
        if self.loop_closer is not None:
            self.loop_closer.tracker = self.tracker
        self.cloud = PointCloudMapper(cfg) if enable_dense_cloud else None
        self.localization_only = localization_only
        self._last_n_kf = 0
        self._last_cloud_change = 0

    # ------------------------------------------------------------------ API
    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray,
                   timestamp: float):
        """Track one RGB-D frame; returns (R, t) world-to-camera or None.
        ``depth`` in metres (apply DepthMapFactor upstream, Tracking.cc:228)."""
        out = self.tracker.process(gray, depth, timestamp)
        if self.cloud is not None:
            if self.map.n_kf != self._last_n_kf:
                kf = self.map.n_kf - 1
                self.cloud.insert_keyframe(kf, gray, depth,
                                           self.map.kf_R[kf],
                                           self.map.kf_t[kf])
                self._last_n_kf = self.map.n_kf
            # loop-correction / GBA gauge moves invalidate the accumulated
            # cloud: schedule a rebuild from the corrected keyframe poses —
            # the reference's is_loop_ rebuild (PointCloudMapping.cc:168-176,
            # set from LoopClosing.cc:1100-1110) — snapshotting poses under
            # the map lock (async workers may still be writing) and
            # amortizing the re-accumulation over subsequent frames so the
            # frame loop doesn't stall right after a loop closure
            if self.map.big_change_idx != self._last_cloud_change:
                with self.tracker._map_lock:
                    self.cloud.mark_dirty(self.map)
                self._last_cloud_change = self.map.big_change_idx
            self.cloud.step()
        return out

    def track_stereo(self, gray_l: np.ndarray, gray_r: np.ndarray,
                     timestamp: float):
        """Track one rectified stereo pair (System::TrackStereo,
        System.cc:121-174)."""
        if self.sensor != "stereo":
            raise RuntimeError(
                "System was not constructed with sensor='stereo'")
        return self.tracker.process_stereo(gray_l, gray_r, timestamp)

    def track_monocular(self, gray: np.ndarray, timestamp: float):
        """Track one monocular frame (System::TrackMonocular,
        System.cc:236-280); returns (R, t) up to the bootstrap scale."""
        if self.sensor != "mono":
            raise RuntimeError("System was not constructed with sensor='mono'")
        return self.tracker.process_mono(gray, timestamp)

    def activate_localization_mode(self):
        """ActivateLocalizationMode (System.cc:129-140): freeze mapping."""
        self.local_mapper.enable_ba = False
        self.localization_only = True
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        self.local_mapper.enable_ba = True
        self.localization_only = False
        self.tracker.only_tracking = False

    def reset(self):
        self.tracker.reset()

    def shutdown(self):
        """Drain the tracking pipeline and join the async mapping and
        loop-closing workers (System::Shutdown, System.cc:313-335)."""
        self.tracker.flush()
        lm = self.local_mapper
        if hasattr(lm, "wait_idle"):
            lm.wait_idle(timeout=30.0)
        lc = self.loop_closer
        if lc is not None and hasattr(lc, "wait_idle"):
            lc.wait_idle(timeout=60.0)
            lc.shutdown()
        if hasattr(lm, "wait_idle"):
            lm.wait_idle(timeout=30.0)
            lm.shutdown()
        self.tracer.close()
        from ..utils import gctune

        if gctune.is_tuned():
            gctune.collect_old()  # safe point: nothing in flight

    def compact_map(self):
        """Reclaim erased landmark arena slots (unbounded-run support).
        Drains the tracking pipeline and pauses at a safe sync point, then
        remaps the tracker's id tables and rebuilds its device local map."""
        tr = self.tracker
        tr.flush()
        lm = self.local_mapper
        if hasattr(lm, "wait_idle"):
            lm.wait_idle(timeout=30.0)
        lc = self.loop_closer
        if lc is not None and hasattr(lc, "wait_idle"):
            lc.wait_idle(timeout=60.0)
        with tr._map_lock:
            pt_map, ln_map = self.map.compact()
            if tr.last_pt_ids is not None:
                ids = tr.last_pt_ids
                tr.last_pt_ids = np.where(
                    ids >= 0, pt_map[np.clip(ids, 0, None)], -1)
            if tr.last_ln_ids is not None:
                ids = tr.last_ln_ids
                tr.last_ln_ids = np.where(
                    ids >= 0, ln_map[np.clip(ids, 0, None)], -1)
            base = lm.inner if hasattr(lm, "inner") else lm
            base.recent_points = [
                (int(pt_map[p]), born) for p, born in base.recent_points
                if pt_map[p] >= 0]
            base.recent_lines = [
                (int(ln_map[l]), born) for l, born in base.recent_lines
                if ln_map[l] >= 0]
            if tr.state == 1 and tr.last_pt_ids is not None:
                tr._refresh_local_map(tr.last_pt_ids, tr.last_ln_ids)
        from ..utils import gctune

        if gctune.is_tuned():
            gctune.collect_old()  # safe point: pipeline drained above

    def save_map(self, path: str):
        """Persist the world model (no reference analogue — ORB-SLAM2
        famously cannot save maps; see utils.checkpoint)."""
        from ..utils import checkpoint

        self.tracker.flush()
        checkpoint.save_map(self.map, path)

    def load_map(self, path: str):
        """Restore a saved map and re-register its keyframes with the BoW
        database. The tracker starts LOST and relocalizes into the map —
        pair with localization_only=True for pure localization."""
        from ..utils import checkpoint
        from .tracking import LOST

        new_map = checkpoint.load_map(self.cfg, path)
        self.map.__dict__.update(new_map.__dict__)
        checkpoint.register_keyframes(self)
        self.tracker.state = LOST
        self.tracker.n_lost_frames = 0
        # no motion prior into a freshly loaded map: the short-lost reloc
        # gate must not compare against a stale pre-load pose
        self.tracker.last_pose = None

    def map_changed(self) -> bool:
        """System::MapChanged (System.cc:294-305)."""
        idx = self.map.big_change_idx
        changed = idx > getattr(self, "_last_big_change", 0)
        self._last_big_change = idx
        return changed

    @property
    def tracking_state(self) -> int:
        return self.tracker.state

    # ---------------------------------------------------------------- savers
    def _quiesce(self):
        """Drain in-flight frames and let the async workers finish their
        queues, so savers see a settled map."""
        self.tracker.flush()
        for w in (self.local_mapper, self.loop_closer):
            if w is not None and hasattr(w, "wait_idle"):
                w.wait_idle(timeout=60.0)

    def save_trajectory_tum(self, path: str):
        """Frame trajectory in TUM format (SaveTrajectoryTUM,
        System.cc:337-396). Poses are HEALED: each frame is re-composed
        against the current pose of its reference keyframe, so loop
        closures / GBA retroactively correct the whole trajectory."""
        self._quiesce()
        traj = self.tracker.healed_trajectory()
        ts = [t for t, _, _ in traj]
        poses = [se3_inv_np(R, t) for _, R, t in traj]
        tum_io.save_trajectory_tum(path, ts, poses)

    def save_keyframe_trajectory_tum(self, path: str):
        """SaveKeyFrameTrajectoryTUM (System.cc:398-441)."""
        m = self.map
        ts, poses = [], []
        for k in range(m.n_kf):
            if m.kf_valid[k]:
                ts.append(m.kf_timestamp[k])
                poses.append(se3_inv_np(m.kf_R[k], m.kf_t[k]))
        tum_io.save_trajectory_tum(path, ts, poses)

    def save_trajectory_kitti(self, path: str):
        """SaveTrajectoryKITTI (System.cc:443-487). Healed like the TUM
        saver: poses re-composed against current reference-keyframe poses."""
        self._quiesce()
        poses = [se3_inv_np(R, t)
                 for _, R, t in self.tracker.healed_trajectory()]
        tum_io.save_trajectory_kitti(path, poses)

    def save_pcd(self, path: str):
        if self.cloud is not None:
            self._quiesce()
            if self.map.big_change_idx != self._last_cloud_change:
                with self.tracker._map_lock:
                    self.cloud.mark_dirty(self.map)
                self._last_cloud_change = self.map.big_change_idx
            self.cloud.drain()
            self.cloud.save_pcd(path)


def se3_inv_np(R: np.ndarray, t: np.ndarray):
    """Tcw -> Twc as numpy (the savers emit camera-to-world)."""
    Rwc = R.T
    return Rwc, -Rwc @ t
