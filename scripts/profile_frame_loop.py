"""Per-frame latency breakdown of the bench loop on the real TPU.

Times every tracker.process() call across a synthetic sequence, marks the
frames where keyframe events / local-map refreshes happened, and prints a
latency histogram + an attribution table — the tool for finding where the
frame loop's time actually goes (dispatch, wire, KF events, mapper
interference)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main():
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.geometry.projection import Camera
    from plslam_tpu.models.async_mapping import AsyncLocalMapper
    from plslam_tpu.models.local_mapping import LocalMapper
    from plslam_tpu.models.map import SlamMap
    from plslam_tpu.models.tracking import Tracker
    from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

    cfg = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                                   bf=40.0))
    pd = int(os.environ.get("PROF_PIPELINE_DEPTH", "0"))
    if pd:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, tracking=dataclasses.replace(cfg.tracking,
                                              pipeline_depth=pd))
    n = int(os.environ.get("PROF_FRAMES", "150"))
    scene = RoomScene(0)
    poses = smooth_trajectory(2 * n)[:n]
    f = cfg.tracking.depth_map_factor
    frames = []
    for R, t in poses:
        gray, depth = scene.render(cfg.camera, R, t)
        frames.append((np.clip(gray, 0, 255).astype(np.uint8),
                       np.clip(depth * f, 0, 65535).astype(np.uint16)))

    import jax

    class ProfTracker(Tracker):
        """Per-phase wall-clock attribution."""

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.phase = {"dispatch": [], "wire": [], "book": [],
                          "kf": [], "refresh": []}

        def _dispatch(self, *a, **kw):
            t0 = time.perf_counter()
            out = super()._dispatch(*a, **kw)
            self.phase["dispatch"].append(time.perf_counter() - t0)
            return out

        def _finish(self, pending):
            t0 = time.perf_counter()
            # the real wire wait; jax caches the host copy so the second
            # device_get inside super()._finish() is free
            jax.device_get(pending["out"].wire)
            self.phase["wire"].append(time.perf_counter() - t0)
            t1 = time.perf_counter()
            ok = super()._finish(pending)
            self.phase["book"].append(time.perf_counter() - t1)
            return ok

        def _create_new_keyframe(self, *a, **kw):
            t0 = time.perf_counter()
            r = super()._create_new_keyframe(*a, **kw)
            self.phase["kf"].append(time.perf_counter() - t0)
            return r

        def _refresh_local_map(self, *a, **kw):
            t0 = time.perf_counter()
            r = super()._refresh_local_map(*a, **kw)
            self.phase["refresh"].append(time.perf_counter() - t0)
            return r

    def run():
        m = SlamMap(cfg)
        tracker = ProfTracker(cfg, m, local_mapper=AsyncLocalMapper(
            LocalMapper(cfg, m)))
        times = np.zeros(n)
        kf_at = np.zeros(n, bool)
        t_all0 = time.perf_counter()
        for i in range(n):
            kf_before = tracker.last_kf_id
            t0 = time.perf_counter()
            tracker.process(frames[i][0], frames[i][1], i / 30.0)
            times[i] = time.perf_counter() - t0
            kf_at[i] = tracker.last_kf_id != kf_before
        tracker.flush()
        total = time.perf_counter() - t_all0
        tracker.local_mapper.shutdown()
        return times, kf_at, total, m.n_kf, tracker.phase

    import gc

    run()  # rehearsal (compiles cached)
    best = None
    for _ in range(2):
        gc.collect()
        gc.disable()
        try:
            times, kf_at, total, n_kf, phase = run()
        finally:
            gc.enable()
        if best is None or total < best[2]:
            best = (times, kf_at, total, n_kf, phase)
    times, kf_at, total, n_kf, phase = best

    ms = times * 1e3
    print(f"frames {n}  total {total:.2f}s  fps {n/total:.1f}  kfs {n_kf}")
    qs = np.percentile(ms, [10, 50, 90, 99])
    print(f"per-call ms: p10 {qs[0]:.1f}  p50 {qs[1]:.1f}  p90 {qs[2]:.1f}"
          f"  p99 {qs[3]:.1f}  max {ms.max():.1f}")
    kf_frames = np.nonzero(kf_at)[0]
    non_kf = ms[~kf_at]
    print(f"KF frames: {len(kf_frames)}  mean {ms[kf_at].mean():.1f} ms"
          f"  | non-KF mean {non_kf.mean():.1f} ms")
    # time attribution: sum of slowest decile vs the rest
    order = np.argsort(ms)[::-1]
    top = order[: max(n // 10, 1)]
    print(f"slowest 10% of calls hold {ms[top].sum()/ms.sum()*100:.0f}% of "
          f"loop time; of those, {kf_at[top].mean()*100:.0f}% are KF frames")
    print("slowest 12 frames (idx, ms, kf?):")
    for i in order[:12]:
        print(f"  {i:4d}  {ms[i]:7.1f}  {'KF' if kf_at[i] else ''}")
    print("phase totals over the run (ms):")
    for k, v in phase.items():
        a = np.array(v) * 1e3
        if len(a):
            print(f"  {k:9s} n={len(a):4d} total {a.sum():8.1f} "
                  f"p50 {np.median(a):6.1f} max {a.max():7.1f}")


if __name__ == "__main__":
    main()
    os._exit(0)
