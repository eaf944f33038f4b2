"""Benchmark: tracked frames/s of the full RGB-D point+line SLAM pipeline.

Runs the complete per-frame path (ORB extraction, line extraction + LBD,
motion matching, local-map matching, two joint point+line pose LMs, map
bookkeeping) on pre-rendered synthetic 640x480 RGB-D frames, on whatever
accelerator JAX provides (the real TPU chip under the driver).

Prints ONE JSON line. Baseline: the C++ reference is designed for 30 fps
real-time operation on an i7-class CPU (/root/reference/Examples/RGB-D/
rgbd_tum.cc:126-134, TUM1.yaml Camera.fps) — vs_baseline = fps / 30.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    from plslam_tpu.config import SlamConfig
    from plslam_tpu.geometry.projection import Camera
    from plslam_tpu.models.local_mapping import LocalMapper
    from plslam_tpu.models.map import SlamMap
    from plslam_tpu.models.tracking import Tracker
    from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

    cfg = SlamConfig(
        camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)
    )
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    scene = RoomScene(0)
    poses = smooth_trajectory(2 * n_frames)[:n_frames]
    frames = [scene.render(cfg.camera, R, t) for R, t in poses]

    m = SlamMap(cfg)
    # async mapping mirrors the reference's thread split: rgbd_my measures
    # per-frame tracking time while LocalMapping runs on its own thread
    from plslam_tpu.models.async_mapping import AsyncLocalMapper

    tracker = Tracker(cfg, m, local_mapper=AsyncLocalMapper(LocalMapper(cfg, m)))

    warmup = min(20, n_frames // 3)
    for i in range(warmup):
        tracker.process(frames[i][0], frames[i][1], i / 30.0)

    t0 = time.perf_counter()
    tracked = 0
    for i in range(warmup, n_frames):
        out = tracker.process(frames[i][0], frames[i][1], i / 30.0)
        if out is not None:
            tracked += 1
    tracker.flush()  # drain the pipelined (lag-1) in-flight frame
    dt = time.perf_counter() - t0
    fps = (n_frames - warmup) / dt

    print(
        json.dumps(
            {
                "metric": "tracked_fps_640x480_points+lines",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
