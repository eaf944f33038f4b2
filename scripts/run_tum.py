"""Run the engine on a TUM RGB-D sequence — the `rgbd_my` equivalent
(/root/reference/Examples/RGB-D/rgbd_my.cpp).

Usage:
  python scripts/run_tum.py SETTINGS.yaml ASSOC.txt [--root SEQ_DIR]
      [--out results/] [--no-lines] [--no-loop] [--pcd] [--native-loader]

Reads the reference's settings YAML format, tracks every associated frame,
prints per-frame timing stats (median/mean like rgbd_tum.cc:141-149), and
writes CameraTrajectory.txt / KeyFrameTrajectory.txt (+ result.pcd).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("assoc")
    ap.add_argument("--root", default=None)
    ap.add_argument("--out", default="results")
    ap.add_argument("--no-lines", action="store_true")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--pcd", action="store_true")
    ap.add_argument("--native-loader", action="store_true")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--sync", action="store_true",
                    help="run mapping + loop closing synchronously in the "
                         "frame loop (default: async workers, the "
                         "reference's thread architecture — System.cc:86-118)")
    ap.add_argument("--compact-every", type=int, default=0,
                    help="reclaim erased landmark arena slots every N "
                         "frames (unbounded-run support; System.compact_map"
                         " drains the pipeline at a safe point first)")
    ap.add_argument("--save-raw", action="store_true",
                    help="also save the AS-TRACKED (unhealed) trajectory "
                         "as CameraTrajectoryRaw.txt for healed-vs-raw "
                         "ATE comparison")
    args = ap.parse_args()

    from plslam_tpu.config import load_yaml
    from plslam_tpu.models.system import System
    from plslam_tpu.utils import tum_io

    cfg = load_yaml(args.settings)
    if args.no_lines:
        cfg = cfg.replace(use_lines=False)
    slam = System(cfg, tune_gc=True, enable_loop_closing=not args.no_loop,
                  enable_dense_cloud=args.pcd,
                  async_mapping=not args.sync)

    root = args.root or os.path.dirname(os.path.abspath(args.assoc))
    if args.native_loader:
        from plslam_tpu.native import TumLoader

        frames = TumLoader(args.assoc, root,
                           cfg.tracking.depth_map_factor,
                           width=cfg.camera.width, height=cfg.camera.height)
        n_total = len(frames)

        def frame_iter():
            yield from frames
    else:
        assoc = tum_io.load_association(args.assoc, root)
        n_total = len(assoc.timestamps)

        def frame_iter():
            for i in range(n_total):
                gray, depth = tum_io.load_rgb_depth(
                    assoc.rgb_paths[i], assoc.depth_paths[i],
                    cfg.tracking.depth_map_factor,
                )
                yield gray, depth, assoc.timestamps[i]

    times = []
    n = 0
    for gray, depth, ts in frame_iter():
        t0 = time.perf_counter()
        slam.track_rgbd(gray, depth, ts)
        times.append(time.perf_counter() - t0)
        n += 1
        if n % 50 == 0:
            print(f"[{n}/{n_total}] state={slam.tracking_state} "
                  f"kfs={slam.map.n_kf} pts={slam.map.n_points()} "
                  f"lines={slam.map.n_lines()} "
                  f"median {np.median(times)*1000:.1f} ms/frame", flush=True)
        if args.compact_every and n % args.compact_every == 0:
            slam.compact_map()
        if args.max_frames and n >= args.max_frames:
            break

    os.makedirs(args.out, exist_ok=True)
    slam.save_trajectory_tum(os.path.join(args.out, "CameraTrajectory.txt"))
    if args.save_raw:
        tr = slam.tracker
        ts_raw = [t for t, _, _ in tr.trajectory]
        poses_raw = [(R.T, -(R.T @ t)) for _, R, t in tr.trajectory]
        tum_io.save_trajectory_tum(
            os.path.join(args.out, "CameraTrajectoryRaw.txt"),
            ts_raw, poses_raw)
    slam.save_keyframe_trajectory_tum(
        os.path.join(args.out, "KeyFrameTrajectory.txt"))
    if args.pcd:
        slam.save_pcd(os.path.join(args.out, "result.pcd"))
    slam.shutdown()

    times = np.array(times[3:])  # skip compile frames
    print("-------")
    print(f"median tracking time: {np.median(times)*1000:.1f} ms")
    print(f"mean tracking time:   {times.mean()*1000:.1f} ms")
    print(f"tracked fps:          {1.0/np.median(times):.1f}")


if __name__ == "__main__":
    main()
