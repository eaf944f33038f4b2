"""Run the engine on a KITTI odometry stereo sequence — the
`stereo_kitti` equivalent (/root/reference/Examples/Stereo/
stereo_kitti.cc, shipped but commented out of the reference's build).

Usage:
  python scripts/run_kitti.py SETTINGS.yaml SEQUENCE_DIR
      [--out results/] [--max-frames N]

SEQUENCE_DIR is a KITTI odometry sequence folder (image_0/, image_1/,
times.txt). Writes the KITTI-format trajectory (save_trajectory_kitti)
and prints the reference's median/mean per-frame timing summary.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_gray(path):
    try:
        from PIL import Image

        return np.asarray(Image.open(path).convert("L"))
    except ImportError:  # pragma: no cover - PIL is in the image
        import cv2

        return cv2.imread(path, 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--out", default="results")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from plslam_tpu.config import load_yaml
    from plslam_tpu.models.system import System

    cfg = load_yaml(args.settings)
    cfg = cfg.replace(use_lines=False)  # the reference's stereo ctor has no lines
    slam = System(cfg, tune_gc=True, enable_loop_closing=True, sensor="stereo")

    times = np.loadtxt(os.path.join(args.sequence, "times.txt"))
    n = len(times) if not args.max_frames else min(args.max_frames, len(times))
    lat = []
    for i in range(n):
        name = f"{i:06d}.png"
        gl = _load_gray(os.path.join(args.sequence, "image_0", name))
        gr = _load_gray(os.path.join(args.sequence, "image_1", name))
        t0 = time.perf_counter()
        slam.track_stereo(gl, gr, float(times[i]))
        lat.append(time.perf_counter() - t0)
    slam.shutdown()

    os.makedirs(args.out, exist_ok=True)
    slam.save_trajectory_kitti(os.path.join(args.out, "CameraTrajectory.txt"))
    lat = np.array(sorted(lat))
    print(f"median tracking time: {np.median(lat):.4f}")  # rgbd_tum.cc:146
    print(f"mean tracking time: {lat.mean():.4f}")


if __name__ == "__main__":
    main()
