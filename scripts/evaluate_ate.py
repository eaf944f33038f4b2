"""Compute TUM-protocol ATE RMSE between an estimated trajectory and
ground truth (both TUM format: `ts tx ty tz qx qy qz qw` per line).

Usage: python scripts/evaluate_ate.py EST_FILE GT_FILE [--max-dt 0.02]
       [--scale]   (--scale: similarity alignment, for monocular)

The stand-in for the TUM benchmark's evaluate_ate.py, scoring the same
artifact the reference emits (/root/reference/results/CameraTrajectory.txt).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plslam_tpu.utils import tum_io
from plslam_tpu.utils.evaluate import ate_rmse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("est")
    ap.add_argument("gt")
    ap.add_argument("--max-dt", type=float, default=0.02)
    ap.add_argument("--scale", action="store_true",
                    help="similarity (Sim3) alignment, for monocular")
    args = ap.parse_args()

    est_ts, est_pos, _ = tum_io.load_trajectory_tum(args.est)
    gt_ts, gt_pos, _ = tum_io.load_trajectory_tum(args.gt)
    rmse, n, stats = ate_rmse(gt_ts, gt_pos, est_ts, est_pos,
                              max_dt=args.max_dt, with_scale=args.scale)
    if n == 0:
        print("no associated pose pairs (check timestamps / --max-dt)")
        sys.exit(1)
    print(f"compared_pose_pairs {n} pairs")
    print(f"absolute_translational_error.rmse {rmse:.6f} m")
    print(f"absolute_translational_error.mean {stats['mean']:.6f} m")
    print(f"absolute_translational_error.median {stats['median']:.6f} m")
    print(f"absolute_translational_error.max {stats['max']:.6f} m")
    if args.scale:
        print(f"alignment_scale {stats['scale']:.6f}")


if __name__ == "__main__":
    main()
