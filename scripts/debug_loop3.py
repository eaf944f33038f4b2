"""One-time producer: build the severed map and checkpoint it, so solver
iteration (debug_loop4) runs in seconds instead of 5-minute replays."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import importlib.util

spec = importlib.util.spec_from_file_location(
    "tlc", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "test_loop_closing.py"))
tlc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tlc)

from plslam_tpu.utils import checkpoint


def main():
    cfg, m, lm, lc, tr, kf_cut, pre_R, pre_t = (
        tlc.TestLoopClosing._severed_map())
    checkpoint.save_map(m, "/tmp/severed_map.npz")
    poses = tlc.orbit_poses(150)
    gt_R = np.stack([p[0] for p in poses])
    gt_t = np.stack([p[1] for p in poses])
    np.savez("/tmp/severed_meta.npz", pre_R=pre_R, pre_t=pre_t,
             kf_cut=kf_cut, gt_R=gt_R, gt_t=gt_t,
             kf_frame_id=m.kf_frame_id[:m.n_kf])
    print("saved /tmp/severed_map.npz + meta; n_kf", m.n_kf,
          "cut", kf_cut)


if __name__ == "__main__":
    main()
