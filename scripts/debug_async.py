"""Replicate test_async_loop's mid-run severance scenario SYNCHRONOUSLY
with detection probes: why does the loop not fire?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import importlib.util

spec = importlib.util.spec_from_file_location(
    "tlc", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "test_loop_closing.py"))
tlc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tlc)

from plslam_tpu.geometry import se3
from plslam_tpu.models.loop_closing import LoopCloser
from plslam_tpu.models.system import System
from plslam_tpu.config import SlamConfig

state = {"severed": False}


def main():
    cfg = SlamConfig(camera=tlc.CAM)
    slam = System(cfg, enable_loop_closing=True, async_mapping=False)
    scene = tlc.RoomScene(3)
    n = 150
    poses = tlc.orbit_poses(n)
    m = slam.map
    tr = slam.tracker
    lc = slam.loop_closer
    W_R = np.asarray(
        se3.so3_exp(jnp.asarray([0.0, 0.10, 0.0], jnp.float32))
    ).astype(np.float32)
    W_t = np.array([0.15, 0.0, -0.12], np.float32)

    orig_detect = LoopCloser._detect_loop
    orig_pk = LoopCloser.process_keyframe

    def patched_pk(self, kf):
        if state["severed"]:
            print(f"  [pk kf={kf} frame={m.kf_frame_id[kf]}] "
                  f"n_kf={m.n_kf} gap_ok="
                  f"{kf >= self.last_loop_kf + self.cfg.loop.min_kf_gap}")
        return orig_pk(self, kf)

    def patched_detect(self, kf):
        covis = set(m.covisible_keyframes(kf))
        out = orig_detect(self, kf)
        if state["severed"]:
            bow = self.kfdb.get_bow(kf)
            scores = self.kfdb.score_all(bow)
            anchors = covis or {q for q in range(max(0, kf - 3), kf)
                                if m.kf_valid[q] and self.kfdb.has[q]}
            ms = min((scores[c] for c in anchors), default=-1)
            top = np.argsort(scores[:m.n_kf])[::-1][:6]
            print(f"    detect kf={kf}: covis={sorted(covis)[:8]} "
                  f"min_score={ms:.3f} "
                  f"top={[(int(t), round(float(scores[t]), 3)) for t in top]} "
                  f"-> consistent={out}")
        return out

    LoopCloser.process_keyframe = patched_pk
    LoopCloser._detect_loop = patched_detect
    try:
        kf_cut = None
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(tlc.CAM, R, t)
            slam.track_rgbd(g, d, i / 30.0)
            if i == 90:
                kf_cut = max(m.n_kf // 2, 1)
                with tr._map_lock:
                    tlc.sever_and_displace(m, tr, kf_cut, W_R, W_t)
                    lc.prev_groups = []
                    lc.last_loop_kf = -(10**9)
                    lc.n_loops_closed = 0
                tr._refresh_local_map(tr.last_pt_ids, tr.last_ln_ids)
                state["severed"] = True
                print(f"severed at frame 90: cut={kf_cut} n_kf={m.n_kf}")
        tr.flush()
    finally:
        LoopCloser.process_keyframe = orig_pk
        LoopCloser._detect_loop = orig_detect
    print("loops:", lc.n_loops_closed, "pair:", lc.last_loop_pair)
    err = tlc._rel_err_vs_gt(m, tr, poses)
    print(f"final rel err vs GT: {err*100:.2f}cm")


if __name__ == "__main__":
    main()
