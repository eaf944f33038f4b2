"""Instrumented FULL replay of the severed-map loop test (exact test-body
path: fresh tracking, detection-driven candidates). Wraps the live
pipeline stages with probes."""

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

from plslam_tpu.models.loop_closing import LoopCloser


def main():
    cfg, m, lm, lc, tr, kf_cut, pre_R, pre_t = (
        tlc.TestLoopClosing._severed_map())
    poses = tlc.orbit_poses(150)
    fid = m.kf_frame_id
    gt_R = np.stack([p[0] for p in poses])
    gt_t = np.stack([p[1] for p in poses])
    k = max(q for q in range(m.n_kf) if m.kf_valid[q])
    print(f"n_kf={m.n_kf} cut={kf_cut} k={k}")

    state = {}

    def probe(tag):
        k1, k2 = state["pair"]
        Rg1, tg1 = gt_R[fid[k1]], gt_t[fid[k1]]
        Rg2, tg2 = gt_R[fid[k2]], gt_t[fid[k2]]
        Rab = m.kf_R[k2] @ m.kf_R[k1].T
        tab = m.kf_t[k2] - Rab @ m.kf_t[k1]
        Rab0 = Rg2 @ Rg1.T
        tab0 = tg2 - Rab0 @ tg1
        e = np.linalg.norm(tab - tab0)
        cross = sum(
            1 for pid in m.point_ids()
            if any(q < kf_cut for q in m.pt_obs[pid])
            and any(q >= kf_cut for q in m.pt_obs[pid]))
        print(f"  [{tag:10s}] vs-GT {e*100:6.2f}cm  cross-lm {cross}")

    orig_cr = LoopCloser._compute_relative
    orig_prop = LoopCloser._propagate_group
    orig_saf = LoopCloser._search_and_fuse
    orig_eg = LoopCloser._optimize_essential_graph
    orig_gba = LoopCloser._global_ba

    def patched_cr(self, kf1, kf2):
        out = orig_cr(self, kf1, kf2)
        print(f"compute_relative kf1={kf1} kf2={kf2}: "
              f"{'ACCEPT n=%d' % out[3] if out else 'reject'}")
        if out is not None:
            state["pair"] = (kf1, kf2)
        return out

    def patched_prop(self, *a, **kw):
        r = orig_prop(self, *a, **kw)
        probe("propagate")
        return r

    def patched_saf(self, group, kf2):
        print(f"  search_and_fuse group={sorted(group)} kf2={kf2}")
        r = orig_saf(self, group, kf2)
        probe("fuse")
        return r

    def patched_eg(self, *a, **kw):
        r = orig_eg(self, *a, **kw)
        probe("essential")
        return r

    def patched_gba(self, *a, **kw):
        r = orig_gba(self, *a, **kw)
        probe("gba")
        return r

    LoopCloser._compute_relative = patched_cr
    LoopCloser._propagate_group = patched_prop
    LoopCloser._search_and_fuse = patched_saf
    LoopCloser._optimize_essential_graph = patched_eg
    LoopCloser._global_ba = patched_gba
    try:
        for _ in range(3):
            lc.process_keyframe(k)
            if lc.n_loops_closed:
                break
    finally:
        LoopCloser._compute_relative = orig_cr
        LoopCloser._propagate_group = orig_prop
        LoopCloser._search_and_fuse = orig_saf
        LoopCloser._optimize_essential_graph = orig_eg
        LoopCloser._global_ba = orig_gba
    print("loops closed:", lc.n_loops_closed,
          "pair:", lc.last_loop_pair)
    if lc.n_loops_closed:
        probe("final")


if __name__ == "__main__":
    main()
