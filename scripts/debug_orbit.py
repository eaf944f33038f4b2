"""Instrument the plain 150-frame orbit run: per-frame state, loop events,
map health; checkpoint the PRE-severance map."""

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
from plslam_tpu.utils import checkpoint


def main():
    cfg, m, lm, lc, tr = tlc.build_system()
    scene = tlc.RoomScene(3)
    n = 150
    poses = tlc.orbit_poses(n)

    gt_R = np.stack([p[0] for p in poses])
    gt_t = np.stack([p[1] for p in poses])

    def anchor_err(k1, k2):
        f1, f2 = int(m.kf_frame_id[k1]), int(m.kf_frame_id[k2])
        Rab = m.kf_R[k2] @ m.kf_R[k1].T
        tab = m.kf_t[k2] - Rab @ m.kf_t[k1]
        Rab0 = gt_R[f2] @ gt_R[f1].T
        tab0 = gt_t[f2] - Rab0 @ gt_t[f1]
        return np.linalg.norm(tab - tab0)

    orig_correct = LoopCloser._correct_loop
    state = {}

    def kf0_rel_errs(tag):
        errs = []
        for k in range(m.n_kf):
            if m.kf_valid[k]:
                errs.append((k, anchor_err(k, 0)))
        print(f"  {tag}: " + " ".join(
            f"{k}:{e*100:.0f}" for k, e in errs))

    def patched(self, kf1, kf2, R12, t12, s12=1.0):
        print(f"  >> IN-RUN LOOP: kf1={kf1} kf2={kf2} at n_kf={m.n_kf}  "
              f"anchor-before {anchor_err(kf1, kf2)*100:.1f}cm")
        kf0_rel_errs("kf0-rel err before (cm)")
        r = orig_correct(self, kf1, kf2, R12, t12, s12)
        print(f"  >> corrected: anchor-after {anchor_err(kf1, kf2)*100:.1f}cm")
        kf0_rel_errs("kf0-rel err after  (cm)")
        state["fired"] = True
        return r

    LoopCloser._correct_loop = patched
    from plslam_tpu.models.tracking import Tracker

    orig_refresh = Tracker._refresh_local_map

    def patched_refresh(self, cur_pt_ids, cur_ln_ids, rebind=True):
        r = orig_refresh(self, cur_pt_ids, cur_ln_ids, rebind)
        if state.get("fired"):
            print(f"    [refresh @disp {self.frame_id}] "
                  f"lkfs={sorted(set(self._lkfs_dbg))} "
                  f"lp={len(self._lp_ids)}")
        return r

    orig_lkf = Tracker._local_keyframes

    def patched_lkf(self, cur_pt_ids):
        out = orig_lkf(self, cur_pt_ids)
        self._lkfs_dbg = out
        if state.get("fired"):
            cov20 = m.covisible_keyframes(20, 10) if m.n_kf > 20 else []
            print(f"      lkf detail: out={out[:12]} "
                  f"covis(20)={cov20} parent20={m.kf_parent[20]}")
        return out

    Tracker._refresh_local_map = patched_refresh
    Tracker._local_keyframes = patched_lkf
    try:
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(tlc.CAM, R, t)
            out = tr.process(g, d, i / 30.0)
            if i % 10 == 0 or tr.state != 1 or state.get("fired"):
                extra = ""
                if tr.last_pose is not None and m.n_kf:
                    e = tlc._rel_err_vs_gt(m, tr, poses[:i + 1])
                    extra = f" relerr {e*100:.1f}cm"
                d_ = tr.debug
                print(f"frame {i}: state={tr.state} n_kf={m.n_kf} "
                      f"pts={m.n_points()} loops={lc.n_loops_closed}"
                      f" inl={d_.get('local_inliers')}{extra}")
        tr.flush()
    finally:
        LoopCloser._correct_loop = orig_correct
    print("valid:", [int(k) for k in range(m.n_kf) if m.kf_valid[k]])
    print("loops:", lc.n_loops_closed, "pair:", lc.last_loop_pair)
    err = tlc._rel_err_vs_gt(m, tr, poses)
    print(f"final rel err vs GT: {err*100:.2f}cm")
    for k in range(m.n_kf):
        row = m.kf_pt_idx[k]
        cc = m.covisibility_counts(k)
        top = sorted(cc.items(), key=lambda kv: -kv[1])[:3]
        print(f"kf {k}: frame {m.kf_frame_id[k]} bound {(row>=0).sum()} "
              f"covis-top {top}")
    checkpoint.save_map(m, "/tmp/orbit_map.npz")
    print("saved /tmp/orbit_map.npz")


if __name__ == "__main__":
    main()
