"""Fast consumer: load the checkpointed severed map and iterate on the
loop-correction pipeline in seconds. Measures the anchor error after each
stage against BOTH references: the pre-displacement tracked poses and the
ground-truth orbit poses."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from plslam_tpu.bow.database import KeyFrameDatabase
from plslam_tpu.bow.vocabulary import Vocabulary
from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.local_mapping import LocalMapper
from plslam_tpu.models.loop_closing import LoopCloser
from plslam_tpu.utils import checkpoint

CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)
VOC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plslam_tpu", "bow", "vocab_synth.npz")


def rel_err(Ra, ta, Rb, tb, Ra0, ta0, Rb0, tb0):
    Rab = Ra @ Rb.T
    tab = ta - Rab @ tb
    Rab0 = Ra0 @ Rb0.T
    tab0 = ta0 - Rab0 @ tb0
    ang = np.degrees(np.arccos(np.clip((np.trace(Rab @ Rab0.T) - 1) / 2,
                                       -1, 1)))
    return float(np.linalg.norm(tab - tab0)), float(ang)


def main():
    cfg = SlamConfig(camera=CAM, use_lines=False)
    voc = Vocabulary.load(VOC_PATH)
    m = checkpoint.load_map(cfg, "/tmp/severed_map.npz")
    meta = np.load("/tmp/severed_meta.npz")
    pre_R, pre_t = meta["pre_R"], meta["pre_t"]
    kf_cut = int(meta["kf_cut"])
    gt_R, gt_t = meta["gt_R"], meta["gt_t"]
    fid = meta["kf_frame_id"]

    kfdb = KeyFrameDatabase(voc, max_kf=cfg.capacity.max_keyframes)
    lm = LocalMapper(cfg, m, kfdb=kfdb)
    lc = LoopCloser(cfg, m, kfdb, voc, local_mapper=lm)
    for k in range(m.n_kf):
        if m.kf_valid[k]:
            fd = m.device_frame(k)
            _, bow = voc.transform(fd.kp_desc, fd.kp_valid)
            kfdb.add(k, np.asarray(bow))

    k = max(q for q in range(m.n_kf) if m.kf_valid[q])
    state = {}

    def probe(tag):
        k1, k2 = state["pair"]
        e_pre, a_pre = rel_err(m.kf_R[k2], m.kf_t[k2], m.kf_R[k1],
                               m.kf_t[k1], pre_R[k2], pre_t[k2],
                               pre_R[k1], pre_t[k1])
        Rg2, tg2 = gt_R[fid[k2]], gt_t[fid[k2]]
        Rg1, tg1 = gt_R[fid[k1]], gt_t[fid[k1]]
        e_gt, a_gt = rel_err(m.kf_R[k2], m.kf_t[k2], m.kf_R[k1], m.kf_t[k1],
                             Rg2, tg2, Rg1, tg1)
        cut = kf_cut
        cross = 0
        cross_obs = 0
        for pid in m.point_ids():
            obs = m.pt_obs[pid]
            old = sum(1 for q in obs if q < cut)
            new = sum(1 for q in obs if q >= cut)
            if old and new:
                cross += 1
                cross_obs += min(old, new)
        print(f"  [{tag:10s}] vs-pre {e_pre*100:6.2f}cm/{a_pre:5.2f}deg   "
              f"vs-GT {e_gt*100:6.2f}cm/{a_gt:5.2f}deg   "
              f"cross-lm {cross} ({cross_obs} obs)")

    orig_propagate = LoopCloser._propagate_group
    orig_eg = LoopCloser._optimize_essential_graph
    orig_gba = LoopCloser._global_ba
    orig_fuse = LocalMapper.fuse

    def patched_prop(self, *a, **kw):
        r = orig_propagate(self, *a, **kw)
        probe("propagate")
        return r

    def patched_eg(self, *a, **kw):
        r = orig_eg(self, *a, **kw)
        probe("essential")
        return r

    def patched_gba(self, *a, **kw):
        r = orig_gba(self, *a, **kw)
        probe("gba")
        return r

    orig_cr = LoopCloser._compute_relative

    def patched_cr(self, kf1, kf2):
        state["pair"] = (kf1, kf2)
        out = orig_cr(self, kf1, kf2)
        if out is not None:
            R12, t12, s12, n = out
            R1c = R12 @ m.kf_R[kf2]
            t1c = s12 * (R12 @ m.kf_t[kf2]) + t12
            Rg2, tg2 = gt_R[fid[kf2]], gt_t[fid[kf2]]
            Rg1, tg1 = gt_R[fid[kf1]], gt_t[fid[kf1]]
            e_gt, a_gt = rel_err(m.kf_R[kf2], m.kf_t[kf2], R1c, t1c,
                                 Rg2, tg2, Rg1, tg1)
            e_pre, a_pre = rel_err(m.kf_R[kf2], m.kf_t[kf2], R1c, t1c,
                                   pre_R[kf2], pre_t[kf2],
                                   pre_R[kf1], pre_t[kf1])
            print(f"pair kf1={kf1} kf2={kf2} n={n}")
            print(f"  [sim3 est  ] vs-pre {e_pre*100:6.2f}cm/{a_pre:5.2f}deg"
                  f"   vs-GT {e_gt*100:6.2f}cm/{a_gt:5.2f}deg")
        return out

    LoopCloser._propagate_group = patched_prop
    LoopCloser._optimize_essential_graph = patched_eg
    LoopCloser._global_ba = patched_gba
    LoopCloser._compute_relative = patched_cr
    try:
        for _ in range(3):
            lc.process_keyframe(k)
            if lc.n_loops_closed:
                break
        if not lc.n_loops_closed:
            print("detection path did not fire; brute-forcing candidates")
            for cand in range(int(meta["kf_cut"])):
                if not m.kf_valid[cand]:
                    continue
                out = patched_cr(lc, k, cand)
                if out is not None:
                    R12, t12, s12, pairs = out
                    lc._correct_loop(k, cand, R12, t12, s12)
                    lc.n_loops_closed += 1
                    lc.last_loop_pair = (k, cand)
                    break
                else:
                    print(f"  cand {cand}: rejected")
    finally:
        LoopCloser._propagate_group = orig_propagate
        LoopCloser._optimize_essential_graph = orig_eg
        LoopCloser._global_ba = orig_gba
        LoopCloser._compute_relative = orig_cr
    print("loops closed:", lc.n_loops_closed)
    if lc.n_loops_closed:
        state["pair"] = lc.last_loop_pair
        probe("final")


if __name__ == "__main__":
    main()
