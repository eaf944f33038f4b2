"""Dump the loop pipeline's matched 3D pairs + observations to an npz so
solver iteration doesn't need the 5-minute tracking replay."""

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

from plslam_tpu.ops import matching, hamming


def main():
    cfg, m, lm, lc, tr, kf_cut, pre_R, pre_t = (
        tlc.TestLoopClosing._severed_map())
    k = max(q for q in range(m.n_kf) if m.kf_valid[q])
    # drive detection until candidates appear
    pair = None
    for _ in range(3):
        cands = lc._detect_loop(k)
        if cands:
            pair = (k, cands[0])
            break
    if pair is None:
        print("no candidates")
        return
    kf1, kf2 = pair
    print(f"pair kf1={kf1} kf2={kf2} (cut={kf_cut})")

    p1 = m.kf_pt_idx[kf1].copy()
    p2 = m.kf_pt_idx[kf2].copy()
    has1 = (p1 >= 0) & m.pt_valid[np.clip(p1, 0, None)]
    has2 = (p2 >= 0) & m.pt_valid[np.clip(p2, 0, None)]
    d1 = m.device_frame(kf1)
    d2 = m.device_frame(kf2)
    dist = hamming.hamming_matrix(d1.kp_desc, d2.kp_desc)
    gate = jnp.asarray(has1)[:, None] & jnp.asarray(has2)[None, :]
    mm = matching.best_matches(dist, gate, max_dist=60,
                               nn_ratio=lc.cfg.matcher.nn_ratio_reloc)
    mm = matching.dedupe_targets(mm, len(p2))
    ok = np.asarray(mm.ok)
    idx = np.asarray(mm.idx)
    print(f"n_match={ok.sum()}")
    w1 = m.pt_pos[p1[ok]]
    w2 = m.pt_pos[p2[idx[ok]]]
    x1 = w1 @ m.kf_R[kf1].T + m.kf_t[kf1]
    x2 = w2 @ m.kf_R[kf2].T + m.kf_t[kf2]
    h1 = m.kf_frames[kf1]
    h2 = m.kf_frames[kf2]
    feats1 = np.nonzero(ok)[0]
    feats2 = idx[feats1]
    uv1 = h1.kp_xy_un[feats1]
    uv2 = h2.kp_xy_un[feats2]
    # ground-truth-consistent relative: pre-displacement poses
    R12_true = pre_R[kf1] @ pre_R[kf2].T
    t12_true = pre_t[kf1] - R12_true @ pre_t[kf2]
    np.savez("/tmp/loop_pairs.npz",
             x1=x1, x2=x2, uv1=uv1, uv2=uv2,
             R12_true=R12_true, t12_true=t12_true,
             kf1=kf1, kf2=kf2,
             R1=m.kf_R[kf1], t1=m.kf_t[kf1],
             R2=m.kf_R[kf2], t2=m.kf_t[kf2],
             pre_R1=pre_R[kf1], pre_t1=pre_t[kf1],
             pre_R2=pre_R[kf2], pre_t2=pre_t[kf2],
             fx=lc.cfg.camera.fx, fy=lc.cfg.camera.fy,
             cx=lc.cfg.camera.cx, cy=lc.cfg.camera.cy)
    # oracle: residual of each pair under the true relative
    res = np.linalg.norm(x1 - (x2 @ R12_true.T + t12_true), axis=1)
    print(f"pairs within 3cm of TRUE relative: {(res < 0.03).sum()}"
          f"/{len(res)}; within 10cm: {(res < 0.10).sum()}")
    print(f"median residual vs true: {np.median(res)*100:.1f}cm")
    print("saved /tmp/loop_pairs.npz")


if __name__ == "__main__":
    main()
