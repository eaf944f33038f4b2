"""LSD/LBD quality harness: every line-pipeline quality metric in one run.

Usage: JAX_PLATFORMS=cpu python scripts/lsd_quality.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import cv2
import jax.numpy as jnp
import numpy as np

from plslam_tpu.ops import lbd, lsd
from test_lines import CFG, paint_scene, seg_dist


def hits(img, segs, th):
    f = lsd.detect_lines(jnp.asarray(img), CFG, (480, 640))
    ep = np.asarray(f.endpoints)[np.asarray(f.valid)]
    if len(ep) == 0:
        return 0
    return sum(
        1 for (a, b) in segs
        if min(seg_dist(e, np.array([a, b], float)) for e in ep) < th
    )


def detect_desc(img):
    f = lsd.detect_lines(jnp.asarray(img), CFG, (480, 640))
    d = np.asarray(lbd.extract_lbd(jnp.asarray(img), f.endpoints, f.valid, CFG))
    return f, d


def pair_hams(f1, d1, f2, d2, M=None, th=16):
    epa = np.asarray(f1.endpoints).copy()
    w = epa.copy()
    if M is not None:
        w[..., 0] = epa[..., 0] * M[0, 0] + epa[..., 1] * M[0, 1] + M[0, 2]
        w[..., 1] = epa[..., 0] * M[1, 0] + epa[..., 1] * M[1, 1] + M[1, 2]
    epb = np.asarray(f2.endpoints)
    va, vb = np.asarray(f1.valid), np.asarray(f2.valid)
    out = []
    for i in np.nonzero(va)[0]:
        cands = [(seg_dist(w[i], epb[j]), j) for j in np.nonzero(vb)[0]]
        if not cands:
            continue
        d, bj = min(cands)
        if d < th:
            out.append(
                bin(int.from_bytes((d1[i] ^ d2[bj]).tobytes(), "big")).count("1")
            )
    return out


def main():
    img_p, segs = paint_scene(texture=False)
    img_t, segs_t = paint_scene(texture=True)
    print(f"painted hits: {hits(img_p, segs, 60)}/5 (need >=4)")
    print(f"textured hits: {hits(img_t, segs_t, 80)}/5 (need >=4)")

    M = np.float32([[np.cos(0.03), -np.sin(0.03), 6],
                    [np.sin(0.03), np.cos(0.03), 4]])
    img_w = cv2.warpAffine(img_t, M, (640, 480),
                           borderMode=cv2.BORDER_REFLECT_101).astype(np.float32)
    f1, d1 = detect_desc(img_t)
    f2, d2 = detect_desc(img_w)
    same = pair_hams(f1, d1, f2, d2, M)
    print(f"stability: pairs={len(same)} (need >=5) "
          f"median={np.median(same) if same else -1} (need <50)")
    rng = np.random.default_rng(0)
    va = np.nonzero(np.asarray(f1.valid))[0]
    cross = []
    for _ in range(80):
        i, j = rng.choice(va, 2, replace=False)
        cross.append(
            bin(int.from_bytes((d1[i] ^ d1[j]).tobytes(), "big")).count("1"))
    print(f"cross median: {np.median(cross)} "
          f"(need > same_median + 25)")

    img_b = np.clip(img_t * 1.3 - 20, 0, 255).astype(np.float32)
    f3, d3 = detect_desc(img_b)
    bri = pair_hams(f1, d1, f3, d3, None)
    print(f"brightness: pairs={len(bri)} (need >=3) "
          f"median={np.median(bri) if bri else -1} (need <45)")
    n_det = int(np.asarray(f1.valid).sum())
    print(f"textured detections: {n_det}")


if __name__ == "__main__":
    main()
