"""Fine-grained stage profiler: times individual subprograms of ORB and LSD
on the active backend (real TPU under the driver). Each stage is its own jit;
times include the per-dispatch floor (~1 ms on the tunneled chip), so compare
deltas between cumulative stages rather than absolute values.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.ops import fast, image, lbd, lsd, orb
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:44s} {best*1e3:8.3f} ms", flush=True)
    return best


def main():
    cfg = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0))
    scene = RoomScene(0)
    (R, t) = smooth_trajectory(4)[0]
    gray_np, _ = scene.render(cfg.camera, R, t)
    gray = jnp.asarray(np.clip(gray_np, 0, 255).astype(np.float32))
    hw = (cfg.camera.height, cfg.camera.width)
    ocfg = cfg.orb
    lcfg = cfg.lines

    print(f"backend: {jax.default_backend()}")

    # ---------------- ORB internals ----------------
    timeit("orb: build_pyramid", jax.jit(
        lambda g: image.build_pyramid(g, ocfg.n_levels, ocfg.scale_factor)), gray)

    def score_all(g):
        lv = image.build_pyramid(g, ocfg.n_levels, ocfg.scale_factor)
        return [fast.nms3x3(fast.fast_score_map(l, float(ocfg.min_th_fast)))
                for l in lv]
    timeit("orb: pyramid + score/nms all levels", jax.jit(score_all), gray)

    def cells_all(g):
        lv = image.build_pyramid(g, ocfg.n_levels, ocfg.scale_factor)
        out = []
        budget = orb._per_level_budget(ocfg)
        for l, lvl in enumerate(lv):
            s = fast.nms3x3(fast.fast_score_map(lvl, float(ocfg.min_th_fast)))
            cys, cxs, cresp = fast.detect_cellwise(
                s, float(ocfg.ini_th_fast), ocfg.cell_size,
                ocfg.max_kp_per_cell, ocfg.edge_threshold)
            out.append(fast.top_n_keypoints(cys, cxs, cresp, budget[l]))
        return out
    timeit("orb: + cellwise/topk all levels", jax.jit(cells_all), gray)

    def ang_all(g):
        lv = image.build_pyramid(g, ocfg.n_levels, ocfg.scale_factor)
        out = []
        budget = orb._per_level_budget(ocfg)
        for l, lvl in enumerate(lv):
            s = fast.nms3x3(fast.fast_score_map(lvl, float(ocfg.min_th_fast)))
            cys, cxs, cresp = fast.detect_cellwise(
                s, float(ocfg.ini_th_fast), ocfg.cell_size,
                ocfg.max_kp_per_cell, ocfg.edge_threshold)
            ys, xs, resp, valid = fast.top_n_keypoints(cys, cxs, cresp, budget[l])
            out.append(orb.ic_angles(lvl, ys, xs))
        return out
    timeit("orb: + ic_angles all levels", jax.jit(ang_all), gray)

    def blur_all(g):
        lv = image.build_pyramid(g, ocfg.n_levels, ocfg.scale_factor)
        return [image.gaussian_blur(l) for l in lv]
    timeit("orb: pyramid + blur all levels", jax.jit(blur_all), gray)

    timeit("orb: FULL extract_orb", jax.jit(
        lambda g: orb.extract_orb(g, ocfg, hw)), gray)

    # ---------------- LSD internals ----------------
    def lsd_grad(g):
        gx, gy = image.sobel_gradients(image.gaussian_blur(g, 5, 1.0))
        mag = jnp.sqrt(gx * gx + gy * gy)
        jxx = image.gaussian_blur(gx * gx, 5, 2.0)
        jxy = image.gaussian_blur(gx * gy, 5, 2.0)
        jyy = image.gaussian_blur(gy * gy, 5, 2.0)
        coh = jnp.sqrt((jxx - jyy) ** 2 + 4.0 * jxy * jxy) / (jxx + jyy + 1e-6)
        return mag * coh
    timeit("lsd: gradients + structure tensor", jax.jit(lsd_grad), gray)

    def lsd_topP(g):
        m = lsd_grad(g)
        return jax.lax.approx_max_k(m.reshape(-1), 12288)
    timeit("lsd: + top-P sparse set", jax.jit(lsd_topP), gray)

    timeit("lsd: FULL detect_lines", jax.jit(
        lambda g: lsd.detect_lines(g, lcfg, hw)), gray)

    def lbd_only(g):
        lf = lsd.detect_lines(g, lcfg, hw)
        gxy = image.sobel_gradients(image.gaussian_blur(g, 5, 1.0))
        return lbd.lbd_descriptors(gxy[0], gxy[1], lf.endpoints, lf.valid, lcfg)
    timeit("lsd + lbd", jax.jit(lbd_only), gray)


if __name__ == "__main__":
    main()
