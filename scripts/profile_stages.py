"""Per-stage device-time profiler for the frame front-end.

Times each jitted subprogram (ORB, LSD, LBD, full build_frame, fused
track-step kernels) amortized over many warm dispatches with a single
trailing block — the only reliable timing discipline on the tunneled TPU
(PERF.md §2). Prints a table; use to target kernel work.
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
from plslam_tpu.models import frame as frame_mod
from plslam_tpu.ops import image, lbd, lsd, orb
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
    print(f"{name:40s} {best*1e3:8.3f} ms")
    return best


def main():
    cfg = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0))
    scene = RoomScene(0)
    (R, t) = smooth_trajectory(4)[0]
    gray_np, depth_np = scene.render(cfg.camera, R, t)
    gray = jnp.asarray(np.clip(gray_np, 0, 255).astype(np.float32))
    depth = jnp.asarray(depth_np.astype(np.float32))
    hw = (cfg.camera.height, cfg.camera.width)

    print(f"devices: {jax.devices()}")

    extract = jax.jit(lambda g: orb.extract_orb(g, cfg.orb, hw))
    timeit("orb.extract_orb", extract, gray)

    detect = jax.jit(lambda g: lsd.detect_lines(g, cfg.lines, hw))
    timeit("lsd.detect_lines", detect, gray)

    def lbd_fn(g):
        lf = lsd.detect_lines(g, cfg.lines, hw)
        gxy = image.sobel_gradients(image.gaussian_blur(g, 5, 1.0))
        return lbd.lbd_descriptors(gxy[0], gxy[1], lf.endpoints, lf.valid, cfg.lines)

    timeit("lsd + lbd", jax.jit(lbd_fn), gray)

    bf = jax.jit(lambda g, d: frame_mod.build_frame(g, d, cfg))
    timeit("build_frame (full)", bf, gray, depth)

    # individual hot subkernels of ORB
    from plslam_tpu.ops import fast as fast_mod

    score = jax.jit(lambda g: fast_mod.nms3x3(fast_mod.fast_score_map(g, 7.0)))
    timeit("FAST score+NMS (level 0)", score, gray)


if __name__ == "__main__":
    main()
