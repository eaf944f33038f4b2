"""Capture an XLA device trace of build_frame and print the top HLO ops by
self time, using jax.profiler + tensorboard_plugin_profile's converters.
Usage: python scripts/trace_ops.py [lsd|orb|frame]
"""

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models import frame as frame_mod
from plslam_tpu.ops import lsd, orb
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "lsd"
    cfg = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0))
    scene = RoomScene(0)
    (R, t) = smooth_trajectory(4)[0]
    gray_np, depth_np = scene.render(cfg.camera, R, t)
    gray = jnp.asarray(np.clip(gray_np, 0, 255).astype(np.float32))
    depth = jnp.asarray(depth_np.astype(np.float32))
    hw = (cfg.camera.height, cfg.camera.width)

    if which == "lsd":
        fn = jax.jit(lambda g: lsd.detect_lines(g, cfg.lines, hw))
        args = (gray,)
    elif which == "orb":
        fn = jax.jit(lambda g: orb.extract_orb(g, cfg.orb, hw))
        args = (gray,)
    else:
        fn = jax.jit(lambda g, d: frame_mod.build_frame(g, d, cfg))
        args = (gray, depth)

    jax.block_until_ready(fn(*args))  # compile outside the trace

    logdir = f"/tmp/xtrace_{which}"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(10):
            out = fn(*args)
        jax.block_until_ready(out)

    # find the xplane file and convert
    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)
    if not files:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(files, tool, {})
            out_path = f"/tmp/{which}_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out_path, mode) as f:
                f.write(data)
            print("wrote", out_path, len(data))
        except Exception as e:
            print(tool, "failed:", e)


if __name__ == "__main__":
    main()
