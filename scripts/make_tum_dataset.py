"""Generate a TUM-RGB-D-format dataset on disk from the synthetic room.

Produces the exact file layout the reference consumes (rgb/*.png uint8,
depth/*.png uint16 at DepthMapFactor units, associate.txt, groundtruth.txt,
settings yaml — /root/reference/Examples/RGB-D/rgbd_my.cpp:40-58 +
associate.py conventions), so `scripts/run_tum.py` + `scripts/
evaluate_ate.py` run the full file-driven pipeline with a known answer.
Real TUM sequences are a drop-in the day they are available.

Usage: python scripts/make_tum_dataset.py OUT_DIR [--frames 60] [--seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SETTINGS_YAML = """%YAML:1.0
Camera.fx: 525.0
Camera.fy: 525.0
Camera.cx: 319.5
Camera.cy: 239.5
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
Camera.bf: 40.0
Camera.RGB: 1
ThDepth: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def orbit_trajectory(n: int, radius: float = 0.45, laps: float = 1.0):
    """Orbit with a sustained revisit tail (the loopy-sequence generator:
    the camera yaws ``laps`` complete revolutions by frame ``n - 30`` and
    re-observes the start — the reference's golden artifact is a loopy
    fr1_room run, results/CameraTrajectory.txt). With laps > 1 the path
    also bobs vertically and breathes in radius so successive laps are
    near-but-not-identical views, like a handheld walk-around."""
    import jax.numpy as jnp

    from plslam_tpu.geometry import se3

    poses = []
    for i in range(n):
        a = 2 * np.pi * laps * i / max(n - 30, 1)
        r_i = radius * (1.0 + 0.12 * np.sin(0.7 * a)) if laps > 1 else radius
        y_i = 0.06 * np.sin(1.3 * a) if laps > 1 else 0.0
        c = np.array(
            [r_i * np.sin(a), y_i, 1.25 + r_i * np.cos(a)], np.float32)
        Rwc = np.asarray(se3.so3_exp(jnp.asarray([0.0, a, 0.0], jnp.float32)))
        R = Rwc.T.astype(np.float32)
        poses.append((R, (-R @ c).astype(np.float32)))
    return poses


def degrade(gray, depth, rng, blur_len: float = 0.0):
    """Sensor-realism degradation (the gap between rendered frames and the
    Kinect data of the reference's golden artifact):

    - photometric: per-frame gain/bias flicker + Gaussian shot noise
    - motion blur: linear kernel along the image-motion direction,
      length ~ angular rate (the orbit is a pure-yaw pan: horizontal)
    - depth: Kinect-style quadratic range noise, holes at depth edges
      (occlusion boundaries) and random dropout blobs, zeros outside the
      valid range — matching TUM depth PNGs where 0 = no measurement
    """
    import cv2

    g = gray.astype(np.float32)
    if blur_len >= 1.0:
        k = int(min(9, 2 * round(blur_len / 2) + 1))
        kern = np.zeros((1, k), np.float32)
        kern[0, :] = 1.0 / k
        g = cv2.filter2D(g, -1, kern)
    gain = 1.0 + rng.normal(0.0, 0.03)
    bias = rng.normal(0.0, 2.0)
    g = g * gain + bias + rng.normal(0.0, 2.5, g.shape)
    g = np.clip(g, 0, 255)

    d = depth.astype(np.float32).copy()
    d *= 1.0 + rng.normal(0.0, 0.004, d.shape) * np.clip(d, 0.5, 10.0)
    gx = np.abs(np.diff(d, axis=1, prepend=d[:, :1]))
    gy = np.abs(np.diff(d, axis=0, prepend=d[:1]))
    edge = (gx + gy) > 0.15  # occlusion boundaries lose measurement
    d[edge] = 0.0
    for _ in range(rng.integers(2, 6)):  # dropout blobs
        cx, cy = rng.integers(0, d.shape[1]), rng.integers(0, d.shape[0])
        rr = int(rng.integers(4, 18))
        yy, xx = np.ogrid[:d.shape[0], :d.shape[1]]
        d[(xx - cx) ** 2 + (yy - cy) ** 2 < rr * rr] = 0.0
    d[(d < 0.3) | (d > 12.0)] = 0.0
    return g, d


def generate(out: str, n_frames: int = 60, seed: int = 0,
             fps: float = 30.0, orbit: bool = False, laps: float = 1.0,
             realism: bool = False) -> None:
    import cv2
    import jax.numpy as jnp

    from plslam_tpu.config import SlamConfig
    from plslam_tpu.geometry import se3
    from plslam_tpu.geometry.projection import Camera
    from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

    cam = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)
    scene = RoomScene(seed)
    rng = np.random.default_rng(seed + 1)
    if orbit:
        poses = orbit_trajectory(n_frames, laps=laps)
        # pure-yaw pan: blur length ~ angular rate in px/frame at center
        blur_len = 525.0 * 2 * np.pi * laps / max(n_frames - 30, 1)
    else:
        poses = smooth_trajectory(2 * n_frames)[:n_frames]
        blur_len = 1.0
    os.makedirs(os.path.join(out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out, "depth"), exist_ok=True)
    factor = 5000.0
    t0 = 1305031900.0  # TUM-era epoch timestamps
    assoc_lines = []
    gt_lines = ["# ground truth trajectory",
                "# timestamp tx ty tz qx qy qz qw"]
    for i, (R, t) in enumerate(poses):
        gray, depth = scene.render(cam, R, t)
        if realism:
            gray, depth = degrade(gray, depth, rng, blur_len=blur_len)
        ts = t0 + i / fps
        rgb_name = f"rgb/{ts:.6f}.png"
        depth_name = f"depth/{ts:.6f}.png"
        bgr = np.repeat(
            np.clip(gray, 0, 255).astype(np.uint8)[..., None], 3, -1)
        cv2.imwrite(os.path.join(out, rgb_name), bgr)
        d16 = np.clip(depth * factor, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(out, depth_name), d16)
        assoc_lines.append(f"{ts:.6f} {rgb_name} {ts:.6f} {depth_name}")
        Rwc = R.T
        c = -Rwc @ t
        q = np.asarray(se3.rot_to_quat(jnp.asarray(Rwc, jnp.float32)))
        gt_lines.append(
            f"{ts:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")
    with open(os.path.join(out, "associate.txt"), "w") as f:
        f.write("\n".join(assoc_lines) + "\n")
    with open(os.path.join(out, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    with open(os.path.join(out, "settings.yaml"), "w") as f:
        f.write(SETTINGS_YAML)
    print(f"wrote {n_frames} frames to {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--orbit", action="store_true",
                    help="full-turn revisit trajectory (loopy sequence)")
    ap.add_argument("--laps", type=float, default=1.0,
                    help="orbit revolutions (loop revisits per lap)")
    ap.add_argument("--realism", action="store_true",
                    help="photometric noise + motion blur + depth holes")
    args = ap.parse_args()
    generate(args.out, args.frames, args.seed, orbit=args.orbit,
             laps=args.laps, realism=args.realism)


if __name__ == "__main__":
    main()
