"""Offline visualization — the headless stand-in for the reference's
Pangolin Viewer / FrameDrawer / MapDrawer (/root/reference/src/Viewer.cc,
FrameDrawer.cc, MapDrawer.cc). Renders the map (points, lines as segments,
keyframe frusta, trajectory) and per-frame overlays to PNG via matplotlib —
suitable for notebooks/CI; a live GL loop has no place in a TPU batch
engine."""

from __future__ import annotations

import numpy as np


def draw_map(slam_map, trajectory=None, path: str = "map.png",
             show_lines: bool = True):
    """Top-down (x-z) map view: points, lines, keyframes, trajectory."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    pids = slam_map.point_ids()
    if len(pids):
        p = slam_map.pt_pos[pids]
        ax.scatter(p[:, 0], p[:, 2], s=1, c="k", alpha=0.4, label="points")
    if show_lines:
        lids = slam_map.line_ids()
        for l in lids:
            ep = slam_map.ln_ep[l]
            ax.plot(ep[:, 0], ep[:, 2], "r-", lw=1.2)
    for k in range(slam_map.n_kf):
        if slam_map.kf_valid[k]:
            c = slam_map.kf_camera_center(k)
            ax.plot(c[0], c[2], "b^", ms=3)
    if trajectory is not None:
        cs = np.array([-R.T @ t for _, R, t in trajectory])
        if len(cs):
            ax.plot(cs[:, 0], cs[:, 2], "g-", lw=1, label="trajectory")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def draw_frame(gray, fd, path: str = "frame.png"):
    """Keypoint + keyline overlay (FrameDrawer.cc:43-253 equivalent)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(np.asarray(gray), cmap="gray")
    kp = np.asarray(fd.kp_xy)
    v = np.asarray(fd.kp_valid)
    ax.plot(kp[v, 0], kp[v, 1], "g.", ms=2)
    ep = np.asarray(fd.ln_ep)
    lv = np.asarray(fd.ln_valid)
    for e in ep[lv]:
        ax.plot(e[:, 0], e[:, 1], "r-", lw=1.5)
    ax.set_axis_off()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
