"""EPnP solver + RANSAC (reference PnPsolver.cc parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.geometry.projection import Camera
from plslam_tpu.optim import epnp

CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)


def _project(R, t, pw):
    pc = pw @ R.T + t
    return np.stack(
        [CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx,
         CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy], -1
    )


def _scene(seed, n=80):
    rng = np.random.default_rng(seed)
    pw = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n, 3)).astype(np.float32)
    aa = rng.normal(size=3) * 0.3
    th = np.linalg.norm(aa)
    k = aa / (th + 1e-12)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32) * 0.2
    return pw, R, t


def test_epnp_exact_pose():
    pw, R, t = _scene(0)
    uv = _project(R, t, pw).astype(np.float32)
    Re, te, inl, n = epnp.ransac_epnp(
        CAM, jnp.asarray(pw), jnp.asarray(uv),
        jnp.ones(len(pw), bool), jax.random.PRNGKey(0),
    )
    Re, te = np.asarray(Re), np.asarray(te)
    assert int(n) >= 0.95 * len(pw)
    assert np.linalg.norm(Re - R) < 1e-2
    assert np.linalg.norm(te - t) < 2e-2


def test_epnp_outlier_robust():
    pw, R, t = _scene(1, n=120)
    uv = _project(R, t, pw).astype(np.float32)
    rng = np.random.default_rng(7)
    bad = rng.choice(len(pw), 40, replace=False)  # 33% outliers
    uv[bad] += rng.uniform(30, 200, (len(bad), 2)) * rng.choice([-1, 1], (len(bad), 2))
    Re, te, inl, n = epnp.ransac_epnp(
        CAM, jnp.asarray(pw), jnp.asarray(uv),
        jnp.ones(len(pw), bool), jax.random.PRNGKey(1),
    )
    Re, te = np.asarray(Re), np.asarray(te)
    inl = np.asarray(inl)
    assert np.linalg.norm(Re - R) < 3e-2
    assert np.linalg.norm(te - t) < 5e-2
    # outliers must not be counted as inliers
    assert inl[bad].sum() <= 2


def test_epnp_noise_accuracy():
    pw, R, t = _scene(2, n=100)
    uv = _project(R, t, pw).astype(np.float32)
    uv += np.random.default_rng(3).normal(0, 0.5, uv.shape).astype(np.float32)
    Re, te, _, n = epnp.ransac_epnp(
        CAM, jnp.asarray(pw), jnp.asarray(uv),
        jnp.ones(len(pw), bool), jax.random.PRNGKey(2),
    )
    assert int(n) >= 60
    assert np.linalg.norm(np.asarray(Re) - R) < 5e-2
    assert np.linalg.norm(np.asarray(te) - t) < 8e-2
