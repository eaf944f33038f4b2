"""Monocular two-view bootstrap (Initializer.cc parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.ops import initializer

K = np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]], np.float32)


def _rot(aa):
    th = np.linalg.norm(aa)
    if th < 1e-12:
        return np.eye(3, dtype=np.float32)
    k = aa / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return (np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx).astype(
        np.float32)


def _proj(R, t, pw):
    pc = pw @ R.T + t
    return (pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]]
            + [K[0, 2], K[1, 2]]).astype(np.float32)


def _pad(uv, n=512):
    out = np.zeros((n, 2), np.float32)
    out[: len(uv)] = uv
    valid = np.zeros(n, bool)
    valid[: len(uv)] = True
    return out, valid


def test_fundamental_wins_for_general_scene():
    rng = np.random.default_rng(0)
    pw = rng.uniform([-2, -1.5, 3], [2, 1.5, 8], (200, 3)).astype(np.float32)
    R = _rot(np.array([0.02, -0.03, 0.01]))
    t = np.array([0.3, 0.02, 0.01], np.float32)
    uv1 = _proj(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), pw)
    uv2 = _proj(R, t, pw)
    u1, valid = _pad(uv1)
    u2, _ = _pad(uv2)
    H, sh, F, sf, okh, okf = initializer.find_models(
        jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(valid),
        jax.random.PRNGKey(0))
    assert float(sf) / (float(sh) + float(sf)) > 0.4  # F preferred

    Rr, tr, pw_r, good, clear = initializer.reconstruct_f(
        F, jnp.asarray(K), jnp.asarray(u1), jnp.asarray(u2), okf)
    assert bool(clear)
    Rr = np.asarray(Rr)
    tr = np.asarray(tr)
    # rotation exact; translation up to scale
    assert np.linalg.norm(Rr - R) < 5e-3
    tdir = t / np.linalg.norm(t)
    assert min(np.linalg.norm(tr - tdir), np.linalg.norm(tr + tdir)) < 2e-2
    # triangulated structure matches up to the same scale
    g = np.asarray(good)[: len(pw)]
    pw_r = np.asarray(pw_r)[: len(pw)]
    s = np.linalg.norm(t)
    err = np.linalg.norm(pw_r[g] * s - pw[g], axis=-1)
    assert g.sum() > 0.7 * len(pw)
    assert np.median(err) < 0.05


def test_homography_wins_for_planar_scene():
    rng = np.random.default_rng(1)
    # planar scene: z = 5 + 0.2x + 0.1y
    xy = rng.uniform([-2, -1.5], [2, 1.5], (200, 2)).astype(np.float32)
    z = 5.0 + 0.2 * xy[:, 0] + 0.1 * xy[:, 1]
    pw = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
    R = _rot(np.array([0.0, -0.05, 0.01]))
    t = np.array([0.4, 0.0, 0.05], np.float32)
    uv1 = _proj(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), pw)
    uv2 = _proj(R, t, pw)
    u1, valid = _pad(uv1)
    u2, _ = _pad(uv2)
    H, sh, F, sf, okh, okf = initializer.find_models(
        jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(valid),
        jax.random.PRNGKey(1))
    assert float(sh) / (float(sh) + float(sf)) > 0.40  # H preferred

    Rr, tr, pw_r, good, clear = initializer.reconstruct_h(
        H, jnp.asarray(K), jnp.asarray(u1), jnp.asarray(u2), okh)
    assert bool(clear)
    Rr = np.asarray(Rr)
    assert np.linalg.norm(Rr - R) < 2e-2
    tdir = t / np.linalg.norm(t)
    tr = np.asarray(tr)
    assert min(np.linalg.norm(tr - tdir), np.linalg.norm(tr + tdir)) < 5e-2
