"""Pose-only optimization: joint point + line Levenberg–Marquardt.

JAX-native replacement for the reference's g2o problems
``Optimizer::PoseOptimization`` (/root/reference/src/Optimizer.cc:375-643)
and ``Optimizer::PoseOptimizationWithLines`` (:2132-2489):

- mono point edges   (EdgeSE3ProjectXYZOnlyPose,      chi2 gate 5.991)
- stereo point edges (EdgeStereoSE3ProjectXYZOnlyPose, chi2 gate 7.815)
- line edges         (EdgeLineOnlyPose — both observed endpoints' signed
  distances to the projected infinite Plücker line; types_line_expmap.h:
  77-104; outlier if chi2 > 2*7.815, Optimizer.cc:2459)

Reference protocol reproduced: 4 rounds x 10 LM iterations; after each round
observations are re-classified inlier/outlier by chi2 at the current pose;
Huber kernels (delta = sqrt(gate)) active for the first two rounds only
(Optimizer.cc:600-607 semantics). The Jacobian row-overwrite bug of the
reference line edge (types_line_expmap.h:143-145) does not exist here:
Jacobians come from forward-mode autodiff of the residual.

Everything is fixed-shape and mask-padded: one jit, zero host round-trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lines as glines
from ..geometry import se3

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
CHI2_LINE = 2.0 * 7.815


class PoseObs(NamedTuple):
    """Fixed-capacity observation set for pose-only optimization."""

    # points (N,)
    p3d: jax.Array          # (N, 3) world positions
    uv: jax.Array           # (N, 2) observed undistorted pixels
    u_right: jax.Array      # (N,) virtual right u (stereo/RGB-D) or -1 (mono)
    inv_sigma2: jax.Array   # (N,) information scale (1/sigma^2 of octave)
    valid: jax.Array        # (N,) bool
    # lines (NL,)
    line_nw: jax.Array      # (NL, 3) world Plücker moment
    line_vw: jax.Array      # (NL, 3) world Plücker direction
    line_uv: jax.Array      # (NL, 2, 2) observed endpoints (undistorted px)
    line_inv_sigma2: jax.Array  # (NL,)
    line_valid: jax.Array   # (NL,) bool


class PoseResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    inlier_pts: jax.Array    # (N,) bool — final point inliers
    inlier_lines: jax.Array  # (NL,) bool
    n_inliers: jax.Array     # scalar int32 — point inliers (reference returns this)


def make_pose_obs(n_pts: int, n_lines: int) -> PoseObs:
    """All-invalid observation buffers of the given static capacity."""
    z = jnp.zeros
    return PoseObs(
        p3d=z((n_pts, 3), jnp.float32),
        uv=z((n_pts, 2), jnp.float32),
        u_right=jnp.full((n_pts,), -1.0, jnp.float32),
        inv_sigma2=jnp.ones((n_pts,), jnp.float32),
        valid=z((n_pts,), bool),
        line_nw=z((n_lines, 3), jnp.float32),
        line_vw=z((n_lines, 3), jnp.float32),
        line_uv=z((n_lines, 2, 2), jnp.float32),
        line_inv_sigma2=jnp.ones((n_lines,), jnp.float32),
        line_valid=z((n_lines,), bool),
    )


def _point_residuals(cam, R, t, obs: PoseObs):
    """(r2 mono part (N,2), r_ur (N,), chi2-ready pieces). Stereo rows active
    where u_right >= 0."""
    pc = obs.p3d @ R.T + t
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    u = cam.fx * pc[:, 0] / safe_z + cam.cx
    v = cam.fy * pc[:, 1] / safe_z + cam.cy
    r_uv = jnp.stack([u - obs.uv[:, 0], v - obs.uv[:, 1]], -1)
    ur = u - cam.bf / safe_z
    r_ur = jnp.where(obs.u_right >= 0, ur - obs.u_right, 0.0)
    behind = z <= 1e-6
    return r_uv, r_ur, behind


def _line_residuals(cam, R, t, obs: PoseObs):
    """Signed distances of both observed endpoints to the projected line."""
    Kl = glines.line_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
    n_c, v_c = glines.transform_plucker(R, t, obs.line_nw, obs.line_vw)
    l = glines.project_plucker(Kl, n_c)  # (NL, 3)
    d0 = glines.point_line_distance(l, obs.line_uv[:, 0])
    d1 = glines.point_line_distance(l, obs.line_uv[:, 1])
    return jnp.stack([d0, d1], -1)  # (NL, 2)


def _chi2(cam, R, t, obs: PoseObs):
    r_uv, r_ur, behind = _point_residuals(cam, R, t, obs)
    chi_pt = (jnp.sum(r_uv**2, -1) + r_ur**2) * obs.inv_sigma2
    chi_pt = jnp.where(behind, jnp.inf, chi_pt)
    r_l = _line_residuals(cam, R, t, obs)
    chi_ln = jnp.sum(r_l**2, -1) * obs.line_inv_sigma2
    return chi_pt, chi_ln


def _huber_w(chi2, delta2):
    """IRLS weight of the Huber kernel on squared error."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


@functools.partial(jax.jit, static_argnames=("cam", "rounds", "iters"))
def optimize_pose(
    cam,
    R0: jax.Array,
    t0: jax.Array,
    obs: PoseObs,
    rounds: int = 4,
    iters: int = 10,
) -> PoseResult:
    """Reference-protocol pose optimization (see module docstring)."""

    def residual_fn(xi, R, t, use_mask_pt, use_mask_ln, robust):
        Rn, tn = se3.left_update(xi, R, t)
        r_uv, r_ur, behind = _point_residuals(cam, Rn, tn, obs)
        r_l = _line_residuals(cam, Rn, tn, obs)
        return r_uv, r_ur, r_l

    def build_normal_eqs(R, t, in_pt, in_ln, robust):
        zero = jnp.zeros(6)
        (r_uv, r_ur, r_l) = residual_fn(zero, R, t, in_pt, in_ln, robust)
        (J_uv, J_ur, J_l) = jax.jacfwd(
            lambda xi: residual_fn(xi, R, t, in_pt, in_ln, robust)
        )(zero)

        chi_pt = (jnp.sum(r_uv**2, -1) + r_ur**2) * obs.inv_sigma2
        chi_ln = jnp.sum(r_l**2, -1) * obs.line_inv_sigma2
        stereo = obs.u_right >= 0
        delta2_pt = jnp.where(stereo, CHI2_STEREO, CHI2_MONO)
        w_pt = jnp.where(robust, _huber_w(chi_pt, delta2_pt), 1.0)
        w_ln = jnp.where(robust, _huber_w(chi_ln, CHI2_LINE), 1.0)
        w_pt = w_pt * obs.inv_sigma2 * (in_pt & obs.valid)
        w_ln = w_ln * obs.line_inv_sigma2 * (in_ln & obs.line_valid)

        # H = sum w J^T J over residual rows; b = -sum w J^T r
        def acc(J, r, w):
            # J: (..., 6), r: (...,), w broadcast over residual rows
            Jw = J * w[..., None]
            H = jnp.einsum("...i,...j->ij", Jw, J)
            b = -jnp.einsum("...i,...->i", Jw, r)
            cost = jnp.sum(w * r * r)
            return H, b, cost

        H1, b1, c1 = acc(J_uv, r_uv, w_pt[:, None])
        H2, b2, c2 = acc(J_ur, r_ur, w_pt)
        H3, b3, c3 = acc(J_l, r_l, w_ln[:, None])
        return H1 + H2 + H3, b1 + b2 + b3, c1 + c2 + c3

    def robust_cost(R, t, in_pt, in_ln, robust):
        chi_pt, chi_ln = _chi2(cam, R, t, obs)
        stereo = obs.u_right >= 0
        delta2_pt = jnp.where(stereo, CHI2_STEREO, CHI2_MONO)

        def rho(chi, d2):
            return jnp.where(
                robust & (chi > d2), 2.0 * jnp.sqrt(d2 * jnp.maximum(chi, 0.0)) - d2, chi
            )

        chi_pt = jnp.where(jnp.isfinite(chi_pt), chi_pt, 1e9)
        c_pt = jnp.sum(rho(chi_pt, delta2_pt) * (in_pt & obs.valid))
        c_ln = jnp.sum(rho(chi_ln, CHI2_LINE) * (in_ln & obs.line_valid))
        return c_pt + c_ln

    def lm_round(carry, robust):
        R, t, in_pt, in_ln = carry

        def body(_, st):
            R, t, lam = st
            H, b, _ = build_normal_eqs(R, t, in_pt, in_ln, robust)
            cost0 = robust_cost(R, t, in_pt, in_ln, robust)

            def try_step(lam):
                Hd = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-9 * jnp.eye(6)
                xi = jnp.linalg.solve(Hd, b)
                Rn, tn = se3.left_update(xi, R, t)
                return Rn, tn, robust_cost(Rn, tn, in_pt, in_ln, robust)

            Rn, tn, cost1 = try_step(lam)
            accept = (cost1 < cost0) & jnp.all(jnp.isfinite(tn))
            R2 = jnp.where(accept, Rn, R)
            t2 = jnp.where(accept, tn, t)
            lam2 = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam2 = jnp.clip(lam2, 1e-9, 1e6)
            return R2, t2, lam2

        R, t, _ = jax.lax.fori_loop(0, iters, body, (R, t, jnp.float32(1e-5)))
        # re-classify by chi2 at the new pose (Optimizer.cc:2436-2476)
        chi_pt, chi_ln = _chi2(cam, R, t, obs)
        stereo = obs.u_right >= 0
        gate_pt = jnp.where(stereo, CHI2_STEREO, CHI2_MONO)
        in_pt = (chi_pt <= gate_pt) & obs.valid
        in_ln = (chi_ln <= CHI2_LINE) & obs.line_valid
        return (R, t, in_pt, in_ln)

    in_pt = obs.valid
    in_ln = obs.line_valid
    carry = (se3.orthonormalize(R0), t0, in_pt, in_ln)
    for r in range(rounds):
        R, t, in_pt, in_ln = lm_round(carry, robust=(r < 2))
        carry = (se3.orthonormalize(R), t, in_pt, in_ln)
    R, t, in_pt, in_ln = carry
    return PoseResult(R, t, in_pt, in_ln, jnp.sum(in_pt.astype(jnp.int32)))
