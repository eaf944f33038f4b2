"""SO(3) / SE(3) Lie-group primitives.

Pure jax functions, all batched-friendly (use ``jax.vmap`` for leading axes).
Poses are represented as ``(R, t)`` tuples with ``R: (3,3)`` and ``t: (3,)``
in world-to-camera convention ``x_cam = R @ x_world + t`` (same convention as
the reference's ``Tcw``; see ``/root/reference/src/Frame.cc`` SetPose /
UpdatePoseMatrices for the convention being reproduced).

The se(3) tangent is ordered ``[omega, upsilon]`` (rotation first) to match
the g2o ``SE3Quat::exp`` convention used by the reference optimizer
(``/root/reference/Thirdparty/g2o/g2o/types/se3quat.h``), so chi²/step-size
behaviour of the LM loops is directly comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [w]_x such that hat(w) @ v = w × v."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy]),
            jnp.stack([wz, z, -wx]),
            jnp.stack([-wy, wx, z]),
        ]
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: exp of so(3) vector -> rotation matrix. Safe at w=0."""
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # Taylor-stable coefficients sin(t)/t and (1-cos t)/t^2.
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    W = hat(w)
    return jnp.eye(3) + a * W + b * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """Log map of a rotation matrix -> so(3) vector. Stable near 0 and pi."""
    trace = jnp.trace(R)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Antisymmetric part gives axis*sin(theta).
    w_raw = 0.5 * jnp.stack(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    sin_t = jnp.sin(theta)
    small = jnp.abs(sin_t) < 1e-5
    near_pi = cos_t < -0.99
    scale = jnp.where(small, 1.0, theta / jnp.where(small, 1.0, sin_t))
    w_generic = scale * w_raw
    # Near pi: axis from the symmetric part, R + I = 2(aa^T cos^2 + ...)
    # Use the largest diagonal of (R + I)/2 to pick a stable axis.
    B = (R + jnp.eye(3)) * 0.5
    diag = jnp.clip(jnp.diagonal(B), 0.0, None)
    axis_unnorm = jnp.stack([B[0, :], B[1, :], B[2, :]])
    k = jnp.argmax(diag)
    axis = axis_unnorm[k] / jnp.sqrt(diag[k] + _EPS)
    axis = axis / (jnp.linalg.norm(axis) + _EPS)
    # Fix the sign using the antisymmetric part (may be ~0 exactly at pi).
    sign = jnp.where(jnp.dot(axis, w_raw) < 0.0, -1.0, 1.0)
    w_pi = theta * axis * sign
    return jnp.where(near_pi, w_pi, w_generic)


def se3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """exp of se(3) vector [omega, upsilon] -> (R, t) with t = V @ upsilon."""
    w, u = xi[:3], xi[3:]
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    c = jnp.where(
        theta2 > _EPS,
        (1.0 - a) / theta2,
        1.0 / 6.0 - theta2 / 120.0,
    )
    R = jnp.eye(3) + a * W + b * (W @ W)
    V = jnp.eye(3) + b * W + c * (W @ W)
    return R, V @ u


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """Log map of (R, t) -> [omega, upsilon]."""
    w = so3_log(R)
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    half = 0.5 * theta
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta*cos(t/2)/(2 sin(t/2))) W^2
    cot_coeff = jnp.where(
        theta2 > _EPS,
        (1.0 - half * jnp.cos(half) / (jnp.sin(half) + _EPS)) / (theta2 + _EPS),
        1.0 / 12.0,
    )
    Vinv = jnp.eye(3) - 0.5 * W + cot_coeff * (W @ W)
    return jnp.concatenate([w, Vinv @ t])


def compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): first apply b, then a."""
    return Ra @ Rb, Ra @ tb + ta


def inverse(R, t):
    Rt = R.T
    return Rt, -(Rt @ t)


def apply(R, t, p):
    """Transform points p (..., 3)."""
    return p @ R.T + t


def left_update(xi, R, t):
    """g2o-style multiplicative update: exp(xi) ∘ (R, t)."""
    dR, dt = se3_exp(xi)
    return compose(dR, dt, R, t)


def orthonormalize(R: jax.Array) -> jax.Array:
    """Project a near-rotation back onto SO(3) (two Newton steps of the
    polar decomposition). Float32 chains of hundreds of rotation products
    per frame otherwise contract det(R) exponentially — which silently
    shrinks the whole geometry and diverges tracking."""
    for _ in range(2):
        R = 0.5 * (3.0 * R - R @ (R.T @ R))
    return R


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w) — matching the TUM trajectory format ordering
# used by the reference savers (/root/reference/src/System.cc:337-487).
# ---------------------------------------------------------------------------


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (x, y, z, w), branch-free."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best.
    qw_t = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 0.5
    q0 = jnp.stack(
        [(m21 - m12) / (4 * qw_t), (m02 - m20) / (4 * qw_t),
         (m10 - m01) / (4 * qw_t), qw_t]
    )
    qx_t = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 0.5
    q1 = jnp.stack(
        [qx_t, (m01 + m10) / (4 * qx_t), (m02 + m20) / (4 * qx_t),
         (m21 - m12) / (4 * qx_t)]
    )
    qy_t = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 0.5
    q2 = jnp.stack(
        [(m01 + m10) / (4 * qy_t), qy_t, (m12 + m21) / (4 * qy_t),
         (m02 - m20) / (4 * qy_t)]
    )
    qz_t = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 0.5
    q3 = jnp.stack(
        [(m02 + m20) / (4 * qz_t), (m12 + m21) / (4 * qz_t), qz_t,
         (m10 - m01) / (4 * qz_t)]
    )
    cands = jnp.stack([q0, q1, q2, q3])
    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22])
    q = cands[jnp.argmax(scores)]
    return q / jnp.linalg.norm(q)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (x, y, z, w) -> rotation matrix."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    n = x * x + y * y + z * z + w * w
    s = 2.0 / jnp.where(n > 0, n, 1.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ]
    )
