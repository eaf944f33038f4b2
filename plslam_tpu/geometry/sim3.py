"""Sim(3) similarity transforms for loop closing.

Represented as ``(s, R, t)`` with action ``x -> s * R @ x + t``; this matches
the Sim3 semantics the reference uses for loop correction
(``/root/reference/src/LoopClosing.cc:420-617`` and its g2o Sim3 type).
Tangent ordering is ``[omega, upsilon, sigma]`` (7-vector, rotation first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3

_EPS = 1e-7


def identity():
    return jnp.float32(1.0), jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)


def apply(s, R, t, p):
    return s * (p @ R.T) + t


def compose(sa, Ra, ta, sb, Rb, tb):
    """a ∘ b: first apply b, then a."""
    return sa * sb, Ra @ Rb, sa * (Ra @ tb) + ta


def inverse(s, R, t):
    Rt = R.T
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv * (Rt @ t)


def _w_coeffs(theta, sigma, s):
    """Coefficients (C, A, B) of W = C·I + A·[w]ₓ + B·[w]ₓ² where
    t = W @ upsilon (the sim3 left-Jacobian translation block)."""
    theta2 = theta * theta
    sigma2 = sigma * sigma
    small_t = theta < 1e-4
    small_s = jnp.abs(sigma) < 1e-4

    safe_t2 = jnp.where(small_t, 1.0, theta2)
    safe_s = jnp.where(small_s, 1.0, sigma)
    safe_s2 = jnp.where(small_s, 1.0, sigma2)

    # sigma ≈ 0 branch
    C_s0 = 1.0 + sigma / 2.0 + sigma2 / 6.0
    A_s0 = jnp.where(small_t, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    B_s0 = jnp.where(
        small_t, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (safe_t2 * jnp.where(small_t, 1.0, theta))
    )

    # generic sigma branch
    C_g = (s - 1.0) / safe_s
    A_g_t0 = ((sigma - 1.0) * s + 1.0) / safe_s2
    B_g_t0 = (s * (sigma2 - 2.0 * sigma + 2.0) - 2.0) / (2.0 * safe_s2 * safe_s)
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = theta2 + sigma2
    safe_c = jnp.where(c < _EPS, 1.0, c)
    A_g = (a * sigma + (1.0 - b) * theta) / (jnp.where(small_t, 1.0, theta) * safe_c)
    B_g = (C_g - ((b - 1.0) * sigma + a * theta) / safe_c) / safe_t2

    C = jnp.where(small_s, C_s0, C_g)
    A = jnp.where(small_s, A_s0, jnp.where(small_t, A_g_t0, A_g))
    B = jnp.where(small_s, B_s0, jnp.where(small_t, B_g_t0, B_g))
    return C, A, B


def exp(xi: jax.Array):
    """exp of sim(3) vector [omega, upsilon, sigma] -> (s, R, t)."""
    w, u, sigma = xi[:3], xi[3:6], xi[6]
    s = jnp.exp(sigma)
    R = se3.so3_exp(w)
    theta = jnp.sqrt(jnp.dot(w, w) + _EPS * _EPS)
    W = se3.hat(w)
    C, A, B = _w_coeffs(theta, sigma, s)
    Wmat = C * jnp.eye(3) + A * W + B * (W @ W)
    return s, R, Wmat @ u


def log(s, R, t) -> jax.Array:
    """Log map of (s, R, t) -> [omega, upsilon, sigma]."""
    sigma = jnp.log(s)
    w = se3.so3_log(R)
    theta = jnp.sqrt(jnp.dot(w, w) + _EPS * _EPS)
    W = se3.hat(w)
    C, A, B = _w_coeffs(theta, sigma, s)
    Wmat = C * jnp.eye(3) + A * W + B * (W @ W)
    u = jnp.linalg.solve(Wmat, t)
    return jnp.concatenate([w, u, jnp.reshape(sigma, (1,))])
