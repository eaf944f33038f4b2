"""3D line geometry: Plücker coordinates, projection, clipping, triangulation.

Reproduces (as pure batched jax) the line math of the reference fork:

- Plücker coords ``n = s × e, v = e − s`` from endpoints
  (``/root/reference/src/MapLine.cpp:38-41``),
- projection of a camera-frame Plücker line to an image line via the
  "line intrinsics" matrix
  (``/root/reference/include/types_line_expmap.h:77-104``),
- endpoint-to-line signed distance residual (same file, with the Jacobian
  row-overwrite bug at ``types_line_expmap.h:143-145`` fixed here — we use
  autodiff/correct analytic rows),
- Liang–Barsky segment clipping against the image rectangle
  (``/root/reference/src/LineMatcher.cpp:1389-1460``),
- two-plane line triangulation (``/root/reference/src/LocalMapping.cc:793-832``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def plucker_from_endpoints(p_start: jax.Array, p_end: jax.Array):
    """Endpoints (..., 3) -> Plücker (n, v): n = s×e (moment), v = e−s (dir)."""
    n = jnp.cross(p_start, p_end)
    v = p_end - p_start
    return n, v


def transform_plucker(R, t, n, v):
    """World Plücker -> camera Plücker under x_cam = R x + t:
    n' = R n + [t]ₓ R v ;  v' = R v."""
    Rv = v @ R.T
    Rn = n @ R.T
    n_c = Rn + jnp.cross(jnp.broadcast_to(t, Rv.shape), Rv)
    return n_c, Rv


def line_intrinsics(fx, fy, cx, cy) -> jax.Array:
    """K_line such that image line l = K_line @ n_cam (reference
    types_line_expmap.h:87-95)."""
    return jnp.array(
        [[fy, 0.0, 0.0], [0.0, fx, 0.0], [-fy * cx, -fx * cy, fx * fy]],
        jnp.float32,
    )


def project_plucker(K_line: jax.Array, n_cam: jax.Array) -> jax.Array:
    """Camera-frame Plücker moment (..., 3) -> homogeneous image line (..., 3)."""
    return n_cam @ K_line.T


def point_line_distance(l: jax.Array, uv: jax.Array) -> jax.Array:
    """Signed distance of pixel (..., 2) to homogeneous line (..., 3)."""
    denom = jnp.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2 + 1e-12)
    return (l[..., 0] * uv[..., 0] + l[..., 1] * uv[..., 1] + l[..., 2]) / denom


def line_equation_2d(e0: jax.Array, e1: jax.Array) -> jax.Array:
    """Normalized homogeneous 2D line through two endpoints (..., 2) — the
    reference's cross-product of homogeneous endpoints
    (LineExtractor.cpp:60-69)."""
    a = jnp.stack([e0[..., 0], e0[..., 1], jnp.ones_like(e0[..., 0])], -1)
    b = jnp.stack([e1[..., 0], e1[..., 1], jnp.ones_like(e1[..., 0])], -1)
    l = jnp.cross(a, b)
    norm = jnp.linalg.norm(l, axis=-1, keepdims=True)
    return l / jnp.where(norm > 1e-12, norm, 1.0)


def liang_barsky(p0: jax.Array, p1: jax.Array, xmin, ymin, xmax, ymax):
    """Clip segments p0->p1 ((..., 2) each) to rect. Returns (q0, q1, valid).

    Branch-free Liang–Barsky: t-range intersection over the four edges.
    """
    d = p1 - p0
    p = jnp.stack([-d[..., 0], d[..., 0], -d[..., 1], d[..., 1]], -1)
    q = jnp.stack(
        [p0[..., 0] - xmin, xmax - p0[..., 0], p0[..., 1] - ymin, ymax - p0[..., 1]],
        -1,
    )
    r = q / jnp.where(jnp.abs(p) > 1e-12, p, 1e-12)
    # For p<0 edge contributes to t_enter; p>0 to t_exit; p==0: reject if q<0.
    neg = p < -1e-12
    pos = p > 1e-12
    t0 = jnp.max(jnp.where(neg, r, 0.0), axis=-1)
    t1 = jnp.min(jnp.where(pos, r, 1.0), axis=-1)
    parallel_out = jnp.any((jnp.abs(p) <= 1e-12) & (q < 0.0), axis=-1)
    valid = (t0 <= t1) & ~parallel_out
    q0 = p0 + t0[..., None] * d
    q1 = p0 + t1[..., None] * d
    return q0, q1, valid


def triangulate_line_two_view(coef1, coef2, P1, P2, ray_s, ray_e):
    """Triangulate a 3D line from two views.

    Reference method (LocalMapping.cc:793-832): the image line ``coef`` in view
    k back-projects to the plane ``pi_k = P_k^T coef_k`` (P_k = 3x4 projection).
    The 3D line is the intersection of the two planes; endpoints are fixed by
    intersecting that line with the rays of the first view's observed
    endpoints. Solved as two 4x4 nullspace problems (SVD), batched via vmap.

    Args:
      coef1, coef2: (3,) normalized image-line coefficients in views 1, 2.
      P1, P2: (3, 4) projection matrices K[R|t].
      ray_s, ray_e: (3,) unit rays (camera-1 frame, world-aligned — i.e.
        already rotated into world) through the observed endpoints of view 1,
        with camera-1 center as origin given in the last column convention of
        P1; pass world-frame camera center + directions below instead.

    Returns (Xs, Xe, ok): world endpoints and a validity flag.
    """
    pi1 = P1.T @ coef1          # (4,) plane through camera-1 line
    pi2 = P2.T @ coef2          # (4,) plane through camera-2 line
    # Endpoint = intersection of plane pi2 with the plane pi1 and the plane
    # orthogonal complement pinning the endpoint ray: build 4x4 A whose
    # nullspace is the homogeneous endpoint. Use two auxiliary planes that
    # contain the endpoint ray of view 1.
    # Represent the ray by two planes through it: any two independent planes
    # containing the camera center c and direction d.
    def ray_planes(c, d):
        # pick two vectors orthogonal to d
        a = jnp.where(jnp.abs(d[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
        e1 = jnp.cross(d, a)
        e1 = e1 / (jnp.linalg.norm(e1) + 1e-12)
        e2 = jnp.cross(d, e1)
        n1, n2 = e1, e2
        return (
            jnp.concatenate([n1, -jnp.dot(n1, c)[None]]),
            jnp.concatenate([n2, -jnp.dot(n2, c)[None]]),
        )

    c1 = ray_s["origin"]
    pl_s1, pl_s2 = ray_planes(c1, ray_s["dir"])
    pl_e1, pl_e2 = ray_planes(ray_e["origin"], ray_e["dir"])

    def solve_point(pa, pb, pc):
        A = jnp.stack([pa, pb, pc, jnp.zeros(4)])
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        w = X[3]
        ok = jnp.abs(w) > 1e-8
        return X[:3] / jnp.where(ok, w, 1.0), ok

    Xs, ok_s = solve_point(pi2, pl_s1, pl_s2)
    Xe, ok_e = solve_point(pi2, pl_e1, pl_e2)
    return Xs, Xe, ok_s & ok_e


def segment_overlap(a0, a1, b0, b1):
    """1D overlap ratio of projections — reference LineOverLap
    (LineMatcher.cpp:1508-1559): overlap length / shorter extent."""
    lo = jnp.maximum(jnp.minimum(a0, a1), jnp.minimum(b0, b1))
    hi = jnp.minimum(jnp.maximum(a0, a1), jnp.maximum(b0, b1))
    inter = jnp.clip(hi - lo, 0.0, None)
    len_a = jnp.abs(a1 - a0)
    len_b = jnp.abs(b1 - b0)
    shorter = jnp.minimum(len_a, len_b)
    return inter / jnp.where(shorter > 1e-6, shorter, 1e-6)
