"""Closed-form rigid / similarity alignment + vmapped RANSAC.

The minimal-solver engine behind relocalization and loop closing, replacing
the reference's ``Sim3Solver`` (Horn quaternion method + RANSAC,
/root/reference/src/Sim3Solver.cc) and — for RGB-D — its EPnP relocalization
(``PnPsolver``, src/PnPsolver.cc): with per-keypoint depth available, the
3D-3D alignment is strictly better conditioned than 3D-2D EPnP, and the
whole RANSAC (hundreds of 3-point Kabsch solves + inlier counts) runs as
one vmapped program instead of the reference's sequential iterate() loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def kabsch(src: jax.Array, dst: jax.Array, w: jax.Array | None = None,
           with_scale: bool = False):
    """Least-squares (s)R,t with dst ≈ s * R @ src + t. src/dst: (N, 3)."""
    if w is None:
        w = jnp.ones(src.shape[0])
    wsum = jnp.sum(w) + 1e-9
    cs = jnp.sum(src * w[:, None], 0) / wsum
    cd = jnp.sum(dst * w[:, None], 0) / wsum
    s0 = src - cs
    d0 = dst - cd
    H = (s0 * w[:, None]).T @ d0
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    if with_scale:
        # Umeyama: s = trace(D diag(S)) / (sum_w ||src - c||^2)
        var = jnp.sum(w[:, None] * s0 * s0)
        scale = jnp.sum(S * jnp.array([1.0, 1.0, d])) / (var + 1e-12)
    else:
        scale = jnp.float32(1.0)
    t = cd - scale * (R @ cs)
    return scale, R, t


@functools.partial(jax.jit, static_argnames=("n_hyp", "with_scale"))
def ransac_align(
    src: jax.Array,      # (M, 3)
    dst: jax.Array,      # (M, 3)
    valid: jax.Array,    # (M,)
    key: jax.Array,
    thresh: float = 0.07,
    n_hyp: int = 256,
    with_scale: bool = False,
):
    """Vmapped 3-point RANSAC for dst ≈ sR src + t.

    Returns (s, R, t, inliers (M,), n_inliers). The final model is a
    weighted Kabsch refit on the best hypothesis' inliers.
    """
    M = src.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # sample only among valid rows: build index list of valid entries
    order = jnp.argsort(~valid)  # valid first
    pool = jnp.maximum(n_valid, 3)
    samples = jax.random.randint(key, (n_hyp, 3), 0, pool)
    sample_idx = order[samples]  # (n_hyp, 3)

    def hyp(idx):
        s, R, t = kabsch(src[idx], dst[idx], with_scale=with_scale)
        resid = jnp.linalg.norm(dst - (s * (src @ R.T) + t), axis=1)
        inl = (resid < thresh) & valid
        return jnp.sum(inl.astype(jnp.int32)), s, R, t

    scores, ss, Rs, ts = jax.vmap(hyp)(sample_idx)
    best = jnp.argmax(scores)
    s_b, R_b, t_b = ss[best], Rs[best], ts[best]
    resid = jnp.linalg.norm(dst - (s_b * (src @ R_b.T) + t_b), axis=1)
    inl = (resid < thresh) & valid

    # iterative trimmed refit: refit on inliers, re-gate at a SHRINKING
    # threshold (thresh -> thresh/2 -> thresh/4, floored) — the wide RANSAC
    # gate finds the consensus basin, the trimming converges to the tight
    # rigid core instead of averaging near-miss wrong matches in
    def trim(carry, th):
        s_c, R_c, t_c, inl_c = carry
        w = inl_c.astype(jnp.float32)
        s_f, R_f, t_f = kabsch(src, dst, w=w, with_scale=with_scale)
        r = jnp.linalg.norm(dst - (s_f * (src @ R_f.T) + t_f), axis=1)
        inl_f = (r < th) & valid
        # keep the refit only while it retains a usable support set
        ok = jnp.sum(inl_f.astype(jnp.int32)) >= jnp.maximum(
            8, jnp.sum(inl_c.astype(jnp.int32)) // 4)
        s_o = jnp.where(ok, s_f, s_c)
        R_o = jnp.where(ok, R_f, R_c)
        t_o = jnp.where(ok, t_f, t_c)
        inl_o = jnp.where(ok, inl_f, inl_c)
        return (s_o, R_o, t_o, inl_o), None

    ths = jnp.array([thresh, 0.5 * thresh, 0.25 * thresh, 0.25 * thresh],
                    jnp.float32)
    ths = jnp.maximum(ths, 0.01)
    (s_o, R_o, t_o, inl_o), _ = jax.lax.scan(
        trim, (s_b, R_b, t_b, inl), ths)
    return s_o, R_o, t_o, inl_o, jnp.sum(inl_o.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("iters", "with_scale"))
def refine_sim3(cam, s0, R12, t12,
                x1, uv1, x2, uv2, valid,
                chi2_th: float = 10.0, iters: int = 8,
                with_scale: bool = True):
    """Sim3 LM refinement on BIDIRECTIONAL reprojection errors
    (Optimizer::OptimizeSim3, /root/reference/src/Optimizer.cc:1400-1659:
    EdgeSim3ProjectXYZ projects x2 through S12 into image 1 and
    EdgeInverseSim3ProjectXYZ projects x1 through S12^-1 into image 2,
    chi2 gate th2=10, scale frozen when bFixScale).

    x1/x2: (N, 3) camera-frame points; uv1/uv2: (N, 2) their pixel
    observations in the OTHER frame's image. Returns (s, R, t, inliers,
    n_inliers)."""
    from ..geometry import se3 as _se3

    def project(p):
        z = jnp.where(jnp.abs(p[:, 2]) > 1e-6, p[:, 2], 1e-6)
        return jnp.stack([cam.fx * p[:, 0] / z + cam.cx,
                          cam.fy * p[:, 1] / z + cam.cy], -1)

    def residuals(params, w_rob):
        w, u, log_s = params[:3], params[3:6], params[6]
        dR = _se3.so3_exp(w)
        R = dR @ R12
        t = t12 + u
        s = s0 * jnp.exp(log_s if with_scale else 0.0)
        p1 = s * (x2 @ R.T) + t                    # x2 -> frame 1
        r1 = (project(p1) - uv1) * valid[:, None]
        Rinv = R.T
        p2 = (x1 - t) @ Rinv.T / s                 # x1 -> frame 2
        r2 = (project(p2) - uv2) * valid[:, None]
        return (jnp.concatenate([r1, r2], 0)
                * w_rob[:, None]).reshape(-1)

    def huber_w(params):
        # sqrt-Huber IRLS weights from the CURRENT residuals — g2o's
        # RobustKernelHuber on the Sim3 edges (OptimizeSim3 uses chi2
        # gating; a smooth Huber downweight is the batched equivalent and
        # keeps the 60%+ wrong ratio matches from dragging the fit)
        r = residuals(params, jnp.ones(2 * x1.shape[0]))
        e = jnp.sqrt(jnp.sum(r.reshape(-1, 2) ** 2, -1) + 1e-12)
        delta = jnp.sqrt(chi2_th)
        return jnp.sqrt(jnp.minimum(1.0, delta / e))

    params = jnp.zeros(7)
    lam0 = jnp.float32(1e-3)

    def step(carry, _):
        params, lam = carry
        w_rob = huber_w(params)
        r = residuals(params, w_rob)
        J = jax.jacfwd(residuals)(params, w_rob)
        H = J.T @ J + lam * jnp.eye(7)
        g = J.T @ r
        dp = -jnp.linalg.solve(H, g)
        new = params + dp
        better = jnp.sum(residuals(new, w_rob) ** 2) < jnp.sum(r ** 2)
        params = jnp.where(better, new, params)
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 5.0), 1e-8, 1e2)
        return (params, lam), None

    (params, _), _ = jax.lax.scan(step, (params, lam0), None, length=iters)
    w, u, log_s = params[:3], params[3:6], params[6]
    R = _se3.so3_exp(w) @ R12
    t = t12 + u
    s = s0 * jnp.exp(log_s if with_scale else 0.0)

    p1 = s * (x2 @ R.T) + t
    e1 = jnp.sum((project(p1) - uv1) ** 2, -1)
    p2 = (x1 - t) @ R / s
    e2 = jnp.sum((project(p2) - uv2) ** 2, -1)
    inl = valid & (e1 < chi2_th) & (e2 < chi2_th)
    return s, R, t, inl, inl.sum()
