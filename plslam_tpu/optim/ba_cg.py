"""Matrix-free Schur-complement bundle adjustment (preconditioned CG).

The dense path in ``optim.local_ba`` materializes the off-diagonal camera-
landmark blocks ``A[p, c]`` as a (P, C, 6, 3) tensor and the reduced camera
system S as (C, C, 6, 6) — fine for local windows (C<=64) but O(P·C) memory
caps global BA around 250 keyframes. This module solves the SAME damped
normal equations

    S xi = bt,   S = U_d - sum_p A_p V_p^{-1} A_p^T

without ever forming A or S: every product S·v is two passes over the
observation list (gather camera blocks, scatter-add landmark blocks — the
standard "Bundle Adjustment in the Large" matrix-free Schur/PCG
formulation), so memory is O(O + C + P) and the full map (C in the
thousands) fits easily. The preconditioner is the exact block diagonal of
S (exact because a (point, camera) pair observes at most once in SLAM),
inverted as a batch of 6x6 solves.

Replaces the same g2o machinery as local_ba
(/root/reference/src/Optimizer.cc:60-374 GlobalBundleAdjustemnt;
Thirdparty/g2o BlockSolver + LinearSolver) — the reference's sparse
Cholmod-style solve becomes PCG on the MXU. Residual/robust-kernel/chi2
semantics are shared with local_ba (identical functions), so the two
solvers are interchangeable; tests assert they agree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry import se3
from .local_ba import (
    BAProblem,
    BAResult,
    CHI2_LINE,
    _delta2_pt,
    _huber_w,
    _ln_residual,
    _pt_residual,
    _robust_cost,
    ba_state_init,
)

__all__ = ["ba_iterate_chunk_cg", "bundle_adjust_cg_stepped"]


def _lm_iteration_cg(cam, prob: BAProblem, state, use_robust, cg_iters: int):
    """One damped LM step with a matrix-free PCG solve of the reduced
    camera system. State layout identical to local_ba._lm_iteration."""
    C = prob.cam_R.shape[0]
    P = prob.pt_xyz.shape[0]
    L = prob.ln_ep.shape[0]
    cam_R, cam_t, pt_xyz, ln_ep, in_pt, in_ln, lam = state
    delta2_pt = _delta2_pt(prob)

    # ---- per-observation residuals & Jacobians (same math as dense) -----
    def pt_r_and_J(R, t, X, uv, ur):
        zero6 = jnp.zeros(6)
        zero3 = jnp.zeros(3)
        r = _pt_residual(cam, zero6, zero3, R, t, X, uv, ur)
        Jc = jax.jacfwd(
            lambda xi: _pt_residual(cam, xi, zero3, R, t, X, uv, ur))(zero6)
        Jp = jax.jacfwd(
            lambda dx: _pt_residual(cam, zero6, dx, R, t, X, uv, ur))(zero3)
        return r, Jc, Jp

    def ln_r_and_J(R, t, ep, uv_obs):
        zero6 = jnp.zeros(6)
        zeroe = jnp.zeros(6)
        r = _ln_residual(cam, zero6, zeroe, R, t, ep, uv_obs)
        Jc = jax.jacfwd(
            lambda xi: _ln_residual(cam, xi, zeroe, R, t, ep, uv_obs))(zero6)
        Jl = jax.jacfwd(
            lambda de: _ln_residual(cam, zero6, de, R, t, ep, uv_obs))(zeroe)
        return r, Jc, Jl

    r, Jc, Jp = jax.vmap(pt_r_and_J)(
        cam_R[prob.obs_cam], cam_t[prob.obs_cam], pt_xyz[prob.obs_pt],
        prob.obs_uv, prob.obs_ur)
    chi = jnp.sum(r**2, -1) * prob.obs_w
    w_rob = jnp.where(use_robust, _huber_w(chi, delta2_pt), 1.0)
    w = prob.obs_w * w_rob * (in_pt & prob.obs_valid)

    rl, Jcl, Jl = jax.vmap(ln_r_and_J)(
        cam_R[prob.lobs_cam], cam_t[prob.lobs_cam], ln_ep[prob.lobs_ln],
        prob.lobs_uv)
    chil = jnp.sum(rl**2, -1) * prob.lobs_w
    wl_rob = jnp.where(use_robust, _huber_w(chil, CHI2_LINE), 1.0)
    wl = prob.lobs_w * wl_rob * (in_ln & prob.lobs_valid)

    # ---- diagonal blocks + gradient (no off-diagonal tensor) ------------
    JcW = Jc * w[:, None, None]
    JclW = Jcl * wl[:, None, None]
    JpW = Jp * w[:, None, None]
    JlW = Jl * wl[:, None, None]
    U = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
        jnp.einsum("ori,orj->oij", JcW, Jc))
    U = U.at[prob.lobs_cam].add(jnp.einsum("ori,orj->oij", JclW, Jcl))
    V = jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(
        jnp.einsum("ori,orj->oij", JpW, Jp))
    Vl = jnp.zeros((L, 6, 6)).at[prob.lobs_ln].add(
        jnp.einsum("ori,orj->oij", JlW, Jl))
    bc = jnp.zeros((C, 6)).at[prob.obs_cam].add(
        -jnp.einsum("ori,or->oi", JcW, r))
    bc = bc.at[prob.lobs_cam].add(-jnp.einsum("ori,or->oi", JclW, rl))
    bp = jnp.zeros((P, 3)).at[prob.obs_pt].add(
        -jnp.einsum("ori,or->oi", JpW, r))
    bl = jnp.zeros((L, 6)).at[prob.lobs_ln].add(
        -jnp.einsum("ori,or->oi", JlW, rl))

    free = (~prob.cam_fixed) & prob.cam_valid
    mfree = free.astype(jnp.float32)[:, None]

    def solve_with_damping(lam):
        mkdiag = jax.vmap(jnp.diag)
        Vd = V + lam * mkdiag(jnp.diagonal(V, axis1=1, axis2=2)) \
            + 1e-6 * jnp.eye(3)
        Vinv = jnp.linalg.inv(Vd)
        Vld = Vl + lam * mkdiag(jnp.diagonal(Vl, axis1=1, axis2=2)) \
            + 1e-6 * jnp.eye(6)
        Vlinv = jnp.linalg.inv(Vld)
        Ud = U + lam * mkdiag(jnp.diagonal(U, axis1=1, axis2=2))

        # S·v products: two passes over the observation list per landmark
        # family, with A[p,c] = sum_o Jc_o^T W_o Jp_o applied implicitly
        # (JcW carries the single factor of W).
        def schur_term_pt(v):
            # u_o = W_o Jc_o v[cam_o]  -> accumulate A^T v per point
            u = jnp.einsum("ori,oi->or", JcW, v[prob.obs_cam])
            atv = jnp.zeros((P, 3)).at[prob.obs_pt].add(
                jnp.einsum("ori,or->oi", Jp, u))
            z = jnp.einsum("pij,pj->pi", Vinv, atv)
            s = jnp.einsum("ori,oi->or", Jp, z[prob.obs_pt])
            return jnp.zeros((C, 6)).at[prob.obs_cam].add(
                jnp.einsum("ori,or->oi", JcW, s)), z

        def schur_term_ln(v):
            u = jnp.einsum("ori,oi->or", JclW, v[prob.lobs_cam])
            atv = jnp.zeros((L, 6)).at[prob.lobs_ln].add(
                jnp.einsum("ori,or->oi", Jl, u))
            z = jnp.einsum("pij,pj->pi", Vlinv, atv)
            s = jnp.einsum("ori,oi->or", Jl, z[prob.lobs_ln])
            return jnp.zeros((C, 6)).at[prob.lobs_cam].add(
                jnp.einsum("ori,or->oi", JclW, s)), z

        def S_mul(v):
            v = v * mfree
            uv = jnp.einsum("cij,cj->ci", Ud, v)
            tp, _ = schur_term_pt(v)
            tl, _ = schur_term_ln(v)
            return (uv - tp - tl) * mfree

        # rhs: bt = bc - A Vinv bp - Al Vlinv bl (same two-pass shape)
        zp = jnp.einsum("pij,pj->pi", Vinv, bp)
        sp = jnp.einsum("ori,oi->or", Jp, zp[prob.obs_pt])
        av_bp = jnp.zeros((C, 6)).at[prob.obs_cam].add(
            jnp.einsum("ori,or->oi", JcW, sp))
        zl = jnp.einsum("pij,pj->pi", Vlinv, bl)
        sl = jnp.einsum("ori,oi->or", Jl, zl[prob.lobs_ln])
        avl_bl = jnp.zeros((C, 6)).at[prob.lobs_cam].add(
            jnp.einsum("ori,or->oi", JclW, sl))
        bt = (bc - av_bp - avl_bl) * mfree

        # exact block-diagonal of S (each (landmark, camera) pair observes
        # at most once, so per-obs B_o Vinv B_o^T sums exactly):
        # B_o = Jc_o^T W_o Jp_o (6x3 / 6x6)
        B = jnp.einsum("ori,orj->oij", JcW, Jp)           # (O, 6, 3)
        BV = jnp.einsum("oij,ojk->oik", B, Vinv[prob.obs_pt])
        dg = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
            jnp.einsum("oik,ojk->oij", BV, B))
        Bl = jnp.einsum("ori,orj->oij", JclW, Jl)         # (OL, 6, 6)
        BVl = jnp.einsum("oij,ojk->oik", Bl, Vlinv[prob.lobs_ln])
        dg = dg.at[prob.lobs_cam].add(jnp.einsum("oik,ojk->oij", BVl, Bl))
        M = Ud - dg
        M = M * mfree[:, :, None] + jnp.eye(6)[None] * (1.0 - mfree[:, :, None])
        M = M + 1e-6 * jnp.eye(6)
        Minv = jnp.linalg.inv(M)

        def prec(v):
            return jnp.einsum("cij,cj->ci", Minv, v) * mfree

        # ---- PCG (fixed iteration count; LM accept/reject absorbs any
        # leftover solve error) ----------------------------------------
        x0 = jnp.zeros((C, 6))
        r0 = bt
        z0 = prec(r0)
        p0 = z0

        def dot(a, b):
            return jnp.sum(a * b)

        def cg_step(carry, _):
            x, rr, z, p, rz = carry
            Ap = S_mul(p)
            pAp = dot(p, Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
            ok = pAp > 1e-20
            x = jnp.where(ok, x + alpha * p, x)
            rn = jnp.where(ok, rr - alpha * Ap, rr)
            zn = prec(rn)
            rzn = dot(rn, zn)
            beta = rzn / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            pn = jnp.where(ok, zn + beta * p, p)
            return (x, rn, zn, pn, rzn), None

        (xi, *_), _ = jax.lax.scan(
            cg_step, (x0, r0, z0, p0, dot(r0, z0)), None, length=cg_iters)
        xi = xi * mfree

        # ---- back-substitution (matrix-free A^T xi) --------------------
        u = jnp.einsum("ori,oi->or", JcW, xi[prob.obs_cam])
        at_xi = jnp.zeros((P, 3)).at[prob.obs_pt].add(
            jnp.einsum("ori,or->oi", Jp, u))
        dX = jnp.einsum("pij,pj->pi", Vinv, bp - at_xi)
        ul = jnp.einsum("ori,oi->or", JclW, xi[prob.lobs_cam])
        at_xil = jnp.zeros((L, 6)).at[prob.lobs_ln].add(
            jnp.einsum("ori,or->oi", Jl, ul))
        dE = jnp.einsum("pij,pj->pi", Vlinv, bl - at_xil)

        Rn, tn = jax.vmap(se3.left_update)(xi, cam_R, cam_t)
        Rn = jax.vmap(se3.orthonormalize)(Rn)
        keep = (prob.cam_fixed | ~prob.cam_valid)[:, None]
        tn = jnp.where(keep, cam_t, tn)
        Rn = jnp.where(keep[:, :, None], cam_R, Rn)
        has_obs_p = jnp.diagonal(V, axis1=1, axis2=2).sum(-1) > 1e-9
        Xn = jnp.where((prob.pt_valid & has_obs_p)[:, None],
                       pt_xyz + dX, pt_xyz)
        has_obs_l = jnp.diagonal(Vl, axis1=1, axis2=2).sum(-1) > 1e-9
        En = jnp.where((prob.ln_valid & has_obs_l)[:, None, None],
                       ln_ep + dE.reshape(L, 2, 3), ln_ep)
        return Rn, tn, Xn, En

    cost0 = _robust_cost(cam, prob, cam_R, cam_t, pt_xyz, ln_ep, in_pt,
                         in_ln, use_robust)
    Rn, tn, Xn, En = solve_with_damping(lam)
    cost1 = _robust_cost(cam, prob, Rn, tn, Xn, En, in_pt, in_ln, use_robust)
    accept = (cost1 < cost0) & jnp.isfinite(cost1)
    cam_R = jnp.where(accept, Rn, cam_R)
    cam_t = jnp.where(accept, tn, cam_t)
    pt_xyz = jnp.where(accept, Xn, pt_xyz)
    ln_ep = jnp.where(accept, En, ln_ep)
    lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-9, 1e6)
    return (cam_R, cam_t, pt_xyz, ln_ep, in_pt, in_ln, lam)


@functools.partial(
    jax.jit, static_argnames=("cam", "robust", "n", "cg_iters"))
def ba_iterate_chunk_cg(cam, prob: BAProblem, state, robust: bool = True,
                        n: int = 5, cg_iters: int = 48):
    """``n`` matrix-free LM iterations per XLA program (CG counterpart of
    local_ba.ba_iterate_chunk; same stepped/abortable contract)."""
    return jax.lax.scan(
        lambda s, _: (_lm_iteration_cg(cam, prob, s, robust, cg_iters), None),
        state, None, length=n,
    )[0]


def bundle_adjust_cg_stepped(cam, prob: BAProblem, iters1: int = 5,
                             iters2: int = 10, robust: bool = True,
                             should_abort=None, cg_iters: int = 48
                             ) -> BAResult:
    """Two-phase LM BA with the matrix-free PCG inner solver — the drop-in
    for bundle_adjust_stepped at global-BA scale (C beyond the dense
    solver's memory reach)."""
    from .local_ba import ba_finalize, ba_reclassify

    state = ba_state_init(prob)
    aborted = False
    chunk = 5
    for i in range(0, iters1, chunk):
        state = ba_iterate_chunk_cg(cam, prob, state, robust,
                                    n=min(chunk, iters1 - i),
                                    cg_iters=cg_iters)
        if should_abort is not None and should_abort():
            aborted = True
            break
    if not aborted:
        state = ba_reclassify(cam, prob, state)
        for i in range(0, iters2, chunk):
            state = ba_iterate_chunk_cg(cam, prob, state, robust,
                                        n=min(chunk, iters2 - i),
                                        cg_iters=cg_iters)
            if should_abort is not None and should_abort():
                break
    return ba_finalize(cam, prob, state)
