"""Bundle adjustment: Schur-complement Levenberg–Marquardt over keyframe
cohorts — the JAX replacement for g2o's BlockSolver + LM
(/root/reference/src/Optimizer.cc:644-1063 LocalBundleAdjustment, :60-374
GlobalBundleAdjustemnt; Thirdparty/g2o block solvers).

Structure per iteration (all fixed-shape, one XLA program):

- vmapped residuals + forward-mode Jacobians per observation
  (mono 2, stereo 3 rows; line observations use the reference's *intended*
  endpoint-landmark design from its dead code, Optimizer.cc:1670-2108:
  a line landmark is its two 3D endpoints (6 dof), the residual is the
  signed distance of both observed endpoints to the image line through the
  projected endpoints),
- block accumulation: U_c (6x6 per camera), V_p (3x3 per point / 6x6 per
  line), A_{p,c} = sum_obs J_c^T W J_p via segment scatter-adds,
- Schur complement of all landmark blocks:
  S = U - sum_p A_{p,:} V_p^{-1} A_{p,:}^T (dense (6C, 6C) — C<=64 local /
  <=1024 global is tiny for the MXU), solve for camera updates, back-
  substitute landmarks,
- Levenberg damping with accept/reject on the robust cost, Huber kernels
  delta = sqrt(5.991)/sqrt(7.815) as the reference,
- chi2 outlier classification between the two phases
  (Optimizer.cc:806-860: 5 iters, reclassify, 10 more, erase outliers).

The same function scales from local BA to the full-map GBA — only the caps
change. Distributed execution shards the observation axis (see
plslam_tpu.parallel.ba).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
CHI2_LINE = 2.0 * 7.815


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem. All index arrays point into the padded
    camera/landmark arrays; invalid entries must have valid=False."""

    # cameras (C,)
    cam_R: jax.Array        # (C, 3, 3)
    cam_t: jax.Array        # (C, 3)
    cam_fixed: jax.Array    # (C,) bool — pose held constant
    cam_valid: jax.Array    # (C,) bool
    # point landmarks (P,)
    pt_xyz: jax.Array       # (P, 3)
    pt_valid: jax.Array     # (P,) bool
    # point observations (O,)
    obs_cam: jax.Array      # (O,) int32
    obs_pt: jax.Array       # (O,) int32
    obs_uv: jax.Array       # (O, 2)
    obs_ur: jax.Array       # (O,) virtual right u or -1
    obs_w: jax.Array        # (O,) inv sigma^2
    obs_valid: jax.Array    # (O,) bool
    # line landmarks (L, 2 endpoints)
    ln_ep: jax.Array        # (L, 2, 3)
    ln_valid: jax.Array     # (L,) bool
    # line observations (OL,)
    lobs_cam: jax.Array     # (OL,) int32
    lobs_ln: jax.Array      # (OL,) int32
    lobs_uv: jax.Array      # (OL, 2, 2) observed endpoints
    lobs_w: jax.Array       # (OL,)
    lobs_valid: jax.Array   # (OL,) bool


class BAResult(NamedTuple):
    cam_R: jax.Array
    cam_t: jax.Array
    pt_xyz: jax.Array
    ln_ep: jax.Array
    obs_inlier: jax.Array    # (O,) bool — post-BA chi2 classification
    lobs_inlier: jax.Array   # (OL,)
    cost: jax.Array


def make_problem(C, P, O, L=1, OL=1) -> BAProblem:
    z = jnp.zeros
    return BAProblem(
        cam_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 3, 3)),
        cam_t=z((C, 3), jnp.float32),
        cam_fixed=z((C,), bool),
        cam_valid=z((C,), bool),
        pt_xyz=z((P, 3), jnp.float32),
        pt_valid=z((P,), bool),
        obs_cam=z((O,), jnp.int32),
        obs_pt=z((O,), jnp.int32),
        obs_uv=z((O, 2), jnp.float32),
        obs_ur=jnp.full((O,), -1.0, jnp.float32),
        obs_w=jnp.ones((O,), jnp.float32),
        obs_valid=z((O,), bool),
        ln_ep=z((L, 2, 3), jnp.float32),
        ln_valid=z((L,), bool),
        lobs_cam=z((OL,), jnp.int32),
        lobs_ln=z((OL,), jnp.int32),
        lobs_uv=z((OL, 2, 2), jnp.float32),
        lobs_w=jnp.ones((OL,), jnp.float32),
        lobs_valid=z((OL,), bool),
    )


def _pt_residual(cam, xi, dx, R0, t0, X0, uv, ur):
    """Point obs residual (3,): [du, dv, dur]; dur row zero for mono."""
    R, t = se3.left_update(xi, R0, t0)
    X = X0 + dx
    pc = R @ X + t
    z = jnp.where(jnp.abs(pc[2]) > 1e-6, pc[2], 1e-6)
    u = cam.fx * pc[0] / z + cam.cx
    v = cam.fy * pc[1] / z + cam.cy
    urp = u - cam.bf / z
    r_ur = jnp.where(ur >= 0, urp - ur, 0.0)
    return jnp.stack([u - uv[0], v - uv[1], r_ur])


def _ln_residual(cam, xi, dep, R0, t0, ep0, uv_obs):
    """Line obs residual (2,): signed distances of the two observed
    endpoints to the image line through the projected landmark endpoints."""
    R, t = se3.left_update(xi, R0, t0)
    ep = ep0 + dep.reshape(2, 3)

    def proj(X):
        pc = R @ X + t
        z = jnp.where(jnp.abs(pc[2]) > 1e-6, pc[2], 1e-6)
        return jnp.array([cam.fx * pc[0] / z + cam.cx, cam.fy * pc[1] / z + cam.cy])

    a = proj(ep[0])
    b = proj(ep[1])
    # homogeneous line through a, b
    l = jnp.array(
        [a[1] - b[1], b[0] - a[0], a[0] * b[1] - a[1] * b[0]]
    )
    n = jnp.sqrt(l[0] ** 2 + l[1] ** 2 + 1e-12)
    d0 = (l[0] * uv_obs[0, 0] + l[1] * uv_obs[0, 1] + l[2]) / n
    d1 = (l[0] * uv_obs[1, 0] + l[1] * uv_obs[1, 1] + l[2]) / n
    return jnp.stack([d0, d1])


def _huber_w(chi2, delta2):
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def _delta2_pt(prob):
    return jnp.where(prob.obs_ur >= 0, CHI2_STEREO, CHI2_MONO)


def _chi2_all(cam, prob, cam_R, cam_t, pt_xyz, ln_ep):
    Ro = cam_R[prob.obs_cam]
    to = cam_t[prob.obs_cam]
    Xo = pt_xyz[prob.obs_pt]
    r = jax.vmap(
        lambda R, t, X, uv, ur: _pt_residual(
            cam, jnp.zeros(6), jnp.zeros(3), R, t, X, uv, ur
        )
    )(Ro, to, Xo, prob.obs_uv, prob.obs_ur)
    chi_pt = jnp.sum(r**2, -1) * prob.obs_w
    # behind-camera guard
    pc_z = jnp.einsum("oi,oi->o", Ro[:, 2, :], Xo) + to[:, 2]
    chi_pt = jnp.where(pc_z <= 0.05, jnp.inf, chi_pt)
    Rl = cam_R[prob.lobs_cam]
    tl = cam_t[prob.lobs_cam]
    epl = ln_ep[prob.lobs_ln]
    rl = jax.vmap(
        lambda R, t, ep, uv: _ln_residual(
            cam, jnp.zeros(6), jnp.zeros(6), R, t, ep, uv
        )
    )(Rl, tl, epl, prob.lobs_uv)
    chi_ln = jnp.sum(rl**2, -1) * prob.lobs_w
    return chi_pt, chi_ln


def _robust_cost(cam, prob, cam_R, cam_t, pt_xyz, ln_ep, in_pt, in_ln,
                 use_robust):
    chi_pt, chi_ln = _chi2_all(cam, prob, cam_R, cam_t, pt_xyz, ln_ep)

    def rho(chi, d2):
        chi = jnp.where(jnp.isfinite(chi), chi, 1e9)
        return jnp.where(
            use_robust & (chi > d2),
            2.0 * jnp.sqrt(d2 * jnp.maximum(chi, 0.0)) - d2,
            chi,
        )

    c1 = jnp.sum(rho(chi_pt, _delta2_pt(prob)) * (in_pt & prob.obs_valid))
    c2 = jnp.sum(rho(chi_ln, CHI2_LINE) * (in_ln & prob.lobs_valid))
    return c1 + c2


def _lm_iteration(cam, prob, state, use_robust):
    """One damped LM step: residuals + Jacobians, Schur solve, accept/reject
    (the body of g2o OptimizationAlgorithmLevenberg::solve)."""
    C = prob.cam_R.shape[0]
    P = prob.pt_xyz.shape[0]
    L = prob.ln_ep.shape[0]
    cam_R, cam_t, pt_xyz, ln_ep, in_pt, in_ln, lam = state
    delta2_pt = _delta2_pt(prob)

    def pt_r_and_J(R, t, X, uv, ur):
        zero6 = jnp.zeros(6)
        zero3 = jnp.zeros(3)
        r = _pt_residual(cam, zero6, zero3, R, t, X, uv, ur)
        Jc = jax.jacfwd(lambda xi: _pt_residual(cam, xi, zero3, R, t, X, uv, ur))(zero6)
        Jp = jax.jacfwd(lambda dx: _pt_residual(cam, zero6, dx, R, t, X, uv, ur))(zero3)
        return r, Jc, Jp

    def ln_r_and_J(R, t, ep, uv_obs):
        zero6 = jnp.zeros(6)
        zeroe = jnp.zeros(6)
        r = _ln_residual(cam, zero6, zeroe, R, t, ep, uv_obs)
        Jc = jax.jacfwd(lambda xi: _ln_residual(cam, xi, zeroe, R, t, ep, uv_obs))(zero6)
        Jl = jax.jacfwd(lambda de: _ln_residual(cam, zero6, de, R, t, ep, uv_obs))(zeroe)
        return r, Jc, Jl

    # ---- per-obs residuals & Jacobians (points) ----------------------
    Ro = cam_R[prob.obs_cam]
    to = cam_t[prob.obs_cam]
    Xo = pt_xyz[prob.obs_pt]
    r, Jc, Jp = jax.vmap(pt_r_and_J)(Ro, to, Xo, prob.obs_uv, prob.obs_ur)
    chi = jnp.sum(r**2, -1) * prob.obs_w
    w_rob = jnp.where(use_robust, _huber_w(chi, delta2_pt), 1.0)
    w = prob.obs_w * w_rob * (in_pt & prob.obs_valid)

    # block accumulations
    JcW = Jc * w[:, None, None]
    U = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
        jnp.einsum("ori,orj->oij", JcW, Jc)
    )
    V = jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(
        jnp.einsum("ori,orj->oij", Jp * w[:, None, None], Jp)
    )
    bc = jnp.zeros((C, 6)).at[prob.obs_cam].add(
        -jnp.einsum("ori,or->oi", JcW, r)
    )
    bp = jnp.zeros((P, 3)).at[prob.obs_pt].add(
        -jnp.einsum("ori,or->oi", Jp * w[:, None, None], r)
    )
    # A[p, c] = sum_{obs(c,p)} Jc^T W Jp  (P, C, 6, 3)
    A = jnp.zeros((P, C, 6, 3)).at[prob.obs_pt, prob.obs_cam].add(
        jnp.einsum("ori,orj->oij", JcW, Jp)
    )

    # ---- lines -------------------------------------------------------
    Rl = cam_R[prob.lobs_cam]
    tl = cam_t[prob.lobs_cam]
    epl = ln_ep[prob.lobs_ln]
    rl, Jcl, Jl = jax.vmap(ln_r_and_J)(Rl, tl, epl, prob.lobs_uv)
    chil = jnp.sum(rl**2, -1) * prob.lobs_w
    wl_rob = jnp.where(use_robust, _huber_w(chil, CHI2_LINE), 1.0)
    wl = prob.lobs_w * wl_rob * (in_ln & prob.lobs_valid)
    JclW = Jcl * wl[:, None, None]
    U = U.at[prob.lobs_cam].add(jnp.einsum("ori,orj->oij", JclW, Jcl))
    Vl = jnp.zeros((L, 6, 6)).at[prob.lobs_ln].add(
        jnp.einsum("ori,orj->oij", Jl * wl[:, None, None], Jl)
    )
    bc = bc.at[prob.lobs_cam].add(-jnp.einsum("ori,or->oi", JclW, rl))
    bl = jnp.zeros((L, 6)).at[prob.lobs_ln].add(
        -jnp.einsum("ori,or->oi", Jl * wl[:, None, None], rl)
    )
    Al = jnp.zeros((L, C, 6, 6)).at[prob.lobs_ln, prob.lobs_cam].add(
        jnp.einsum("ori,orj->oij", JclW, Jl)
    )

    def solve_with_damping(lam):
        # damped landmark blocks: V + lam*diag(V) + eps*I
        mkdiag3 = jax.vmap(jnp.diag)
        Vd = V + lam * mkdiag3(jnp.diagonal(V, axis1=1, axis2=2)) + 1e-6 * jnp.eye(3)
        Vinv = jnp.linalg.inv(Vd)
        Vld = Vl + lam * mkdiag3(jnp.diagonal(Vl, axis1=1, axis2=2)) + 1e-6 * jnp.eye(6)
        Vlinv = jnp.linalg.inv(Vld)

        # Schur complement (points + lines)
        AV = jnp.einsum("pcij,pjk->pcik", A, Vinv)       # (P, C, 6, 3)
        S_pt = jnp.einsum("pcik,pdlk->cdil", AV, A)      # (C, C, 6, 6)
        AVl = jnp.einsum("pcij,pjk->pcik", Al, Vlinv)
        S_ln = jnp.einsum("pcik,pdlk->cdil", AVl, Al)
        Ud = U + lam * jax.vmap(jnp.diag)(jnp.diagonal(U, axis1=1, axis2=2))
        S = -S_pt - S_ln
        S = S.at[jnp.arange(C), jnp.arange(C)].add(Ud)
        bt = bc - jnp.einsum("pcik,pk->ci", AV, bp) - jnp.einsum(
            "pcik,pk->ci", AVl, bl
        )

        # fixed / invalid cameras: identity rows
        free = (~prob.cam_fixed) & prob.cam_valid
        mask_c = free.astype(jnp.float32)
        S = S * mask_c[:, None, None, None] * mask_c[None, :, None, None]
        S = S.at[jnp.arange(C), jnp.arange(C)].add(
            jnp.eye(6)[None] * (1.0 - mask_c)[:, None, None]
        )
        bt = bt * mask_c[:, None]

        Sd = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
        xi = jnp.linalg.solve(
            Sd + 1e-8 * jnp.eye(6 * C), bt.reshape(-1)
        ).reshape(C, 6)

        # back-substitute landmarks
        rhs_p = bp - jnp.einsum("pcik,ci->pk", A, xi)
        dX = jnp.einsum("pij,pj->pi", Vinv, rhs_p)
        rhs_l = bl - jnp.einsum("pcik,ci->pk", Al, xi)
        dE = jnp.einsum("pij,pj->pi", Vlinv, rhs_l)

        Rn, tn = jax.vmap(se3.left_update)(xi, cam_R, cam_t)
        Rn = jax.vmap(se3.orthonormalize)(Rn)
        # freeze fixed cameras / gate landmark updates on observation
        keep = (prob.cam_fixed | ~prob.cam_valid)[:, None]
        tn = jnp.where(keep, cam_t, tn)
        Rn = jnp.where(keep[:, :, None], cam_R, Rn)
        has_obs_p = jnp.diagonal(V, axis1=1, axis2=2).sum(-1) > 1e-9
        Xn = jnp.where((prob.pt_valid & has_obs_p)[:, None], pt_xyz + dX, pt_xyz)
        has_obs_l = jnp.diagonal(Vl, axis1=1, axis2=2).sum(-1) > 1e-9
        En = jnp.where(
            (prob.ln_valid & has_obs_l)[:, None, None],
            ln_ep + dE.reshape(L, 2, 3),
            ln_ep,
        )
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


def ba_state_init(prob: BAProblem):
    """Initial LM state for the stepped API."""
    return (
        prob.cam_R, prob.cam_t, prob.pt_xyz, prob.ln_ep,
        prob.obs_valid, prob.lobs_valid, jnp.float32(1e-4),
    )


@functools.partial(jax.jit, static_argnames=("cam", "robust"))
def ba_iterate(cam, prob: BAProblem, state, robust: bool = True):
    """ONE LM iteration as its own XLA program. The stepped API exists for
    the shared-transport deployment reality: a monolithic 15-iteration BA
    monopolizes the device for hundreds of ms while the tracker's per-frame
    dispatches queue behind it. Dispatching iterations one at a time lets
    tracking interleave, and the host can abort between iterations — the
    reference's interruptible BA (mbAbortBA, Optimizer.cc:682,1007)."""
    return _lm_iteration(cam, prob, state, robust)


@functools.partial(jax.jit, static_argnames=("cam", "robust", "n"))
def ba_iterate_chunk(cam, prob: BAProblem, state, robust: bool = True,
                     n: int = 5):
    """``n`` LM iterations per XLA program (lax.scan). The per-dispatch
    transport overhead on the tunneled TPU (~2.5 ms amortized) makes
    one-iteration programs mostly overhead; a small chunk keeps BA
    abortable at a few-iteration granularity while paying the dispatch
    tax ~n times less."""
    return jax.lax.scan(
        lambda s, _: (_lm_iteration(cam, prob, s, robust), None),
        state, None, length=n,
    )[0]


@functools.partial(jax.jit, static_argnames=("cam",))
def ba_reclassify(cam, prob: BAProblem, state):
    """chi2 inlier reclassification between the two phases
    (Optimizer.cc:806-860)."""
    cam_R, cam_t, pt_xyz, ln_ep, _, _, lam = state
    chi_pt, chi_ln = _chi2_all(cam, prob, cam_R, cam_t, pt_xyz, ln_ep)
    in_pt = (chi_pt <= _delta2_pt(prob)) & prob.obs_valid
    in_ln = (chi_ln <= CHI2_LINE) & prob.lobs_valid
    return (cam_R, cam_t, pt_xyz, ln_ep, in_pt, in_ln, lam)


@functools.partial(jax.jit, static_argnames=("cam",))
def ba_finalize(cam, prob: BAProblem, state) -> BAResult:
    """Final chi2 classification + cost."""
    cam_R, cam_t, pt_xyz, ln_ep, _, _, lam = state
    chi_pt, chi_ln = _chi2_all(cam, prob, cam_R, cam_t, pt_xyz, ln_ep)
    in_pt = (chi_pt <= _delta2_pt(prob)) & prob.obs_valid
    in_ln = (chi_ln <= CHI2_LINE) & prob.lobs_valid
    cost = _robust_cost(cam, prob, cam_R, cam_t, pt_xyz, ln_ep, in_pt,
                        in_ln, False)
    return BAResult(cam_R, cam_t, pt_xyz, ln_ep, in_pt, in_ln, cost)


def bundle_adjust_stepped(cam, prob: BAProblem, iters1: int = 5,
                          iters2: int = 10, robust: bool = True,
                          should_abort=None) -> BAResult:
    """Two-phase LM BA dispatched one iteration per XLA program (see
    ba_iterate). ``should_abort()`` is polled between iterations; on abort
    the current state is finalized early (mbAbortBA semantics)."""
    state = ba_state_init(prob)
    aborted = False
    chunk = 5
    for i in range(0, iters1, chunk):
        state = ba_iterate_chunk(cam, prob, state, robust,
                                 n=min(chunk, iters1 - i))
        if should_abort is not None and should_abort():
            aborted = True
            break
    if not aborted:
        state = ba_reclassify(cam, prob, state)
        for i in range(0, iters2, chunk):
            state = ba_iterate_chunk(cam, prob, state, robust,
                                     n=min(chunk, iters2 - i))
            if should_abort is not None and should_abort():
                break
    return ba_finalize(cam, prob, state)


@functools.partial(
    jax.jit, static_argnames=("cam", "iters1", "iters2", "robust")
)
def bundle_adjust(
    cam,
    prob: BAProblem,
    iters1: int = 5,
    iters2: int = 10,
    robust: bool = True,
) -> BAResult:
    """Two-phase LM BA with chi2 reclassification between phases, as ONE
    XLA program (lax.scan over the iteration — unrolling 15 copies made
    trace+compile take over a minute)."""
    state = ba_state_init(prob)

    def run_phase(state, n):
        return jax.lax.scan(
            lambda s, _: (_lm_iteration(cam, prob, s, robust), None),
            state, None, length=n,
        )[0]

    state = run_phase(state, iters1)
    state = ba_reclassify(cam, prob, state)
    state = run_phase(state, iters2)
    return ba_finalize(cam, prob, state)
