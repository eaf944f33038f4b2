"""Distributed bundle adjustment: landmark-block sharding + psum'd
reduced camera system.

The scaling story from BASELINE.json: partition map points (and their
observations) into blocks across devices; every device Schur-eliminates its
landmark blocks locally; the contributions to the reduced camera system
S = U - sum_p A_p V_p^-1 A_p^T and rhs are ALL-REDUCED over the mesh's
``obs`` axis (one psum riding ICI); the dense (6C, 6C) solve is replicated;
landmark back-substitution happens shard-locally. The camera update is
identical on every device by construction.

This is the ``shard_map`` expression of the reference's LocalBundleAdjustment
/ GlobalBundleAdjustemnt (/root/reference/src/Optimizer.cc:644-1063, :60-374)
at multi-chip scale — the reference has no distributed analog (pthreads over
shared memory only; SURVEY §2 concurrency row).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import se3

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class ShardedBA(NamedTuple):
    """Per-shard BA problem; leading axis = shard. Cameras replicated."""

    cam_R: jax.Array      # (C, 3, 3) replicated
    cam_t: jax.Array      # (C, 3)
    cam_fixed: jax.Array  # (C,)
    pt_xyz: jax.Array     # (S, Ps, 3) sharded points
    pt_valid: jax.Array   # (S, Ps)
    obs_cam: jax.Array    # (S, Os)
    obs_pt: jax.Array     # (S, Os)  local point index within the shard
    obs_uv: jax.Array     # (S, Os, 2)
    obs_ur: jax.Array     # (S, Os)
    obs_w: jax.Array      # (S, Os)
    obs_valid: jax.Array  # (S, Os)


def shard_problem(cam_R, cam_t, cam_fixed, pt_xyz, pt_valid,
                  obs_cam, obs_pt, obs_uv, obs_ur, obs_w, obs_valid,
                  n_shards: int) -> ShardedBA:
    """Host-side partitioner: round-robin points to shards, obs follow their
    point. Pads every shard to equal size (SPMD-friendly)."""
    P_total = pt_xyz.shape[0]
    owner = np.arange(P_total) % n_shards
    local_idx = np.arange(P_total) // n_shards
    Ps = -(-P_total // n_shards)
    o_owner = owner[obs_pt]
    Os = 0
    per_shard_obs = []
    for s in range(n_shards):
        sel = np.nonzero((o_owner == s) & obs_valid)[0]
        per_shard_obs.append(sel)
        Os = max(Os, len(sel))
    Os = max(Os, 1)

    def pad(arr, n, shape=(), dtype=np.float32):
        out = np.zeros((n,) + shape, dtype)
        out[: len(arr)] = arr
        return out

    sp_xyz = np.zeros((n_shards, Ps, 3), np.float32)
    sp_valid = np.zeros((n_shards, Ps), bool)
    so_cam = np.zeros((n_shards, Os), np.int32)
    so_pt = np.zeros((n_shards, Os), np.int32)
    so_uv = np.zeros((n_shards, Os, 2), np.float32)
    so_ur = np.full((n_shards, Os), -1.0, np.float32)
    so_w = np.ones((n_shards, Os), np.float32)
    so_valid = np.zeros((n_shards, Os), bool)
    for s in range(n_shards):
        pids = np.nonzero(owner == s)[0]
        sp_xyz[s, : len(pids)] = pt_xyz[pids]
        sp_valid[s, : len(pids)] = pt_valid[pids]
        sel = per_shard_obs[s]
        so_cam[s, : len(sel)] = obs_cam[sel]
        so_pt[s, : len(sel)] = local_idx[obs_pt[sel]]
        so_uv[s, : len(sel)] = obs_uv[sel]
        so_ur[s, : len(sel)] = obs_ur[sel]
        so_w[s, : len(sel)] = obs_w[sel]
        so_valid[s, : len(sel)] = True
    return ShardedBA(
        jnp.asarray(cam_R), jnp.asarray(cam_t), jnp.asarray(cam_fixed),
        jnp.asarray(sp_xyz), jnp.asarray(sp_valid),
        jnp.asarray(so_cam), jnp.asarray(so_pt), jnp.asarray(so_uv),
        jnp.asarray(so_ur), jnp.asarray(so_w), jnp.asarray(so_valid),
    )


def unshard_points(Xs: np.ndarray, n_points: int) -> np.ndarray:
    """Invert shard_problem's round-robin point partition: (S, Ps, 3) back
    to global (n_points, 3) order."""
    S, Ps, _ = Xs.shape
    out = np.zeros((n_points, 3), Xs.dtype)
    ids = np.arange(n_points)
    out[ids] = Xs[ids % S, ids // S]
    return out


def distributed_bundle_adjust(cam, prob, mesh: Mesh, iters: int = 8,
                              cg_iters: int = 32,
                              chi2_mono: float = CHI2_MONO,
                              chi2_stereo: float = CHI2_STEREO,
                              should_abort=None):
    """Run the engine's gathered point-BA problem on a device mesh.

    ``prob`` is the engine's ``optim.local_ba.BAProblem`` (duck-typed: the
    point fields are read; line fields are ignored — the reference's GBA is
    points-only, Optimizer.cc:60-374, and map lines ride along via their
    reference keyframes). The landmark blocks are round-robin sharded over
    the mesh's ``obs`` axis; each damped GN step relinearizes and solves
    the reduced camera system with the matrix-free sharded PCG
    (distributed_cg_step) so nothing quadratic in C exists on any chip.

    Returns (cam_R, cam_t, pt_xyz, obs_inlier) as host numpy in the
    problem's global ordering — a drop-in for the single-device
    ``ba_cg.bundle_adjust_cg_stepped`` write-back path.
    """
    cam_R = np.asarray(prob.cam_R)
    cam_t = np.asarray(prob.cam_t)
    cam_fixed = np.asarray(prob.cam_fixed) | ~np.asarray(prob.cam_valid)
    pt_xyz = np.asarray(prob.pt_xyz)
    pt_valid = np.asarray(prob.pt_valid)
    obs_cam = np.asarray(prob.obs_cam)
    obs_pt = np.asarray(prob.obs_pt)
    obs_uv = np.asarray(prob.obs_uv)
    obs_ur = np.asarray(prob.obs_ur)
    obs_w = np.asarray(prob.obs_w)
    obs_valid = np.asarray(prob.obs_valid)
    n_shards = int(mesh.shape["obs"])  # landmark blocks shard this axis
    P_total = pt_xyz.shape[0]

    sharded = shard_problem(
        cam_R, cam_t, cam_fixed, pt_xyz, pt_valid,
        obs_cam, obs_pt, obs_uv, obs_ur, obs_w, obs_valid,
        n_shards=n_shards,
    )
    lam = 1e-3
    for it in range(iters):
        # mbStopGBA (LoopClosing.cc:641-647): a queued keyframe aborts the
        # GBA between steps — each step is one dispatched program, so the
        # abort latency is one GN step, same as the single-device stepped BA
        if should_abort is not None and it > 0 and should_abort():
            break
        Rn, tn, Xn = distributed_cg_step(cam, sharded, mesh, lam=lam,
                                         cg_iters=cg_iters)
        sharded = sharded._replace(cam_R=Rn, cam_t=tn, pt_xyz=Xn)
        lam = max(lam * 0.5, 1e-5)

    Rn = np.asarray(sharded.cam_R)
    tn = np.asarray(sharded.cam_t)
    Xn = unshard_points(np.asarray(sharded.pt_xyz), P_total)

    # chi2 inlier classification at the final state (host, vectorized):
    # the engine's write-back erases outlier observations
    Ro = Rn[obs_cam]
    to = tn[obs_cam]
    pc = np.einsum("oij,oj->oi", Ro, Xn[obs_pt]) + to
    z = np.where(np.abs(pc[:, 2]) > 1e-6, pc[:, 2], 1e-6)
    u = cam.fx * pc[:, 0] / z + cam.cx
    v = cam.fy * pc[:, 1] / z + cam.cy
    du = u - obs_uv[:, 0]
    dv = v - obs_uv[:, 1]
    stereo = obs_ur >= 0
    dur = np.where(stereo, (u - cam.bf / z) - obs_ur, 0.0)
    chi2 = obs_w * (du**2 + dv**2 + dur**2)
    inlier = obs_valid & (pc[:, 2] > 0) & np.where(
        stereo, chi2 <= chi2_stereo, chi2 <= chi2_mono)
    return Rn, tn, Xn, inlier


def _point_residual(cam, R, t, X, uv, ur):
    pc = R @ X + t
    z = jnp.where(jnp.abs(pc[2]) > 1e-6, pc[2], 1e-6)
    u = cam.fx * pc[0] / z + cam.cx
    v = cam.fy * pc[1] / z + cam.cy
    urp = u - cam.bf / z
    return jnp.stack([u - uv[0], v - uv[1],
                      jnp.where(ur >= 0, urp - ur, 0.0)])


def distributed_gn_step(cam, prob: ShardedBA, mesh: Mesh, lam: float = 1e-4):
    """One damped GN step of the sharded BA. Returns (cam_R, cam_t, pt_xyz)
    with the same sharding as the input."""
    C = prob.cam_R.shape[0]

    def local_shard(cam_R, cam_t, cam_fixed, pt_xyz, pt_valid,
                    obs_cam, obs_pt, obs_uv, obs_ur, obs_w, obs_valid):
        # shapes inside shard_map: leading shard axis stripped
        pt_xyz = pt_xyz[0]
        pt_valid = pt_valid[0]
        obs_cam = obs_cam[0]
        obs_pt = obs_pt[0]
        obs_uv = obs_uv[0]
        obs_ur = obs_ur[0]
        obs_w = obs_w[0]
        obs_valid = obs_valid[0]
        Ps = pt_xyz.shape[0]

        def r_and_J(Rc, tc, X, uv, ur):
            zero6 = jnp.zeros(6)
            zero3 = jnp.zeros(3)

            def f(xi, dx):
                Rn, tn = se3.left_update(xi, Rc, tc)
                return _point_residual(cam, Rn, tn, X + dx, uv, ur)

            r = f(zero6, zero3)
            Jc = jax.jacfwd(lambda xi: f(xi, zero3))(zero6)
            Jp = jax.jacfwd(lambda dx: f(zero6, dx))(zero3)
            return r, Jc, Jp

        Ro = cam_R[obs_cam]
        to = cam_t[obs_cam]
        Xo = pt_xyz[obs_pt]
        r, Jc, Jp = jax.vmap(r_and_J)(Ro, to, Xo, obs_uv, obs_ur)
        w = obs_w * obs_valid
        JcW = Jc * w[:, None, None]
        JpW = Jp * w[:, None, None]

        U = jnp.zeros((C, 6, 6)).at[obs_cam].add(
            jnp.einsum("ori,orj->oij", JcW, Jc))
        V = jnp.zeros((Ps, 3, 3)).at[obs_pt].add(
            jnp.einsum("ori,orj->oij", JpW, Jp))
        bc = jnp.zeros((C, 6)).at[obs_cam].add(
            -jnp.einsum("ori,or->oi", JcW, r))
        bp = jnp.zeros((Ps, 3)).at[obs_pt].add(
            -jnp.einsum("ori,or->oi", JpW, r))
        A = jnp.zeros((Ps, C, 6, 3)).at[obs_pt, obs_cam].add(
            jnp.einsum("ori,orj->oij", JcW, Jp))

        Vd = V + lam * jax.vmap(jnp.diag)(
            jnp.diagonal(V, axis1=1, axis2=2)) + 1e-6 * jnp.eye(3)
        Vinv = jnp.linalg.inv(Vd)
        AV = jnp.einsum("pcij,pjk->pcik", A, Vinv)
        S_local = -jnp.einsum("pcik,pdlk->cdil", AV, A)
        bt_local = bc - jnp.einsum("pcik,pk->ci", AV, bp)
        U_local = U

        # === THE collective: reduce the camera system over landmark shards
        S = jax.lax.psum(S_local, "obs")
        bt = jax.lax.psum(bt_local, "obs")
        U_all = jax.lax.psum(U_local, "obs")

        Ud = U_all + lam * jax.vmap(jnp.diag)(
            jnp.diagonal(U_all, axis1=1, axis2=2))
        S = S.at[jnp.arange(C), jnp.arange(C)].add(Ud)
        free = ~cam_fixed
        mc = free.astype(jnp.float32)
        S = S * mc[:, None, None, None] * mc[None, :, None, None]
        S = S.at[jnp.arange(C), jnp.arange(C)].add(
            jnp.eye(6)[None] * (1.0 - mc)[:, None, None])
        bt = bt * mc[:, None]
        Sd = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
        xi = jnp.linalg.solve(Sd + 1e-8 * jnp.eye(6 * C),
                              bt.reshape(-1)).reshape(C, 6)

        # local landmark back-substitution
        rhs_p = bp - jnp.einsum("pcik,ci->pk", A, xi)
        dX = jnp.einsum("pij,pj->pi", Vinv, rhs_p)
        has_obs = jnp.diagonal(V, axis1=1, axis2=2).sum(-1) > 1e-9
        Xn = jnp.where((pt_valid & has_obs)[:, None], pt_xyz + dX, pt_xyz)

        Rn, tn = jax.vmap(se3.left_update)(xi, cam_R, cam_t)
        Rn = jax.vmap(se3.orthonormalize)(Rn)
        keep = cam_fixed[:, None]
        tn = jnp.where(keep, cam_t, tn)
        Rn = jnp.where(keep[:, :, None], cam_R, Rn)
        return Rn, tn, Xn[None]

    spec_rep = P()
    spec_sh = P("obs")
    fn = jax.shard_map(
        local_shard, mesh=mesh,
        in_specs=(spec_rep, spec_rep, spec_rep,
                  spec_sh, spec_sh, spec_sh, spec_sh, spec_sh, spec_sh,
                  spec_sh, spec_sh),
        out_specs=(spec_rep, spec_rep, spec_sh),
        check_vma=False,
    )
    return jax.jit(fn)(
        prob.cam_R, prob.cam_t, prob.cam_fixed,
        prob.pt_xyz, prob.pt_valid,
        prob.obs_cam, prob.obs_pt, prob.obs_uv, prob.obs_ur, prob.obs_w,
        prob.obs_valid,
    )


def distributed_cg_step(cam, prob: ShardedBA, mesh: Mesh,
                        lam: float = 1e-4, cg_iters: int = 32):
    """One damped GN step with a MATRIX-FREE sharded Schur solve.

    The dense variant above all-reduces the whole (C, C, 6, 6) reduced
    camera system — one big psum, then a replicated dense solve; fine to a
    few hundred cameras. Here nothing quadratic in C exists anywhere:
    every S·v product is evaluated as local two-pass observation sweeps
    (the optim.ba_cg formulation) whose (C, 6) camera-vector contribution
    is psum'd over the landmark shards — so each PCG iteration moves only
    6C floats over ICI, and the preconditioner (exact block diagonal of S)
    is one (C, 6, 6) psum. This is the whole-map multi-chip GBA design:
    keyframes in the thousands, landmark blocks sharded, collectives
    riding ICI.
    """
    C = prob.cam_R.shape[0]

    def local_shard(cam_R, cam_t, cam_fixed, pt_xyz, pt_valid,
                    obs_cam, obs_pt, obs_uv, obs_ur, obs_w, obs_valid):
        pt_xyz = pt_xyz[0]
        pt_valid = pt_valid[0]
        obs_cam = obs_cam[0]
        obs_pt = obs_pt[0]
        obs_uv = obs_uv[0]
        obs_ur = obs_ur[0]
        obs_w = obs_w[0]
        obs_valid = obs_valid[0]
        Ps = pt_xyz.shape[0]

        def r_and_J(Rc, tc, X, uv, ur):
            zero6 = jnp.zeros(6)
            zero3 = jnp.zeros(3)

            def f(xi, dx):
                Rn, tn = se3.left_update(xi, Rc, tc)
                return _point_residual(cam, Rn, tn, X + dx, uv, ur)

            r = f(zero6, zero3)
            Jc = jax.jacfwd(lambda xi: f(xi, zero3))(zero6)
            Jp = jax.jacfwd(lambda dx: f(zero6, dx))(zero3)
            return r, Jc, Jp

        r, Jc, Jp = jax.vmap(r_and_J)(
            cam_R[obs_cam], cam_t[obs_cam], pt_xyz[obs_pt], obs_uv, obs_ur)
        w = obs_w * obs_valid
        JcW = Jc * w[:, None, None]
        JpW = Jp * w[:, None, None]

        U = jnp.zeros((C, 6, 6)).at[obs_cam].add(
            jnp.einsum("ori,orj->oij", JcW, Jc))
        V = jnp.zeros((Ps, 3, 3)).at[obs_pt].add(
            jnp.einsum("ori,orj->oij", JpW, Jp))
        bc = jnp.zeros((C, 6)).at[obs_cam].add(
            -jnp.einsum("ori,or->oi", JcW, r))
        bp = jnp.zeros((Ps, 3)).at[obs_pt].add(
            -jnp.einsum("ori,or->oi", JpW, r))

        Vd = V + lam * jax.vmap(jnp.diag)(
            jnp.diagonal(V, axis1=1, axis2=2)) + 1e-6 * jnp.eye(3)
        Vinv = jnp.linalg.inv(Vd)

        U_all = jax.lax.psum(U, "obs")
        bc_all = jax.lax.psum(bc, "obs")
        Ud = U_all + lam * jax.vmap(jnp.diag)(
            jnp.diagonal(U_all, axis1=1, axis2=2))

        free = ~cam_fixed
        mfree = free.astype(jnp.float32)[:, None]

        def schur_term(v):
            """Local A V^-1 A^T v contribution (C, 6); psum'd by caller."""
            u = jnp.einsum("ori,oi->or", JcW, v[obs_cam])
            atv = jnp.zeros((Ps, 3)).at[obs_pt].add(
                jnp.einsum("ori,or->oi", Jp, u))
            z = jnp.einsum("pij,pj->pi", Vinv, atv)
            s = jnp.einsum("ori,oi->or", Jp, z[obs_pt])
            return jnp.zeros((C, 6)).at[obs_cam].add(
                jnp.einsum("ori,or->oi", JcW, s))

        def S_mul(v):
            v = v * mfree
            uv_ = jnp.einsum("cij,cj->ci", Ud, v)
            t = jax.lax.psum(schur_term(v), "obs")
            return (uv_ - t) * mfree

        # rhs
        zp = jnp.einsum("pij,pj->pi", Vinv, bp)
        sp = jnp.einsum("ori,oi->or", Jp, zp[obs_pt])
        av_bp = jnp.zeros((C, 6)).at[obs_cam].add(
            jnp.einsum("ori,or->oi", JcW, sp))
        bt = (bc_all - jax.lax.psum(av_bp, "obs")) * mfree

        # exact block-diagonal preconditioner (one psum)
        B = jnp.einsum("ori,orj->oij", JcW, Jp)
        BV = jnp.einsum("oij,ojk->oik", B, Vinv[obs_pt])
        dg = jnp.zeros((C, 6, 6)).at[obs_cam].add(
            jnp.einsum("oik,ojk->oij", BV, B))
        M = Ud - jax.lax.psum(dg, "obs")
        M = M * mfree[:, :, None] + jnp.eye(6)[None] * (1.0 - mfree[:, :, None])
        Minv = jnp.linalg.inv(M + 1e-6 * jnp.eye(6))

        def prec(v):
            return jnp.einsum("cij,cj->ci", Minv, v) * mfree

        def dot(a, b):
            return jnp.sum(a * b)

        x0 = jnp.zeros((C, 6))
        r0 = bt
        z0 = prec(r0)

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
            cg_step, (x0, r0, z0, z0, dot(r0, z0)), None,
            length=cg_iters)
        xi = xi * mfree

        # local landmark back-substitution
        u = jnp.einsum("ori,oi->or", JcW, xi[obs_cam])
        at_xi = jnp.zeros((Ps, 3)).at[obs_pt].add(
            jnp.einsum("ori,or->oi", Jp, u))
        dX = jnp.einsum("pij,pj->pi", Vinv, bp - at_xi)
        has_obs = jnp.diagonal(V, axis1=1, axis2=2).sum(-1) > 1e-9
        Xn = jnp.where((pt_valid & has_obs)[:, None], pt_xyz + dX, pt_xyz)

        Rn, tn = jax.vmap(se3.left_update)(xi, cam_R, cam_t)
        Rn = jax.vmap(se3.orthonormalize)(Rn)
        keep = cam_fixed[:, None]
        tn = jnp.where(keep, cam_t, tn)
        Rn = jnp.where(keep[:, :, None], cam_R, Rn)
        return Rn, tn, Xn[None]

    spec_rep = P()
    spec_sh = P("obs")
    fn = jax.shard_map(
        local_shard, mesh=mesh,
        in_specs=(spec_rep, spec_rep, spec_rep,
                  spec_sh, spec_sh, spec_sh, spec_sh, spec_sh, spec_sh,
                  spec_sh, spec_sh),
        out_specs=(spec_rep, spec_rep, spec_sh),
        check_vma=False,
    )
    return jax.jit(fn)(
        prob.cam_R, prob.cam_t, prob.cam_fixed,
        prob.pt_xyz, prob.pt_valid,
        prob.obs_cam, prob.obs_pt, prob.obs_uv, prob.obs_ur, prob.obs_w,
        prob.obs_valid,
    )
