"""Pose-graph optimization over keyframes (essential graph).

JAX replacement for ``Optimizer::OptimizeEssentialGraph``
(/root/reference/src/Optimizer.cc:1064-1399): nodes are keyframe poses,
edges are relative-pose measurements from the spanning tree, strong
covisibility pairs and loop closures; the residual of edge (i, j) is
``log(T_ij_meas · T_i · T_j^-1)`` — for RGB-D the scale is observable so
the graph is SE(3) (the reference's Sim3 with fixed scale; fix_scale=true
path of its VertexSim3Expmap).

Gauss–Newton with all edge residuals/Jacobians vmapped, normal equations
assembled by segment scatter-add, dense solve of the (6K, 6K) system —
K <= 1024 keyframes is tiny for the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3


class PoseGraphProblem(NamedTuple):
    R: jax.Array          # (K, 3, 3) current poses (world->camera)
    t: jax.Array          # (K, 3)
    fixed: jax.Array      # (K,) bool (the loop keyframe anchors the gauge)
    valid: jax.Array      # (K,) bool
    # edges
    ei: jax.Array         # (E,) int32
    ej: jax.Array         # (E,) int32
    R_meas: jax.Array     # (E, 3, 3)  T_ij = T_i * T_j^-1 measured
    t_meas: jax.Array     # (E, 3)
    w: jax.Array          # (E,) edge weight
    e_valid: jax.Array    # (E,) bool


def make_problem(K: int, E: int) -> PoseGraphProblem:
    z = jnp.zeros
    return PoseGraphProblem(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)),
        t=z((K, 3), jnp.float32),
        fixed=z((K,), bool),
        valid=z((K,), bool),
        ei=z((E,), jnp.int32),
        ej=z((E,), jnp.int32),
        R_meas=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (E, 3, 3)),
        t_meas=z((E, 3), jnp.float32),
        w=jnp.ones((E,), jnp.float32),
        e_valid=z((E,), bool),
    )


def relative_pose(Ri, ti, Rj, tj):
    """T_ij = T_i ∘ T_j^-1."""
    Rji, tji = se3.inverse(Rj, tj)
    return se3.compose(Ri, ti, Rji, tji)


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 20):
    """Damped Gauss-Newton on the edge residuals. Returns (R, t)."""
    K = prob.R.shape[0]

    def edge_residual(xi_i, xi_j, Ri, ti, Rj, tj, Rm, tm):
        Ri2, ti2 = se3.left_update(xi_i, Ri, ti)
        Rj2, tj2 = se3.left_update(xi_j, Rj, tj)
        Rrel, trel = relative_pose(Ri2, ti2, Rj2, tj2)
        # err = log(T_meas^-1 * T_rel)
        Rmi, tmi = se3.inverse(Rm, tm)
        Re, te = se3.compose(Rmi, tmi, Rrel, trel)
        return se3.se3_log(Re, te)

    def gn_iter(state, _):
        R, t, lam = state
        Ri = R[prob.ei]
        ti = t[prob.ei]
        Rj = R[prob.ej]
        tj = t[prob.ej]
        zero = jnp.zeros(6)

        def rJ(Ri, ti, Rj, tj, Rm, tm):
            r = edge_residual(zero, zero, Ri, ti, Rj, tj, Rm, tm)
            Ji = jax.jacfwd(
                lambda x: edge_residual(x, zero, Ri, ti, Rj, tj, Rm, tm)
            )(zero)
            Jj = jax.jacfwd(
                lambda x: edge_residual(zero, x, Ri, ti, Rj, tj, Rm, tm)
            )(zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(rJ)(Ri, ti, Rj, tj, prob.R_meas, prob.t_meas)
        w = prob.w * prob.e_valid
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]

        H = jnp.zeros((K, K, 6, 6))
        H = H.at[prob.ei, prob.ei].add(jnp.einsum("eri,erj->eij", JiW, Ji))
        H = H.at[prob.ej, prob.ej].add(jnp.einsum("eri,erj->eij", JjW, Jj))
        H = H.at[prob.ei, prob.ej].add(jnp.einsum("eri,erj->eij", JiW, Jj))
        H = H.at[prob.ej, prob.ei].add(jnp.einsum("eri,erj->eij", JjW, Ji))
        b = jnp.zeros((K, 6))
        b = b.at[prob.ei].add(-jnp.einsum("eri,er->ei", JiW, r))
        b = b.at[prob.ej].add(-jnp.einsum("eri,er->ei", JjW, r))

        free = prob.valid & ~prob.fixed
        mc = free.astype(jnp.float32)
        H = H * mc[:, None, None, None] * mc[None, :, None, None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.eye(6)[None] * (1.0 - mc)[:, None, None]
        )
        b = b * mc[:, None]
        Hd = H.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        Hd = Hd + lam * jnp.diag(jnp.diagonal(Hd)) + 1e-8 * jnp.eye(6 * K)
        xi = jnp.linalg.solve(Hd, b.reshape(-1)).reshape(K, 6)

        Rn, tn = jax.vmap(se3.left_update)(xi, R, t)
        Rn = jax.vmap(se3.orthonormalize)(Rn)
        keep = (~free)[:, None]
        tn = jnp.where(keep, t, tn)
        Rn = jnp.where(keep[:, :, None], R, Rn)

        def cost(R, t):
            Ri = R[prob.ei]
            ti = t[prob.ei]
            Rj = R[prob.ej]
            tj = t[prob.ej]
            rr = jax.vmap(
                lambda Ri, ti, Rj, tj, Rm, tm: edge_residual(
                    zero, zero, Ri, ti, Rj, tj, Rm, tm
                )
            )(Ri, ti, Rj, tj, prob.R_meas, prob.t_meas)
            return jnp.sum(jnp.sum(rr**2, -1) * w)

        c0 = cost(R, t)
        c1 = cost(Rn, tn)
        accept = (c1 < c0) & jnp.isfinite(c1)
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e3)
        return (R, t, lam), None

    (R, t, _), _ = jax.lax.scan(
        gn_iter, (prob.R, prob.t, jnp.float32(1e-6)), None, length=iters
    )
    return R, t


# ===========================================================================
# Sim(3) variant — scale-drift-aware essential graph for monocular loops
# (the reference's fix_scale=false path of OptimizeEssentialGraph:
# VertexSim3Expmap with 7-dof updates, Optimizer.cc:1064-1399).
# ===========================================================================

from ..geometry import sim3 as _sim3


class Sim3GraphProblem(NamedTuple):
    R: jax.Array          # (K, 3, 3)
    t: jax.Array          # (K, 3)
    s: jax.Array          # (K,) scale (world->camera Sim3)
    fixed: jax.Array
    valid: jax.Array
    ei: jax.Array
    ej: jax.Array
    R_meas: jax.Array     # (E, 3, 3) S_ij = S_i * S_j^-1 measured
    t_meas: jax.Array
    s_meas: jax.Array     # (E,)
    w: jax.Array
    e_valid: jax.Array


def make_sim3_problem(K: int, E: int) -> Sim3GraphProblem:
    z = jnp.zeros
    return Sim3GraphProblem(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)),
        t=z((K, 3), jnp.float32), s=jnp.ones((K,), jnp.float32),
        fixed=z((K,), bool), valid=z((K,), bool),
        ei=z((E,), jnp.int32), ej=z((E,), jnp.int32),
        R_meas=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (E, 3, 3)),
        t_meas=z((E, 3), jnp.float32), s_meas=jnp.ones((E,), jnp.float32),
        w=jnp.ones((E,), jnp.float32), e_valid=z((E,), bool),
    )


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph_sim3(prob: Sim3GraphProblem, iters: int = 20):
    """Damped GN over Sim3 nodes. Returns (R, t, s)."""
    K = prob.R.shape[0]
    zero = jnp.zeros(7)

    def upd(xi, s, R, t):
        ds, dR, dt = _sim3.exp(xi)
        return _sim3.compose(ds, dR, dt, s, R, t)

    def edge_residual(xi_i, xi_j, si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
        si2, Ri2, ti2 = upd(xi_i, si, Ri, ti)
        sj2, Rj2, tj2 = upd(xi_j, sj, Rj, tj)
        sji, Rji, tji = _sim3.inverse(sj2, Rj2, tj2)
        sr, Rr, tr = _sim3.compose(si2, Ri2, ti2, sji, Rji, tji)
        smi, Rmi, tmi = _sim3.inverse(sm, Rm, tm)
        se, Re, te = _sim3.compose(smi, Rmi, tmi, sr, Rr, tr)
        return _sim3.log(se, Re, te)

    def gn_iter(state, _):
        R, t, s, lam = state
        args = (s[prob.ei], R[prob.ei], t[prob.ei],
                s[prob.ej], R[prob.ej], t[prob.ej],
                prob.s_meas, prob.R_meas, prob.t_meas)

        def rJ(si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
            r = edge_residual(zero, zero, si, Ri, ti, sj, Rj, tj, sm, Rm, tm)
            Ji = jax.jacfwd(lambda x: edge_residual(
                x, zero, si, Ri, ti, sj, Rj, tj, sm, Rm, tm))(zero)
            Jj = jax.jacfwd(lambda x: edge_residual(
                zero, x, si, Ri, ti, sj, Rj, tj, sm, Rm, tm))(zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(rJ)(*args)
        w = prob.w * prob.e_valid
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        H = jnp.zeros((K, K, 7, 7))
        H = H.at[prob.ei, prob.ei].add(jnp.einsum("eri,erj->eij", JiW, Ji))
        H = H.at[prob.ej, prob.ej].add(jnp.einsum("eri,erj->eij", JjW, Jj))
        H = H.at[prob.ei, prob.ej].add(jnp.einsum("eri,erj->eij", JiW, Jj))
        H = H.at[prob.ej, prob.ei].add(jnp.einsum("eri,erj->eij", JjW, Ji))
        b = jnp.zeros((K, 7))
        b = b.at[prob.ei].add(-jnp.einsum("eri,er->ei", JiW, r))
        b = b.at[prob.ej].add(-jnp.einsum("eri,er->ei", JjW, r))

        free = prob.valid & ~prob.fixed
        mc = free.astype(jnp.float32)
        H = H * mc[:, None, None, None] * mc[None, :, None, None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.eye(7)[None] * (1.0 - mc)[:, None, None])
        b = b * mc[:, None]
        Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        Hd = Hd + lam * jnp.diag(jnp.diagonal(Hd)) + 1e-8 * jnp.eye(7 * K)
        xi = jnp.linalg.solve(Hd, b.reshape(-1)).reshape(K, 7)

        sn, Rn, tn = jax.vmap(upd)(xi, s, R, t)
        Rn = jax.vmap(se3.orthonormalize)(Rn)
        keep = ~free
        sn = jnp.where(keep, s, sn)
        tn = jnp.where(keep[:, None], t, tn)
        Rn = jnp.where(keep[:, None, None], R, Rn)

        def cost(s, R, t):
            rr = jax.vmap(lambda *a: edge_residual(zero, zero, *a))(
                s[prob.ei], R[prob.ei], t[prob.ei],
                s[prob.ej], R[prob.ej], t[prob.ej],
                prob.s_meas, prob.R_meas, prob.t_meas)
            return jnp.sum(jnp.sum(rr**2, -1) * w)

        c0 = cost(s, R, t)
        c1 = cost(sn, Rn, tn)
        accept = (c1 < c0) & jnp.isfinite(c1)
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        s = jnp.where(accept, sn, s)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e3)
        return (R, t, s, lam), None

    (R, t, s, _), _ = jax.lax.scan(
        gn_iter, (prob.R, prob.t, prob.s, jnp.float32(1e-6)), None,
        length=iters)
    return R, t, s
