"""Monocular two-view bootstrap: parallel H/F RANSAC + reconstruction.

Re-design of the reference ``Initializer`` (/root/reference/src/
Initializer.cc): the reference launches two host threads to RANSAC a
homography and a fundamental matrix concurrently (:104-105), scores both
with symmetric transfer errors (CheckHomography/CheckFundamental
:181-461), selects by the ratio SH/(SH+SF) > 0.40 (:129-136), then
reconstructs — ``ReconstructF`` decomposes the essential matrix into 4
motions and keeps the one with a clear cheirality winner (:484-733,909),
``ReconstructH`` runs the Faugeras 8-motion decomposition (:484 comment,
:735-...). DLT triangulation (:734-795) and CheckRT (:798-907) gate the
winner.

TPU shape: both model RANSACs are ONE vmapped program each (hundreds of
minimal solves concurrently — 4-point DLT for H, normalized 8-point for
F, both (k,9) SVD nullspaces), scoring is a dense (hyp x N) batch, and
reconstruction checks all motion hypotheses in one batch instead of
sequential CheckRT calls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CHI2_H = 5.991
CHI2_F = 3.84
SCORE_TH = 5.991  # both scores accumulate (SCORE_TH - chi2)


def _normalize(uv, valid):
    """Hartley normalization (Initializer::Normalize, :909-960)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (uv * w[:, None]).sum(0) / n
    dev = (jnp.abs(uv - mean) * w[:, None]).sum(0) / n
    s = 1.0 / jnp.maximum(dev, 1e-9)
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]], jnp.float32)
    return (uv - mean) * s, T


def _dlt_h(p1, p2):
    """H from 4 correspondences: nullspace of (8,9)."""
    def rows(a, b):
        x, y = a
        u, v = b
        r1 = jnp.array([0., 0., 0., -x, -y, -1., v * x, v * y, v])
        r2 = jnp.array([x, y, 1., 0., 0., 0., -u * x, -u * y, -u])
        return jnp.stack([r1, r2])

    A = jnp.concatenate([rows(p1[i], p2[i]) for i in range(4)], 0)
    _, _, vt = jnp.linalg.svd(A)
    return vt[8].reshape(3, 3)


def _eight_point(p1, p2):
    """F from 8 correspondences (rank-2 enforced)."""
    x, y = p1[:, 0], p1[:, 1]
    u, v = p2[:, 0], p2[:, 1]
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y,
                   jnp.ones_like(x)], -1)
    _, _, vt = jnp.linalg.svd(A)
    F = vt[8].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    return U @ jnp.diag(S.at[2].set(0.0)) @ Vt


def _sym_err_h(H, uv1, uv2):
    """Symmetric transfer chi2 for H (CheckHomography :181-288)."""
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))

    def xfer(M, a, b):
        h = jnp.concatenate([a, jnp.ones((a.shape[0], 1))], -1) @ M.T
        w = jnp.where(jnp.abs(h[:, 2]) > 1e-9, h[:, 2], 1e-9)
        p = h[:, :2] / w[:, None]
        return ((p - b) ** 2).sum(-1)

    return xfer(H, uv1, uv2), xfer(Hinv, uv2, uv1)


def _sym_err_f(F, uv1, uv2):
    """Point-line chi2 both ways (CheckFundamental :290-398)."""
    h1 = jnp.concatenate([uv1, jnp.ones((uv1.shape[0], 1))], -1)
    h2 = jnp.concatenate([uv2, jnp.ones((uv2.shape[0], 1))], -1)
    l2 = h1 @ F.T
    l1 = h2 @ F
    d2 = (jnp.sum(l2 * h2, -1) ** 2) / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-9)
    d1 = (jnp.sum(l1 * h1, -1) ** 2) / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-9)
    return d1, d2


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def find_models(uv1, uv2, valid, key, n_hyp: int = 256):
    """RANSAC H and F concurrently. Returns (H, score_h, F, score_f,
    inliers_h, inliers_f) — the reference's two threads as two vmaps."""
    M = uv1.shape[0]
    p = valid.astype(jnp.float32)
    p = p / (p.sum() + 1e-9)
    n1, T1 = _normalize(uv1, valid)
    n2, T2 = _normalize(uv2, valid)

    keys = jax.random.split(key, n_hyp)

    def hyp_h(k):
        idx = jax.random.choice(k, M, (4,), replace=False, p=p)
        Hn = _dlt_h(n1[idx], n2[idx])
        return jnp.linalg.inv(T2) @ Hn @ T1

    def hyp_f(k):
        idx = jax.random.choice(k, M, (8,), replace=False, p=p)
        Fn = _eight_point(n1[idx], n2[idx])
        # h2n^T Fn h1n = 0 with h*n = T* h*  =>  F = T2^T Fn T1
        return T2.T @ Fn @ T1

    Hs = jax.vmap(hyp_h)(keys)
    Fs = jax.vmap(hyp_f)(keys)

    def score_h(H):
        c1, c2 = _sym_err_h(H, uv1, uv2)
        ok = (c1 < CHI2_H) & (c2 < CHI2_H) & valid
        s = jnp.where(ok, (SCORE_TH - c1) + (SCORE_TH - c2), 0.0)
        return s.sum(), ok

    def score_f(F):
        c1, c2 = _sym_err_f(F, uv1, uv2)
        ok = (c1 < CHI2_F) & (c2 < CHI2_F) & valid
        s = (jnp.where((c1 < CHI2_F) & valid, SCORE_TH - c1, 0.0)
             + jnp.where((c2 < CHI2_F) & valid, SCORE_TH - c2, 0.0))
        return jnp.where(ok, s, 0.0).sum(), ok

    sh, okh = jax.vmap(score_h)(Hs)
    sf, okf = jax.vmap(score_f)(Fs)
    bh = jnp.argmax(sh)
    bf = jnp.argmax(sf)
    return Hs[bh], sh[bh], Fs[bf], sf[bf], okh[bh], okf[bf]


def _triangulate(P1, P2, uv1, uv2):
    A = jnp.stack([
        uv1[:, 0:1] * P1[2] - P1[0],
        uv1[:, 1:2] * P1[2] - P1[1],
        uv2[:, 0:1] * P2[2] - P2[0],
        uv2[:, 1:2] * P2[2] - P2[1],
    ], axis=1)
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[:, 3, :]
    w = Xh[:, 3]
    return Xh[:, :3] / jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)[:, None]


def _check_rt(K, R, t, uv1, uv2, ok):
    """CheckRT (:798-907): triangulate, gate cheirality/parallax/reproj;
    returns (n_good, good_mask, p3d, parallax_score)."""
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
    P2 = K @ jnp.concatenate([R, t[:, None]], -1)
    pw = _triangulate(P1, P2, uv1, uv2)
    z1 = pw[:, 2]
    pc2 = pw @ R.T + t
    z2 = pc2[:, 2]
    c2 = -(R.T @ t)
    r1 = pw
    r2 = pw - c2
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(d1 * d2, 1e-9)

    def reproj(P, uv):
        h = pw @ P[:, :3].T + P[:, 3]
        w = jnp.where(jnp.abs(h[:, 2]) > 1e-9, h[:, 2], 1e-9)
        return (((h[:, :2] / w[:, None]) - uv) ** 2).sum(-1)

    e1 = reproj(P1, uv1)
    e2 = reproj(P2, uv2)
    good = (ok & (z1 > 0) & (z2 > 0) & (cos_par < 0.99998)
            & (e1 < 4.0 * CHI2_H) & (e2 < 4.0 * CHI2_H))
    return good.sum(), good, pw, cos_par


@functools.partial(jax.jit, static_argnames=())
def reconstruct_f(F, K, uv1, uv2, ok):
    """4-motion essential decomposition + winner selection
    (ReconstructF :484-733 + DecomposeE :909)."""
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.array([[0., -1., 0.], [1., 0., 0.], [0., 0., 1.]])

    def fix(R):
        return R * jnp.sign(jnp.linalg.det(R))

    R1 = fix(U @ W @ Vt)
    R2 = fix(U @ W.T @ Vt)
    tt = U[:, 2]
    tt = tt / jnp.maximum(jnp.linalg.norm(tt), 1e-9)
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([tt, -tt, tt, -tt])
    n, good, pw, _ = jax.vmap(
        lambda R, t: _check_rt(K, R, t, uv1, uv2, ok))(cands_R, cands_t)
    best = jnp.argmax(n)
    n_best = n[best]
    n_total = ok.sum()
    # clear winner: best > 0.7 * total-good and second-best << best
    n_sorted = jnp.sort(n)
    clear = (n_best >= jnp.maximum(0.7 * n_total.astype(jnp.float32), 30)
             ) & (n_sorted[2] < 0.75 * n_best)
    return cands_R[best], cands_t[best], pw[best], good[best], clear


@functools.partial(jax.jit, static_argnames=())
def reconstruct_h(H, K, uv1, uv2, ok):
    """Faugeras homography decomposition (ReconstructH). The reference
    builds 8 motion hypotheses from the SVD of K^-1 H K; each is CheckRT'd
    and the clear winner kept."""
    A = jnp.linalg.inv(K) @ H @ K
    U, S, Vt = jnp.linalg.svd(A)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # d' = d2 branch (n'=+-)
    aux_st = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sts = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def make_pos(i):
        Rp = jnp.array([[ct, 0., -sts[i]], [0., 1., 0.], [sts[i], 0., ct]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-9)

    # d' = -d2 branch
    aux_sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sps = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def make_neg(i):
        Rp = jnp.array([[cp, 0., sps[i]], [0., -1., 0.], [sps[i], 0., -cp]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-9)

    Rs, ts = [], []
    for i in range(4):
        R, t = make_pos(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = make_neg(i)
        Rs.append(R)
        ts.append(t)
    cands_R = jnp.stack(Rs)
    cands_t = jnp.stack(ts)
    n, good, pw, _ = jax.vmap(
        lambda R, t: _check_rt(K, R, t, uv1, uv2, ok))(cands_R, cands_t)
    best = jnp.argmax(n)
    n_best = n[best]
    n_sorted = jnp.sort(n)
    clear = (n_best >= jnp.maximum(
        0.7 * ok.sum().astype(jnp.float32), 30)) & (
        n_sorted[6] < 0.75 * n_best)
    return cands_R[best], cands_t[best], pw[best], good[best], clear
