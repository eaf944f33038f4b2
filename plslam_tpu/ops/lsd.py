"""Line-segment detection as a fully vectorized array program.

TPU-native replacement for the OpenCV ``LSDDetector::detect`` call wrapped by
the reference's ``LineExtractor`` (/root/reference/src/LineExtractor.cpp:
18-35). Classic LSD region-growing is inherently sequential; this re-design
keeps its signal model (pixels support a line when their gradient is strong
and perpendicular to it) but finds segments with dense parallel primitives:

 1. Sobel gradients; keep the top-P strongest pixels (sparse working set).
 2. Quantize line orientation (mod pi) into B bins with +/- tolerance.
 3. Per-bin Hough-like histogram over the perpendicular offset rho;
    1D NMS + top-K peaks -> (theta, rho) candidates.
 4. Per candidate: support pixels within a rho corridor, reduced to the
    strongest S per candidate with a row-wise ``approx_max_k`` (no scatter —
    TPU scatter throughput would dominate the whole detector), sorted along
    the line direction; the longest gap-tolerant run over the sorted
    projections (one associative scan) gives the segment extent.
 5. Weighted PCA of the run's support pixels refines angle/offset to
    sub-pixel; endpoints = extreme projections of supports onto the fit.
 6. Candidate NMS (same orientation + offset + overlapping extent), then
    keep the longest ``keep_top`` segments — matching the reference's
    response = length / max(W, H) ranking (LineExtractor.cpp:23-35).

Everything is fixed-shape; the whole detector jits into one XLA program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LineConfig
from . import image


class LineFeatures(NamedTuple):
    """Padded per-frame line arrays (pixel coordinates)."""

    endpoints: jax.Array  # (NL, 2, 2) [start(x,y), end(x,y)]
    angle: jax.Array      # (NL,) radians in (-pi, pi], gradient-oriented
    length: jax.Array     # (NL,)
    response: jax.Array   # (NL,) length / max(W, H)
    coeff: jax.Array      # (NL, 3) normalized homogeneous 2D line
    valid: jax.Array      # (NL,) bool


# static working-set sizes
_P = 12288         # sparse strong-gradient pixel budget (Hough voting)
_P_RUN = 4096      # subset used for per-candidate support/run finding
                   # (8192 costs +0.35 ms/frame on v5e with no quality gain
                   # on the lsd_quality harness — stability is actually
                   # better at 4096 because weaker texture pixels stop
                   # perturbing the PCA fit)
_K_PER_BIN = 8     # rho peaks kept per orientation bin
_S_SUP = 512       # strongest supports kept per candidate (approx_max_k);
                   # only delimits run extent — the PCA fit uses all _P_RUN
                   # supports — and 512 samples resolve gaps to ~1.5 px on a
                   # full-diagonal line, well under the 2x gap tolerance


@functools.partial(jax.jit, static_argnames=("cfg", "hw"))
def detect_lines(img: jax.Array, cfg: LineConfig, hw: tuple[int, int]) -> LineFeatures:
    h, w = hw
    img = img.astype(jnp.float32)
    gx, gy = image.sobel_gradients(image.gaussian_blur(img, 5, 1.0))
    mag = jnp.sqrt(gx * gx + gy * gy)

    # Structure-tensor coherence: line/edge pixels have anisotropic local
    # gradients (coherence ~1) while texture/noise is isotropic (~0). This
    # stands in for LSD's implicit region-coherence and keeps the sparse
    # pixel budget for actual edges.
    jxx = image.gaussian_blur(gx * gx, 5, 2.0)
    jxy = image.gaussian_blur(gx * gy, 5, 2.0)
    jyy = image.gaussian_blur(gy * gy, 5, 2.0)
    coherence = jnp.sqrt((jxx - jyy) ** 2 + 4.0 * jxy * jxy) / (jxx + jyy + 1e-6)

    # kill borders
    ys2 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs2 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (ys2 >= 2) & (ys2 < h - 2) & (xs2 >= 2) & (xs2 < w - 2)
    gate = inside & (mag > cfg.grad_threshold) & (coherence > 0.6)
    mag = jnp.where(gate, mag * coherence, 0.0)

    # ---- 1. sparse top-P working set -------------------------------------
    # approx_max_k: the TPU-native top-k (full sort is ~10x slower and exact
    # rank order among support pixels is irrelevant here)
    flat_mag, flat_idx = jax.lax.approx_max_k(mag.reshape(-1), _P)
    py = (flat_idx // w).astype(jnp.float32)
    px = (flat_idx % w).astype(jnp.float32)
    pgx = gx.reshape(-1)[flat_idx]
    pgy = gy.reshape(-1)[flat_idx]
    pw = flat_mag
    p_ok = flat_mag > 0.0
    # line direction = gradient rotated 90deg; fold to [0, pi)
    theta_p = jnp.arctan2(pgy, pgx) + jnp.pi / 2
    theta_p = jnp.mod(theta_p, jnp.pi)  # (P,)

    # center coordinates so rho spans ~[-diag/2, diag/2]
    cx0, cy0 = (w - 1) / 2.0, (h - 1) / 2.0
    qx, qy = px - cx0, py - cy0

    B = cfg.n_orientation_bins
    NR = int(2 * np.ceil(np.hypot(h, w) / 2 / cfg.rho_bin_px)) + 2
    thetas = jnp.arange(B) * (jnp.pi / B)  # (B,)
    tol = jnp.pi / B  # +/- one bin width of angular tolerance

    # angular membership (B, P): distance on the mod-pi circle
    dth = jnp.abs(theta_p[None, :] - thetas[:, None])
    dth = jnp.minimum(dth, jnp.pi - dth)
    inbin = (dth < tol) & p_ok[None, :]

    # rho per (B, P): projection on each bin's normal
    nx = -jnp.sin(thetas)[:, None]
    ny = jnp.cos(thetas)[:, None]
    rho = qx[None, :] * nx + qy[None, :] * ny  # (B, P)
    rho_idx = jnp.clip(
        (rho / cfg.rho_bin_px + NR / 2).astype(jnp.int32), 0, NR - 1
    )

    # ---- 2. Hough histogram + peaks --------------------------------------
    # one-hot contraction on the MXU instead of a scatter-add: hist[b, r] =
    # sum_p w[b,p] * 1[rho_idx[b,p] == r]. TPU scatter costs ~1.7 ms here;
    # the bf16 batched matmul with a materialized one-hot is ~3x cheaper.
    w_b = jnp.where(inbin, pw[None, :], 0.0).astype(jnp.bfloat16)  # (B, P)
    onehot = (
        rho_idx[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, NR), 2)
    ).astype(jnp.bfloat16)  # (B, P, NR)
    hist = jax.lax.dot_general(
        w_b[:, None, :], onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]  # (B, NR)
    # smooth +/-1 bin, then NMS over a 5-bin window
    kernel = jnp.asarray([0.25, 0.5, 0.25])
    hist_s = (
        hist * 0.5
        + 0.25 * jnp.roll(hist, 1, axis=1)
        + 0.25 * jnp.roll(hist, -1, axis=1)
    )
    local_max = jax.lax.reduce_window(
        hist_s, -jnp.inf, jax.lax.max, (1, 5), (1, 1), "SAME"
    )
    peaks = jnp.where(hist_s >= local_max, hist_s, 0.0)
    peak_val, peak_rho_idx = jax.lax.top_k(peaks, _K_PER_BIN)  # (B, K)

    C = B * _K_PER_BIN
    cand_theta = jnp.repeat(thetas, _K_PER_BIN)  # (C,)
    cand_rho = (peak_rho_idx.reshape(-1).astype(jnp.float32) - NR / 2) * cfg.rho_bin_px
    cand_ok = peak_val.reshape(-1) > (cfg.min_length_px * cfg.grad_threshold * 0.5)
    cand_bin = jnp.repeat(jnp.arange(B), _K_PER_BIN)

    # ---- 3+4. support -> gap-tolerant run -> PCA fit, iterated ------------
    # Round 0 gathers support in the Hough (theta, rho) corridor; later
    # rounds re-gather against the refined infinite line, which re-unites
    # fragments that coarse angular bins split across rho corridors.
    corridor = 1.5 * cfg.rho_bin_px
    BIG = jnp.float32(1e9)

    # run/fit stages operate on the strongest _P_RUN pixels only
    qx_r, qy_r = qx[:_P_RUN], qy[:_P_RUN]
    theta_r = theta_p[:_P_RUN]
    p_ok_r = p_ok[:_P_RUN]
    pw_r = pw[:_P_RUN]
    pgx_r, pgy_r = pgx[:_P_RUN], pgy[:_P_RUN]

    def gather_fit(mx, my, dx_f, dy_f):
        """Support pixels near the line through (mx,my) dir (dx_f,dy_f):
        keep the strongest _S_SUP per candidate, sort along the line, take
        the longest gap-tolerant run, weighted-PCA fit. All dense ops —
        the only irregulars are a row-wise approx_max_k and a row sort."""
        # angular gate: pixel's own orientation close to the line's (mod pi)
        ang_line = jnp.mod(jnp.arctan2(dy_f, dx_f), jnp.pi)
        dthc = jnp.abs(theta_r[None, :] - ang_line[:, None])
        dthc = jnp.minimum(dthc, jnp.pi - dthc)
        ang_gate = (dthc < tol) & p_ok_r[None, :]
        # perpendicular distance to the line
        nxf, nyf = -dy_f, dx_f
        dperp = jnp.abs(
            (qx_r[None, :] - mx[:, None]) * nxf[:, None]
            + (qy_r[None, :] - my[:, None]) * nyf[:, None]
        )
        sup = ang_gate & (dperp < corridor)
        # polarity split: a painted stripe's two anti-parallel edges both sit
        # inside the corridor, and a fit over their union settles ~midway —
        # unstably, drifting 1-2 px between frames (LBD flips ~20 bits/px).
        # Keep only ONE polarity class, chosen deterministically: positive
        # canonical polarity unless negative clearly dominates. The canonical
        # normal uses a fixed half-plane (NOT the Hough-bin direction, whose
        # mod-pi wraparound flips for near-horizontal lines under rotation).
        canon = jnp.where(jnp.sign(dy_f + 0.2 * dx_f) == 0, 1.0,
                          jnp.sign(dy_f + 0.2 * dx_f))
        ncx = canon * -dy_f
        ncy = canon * dx_f
        gdot = pgx_r[None, :] * ncx[:, None] + pgy_r[None, :] * ncy[:, None]
        w_sup = jnp.where(sup, pw_r[None, :], 0.0)
        s_pos = jnp.sum(jnp.where(gdot > 0, w_sup, 0.0), axis=1)
        s_neg = jnp.sum(jnp.where(gdot <= 0, w_sup, 0.0), axis=1)
        pol_pos = s_pos >= 0.3 * (s_pos + s_neg)
        pol_class = jnp.where(pol_pos[:, None], gdot > 0, gdot <= 0)
        t = (qx_r[None, :] - mx[:, None]) * dx_f[:, None] + (
            qy_r[None, :] - my[:, None]
        ) * dy_f[:, None]
        # strongest S supports per candidate (C, S). The weight and the line
        # parameter are PACKED into one f32 (w in the high bits, quantized t
        # in the low 12) so approx_max_k returns t directly — the
        # take_along_axis gather it replaces costs ~2 ms/round on TPU, and
        # run segmentation only needs t to ~1 px anyway. Exact integers up
        # to 2^24 are representable: 3000*4096 + 4096 < 2^24.
        w_q = jnp.floor(jnp.clip(pw_r[None, :], 1.0, 3000.0))
        t_q = jnp.floor(jnp.clip(t + 2048.0, 0.0, 4095.0))
        pack = jnp.where(sup, w_q * 4096.0 + t_q, 0.0)
        top_pack, _ = jax.lax.approx_max_k(pack, _S_SUP)
        ok = top_pack > 0.0
        t_sel = jnp.mod(top_pack, 4096.0) - 2048.0
        # sort support t values along the line; invalids to the end (value
        # sort, not argsort — nothing else needs to travel with t)
        ts = jnp.sort(jnp.where(ok, t_sel, BIG), axis=1)
        ok_s = ts < 0.5 * BIG
        idx = jax.lax.broadcasted_iota(jnp.int32, (C, _S_SUP), 1)
        prev = jnp.concatenate([jnp.full((C, 1), -BIG), ts[:, :-1]], axis=1)
        # 2x tolerance: crossings with other lines blank the angular gate for
        # ~a line-width; the old binary-closing formulation bridged ~2 bins
        # each side, which this reproduces
        newrun = (ts - prev > 2.0 * cfg.gap_tolerance_px) | ~ok_s | (idx == 0)
        # t at the start of the run each element belongs to, via a segmented
        # "hold" scan (copy the value at run starts forward). The obvious
        # take_along_axis(ts, prefix_max(start_index)) formulation lowers to
        # a 49k-element scalar-unit gather costing ~0.5 ms/round on v5e —
        # the single hottest op of the whole detector; the scan is ~10 us.
        def _hold(a, b):
            af, av = a
            bf, bv = b
            return af | bf, jnp.where(bf, bv, av)

        _, ts_start = jax.lax.associative_scan(
            _hold, (newrun, jnp.where(newrun, ts, 0.0)), axis=1
        )
        # pick the longest run by SPAN along the line (count under-ranks runs
        # thinned by the per-candidate support cap)
        span = jnp.where(ok_s, ts - ts_start, -1.0)
        best_end = jnp.argmax(span, axis=1).astype(jnp.int32)
        # run extent in t (from the sorted subset)
        t_lo = jnp.take_along_axis(ts_start, best_end[:, None], 1)[:, 0]
        t_hi = jnp.take_along_axis(ts, best_end[:, None], 1)[:, 0]
        # weighted PCA over ALL supports inside the run extent — dense (C, P)
        # reductions (no scatter). The top-S subset only delimits the run;
        # fitting on it alone is unstable: which supports are "strongest"
        # varies frame to frame and both edges of a stripe share the
        # corridor, so a biased subset shifts the fitted line by ~1-2 px —
        # and LBD flips ~20 bits per px of perpendicular drift.
        in_run = sup & (t >= t_lo[:, None]) & (t <= t_hi[:, None])
        # PCA over the chosen polarity class only (see pol_class above): the
        # fit locks onto ONE edge of a stripe instead of drifting between the
        # two. Runs/extent/counts still use the full support set.
        wgt = jnp.where(in_run & pol_class, pw_r[None, :], 0.0)  # (C, P_RUN)
        sw = jnp.sum(wgt, axis=1) + 1e-6
        mx2 = jnp.sum(wgt * qx_r[None, :], axis=1) / sw
        my2 = jnp.sum(wgt * qy_r[None, :], axis=1) / sw
        dxq = qx_r[None, :] - mx2[:, None]
        dyq = qy_r[None, :] - my2[:, None]
        sxx = jnp.sum(wgt * dxq * dxq, axis=1) / sw
        sxy = jnp.sum(wgt * dxq * dyq, axis=1) / sw
        syy = jnp.sum(wgt * dyq * dyq, axis=1) / sw
        ang2 = 0.5 * jnp.arctan2(2 * sxy, sxx - syy)
        dx2 = jnp.cos(ang2)
        dy2 = jnp.sin(ang2)
        flip = dx2 * dx_f + dy2 * dy_f < 0
        dx2 = jnp.where(flip, -dx2, dx2)
        dy2 = jnp.where(flip, -dy2, dy2)
        t_f = dxq * dx2[:, None] + dyq * dy2[:, None]
        t_min = jnp.min(jnp.where(in_run, t_f, BIG), axis=1)
        t_max = jnp.max(jnp.where(in_run, t_f, -BIG), axis=1)
        n_sup = jnp.sum(in_run, axis=1)
        # mean gradient projected on the refined normal (endpoint ordering);
        # over the fit class only — the full-set sum cancels to ~0 on stripes
        # and its sign (hence endpoint order) would flip frame to frame
        in_fit = in_run & pol_class
        gn = jnp.sum(jnp.where(in_fit, pgx_r[None, :], 0.0), axis=1) * (-dy2) + (
            jnp.sum(jnp.where(in_fit, pgy_r[None, :], 0.0), axis=1) * dx2
        )
        return mx2, my2, dx2, dy2, t_min, t_max, n_sup, gn

    # initial line params from the Hough candidate: anchor = rho * normal
    mx = cand_rho * -jnp.sin(cand_theta)
    my = cand_rho * jnp.cos(cand_theta)
    dx_f = jnp.cos(cand_theta)
    dy_f = jnp.sin(cand_theta)
    for _ in range(2):
        mx, my, dx_f, dy_f, t_min, t_max, n_sup, gn = gather_fit(
            mx, my, dx_f, dy_f
        )
    t_min = jnp.where(t_min >= BIG, jnp.inf, t_min)
    t_max = jnp.where(t_max <= -BIG, -jnp.inf, t_max)

    seg_ok = cand_ok & (n_sup >= 8) & jnp.isfinite(t_min) & jnp.isfinite(t_max)
    t_min = jnp.where(seg_ok, t_min, 0.0)
    t_max = jnp.where(seg_ok, t_max, 0.0)
    length = t_max - t_min
    # density gate: supports per pixel of length
    density = n_sup.astype(jnp.float32) / jnp.maximum(length, 1.0)
    seg_ok = seg_ok & (length >= cfg.min_length_px) & (density > 0.35)

    sx = mx + t_min * dx_f + cx0
    sy = my + t_min * dy_f + cy0
    ex = mx + t_max * dx_f + cx0
    ey = my + t_max * dy_f + cy0

    # ---- 5. candidate NMS -------------------------------------------------
    ang_c = jnp.mod(jnp.arctan2(dy_f, dx_f), jnp.pi)
    d_ang = jnp.abs(ang_c[:, None] - ang_c[None, :])
    d_ang = jnp.minimum(d_ang, jnp.pi - d_ang)
    # perpendicular offset of centroid j to line i
    nxf, nyf = -dy_f, dx_f
    off = jnp.abs(
        (mx[None, :] - mx[:, None]) * nxf[:, None]
        + (my[None, :] - my[:, None]) * nyf[:, None]
    )
    # extent overlap along i's direction
    tj_lo = (mx[None, :] + 0 - mx[:, None]) * dx_f[:, None] + (
        my[None, :] - my[:, None]
    ) * dy_f[:, None] + t_min[None, :]
    tj_hi = tj_lo + length[None, :]
    ov_lo = jnp.maximum(t_min[:, None], tj_lo)
    ov_hi = jnp.minimum(t_max[:, None], tj_hi)
    overlap = (ov_hi - ov_lo) > -cfg.gap_tolerance_px
    # duplicates of one structure converge to the SAME edge under the
    # polarity-class fit (off ≈ 0), so suppression can be tight — a loose
    # gate here chains distinct overlapping segments into giant suppression
    # groups and decimates the detection count
    # require substantial mutual extent overlap: duplicates share most of
    # their span; collinear fragments that merely touch are distinct lines
    strong_overlap = (ov_hi - ov_lo) > 0.3 * jnp.minimum(
        length[:, None], length[None, :]
    )
    similar = (d_ang < jnp.pi / 36) & (off < 1.5 * cfg.rho_bin_px) & strong_overlap
    # union-extend each segment over its collinear overlapping fragments: the
    # per-candidate support cap can truncate long lines, but the truncated
    # remainder surfaces as another candidate; the union recovers full extent
    # (the reference's disabled KeyLineMerging intent, LineExtractor.cpp:83-157)
    # deterministic polarity preference: the two anti-parallel edges of a
    # painted stripe are both "similar" under NMS and near-equal in length —
    # without a stable tiebreak the surviving edge flips between frames and
    # descriptor matching compares opposite edges (LBD flips ~20 bits/px of
    # perpendicular offset). gn's sign depends on the direction convention,
    # which must NOT come from the Hough bin (mod-pi wraparound flips it for
    # near-horizontal lines under small rotations): canonicalize against a
    # fixed half-plane tilted away from the Manhattan directions.
    canon = jnp.sign(dy_f + 0.2 * dx_f)
    gn_c = gn * jnp.where(canon == 0, 1.0, canon)
    score = jnp.where(seg_ok, length * jnp.where(gn_c > 0, 2.0, 1.0), -1.0)
    # suppressed if a similar segment has a strictly better (score, idx) key
    key = score * C - jnp.arange(C)
    better = similar & (key[None, :] > key[:, None]) & seg_ok[None, :]
    keep = seg_ok & ~jnp.any(better, axis=1)

    # ---- 6. final top-N by length ----------------------------------------
    final_score = jnp.where(keep, length, 0.0)
    top_val, top_idx = jax.lax.top_k(final_score, cfg.max_lines)
    # reference keeps the best `keep_top` by response (LineExtractor.cpp:23-35)
    rank = jnp.arange(cfg.max_lines)
    valid = (top_val >= cfg.min_length_px) & (rank < cfg.keep_top)

    s_sel = jnp.stack([sx[top_idx], sy[top_idx]], -1)
    e_sel = jnp.stack([ex[top_idx], ey[top_idx]], -1)
    # orient by mean gradient normal (stable endpoint order across frames)
    swap = gn[top_idx] < 0
    s_fin = jnp.where(swap[:, None], e_sel, s_sel)
    e_fin = jnp.where(swap[:, None], s_sel, e_sel)

    d_fin = e_fin - s_fin
    ang_fin = jnp.arctan2(d_fin[:, 1], d_fin[:, 0])
    len_fin = jnp.sqrt(jnp.sum(d_fin**2, -1))
    from ..geometry.lines import line_equation_2d

    coeff = line_equation_2d(s_fin, e_fin)
    return LineFeatures(
        endpoints=jnp.stack([s_fin, e_fin], 1),
        angle=jnp.where(valid, ang_fin, 0.0),
        length=jnp.where(valid, len_fin, 0.0),
        response=jnp.where(valid, len_fin / max(h, w), 0.0),
        coeff=jnp.where(valid[:, None], coeff, 0.0),
        valid=valid,
    )
