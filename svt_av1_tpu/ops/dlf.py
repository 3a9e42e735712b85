"""AV1 deblocking loop filter (normative, 8-bit path).

Vectorized edge-parallel formulation: each edge line (a column of
vertical-edge sample groups or a row of horizontal-edge groups) is
filtered as one array op; the frame is two passes (all vertical edges
left-to-right, then all horizontal edges top-to-bottom), which is
order-equivalent to the reference's per-superblock interleave because
vertical filters never read horizontal-filter output and modification
spans of successive edges do not overlap.

Behavioral parity: masks/filters EbDeblockingCommon.c (filter_mask*:148,
filter4:222, filter6:283, filter8:298, filter14:810, thresholds
update_sharpness:587), edge walk EbDecLF.c.
"""
from __future__ import annotations

import numpy as np

MAX_LOOP_FILTER = 63


def filter_levels_from_qindex(qindex: int, bit_depth: int = 8) -> int:
    """Encoder-side level choice (libaom LPF_PICK_FROM_Q keyframe fit)."""
    from ..entropy.tables import ac_q

    q = ac_q(qindex, bit_depth)
    filt = (q * 20723 + 1015158 + (1 << 17)) >> 18
    return int(np.clip(filt, 0, MAX_LOOP_FILTER))


def _thresholds(level: int, sharpness: int):
    inside = level >> ((sharpness > 0) + (sharpness > 4))
    if sharpness > 0:
        inside = min(inside, 9 - sharpness)
    inside = max(inside, 1)
    blimit = 2 * (level + 2) + inside
    hev = level >> 4
    return np.int32(blimit), np.int32(inside), np.int32(hev)


def _sc(x, shift=0):
    """signed_char_clamp (bd-scaled) on int32 arrays."""
    return np.clip(x, -128 << shift, (128 << shift) - 1)


def _filter_line(p, q, blimit, limit, thresh, size, shift=0):
    """Filter one edge line.

    p: [..., np] samples left/above of the edge, p[..., 0] farthest
       (p[..., -1] is p0);  q: [..., nq], q[..., 0] is q0.
    Returns filtered (p, q) copies.  ``size`` in {4, 6, 8, 14}.
    """
    p = p.astype(np.int32)
    q = q.astype(np.int32)
    P = p.shape[-1]
    p0, p1 = p[..., P - 1], p[..., P - 2]
    q0, q1 = q[..., 0], q[..., 1]

    if size == 4:
        mask = ((np.abs(p1 - p0) <= limit) & (np.abs(q1 - q0) <= limit)
                & (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= blimit))
        return _filter4(p, q, mask, thresh, shift)

    p2, q2 = p[..., P - 3], q[..., 2]
    if size == 6:
        mask = ((np.abs(p2 - p1) <= limit) & (np.abs(p1 - p0) <= limit)
                & (np.abs(q1 - q0) <= limit) & (np.abs(q2 - q1) <= limit)
                & (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= blimit))
        fth = 1 << shift
        flat = ((np.abs(p1 - p0) <= fth) & (np.abs(q1 - q0) <= fth)
                & (np.abs(p2 - p0) <= fth) & (np.abs(q2 - q0) <= fth))
        fp, fq = _filter4(p, q, mask & ~flat, thresh, shift)
        # 5-tap [1,2,2,2,1]
        sel = mask & flat
        op1 = (p2 * 3 + p1 * 2 + p0 * 2 + q0 + 4) >> 3
        op0 = (p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + 4) >> 3
        oq0 = (p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + 4) >> 3
        oq1 = (p0 + q0 * 2 + q1 * 2 + q2 * 3 + 4) >> 3
        fp[..., P - 2] = np.where(sel, op1, fp[..., P - 2])
        fp[..., P - 1] = np.where(sel, op0, fp[..., P - 1])
        fq[..., 0] = np.where(sel, oq0, fq[..., 0])
        fq[..., 1] = np.where(sel, oq1, fq[..., 1])
        return fp, fq

    p3, q3 = p[..., P - 4], q[..., 3]
    mask = ((np.abs(p3 - p2) <= limit) & (np.abs(p2 - p1) <= limit)
            & (np.abs(p1 - p0) <= limit) & (np.abs(q1 - q0) <= limit)
            & (np.abs(q2 - q1) <= limit) & (np.abs(q3 - q2) <= limit)
            & (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= blimit))
    fth = 1 << shift
    flat = ((np.abs(p1 - p0) <= fth) & (np.abs(q1 - q0) <= fth)
            & (np.abs(p2 - p0) <= fth) & (np.abs(q2 - q0) <= fth)
            & (np.abs(p3 - p0) <= fth) & (np.abs(q3 - q0) <= fth))

    fp, fq = _filter4(p, q, mask & ~flat, thresh, shift)

    # 7-tap [1,1,1,2,1,1,1]
    sel8 = mask & flat
    op2 = (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3
    op1 = (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3
    op0 = (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3
    oq0 = (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3
    oq1 = (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3
    oq2 = (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3

    if size == 8:
        for idx, v in ((P - 3, op2), (P - 2, op1), (P - 1, op0)):
            fp[..., idx] = np.where(sel8, v, fp[..., idx])
        for idx, v in ((0, oq0), (1, oq1), (2, oq2)):
            fq[..., idx] = np.where(sel8, v, fq[..., idx])
        return fp, fq

    # size 14: flat2 over p6..q6
    p4, p5, p6 = p[..., P - 5], p[..., P - 6], p[..., P - 7]
    q4, q5, q6 = q[..., 4], q[..., 5], q[..., 6]
    flat2 = ((np.abs(p6 - p0) <= fth) & (np.abs(p5 - p0) <= fth)
             & (np.abs(p4 - p0) <= fth) & (np.abs(q4 - q0) <= fth)
             & (np.abs(q5 - q0) <= fth) & (np.abs(q6 - q0) <= fth))
    sel8_only = sel8 & ~flat2
    for idx, v in ((P - 3, op2), (P - 2, op1), (P - 1, op0)):
        fp[..., idx] = np.where(sel8_only, v, fp[..., idx])
    for idx, v in ((0, oq0), (1, oq1), (2, oq2)):
        fq[..., idx] = np.where(sel8_only, v, fq[..., idx])

    sel14 = sel8 & flat2
    vals_p = [
        (P - 6, (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0 + 8) >> 4),
        (P - 5, (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1 + 8) >> 4),
        (P - 4, (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1 + q2 + 8) >> 4),
        (P - 3, (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0 + q1 + q2 + q3 + 8) >> 4),
        (P - 2, (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0 + q1 + q2 + q3 + q4 + 8) >> 4),
        (P - 1, (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + q2 + q3 + q4 + q5 + 8) >> 4),
    ]
    vals_q = [
        (0, (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + q3 + q4 + q5 + q6 + 8) >> 4),
        (1, (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 + q3 + q4 + q5 + q6 * 2 + 8) >> 4),
        (2, (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 + q4 + q5 + q6 * 3 + 8) >> 4),
        (3, (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 + q5 + q6 * 4 + 8) >> 4),
        (4, (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2 + q6 * 5 + 8) >> 4),
        (5, (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7 + 8) >> 4),
    ]
    for idx, v in vals_p:
        fp[..., idx] = np.where(sel14, v, fp[..., idx])
    for idx, v in vals_q:
        fq[..., idx] = np.where(sel14, v, fq[..., idx])
    return fp, fq


def _filter4(p, q, mask, thresh, shift=0):
    """4-tap filter applied where mask; returns modified copies."""
    P = p.shape[-1]
    t80 = 128 << shift
    p0, p1 = p[..., P - 1], p[..., P - 2]
    q0, q1 = q[..., 0], q[..., 1]
    hev = (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)
    ps1, ps0 = p1 - t80, p0 - t80
    qs0, qs1 = q0 - t80, q1 - t80
    f = np.where(hev, _sc(ps1 - qs1, shift), 0)
    f = np.where(mask, _sc(f + 3 * (qs0 - ps0), shift), 0)
    f1 = _sc(f + 4, shift) >> 3
    f2 = _sc(f + 3, shift) >> 3
    oq0 = _sc(qs0 - f1, shift) + t80
    op0 = _sc(ps0 + f2, shift) + t80
    fo = np.where(~hev, (f1 + 1) >> 1, 0)
    oq1 = _sc(qs1 - fo, shift) + t80
    op1 = _sc(ps1 + fo, shift) + t80
    fp = p.copy()
    fq = q.copy()
    fp[..., P - 1] = np.where(mask, op0, p0)
    fp[..., P - 2] = np.where(mask, op1, p1)
    fq[..., 0] = np.where(mask, oq0, q0)
    fq[..., 1] = np.where(mask, oq1, q1)
    return fp, fq


def loop_filter_plane(plane: np.ndarray, tx_w: np.ndarray, tx_h: np.ndarray,
                      skip: np.ndarray, block_edge_x: np.ndarray,
                      block_edge_y: np.ndarray, width: int, height: int,
                      level_v: int, level_h: int, sharpness: int,
                      is_chroma: bool, bd: int = 8) -> np.ndarray:
    """Filter one plane in place (returns the same array).

    tx_w/tx_h/skip/block_edge_*: per-4x4-unit grids in PLANE coordinates
    ([h4, w4]); block_edge_x[y4, x4] true when a prediction-block
    boundary lies at the left edge of that unit (block_edge_y: top edge).
    width/height: the VISIBLE plane size; a 4px unit is filtered only
    when its start coordinate lies inside it (dec_loop_filter_block's
    width <= x || height <= y early-out, EbDecLF.c:115).
    """
    x4max = (width + 3) >> 2
    y4max = (height + 3) >> 2
    shift = bd - 8
    if level_v > 0:
        bl, lim, hev = _thresholds(level_v, sharpness)
        bl, lim, hev = bl << shift, lim << shift, hev << shift
        for x4 in range(1, x4max):
            x = x4 << 2
            left_w = tx_w[:, x4 - 1]
            curr_w = tx_w[:, x4]
            is_tx_edge = (x % np.maximum(curr_w, 1)) == 0
            # unit is a tx-origin column only where x aligns to the
            # current block's tx grid; tx_w grid stores each unit's tx
            # width so alignment is implicit (uniform within a block)
            apply = is_tx_edge & (block_edge_x[:, x4]
                                  | ~(skip[:, x4 - 1] & skip[:, x4]))
            apply = apply[:y4max]
            if not apply.any():
                continue
            fsize = np.minimum(np.minimum(left_w, curr_w)[:y4max], 16)
            fsize = np.where(fsize >= 16, 14 if not is_chroma else 6,
                             np.where(fsize >= 8, 8 if not is_chroma else 6, 4))
            if is_chroma:
                fsize = np.minimum(fsize, 6)
            span = 7
            xl = max(x - span, 0)
            xr = min(x + span, plane.shape[1])
            rows = plane[:y4max * 4, xl:xr]
            for size in (4, 6, 8, 14):
                sel4 = apply & (fsize == size)
                if not sel4.any():
                    continue
                rmask = np.repeat(sel4, 4)
                npx = min(size // 2 if size != 6 else 3, x - xl)
                nqx = min(size // 2 if size != 6 else 3, xr - x)
                if size == 14:
                    npx, nqx = min(7, x - xl), min(7, xr - x)
                elif size == 8:
                    npx, nqx = min(4, x - xl), min(4, xr - x)
                elif size == 6:
                    npx, nqx = min(3, x - xl), min(3, xr - x)
                else:
                    npx, nqx = min(2, x - xl), min(2, xr - x)
                p = plane[:y4max * 4, x - npx:x]
                q = plane[:y4max * 4, x:x + nqx]
                fp, fq = _filter_line(p, q, bl, lim, hev, size, shift)
                sel_rows = rmask
                plane[:y4max * 4, x - npx:x][sel_rows] = fp[sel_rows]
                plane[:y4max * 4, x:x + nqx][sel_rows] = fq[sel_rows]
    if level_h > 0:
        bl, lim, hev = _thresholds(level_h, sharpness)
        bl, lim, hev = bl << shift, lim << shift, hev << shift
        for y4 in range(1, y4max):
            y = y4 << 2
            up_h = tx_h[y4 - 1, :]
            cur_h = tx_h[y4, :]
            is_tx_edge = (y % np.maximum(cur_h, 1)) == 0
            apply = is_tx_edge & (block_edge_y[y4, :]
                                  | ~(skip[y4 - 1, :] & skip[y4, :]))
            apply = apply[:x4max]
            if not apply.any():
                continue
            fsize = np.minimum(np.minimum(up_h, cur_h)[:x4max], 16)
            fsize = np.where(fsize >= 16, 14 if not is_chroma else 6,
                             np.where(fsize >= 8, 8 if not is_chroma else 6, 4))
            if is_chroma:
                fsize = np.minimum(fsize, 6)
            for size in (4, 6, 8, 14):
                sel4 = apply & (fsize == size)
                if not sel4.any():
                    continue
                cmask = np.repeat(sel4, 4)
                if size == 14:
                    npx = min(7, y)
                    nqx = min(7, plane.shape[0] - y)
                elif size == 8:
                    npx, nqx = min(4, y), min(4, plane.shape[0] - y)
                elif size == 6:
                    npx, nqx = min(3, y), min(3, plane.shape[0] - y)
                else:
                    npx, nqx = min(2, y), min(2, plane.shape[0] - y)
                p = plane[y - npx:y, :x4max * 4].T
                q = plane[y:y + nqx, :x4max * 4].T
                fp, fq = _filter_line(p, q, bl, lim, hev, size, shift)
                plane[y - npx:y, :x4max * 4].T[cmask] = fp[cmask]
                plane[y:y + nqx, :x4max * 4].T[cmask] = fq[cmask]
    return plane
