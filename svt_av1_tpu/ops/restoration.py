"""Loop restoration: Wiener filter path (AV1 spec 7.17).

TPU-first formulation: the reference filters 64x64 processing stripes
with line buffers preserving deblocked rows across CDEF
(EbRestoration.c svt_av1_loop_restoration_filter_unit, boundary logic
setup_processing_stripe_boundary:353; convolve core
svt_av1_wiener_convolve_add_src_c, convolve.c).  Because every stripe's
sources are fully determined by (cdef output, deblock output), each
stripe is materialized as one extended tensor and the 7-tap separable
filter runs as stacked shifts — batched, stateless, reproducible on
both encoder and decoder.

Unit geometry follows foreach_rest_unit_in_tile (EbRestoration.c:1366):
unit rows shifted up by RESTORATION_UNIT_OFFSET, last unit absorbs
remainders below 1.5x the unit size.
"""
from __future__ import annotations

import dataclasses

import numpy as np

RESTORATION_UNIT_OFFSET = 8
RESTORATION_PROC_UNIT_SIZE = 64
FILTER_BITS = 7

WIENER_WIN = 7
# coded tap ranges/midpoints (EbRestoration.h:125-153)
WIENER_TAPS_MID = (3, -7, 15)
WIENER_TAPS_MIN = (-5, -23, -17)
WIENER_TAPS_MAX = (10, 8, 46)
WIENER_SUBEXP_K = (1, 2, 3)

RESTORE_NONE, RESTORE_WIENER, RESTORE_SGRPROJ, RESTORE_SWITCHABLE = range(4)


def default_wiener_taps():
    return list(WIENER_TAPS_MID)


def unit_limits(frame_size: int, unit_size: int):
    """[(start, end)] unit spans along one axis, with the vertical-style
    extension handled by the caller (horizontal uses this directly)."""
    out = []
    x0 = 0
    while x0 < frame_size:
        remaining = frame_size - x0
        w = remaining if remaining < unit_size * 3 // 2 else unit_size
        out.append((x0, x0 + w))
        x0 += w
    return out


def unit_limits_vert(frame_size: int, unit_size: int, ss_y: int):
    """Vertical spans are shifted up by the unit offset (stripe align)."""
    voff = RESTORATION_UNIT_OFFSET >> ss_y
    out = []
    for (v0, v1) in unit_limits(frame_size, unit_size):
        a = max(0, v0 - voff)
        b = v1 - voff if v1 < frame_size else v1
        out.append((a, b))
    return out


def count_units(frame_size: int, unit_size: int) -> int:
    return max((frame_size + (unit_size >> 1)) // unit_size, 1)


def _stripe_spans(v_start: int, v_end: int, ss_y: int, frame_top: int = 0):
    """Split a unit's row range into processing stripes (the while loop of
    svt_dec_av1_loop_restoration_filter_unit)."""
    fsh = RESTORATION_PROC_UNIT_SIZE >> ss_y
    voff = RESTORATION_UNIT_OFFSET >> ss_y
    spans = []
    v = v_start
    while v < v_end:
        stripe_idx = (v - frame_top + voff) // fsh
        nominal = fsh - (voff if stripe_idx == 0 else 0)
        h = min(nominal, ((v_end - v) + 1) & ~1)
        spans.append((v, v + h))
        v += h
    return spans


def build_stripe_ext(cdef, deblock, v0: int, v1: int, h0: int, h1: int,
                     fw: int, fh: int) -> np.ndarray:
    """Extended source for one stripe: rows [v0-3, v1+3) x cols
    [h0-3, h1+3), int32.  Vertical reads clamp to the stripe +-2 and use
    the DEBLOCKED frame outside the stripe (spec get_source_sample);
    horizontal/frame edges replicate."""
    rows = []
    for r in range(v0 - 3, v1 + 3):
        y = int(np.clip(r, v0 - 2, v1 + 1))
        y = int(np.clip(y, 0, fh - 1))
        src = cdef if v0 <= y < v1 else deblock
        rows.append(src[y])
    buf = np.stack(rows).astype(np.int32)
    cols = np.clip(np.arange(h0 - 3, h1 + 3), 0, fw - 1)
    return buf[:, cols]


def apply_wiener_unit(cdef, deblock, v0, v1, h0, h1, taps_v, taps_h,
                      ss_y: int, fw: int, fh: int, bd: int = 8):
    """Filter one restoration unit; returns the [v1-v0, h1-h0] block."""
    out = np.empty((v1 - v0, h1 - h0), np.int32)
    for (s0, s1) in _stripe_spans(v0, v1, ss_y):
        ext = build_stripe_ext(cdef, deblock, s0, s1, h0, h1, fw, fh)
        # chroma taps: 5-tap window (outer tap zero)
        out[s0 - v0:s1 - v0] = wiener_stripe_vh(ext, taps_v, taps_h, bd)
    return out


def wiener_stripe_vh(ext: np.ndarray, taps_v, taps_h, bd: int = 8):
    """Like wiener_stripe but with distinct vertical/horizontal taps."""
    fh_ = _full_taps(taps_h)
    fv_ = _full_taps(taps_v)
    r0 = 3 + (2 if bd == 12 else 0)
    r1 = 2 * FILTER_BITS - r0
    h = ext.shape[0] - 6
    w = ext.shape[1] - 6
    acc = np.zeros((h + 6, w), np.int64)
    for k in range(7):
        acc += int(fh_[k]) * ext[:, k:k + w]
    acc += (ext[:, 3:3 + w].astype(np.int64) << FILTER_BITS) \
        + (1 << (bd + FILTER_BITS - 1))
    clamp_hi = (1 << (bd + 1 + FILTER_BITS - r0)) - 1
    im = np.clip((acc + (1 << (r0 - 1))) >> r0, 0, clamp_hi)
    acc2 = np.zeros((h, w), np.int64)
    for k in range(7):
        acc2 += int(fv_[k]) * im[k:k + h]
    acc2 += (im[3:3 + h] << FILTER_BITS) - (1 << (bd + r1 - 1))
    out = (acc2 + (1 << (r1 - 1))) >> r1
    return np.clip(out, 0, (1 << bd) - 1).astype(np.int32)


def _full_taps(t3):
    t0, t1, t2 = t3
    return (t0, t1, t2, -2 * (t0 + t1 + t2), t2, t1, t0)


# --------------------------------------------------------------------------
# Encoder-side Wiener pick (the analog of EbRestorationPick.c
# search_wiener: compute_stats + wiener_decompose_sep_sym)
# --------------------------------------------------------------------------

def pick_wiener_unit(src, cdef, deblock, v0, v1, h0, h1, ss_y, fw, fh,
                     bd: int = 8, is_chroma: bool = False):
    """Least-squares separable Wiener taps for one unit; returns
    (taps_v, taps_h, sse_filtered, sse_none) with quantized integer taps
    (None taps if degenerate)."""
    # design matrix from shifted views of the same stripe-extended
    # sources the decoder will see
    win = 7
    half = 3
    cols = []
    tgt = []
    center = []
    for (s0, s1) in _stripe_spans(v0, v1, ss_y):
        ext = build_stripe_ext(cdef, deblock, s0, s1, h0, h1, fw, fh)
        hh = s1 - s0
        ww = h1 - h0
        stack = np.empty((win * win, hh * ww), np.float64)
        idx = 0
        for dy in range(win):
            for dx in range(win):
                stack[idx] = ext[dy:dy + hh, dx:dx + ww].reshape(-1)
                idx += 1
        cols.append(stack)
        tgt.append(src[s0:s1, h0:h1].reshape(-1).astype(np.float64))
        center.append(ext[half:half + hh, half:half + ww].reshape(-1)
                      .astype(np.float64))
    D = np.concatenate(cols, axis=1)          # [49, npx]
    s = np.concatenate(tgt)
    c = np.concatenate(center)
    sse_none = float(((c - s) ** 2).sum())

    # normal equations for the 49-tap filter, then separable ALS
    H = D @ D.T
    M = D @ s
    # symmetric + normalized parametrization: taps (q0,q1,q2) give the
    # 7-tap filter e3 + sum_k q_k (e_k + e_{6-k} - 2 e_3)
    B = np.zeros((win, 3))
    for k in range(3):
        B[k, k] = 1
        B[6 - k, k] = 1
        B[3, k] = -2
    e3 = np.zeros(win)
    e3[3] = 1.0

    def taps_to_full(q):
        return e3 + B @ q

    q_a = np.array([WIENER_TAPS_MID[k] / 128.0 for k in range(3)])
    q_b = q_a.copy()

    Ht = H.reshape(win, win, win, win)

    def solve_dir(fixed_full, vertical):
        if vertical:
            A = np.einsum("j,l,ijkl->ik", fixed_full, fixed_full, Ht)
            rhs = np.einsum("j,ij->i", fixed_full, M.reshape(win, win))
        else:
            A = np.einsum("i,k,ijkl->jl", fixed_full, fixed_full, Ht)
            rhs = np.einsum("i,ij->j", fixed_full, M.reshape(win, win))
        Ar = B.T @ A @ B
        rr = B.T @ (rhs - A @ e3)
        try:
            return np.linalg.lstsq(Ar + 1e-2 * np.eye(3), rr, rcond=None)[0]
        except np.linalg.LinAlgError:
            return None

    for _ in range(2):
        nq = solve_dir(taps_to_full(q_b), vertical=True)
        if nq is not None:
            q_a = nq
        nq = solve_dir(taps_to_full(q_a), vertical=False)
        if nq is not None:
            q_b = nq

    def quantize(q):
        taps = []
        for k in range(3):
            lo, hi = WIENER_TAPS_MIN[k], WIENER_TAPS_MAX[k]
            if is_chroma and k == 0:
                taps.append(0)
                continue
            v = int(np.clip(round(q[k] * 128), lo, hi))
            taps.append(v)
        return taps

    tv, th = quantize(q_a), quantize(q_b)
    filt = apply_wiener_unit(cdef, deblock, v0, v1, h0, h1, tv, th,
                             ss_y, fw, fh, bd)
    sse_f = float(((filt.astype(np.float64)
                    - src[v0:v1, h0:h1]) ** 2).sum())
    return tv, th, sse_f, sse_none
