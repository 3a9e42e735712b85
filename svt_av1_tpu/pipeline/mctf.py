"""Motion-compensated temporal filtering (alt-ref / key-frame denoise).

The analog of the reference's MCTF (EbTemporalFiltering.c: planewise
non-local-means weighting svt_av1_apply_temporal_filter_planewise_c:643,
noise estimation estimate_noise:2416, dispatched from Picture Decision
mctf_frame).  Encoder-only: the filtered picture replaces the source of
key / layer-0 pictures before encoding, so no bitstream coupling.

TPU-first formulation: per neighbor frame, motion compensation is a
32x32 block mosaic, and the weight map is computed for the whole frame
at once (blockwise 5x5 box sums + exp), instead of the reference's
per-pixel double loops.
"""
from __future__ import annotations

import numpy as np

from ..ops import me as me_ops

BLK = 32
WINDOW_BALANCE = 5          # TF_WINDOW_BLOCK_BALANCE_WEIGHT
WEIGHT_SCALE = 1000         # TF_PLANEWISE_FILTER_WEIGHT_SCALE
DIST_THRESHOLD = 0.1        # TF_SEARCH_DISTANCE_THRESHOLD
EDGE_THRESHOLD = 50
SQRT_PI_BY_2 = 1.25331413732


def estimate_noise(y: np.ndarray) -> float:
    """Sobel-gated Laplacian noise sigma (estimate_noise:2416)."""
    s = y.astype(np.int64)
    c = s[1:-1, 1:-1]
    nw, n_, ne = s[:-2, :-2], s[:-2, 1:-1], s[:-2, 2:]
    w_, e_ = s[1:-1, :-2], s[1:-1, 2:]
    sw, s_, se = s[2:, :-2], s[2:, 1:-1], s[2:, 2:]
    gx = (nw - ne) + (sw - se) + 2 * (w_ - e_)
    gy = (nw - sw) + (ne - se) + 2 * (n_ - s_)
    mask = (np.abs(gx) + np.abs(gy)) < EDGE_THRESHOLD
    lap = 4 * c - 2 * (w_ + e_ + n_ + s_) + (nw + ne + sw + se)
    num = int(mask.sum())
    if num < 16:
        return -1.0
    return float(np.abs(lap[mask]).sum()) / (6 * num) * SQRT_PI_BY_2


def _block_box5(diff: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Per-block 5x5 window mean of squared diffs, window clipped at
    block borders (matches the CLIP in the reference's window loop)."""
    h, w = diff.shape
    nb_y, nb_x = h // bh, w // bw
    blocks = diff.reshape(nb_y, bh, nb_x, bw).transpose(0, 2, 1, 3)
    pad = np.pad(blocks.astype(np.float64), ((0, 0), (0, 0), (2, 2), (2, 2)),
                 mode="edge")
    acc = np.zeros_like(blocks, np.float64)
    for dy in range(5):
        for dx in range(5):
            acc += pad[:, :, dy:dy + bh, dx:dx + bw]
    acc /= 25.0
    return acc.transpose(0, 2, 1, 3).reshape(h, w)


def _mc_blocks(center_y, neigh_planes, bd):
    """Block ME of the neighbor onto the center; returns (pred planes,
    per-block SSE map, per-block mv magnitude map) with 32x32 luma
    blocks (the reference's tf 32x32 unit)."""
    h, w = center_y.shape
    preds = [np.empty_like(p) for p in neigh_planes]
    nb_y, nb_x = h // BLK, w // BLK
    sse = np.zeros((nb_y, nb_x))
    dist = np.zeros((nb_y, nb_x))
    ny = neigh_planes[0]
    for by in range(nb_y):
        for bx in range(nb_x):
            y0, x0 = by * BLK, bx * BLK
            blk = center_y[y0:y0 + BLK, x0:x0 + BLK].astype(np.uint8)
            dx, dy, _ = me_ops.hme_search(blk, ny.astype(np.uint8),
                                          x0, y0, 16, 16)
            sx = int(np.clip(x0 + dx, 0, w - BLK))
            sy = int(np.clip(y0 + dy, 0, h - BLK))
            pred = ny[sy:sy + BLK, sx:sx + BLK]
            preds[0][y0:y0 + BLK, x0:x0 + BLK] = pred
            d = pred.astype(np.int64) - center_y[y0:y0 + BLK, x0:x0 + BLK]
            sse[by, bx] = float((d * d).sum())
            dist[by, bx] = float(np.hypot((sy - y0) * 8, (sx - x0) * 8))
            for p in (1, 2):
                cp = neigh_planes[p]
                preds[p][y0 >> 1:(y0 + BLK) >> 1, x0 >> 1:(x0 + BLK) >> 1] \
                    = cp[sy >> 1:(sy + BLK) >> 1, sx >> 1:(sx + BLK) >> 1]
    return preds, sse, dist


def temporal_filter(center_planes, neighbor_frames, qp: int,
                    bd: int = 8) -> list:
    """Filter the center picture against its neighbors; returns new
    plane list (same dtypes).  neighbor_frames: list of plane tuples."""
    cy = center_planes[0].astype(np.int32)
    h, w = cy.shape
    if h % BLK or w % BLK:
        # pad to block multiple for the mosaic; crop at the end
        ph = -(-h // BLK) * BLK
        pw = -(-w // BLK) * BLK
        center_planes = [np.pad(p, ((0, (ph - h) >> (1 if i else 0)),
                                    (0, (pw - w) >> (1 if i else 0))),
                                mode="edge")
                         for i, p in enumerate(center_planes)]
        neighbor_frames = [[np.pad(p, ((0, (ph - h) >> (1 if i else 0)),
                                       (0, (pw - w) >> (1 if i else 0))),
                                   mode="edge")
                            for i, p in enumerate(fr)]
                           for fr in neighbor_frames]
        out = temporal_filter(center_planes, neighbor_frames, qp, bd)
        return [o[:h >> (1 if i else 0), :w >> (1 if i else 0)]
                for i, o in enumerate(out)]

    noise = [estimate_noise(center_planes[p]) for p in range(3)]
    noise = [max(n, 0.0) for n in noise]
    decay = 3 if (w * h) <= 854 * 480 else 4
    if qp <= 20:
        decay -= 1
    dist_thr = max(min(w, h) * DIST_THRESHOLD, 1.0)

    accum = [np.zeros(p.shape, np.float64) for p in center_planes]
    count = [np.zeros(p.shape, np.float64) for p in center_planes]

    frames = [center_planes] + list(neighbor_frames)
    for fi, fr in enumerate(frames):
        if fi == 0:
            preds = [p.astype(np.int32) for p in center_planes]
            nb = (h // BLK, w // BLK)
            sse = np.zeros(nb)
            dist = np.zeros(nb)
        else:
            preds, sse, dist = _mc_blocks(cy, [p.astype(np.int32)
                                               for p in fr], bd)
        diff_y = (preds[0].astype(np.int64) - cy) ** 2
        win_y = _block_box5(diff_y, BLK, BLK)
        blk_err = (sse / 1024.0)
        blk_err_map = np.repeat(np.repeat(blk_err, BLK, 0), BLK, 1)
        d_factor = np.maximum(dist / dist_thr, 1.0)
        d_map = np.repeat(np.repeat(d_factor, BLK, 0), BLK, 1)

        combined = (WINDOW_BALANCE * win_y + blk_err_map) / \
            (WINDOW_BALANCE + 1)
        n_decay = decay * (0.7 + np.log1p(noise[0]))
        scaled = np.minimum(combined * d_map / (2 * n_decay * n_decay), 7)
        wmap = np.floor(np.exp(-scaled) * WEIGHT_SCALE)
        accum[0] += wmap * preds[0]
        count[0] += wmap

        # chroma: luma 2x2 cross term + 5x5 chroma window (num = 29)
        luma22 = diff_y.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
        for p in (1, 2):
            diff_c = (preds[p].astype(np.int64)
                      - center_planes[p].astype(np.int64)) ** 2
            win_c = _block_box5(diff_c, BLK // 2, BLK // 2) * 25.0
            win = (win_c + luma22) / 29.0
            blk_c = np.repeat(np.repeat(blk_err, BLK // 2, 0), BLK // 2, 1)
            d_c = np.repeat(np.repeat(d_factor, BLK // 2, 0), BLK // 2, 1)
            comb = (WINDOW_BALANCE * win + blk_c) / (WINDOW_BALANCE + 1)
            nd = decay * (0.7 + np.log1p(noise[p]))
            sc = np.minimum(comb * d_c / (2 * nd * nd), 7)
            wc = np.floor(np.exp(-sc) * WEIGHT_SCALE)
            accum[p] += wc * preds[p]
            count[p] += wc

    out = []
    for p in range(3):
        f = (accum[p] + count[p] / 2) / np.maximum(count[p], 1)
        out.append(np.clip(np.round(f), 0, (1 << bd) - 1)
                   .astype(center_planes[p].dtype))
    return out
