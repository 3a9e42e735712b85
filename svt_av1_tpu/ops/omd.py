"""Open-loop batched mode decision kernels (the TPU mode-decision path).

The reference decides modes on *non-conformant* predictions to decouple
the search from the serial reconstruction (Docs/svt-av1-encoder-design.md
:732-734, :1147; PD_PASS_0 in EbEncDecProcess.c:4534).  This module is
that idea in TPU-native form: for a whole frame at once, per block size,
gather prediction edges from the SOURCE picture, evaluate every intra
mode batched over the `[n_rows, n_cols]` block grid — prediction,
forward transform, quantization, inverse transform, distortion, rate
proxy — and emit per-block best-mode/cost maps.  One jitted device
program replaces the reference's per-block candidate loop
(EbProductCodingLoop.c md_encode_block:7274).

The conformant coding pass then replays these decisions; conformance
never depends on how decisions were made.

All math is int32 and runs under numpy (tests/reference) or jax.numpy
(jit/TPU) via the ``xp`` parameter, like the rest of ops/.
"""
from __future__ import annotations

import functools

import numpy as np

from ..constants import PredictionMode, TxSize, TxType, TX_WIDTH, TX_HEIGHT
from . import intra as intra_ops
from . import quant as qz
from . import transforms as tf

# pad applied around the source plane before edge gathering; covers the
# deepest top-right/bottom-left reach (w + h for 32x32) plus the -1 edge
PAD = 72

ALL_MODES = tuple(PredictionMode(m) for m in range(13))

# candidate block shapes (w, h); squares first, then the rectangular
# HORZ/VERT halves the partition DP composes
SQUARE_SHAPES = ((8, 8), (16, 16), (32, 32))
RECT_SHAPES = ((16, 8), (8, 16), (32, 16), (16, 32))
ALL_SHAPES = SQUARE_SHAPES + RECT_SHAPES
# 64-px shapes the INTER partition DP additionally composes (coherent
# motion codes as one block: one mode/ref/MV/skip for the whole area);
# their TX is the 64-point family whose coded band clamps to 32x32
BIG_SHAPES = ((64, 64), (64, 32), (32, 64))
INTER_SHAPES = ALL_SHAPES + BIG_SHAPES

# coefficient-rate proxy weights (bits ~ A*nnz + B*sum(log2(1+|q|)) + C)
# calibrated against the native trial packer (tools/calibrate_omd.py)
RATE_NNZ = 2.724
RATE_MAG = 1.061
RATE_TXB = 36.242


def txsize_for(w: int, h: int) -> TxSize:
    for ts in TxSize:
        if TX_WIDTH[ts] == w and TX_HEIGHT[ts] == h:
            return ts
    raise ValueError((w, h))


def pad_plane(plane, xp=np):
    """Edge-replicated pad by PAD on every side, int32."""
    return xp.pad(plane.astype(xp.int32), PAD, mode="edge")


# --------------------------------------------------------------------------
# Edge gathering: per (w, h) grid, above/left vectors with the top-left
# sample at index 0 and edge samples from index 1 (ops/intra.py layout)
# --------------------------------------------------------------------------

def grid_edges(padded, w: int, h: int, buf_w: int, buf_h: int, xp=np):
    """Edges for every (w, h) block tiling the [buf_h, buf_w] plane.

    Returns (above, left): int32 [nr, nc, w + h + 1] with [..., 0] the
    top-left neighbor and [..., 1:] the above row / left column extended
    to the top-right / bottom-left reach (w + h samples).

    Built from strided slices only (one per edge sample) — no gathers,
    which XLA lowers far better on TPU.
    """
    nr, nc = buf_h // h, buf_w // w
    L = w + h + 1
    P = padded if xp is np else xp.asarray(padded)
    rows = P[PAD - 1: PAD - 1 + nr * h: h, :]       # block top-1 rows
    above = xp.stack(
        [rows[:, PAD - 1 + k: PAD - 1 + k + nc * w: w] for k in range(L)],
        axis=-1)
    cols = P[:, PAD - 1: PAD - 1 + nc * w: w]       # block left-1 cols
    left = xp.stack(
        [cols[PAD - 1 + k: PAD - 1 + k + nr * h: h, :] for k in range(L)],
        axis=-1)
    return above, left


def grid_blocks(padded, w: int, h: int, buf_w: int, buf_h: int, xp=np):
    """Source pixels per block: int32 [nr, nc, h, w]."""
    nr, nc = buf_h // h, buf_w // w
    inner = padded[PAD:PAD + buf_h, PAD:PAD + buf_w]
    blocks = inner.reshape(nr, h, nc, w).transpose(0, 2, 1, 3)
    return xp.asarray(blocks) if xp is not np else blocks


# --------------------------------------------------------------------------
# Batched predictors over [..., L] edge vectors
# --------------------------------------------------------------------------

def _bcast(v, h, w, xp):
    """[...,] -> [..., h, w]."""
    return xp.broadcast_to(v[..., None, None], v.shape + (h, w))


def predict_mode(mode: PredictionMode, above, left, w: int, h: int, xp=np):
    """Batched prediction [..., h, w] for one mode (angle delta 0,
    open-loop edges: no intra edge filter / upsample — PD0-grade)."""
    a = above[..., 1:]                      # edge samples
    l = left[..., 1:]
    if mode == PredictionMode.DC_PRED:
        s = a[..., :w].sum(-1) + l[..., :h].sum(-1)
        dc = (s + ((w + h) >> 1)) // (w + h)
        return _bcast(dc, h, w, xp).astype(xp.int32)
    if mode == PredictionMode.V_PRED:
        return xp.broadcast_to(a[..., None, :w],
                               a.shape[:-1] + (h, w)).astype(xp.int32)
    if mode == PredictionMode.H_PRED:
        return xp.broadcast_to(l[..., :h, None],
                               l.shape[:-1] + (h, w)).astype(xp.int32)
    if mode == PredictionMode.PAETH_PRED:
        av = a[..., None, :w]
        lv = l[..., :h, None]
        tl = above[..., 0][..., None, None]
        base = av + lv - tl
        pa = xp.abs(base - av)
        pl = xp.abs(base - lv)
        ptl = xp.abs(base - tl)
        z = xp.zeros(base.shape, xp.int32)
        return xp.where((pa <= pl) & (pa <= ptl), av + z,
                        xp.where(pl <= ptl, lv + z, tl + z)).astype(xp.int32)
    if mode in (PredictionMode.SMOOTH_PRED, PredictionMode.SMOOTH_V_PRED,
                PredictionMode.SMOOTH_H_PRED):
        sw = intra_ops._sm_weights()
        av = a[..., None, :w]
        lv = l[..., :h, None]
        below = l[..., h - 1][..., None, None]
        right = a[..., w - 1][..., None, None]
        wh = xp.asarray(sw[h:h + h].reshape(h, 1))
        ww = xp.asarray(sw[w:w + w].reshape(1, w))
        if mode == PredictionMode.SMOOTH_PRED:
            p = av * wh + below * (256 - wh) + lv * ww + right * (256 - ww)
            return ((p + 256) >> 9).astype(xp.int32)
        if mode == PredictionMode.SMOOTH_V_PRED:
            return ((av * wh + below * (256 - wh) + 128) >> 8).astype(xp.int32)
        return ((lv * ww + right * (256 - ww) + 128) >> 8).astype(xp.int32)
    # directional, upsample 0 (decision path): the 2-tap interpolation
    # along the angle is a constant linear map of the edge vectors, so
    # it runs as two dense matmuls (MXU) — exact, since every partial
    # value stays far below 2^24 (float32-exact integers)
    wa, wl = _dir_matrices(mode, w, h)
    acc = 0.0
    if wa is not None:
        acc = above.astype(xp.float32) @ xp.asarray(wa)
    if wl is not None:
        acc = acc + left.astype(xp.float32) @ xp.asarray(wl)
    pred = xp.floor((acc + 16.0) * (1.0 / 32.0))
    return pred.reshape(above.shape[:-1] + (h, w)).astype(xp.int32)


@functools.cache
def _dir_matrices(mode: PredictionMode, w: int, h: int):
    """Constant weight matrices (above, left): [w+h+1, h*w] float32 with
    index 0 = the corner sample, such that
    pred = floor((above @ Wa + left @ Wl + 16) / 32)
    reproduces dr_predictor_z1/z2/z3 with upsample 0 bit-exactly."""
    angle = intra_ops.MODE_TO_ANGLE[mode]
    L = w + h + 1
    r = np.arange(h).reshape(h, 1)
    c = np.arange(w).reshape(1, w)
    max_base = w + h - 1
    wa = np.zeros((L, h * w), np.float32)
    wl = np.zeros((L, h * w), np.float32)
    pos = (r * w + c)                       # flat output position
    if angle < 90:
        dx = intra_ops.get_dx(angle)
        x = np.broadcast_to((r + 1) * dx, (h, w))
        base = (x >> 6) + c
        shift = (x & 0x3F) >> 1
        for i in range(h):
            for j in range(w):
                p = int(pos[i, j])
                if base[i, j] >= max_base:
                    wa[1 + max_base, p] += 32
                else:
                    wa[1 + base[i, j], p] += 32 - shift[i, j]
                    wa[1 + min(base[i, j] + 1, max_base), p] += shift[i, j]
        return wa, None
    if angle > 180:
        dy = intra_ops.get_dy(angle)
        y = np.broadcast_to((c + 1) * dy, (h, w))
        base = (y >> 6) + r
        shift = (y & 0x3F) >> 1
        for i in range(h):
            for j in range(w):
                p = int(pos[i, j])
                if base[i, j] >= max_base:
                    wl[1 + max_base, p] += 32
                else:
                    wl[1 + base[i, j], p] += 32 - shift[i, j]
                    wl[1 + min(base[i, j] + 1, max_base), p] += shift[i, j]
        return None, wl
    dx, dy = intra_ops.get_dx(angle), intra_ops.get_dy(angle)
    x = np.broadcast_to(-(r + 1) * dx, (h, w))
    base1 = (x >> 6) + c
    shift1 = (x & 0x3F) >> 1
    y = np.broadcast_to((r << 6) - (c + 1) * dy, (h, w))
    base2 = y >> 6
    shift2 = (y & 0x3F) >> 1
    for i in range(h):
        for j in range(w):
            p = int(pos[i, j])
            if base1[i, j] >= -1:
                b = int(np.clip(base1[i, j], -1, max_base))
                wa[b + 1, p] += 32 - shift1[i, j]
                wa[b + 2, p] += shift1[i, j]
            else:
                b = int(np.clip(base2[i, j], -1, max_base))
                wl[b + 1, p] += 32 - shift2[i, j]
                wl[b + 2, p] += shift2[i, j]
    return wa, wl


# --------------------------------------------------------------------------
# Cost pass — float DCT on the MXU + a float model of quantize_b
#
# Decisions do not need the bit-exact integer networks (the conformant
# coding pass recomputes everything exactly); an orthonormal DCT runs as
# two dense matmuls per mode (MXU shapes) and Parseval turns the
# transform-domain quantization error directly into pixel SSE, so no
# inverse transform is needed at all.
# --------------------------------------------------------------------------

@functools.cache
def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix [n, n] (rows = frequencies)."""
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m.astype(np.float32)


@functools.cache
def _tx_gain(w: int, h: int) -> float:
    """Gain of the integer AV1 forward DCT vs the orthonormal one
    (maps the quantizer tables into the unit-DCT domain).  For 64-dim
    sizes the integer TX zeroes coefficients beyond the top-left 32x32
    band, so the gain is measured over the coded band only."""
    rng = np.random.default_rng(12345)
    r = rng.integers(-255, 256, (8, h, w)).astype(np.int32)
    ci = np.asarray(tf.fwd_txfm2d(r, TxType.DCT_DCT, txsize_for(w, h),
                                  8, np))
    cu = _dct_mat(h).astype(np.float64) @ r.astype(np.float64) \
        @ _dct_mat(w).astype(np.float64).T
    lh, lw = min(h, 32), min(w, 32)
    return float(np.sqrt((ci[:, :lh, :lw].astype(np.float64) ** 2).sum()
                         / (cu[:, :lh, :lw] ** 2).sum()))


def _quant_maps(w: int, h: int, qindex, pq: qz.PlaneQuant, xp=np):
    """(zbin, round, step) per-position float maps in the unit-DCT
    domain, modeling quantize_b (EbFullLoop.c:37 zbin deadzone).
    ``qindex`` may be a traced scalar (tiny table gathers)."""
    ts = txsize_for(w, h)
    ls = qz.tx_log_scale(ts)
    g = np.float32(_tx_gain(w, h) * (1 << ls))
    dc_mask = np.zeros((h, w), bool)
    dc_mask[0, 0] = True
    dm = xp.asarray(dc_mask)

    def posmap(table):
        vec = xp.asarray(table.astype(np.float32))[qindex]   # [2]
        return xp.where(dm, vec[0], vec[1]) / g

    return (posmap(pq.zbin), posmap(pq.round), posmap(pq.dequant))


def shape_costs(src_blocks, above, left, w: int, h: int, qindex: int,
                pq: qz.PlaneQuant, lam: float, mode_bits, bd: int = 8,
                xp=np):
    """Best intra mode per block of one (w, h) grid.

    Returns (best_mode [nr, nc] int32, best_cost [nr, nc] float32):
    cost = pixel-domain SSE of the modeled quantized recon (Parseval)
    + lam * (coeff-rate proxy + mode signaling bits).
    """
    zbin, rnd, step = _quant_maps(w, h, qindex, pq, xp)
    mb = mode_bits if not isinstance(mode_bits, (tuple, list)) \
        else xp.asarray(np.asarray(mode_bits, np.float32))
    dh = xp.asarray(_dct_mat(h))
    dwt = xp.asarray(_dct_mat(w).T)
    best_cost = None
    best_mode = None
    for mi, mode in enumerate(ALL_MODES):
        pred = predict_mode(mode, above, left, w, h, xp)
        resid = (src_blocks - pred).astype(xp.float32)
        cf = dh @ resid @ dwt                  # [..., h, w] on the MXU
        ac = xp.abs(cf)
        q = xp.floor((ac + rnd) / step)
        q = xp.where(ac >= zbin, xp.maximum(q, 0.0), 0.0)
        err = ac - q * step
        sse = (err * err).sum(axis=(-1, -2))
        nnz = (q > 0).sum(axis=(-1, -2)).astype(xp.float32)
        mag = xp.log2(1.0 + q).sum(axis=(-1, -2))
        bits = RATE_NNZ * nnz + RATE_MAG * mag \
            + RATE_TXB * (nnz > 0).astype(xp.float32) + mb[mi]
        cost = sse + lam * bits
        if best_cost is None:
            best_cost, best_mode = cost, xp.zeros(cost.shape, xp.int32)
        else:
            take = cost < best_cost
            best_cost = xp.where(take, cost, best_cost)
            best_mode = xp.where(take, xp.int32(mi), best_mode)
    return best_mode, best_cost


def intra_decision_arrays(padded, buf_w: int, buf_h: int, qindex: int,
                          lam: float, mode_bits, bd: int = 8, xp=np,
                          shapes=ALL_SHAPES):
    """All shape grids for one padded plane -> {(w, h): (mode, cost)}."""
    pq = qz.build_quantizer(bd)[0]
    out = {}
    for (w, h) in shapes:
        above, left = grid_edges(np.asarray(padded) if xp is np else padded,
                                 w, h, buf_w, buf_h, xp)
        src = grid_blocks(np.asarray(padded) if xp is np else padded,
                          w, h, buf_w, buf_h, xp)
        out[(w, h)] = shape_costs(src, above, left, w, h, qindex, pq,
                                  lam, mode_bits, bd, xp)
    return out


# --------------------------------------------------------------------------
# jit entry (one compiled program per (buf shape, qindex, bd))
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _jitted(buf_w: int, buf_h: int, bd: int, shapes: tuple):
    import jax
    import jax.numpy as jnp

    def run(plane, qindex, lam, mode_bits):
        # pad on device: the host->device link ships the narrow dtype
        padded = pad_plane(plane, jnp)
        res = intra_decision_arrays(padded, buf_w, buf_h, qindex, lam,
                                    mode_bits, bd, jnp, shapes)
        # one flat output array: a single device->host transfer (the
        # tunneled TPU pays tens of ms per transfer, not per byte)
        parts = []
        for s in shapes:
            m, c = res[s]
            parts.append(m.astype(jnp.float32).ravel())
            parts.append(c.astype(jnp.float32).ravel())
        return jnp.concatenate(parts)

    return jax.jit(run)


def _unflatten(flat: np.ndarray, buf_w: int, buf_h: int, shapes):
    out = {}
    off = 0
    for (w, h) in shapes:
        nr, nc = buf_h // h, buf_w // w
        n = nr * nc
        m = flat[off:off + n].reshape(nr, nc).astype(np.int32)
        c = flat[off + n:off + 2 * n].reshape(nr, nc).astype(np.float32)
        out[(w, h)] = (m, c)
        off += 2 * n
    return out


def intra_decision_frame(source_plane, buf_w: int, buf_h: int, qindex: int,
                         lam: float, mode_bits, bd: int = 8,
                         use_jax: bool = True, shapes=ALL_SHAPES):
    """Full-frame open-loop intra decision: returns
    {(w, h): (mode [nr, nc] np.int32, cost [nr, nc] np.float32)}.

    ``use_jax`` runs the whole pass as one jitted device program; the
    numpy path is the bit-identical host reference.
    """
    if hasattr(source_plane, "devices"):
        # device-resident u8/u16 plane (uploaded once per frame by the
        # caller); must already be buf-aligned
        assert source_plane.shape == (buf_h, buf_w)
        narrow = source_plane
    else:
        src = np.asarray(source_plane)
        # buf-align the plane on host (cheap); ship the narrowest dtype
        if src.shape != (buf_h, buf_w):
            a = np.empty((buf_h, buf_w), src.dtype)
            h0, w0 = src.shape
            a[:h0, :w0] = src
            a[:h0, w0:] = src[:, w0 - 1:w0]
            a[h0:, :] = a[h0 - 1:h0, :]
            src = a
        narrow = src.astype(np.uint8 if bd == 8 else np.uint16)
    if use_jax:
        try:
            fn = _jitted(buf_w, buf_h, bd, tuple(shapes))
            flat = np.asarray(fn(narrow, np.int32(qindex), float(lam),
                                 np.asarray(mode_bits, np.float32)))
            return _unflatten(flat, buf_w, buf_h, shapes)
        except ImportError:
            pass
    res = intra_decision_arrays(pad_plane(narrow), buf_w, buf_h, qindex,
                                lam, mode_bits, bd, np, shapes)
    return {s: (np.asarray(m), np.asarray(c)) for s, (m, c) in res.items()}
