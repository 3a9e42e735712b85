"""Temporal-dependency model (TPL) -> CRF-style per-frame qindex.

The reference propagates per-16x16 dependency statistics backward over
the lookahead (tpl_mc_flow, EbRateControlProcess.c:1119: open-loop
intra/inter costs per block, mc_dep flow through the MV field, r0/beta
-> qindex scaling in cqp_qindex_calc_tpl_la:5589).

TPU-native shape: per consecutive display pair, one small jitted device
program computes the 16x16 SAD/MV field (ops/bme.py) and per-block
spatial (intra-proxy) cost; the backward propagation runs on the host
over the tiny [nr16, nc16] grids; the output is a per-frame qindex
offset replacing the static per-layer ladder.
"""
from __future__ import annotations

import functools

import numpy as np

from ..ops import bme

# qindex steps removed per doubling of the dependency multiplier beta
# (applied ON TOP of the per-layer ladder, so leaves stay unboosted)
QSTEP_PER_OCTAVE = 4.0
MAX_BOOST = 16          # cap (reference: kf/arf boost limits)


def _block16_stats(src, ref, xp=np):
    """(sad16, mv_r, mv_c, var16) over the 16x16 grid of one frame pair
    (open-loop, source-referenced like the reference's TPL ME)."""
    me = bme.frame_me(src.astype(xp.int32), ref.astype(xp.int32), xp)
    mv_r, mv_c, sad = me[(16, 16)]
    n_sby, n_sbx = me["grid"]
    blocks = src.astype(xp.int32).reshape(
        src.shape[0] // 16, 16, src.shape[1] // 16, 16).transpose(0, 2, 1, 3)
    mean = blocks.mean(axis=(-1, -2), keepdims=True)
    var = ((blocks - mean) ** 2).sum(axis=(-1, -2))
    # match the per-SB nested layout of the ME maps: [N_sb, 4, 4]
    var = var.reshape(n_sby, 4, n_sbx, 4).transpose(0, 2, 1, 3)         .reshape(-1, 4, 4)
    return sad, mv_r, mv_c, var, (n_sby, n_sbx)


@functools.lru_cache(maxsize=8)
def _jitted_stats(buf_w: int, buf_h: int, bd: int):
    import jax
    import jax.numpy as jnp

    def run(src, ref):
        sad, mv_r, mv_c, var, _ = _block16_stats(
            src.astype(jnp.int32), ref.astype(jnp.int32), jnp)
        return jnp.concatenate([
            sad.astype(jnp.float32).ravel(),
            mv_r.astype(jnp.float32).ravel(),
            mv_c.astype(jnp.float32).ravel(), var.astype(jnp.float32)
            .ravel()])

    return jax.jit(run)


def _expand(a, grid):
    n_sby, n_sbx = grid
    a = np.asarray(a)
    n, oy, ox = a.shape
    return a.reshape(n_sby, n_sbx, oy, ox).transpose(0, 2, 1, 3) \
        .reshape(n_sby * oy, n_sbx * ox)


def _pair_stats(src, ref, buf_w, buf_h, bd, use_jax):
    if use_jax:
        try:
            fn = _jitted_stats(buf_w, buf_h, bd)
            dt = np.uint8 if bd == 8 else np.uint16
            if not hasattr(src, "devices"):
                src = src.astype(dt)
            if not hasattr(ref, "devices"):
                ref = ref.astype(dt)
            flat = np.asarray(fn(src, ref))
            n_sby, n_sbx = buf_h // bme.SB, buf_w // bme.SB
            n16 = (buf_h // 16) * (buf_w // 16)
            grid = (n_sby, n_sbx)
            parts = [flat[i * n16:(i + 1) * n16]
                     .reshape(n_sby * n_sbx, 4, 4) for i in range(4)]
            return tuple(_expand(p, grid) for p in parts)
        except ImportError:
            pass
    sad, mv_r, mv_c, var, grid = _block16_stats(src, ref, np)
    return tuple(_expand(np.asarray(v), grid)
                 for v in (sad, mv_r, mv_c, var))


def _scatter_dep(tgt, prop, mv_r, mv_c):
    """Bilinear area-weighted deposit of ``prop`` onto the 16x16 grid of
    the reference frame through the MV field (mc_flow_dispenser's grid
    scatter)."""
    nr, nc = prop.shape
    ys = (np.arange(nr)[:, None] * 16 + mv_r).astype(np.float64)
    xs = (np.arange(nc)[None, :] * 16 + mv_c).astype(np.float64)
    y0 = np.floor(ys / 16).astype(int)
    x0 = np.floor(xs / 16).astype(int)
    fy = ys / 16 - y0
    fx = xs / 16 - x0
    for dy in (0, 1):
        wy = np.where(dy == 0, 1 - fy, fy)
        yy = np.clip(y0 + dy, 0, nr - 1)
        for dx in (0, 1):
            wx = np.where(dx == 0, 1 - fx, fx)
            xx = np.clip(x0 + dx, 0, nc - 1)
            np.add.at(tgt, (yy, xx), prop * wy * wx)


def tpl_gop_flow(frames_y, displays, buf_w: int, buf_h: int,
                 bd: int = 8, use_jax: bool = True,
                 include_first: bool = False) -> dict:
    """Per-display TPL r0 for one mini-GOP window.

    frames_y: luma planes in DISPLAY order; displays: the display index
    of each entry.  Each adjacent pair is measured in BOTH directions
    (forward: i predicted from i-1; backward: i predicted from i+1) and
    every frame deposits its propagated dependency through whichever
    neighbour predicts it better per block.  Chained over the window,
    forward flow credits past anchors (key frames / previous base) and
    backward flow credits the mini-GOP's own base-layer frame — the two
    anchors the dyadic pyramid actually references.

    Returns {display: r0} with r0 = intra_cost / (intra_cost + mc_dep)
    in (0, 1]; small r0 = heavily depended-on frame (generate_r0beta,
    EbSourceBasedOperationsProcess.c).  ``include_first`` also reports
    the first entry (a key frame leading its own group); otherwise the
    seed is context only.
    """
    n = len(frames_y)
    min_h = bme.SB + 2 * (bme.REFINE_R + bme.MARGIN)
    if n < 2 or buf_h < min_h:
        return {}

    # half-resolution stats when the frame is large enough: TPL ranks
    # frames by aggregate dependency, which survives 2x decimation,
    # for 4x less ME work (the reference's tpl dispenser likewise runs
    # on decimated pictures at fast lad levels)
    ds = 2 if (buf_h // 2 >= min_h and buf_h % (2 * bme.SB) == 0
               and buf_w % (2 * bme.SB) == 0) else 1
    buf_w //= ds
    buf_h //= ds

    def bufal(p):
        p = np.asarray(p)
        if ds == 2:
            h2, w2 = (p.shape[0] // 2) * 2, (p.shape[1] // 2) * 2
            p32 = p[:h2, :w2].astype(np.int32)
            p = (p32.reshape(h2 // 2, 2, w2 // 2, 2).sum((1, 3)) + 2) >> 2
        a = np.zeros((buf_h, buf_w), np.int32)
        h0, w0 = min(p.shape[0], buf_h), min(p.shape[1], buf_w)
        a[:h0, :w0] = p[:h0, :w0]
        a[:h0, w0:] = a[:h0, w0 - 1:w0]
        a[h0:, :] = a[h0 - 1:h0, :]
        return a

    planes = [bufal(np.asarray(f)) for f in frames_y]
    if use_jax:
        try:
            import jax
            # each frame serves as src AND ref of adjacent pairs: one
            # upload per frame for the whole window, not one per call
            dt = np.uint8 if bd == 8 else np.uint16
            planes = [jax.device_put(p.astype(dt)) for p in planes]
        except ImportError:
            pass
    intra = [None] * n       # per-frame intra-cost proxy (variance)
    fwd = [None] * n         # i predicted from i-1
    bwd = [None] * n         # i predicted from i+1
    for i in range(n):
        if i > 0:
            sad, mv_r, mv_c, var = _pair_stats(planes[i], planes[i - 1],
                                               buf_w, buf_h, bd, use_jax)
            intra[i] = var.astype(np.float64) + 1.0
            fwd[i] = ((sad.astype(np.float64) ** 2) / 256.0 + 1.0,
                      mv_r, mv_c)
        if i < n - 1:
            sad, mv_r, mv_c, var = _pair_stats(planes[i], planes[i + 1],
                                               buf_w, buf_h, bd, use_jax)
            if intra[i] is None:
                intra[i] = var.astype(np.float64) + 1.0
            bwd[i] = ((sad.astype(np.float64) ** 2) / 256.0 + 1.0,
                      mv_r, mv_c)

    nr, nc = intra[1].shape
    mc_dep = [np.zeros((nr, nc)) for _ in range(n)]
    # two chained sweeps, mirroring the decode-order property that
    # anchors are coded before the frames that reference them:
    # 1) right-to-left: dependency mass flows toward EARLIER frames
    #    through the blocks where forward prediction wins;
    # 2) left-to-right: mass flows toward LATER frames (the mini-GOP
    #    base) where backward prediction wins.
    for i in range(n - 1, 0, -1):
        ic = intra[i]
        f_cost = np.minimum(fwd[i][0], ic)
        b_cost = np.minimum(bwd[i][0], ic) if bwd[i] is not None else None
        use_f = np.ones_like(ic, bool) if b_cost is None \
            else f_cost <= b_cost
        ratio = np.clip((ic - f_cost) / ic, 0, 1) * use_f
        _scatter_dep(mc_dep[i - 1], (ic + mc_dep[i]) * ratio,
                     fwd[i][1], fwd[i][2])
    for i in range(0, n - 1):
        if bwd[i] is None:
            continue
        ic = intra[i]
        b_cost = np.minimum(bwd[i][0], ic)
        f_cost = np.minimum(fwd[i][0], ic) if fwd[i] is not None else None
        use_b = np.ones_like(ic, bool) if f_cost is None \
            else b_cost < f_cost
        ratio = np.clip((ic - b_cost) / ic, 0, 1) * use_b
        _scatter_dep(mc_dep[i + 1], (ic + mc_dep[i]) * ratio,
                     bwd[i][1], bwd[i][2])

    out = {}
    for i, d in enumerate(displays):
        if i == 0 and not include_first:
            continue                      # the seed frame is context only
        intra_sum = float(intra[i].sum())
        out[d] = intra_sum / (intra_sum + float(mc_dep[i].sum()))
    return out


def tpl_gop_offsets(frames_y, displays, buf_w: int, buf_h: int,
                    bd: int = 8, use_jax: bool = True) -> dict:
    """Legacy qindex-offset form of :func:`tpl_gop_flow` (offset =
    -QSTEP_PER_OCTAVE * log2(1/r0), capped)."""
    r0s = tpl_gop_flow(frames_y, displays, buf_w, buf_h, bd, use_jax)
    out = {}
    for d, r0 in r0s.items():
        boost = min(QSTEP_PER_OCTAVE * np.log2(1.0 / max(r0, 1e-9)),
                    MAX_BOOST)
        out[d] = -int(round(boost))
    return out
