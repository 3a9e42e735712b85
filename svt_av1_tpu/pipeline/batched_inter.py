"""Frame-batched inter mode decision: device ME + open-loop RD maps.

Extends the batched intra decider to inter frames: one device pass runs
full-frame motion estimation against up to three distinct references
(ops/bme.py — coarse /8 search + 8x8 SAD pyramid refinement + exact-tap
quarter-pel, the reference's HME/integer_search_sb/subpel shape),
scores every 16x16 unit per reference plus an averaged-compound
candidate (best forward + best backward, the jnt_comp AVG pair the
reference builds in inter_comp candidates, EbModeDecision.c), picks the
winner per unit, assembles the winning prediction plane, and scores
every block shape on the residual through the same DCT/quantizer cost
model as the intra pass.  The partition DP then picks per-block
intra-vs-inter and the partition tree.

Motion granularity is 16x16: larger inter blocks are allowed when their
children's selections (reference, MV, compound pair) agree — the common
coherent-motion case — and smaller blocks inherit the parent unit's
choice, so every coded block's residual model matches what it codes.

The serial conformant pass replays the plan; NEAREST/NEAR/GLOBAL/NEW
(and NEAREST_NEAREST/NEW_NEW for compound) selection happens there
against the true tile-bounded MV stacks.
"""
from __future__ import annotations

import functools

import numpy as np

from ..constants import FrameType, PredictionMode
from ..ops import bme, omd
from ..ops import quant as qz
from . import mv_pred as mp
from .batched_md import BatchedIntraDecider, default_mode_bits
from .frame_codec import BlockDecision

INTER_MODE_BITS = 3.0        # is_inter + mode ladder proxy
# intra blocks inside inter frames pay is_inter + the full y/uv mode
# syntax (y_mode_cdf by size group, EbEntropyCoding.c write_modes_b);
# without this the near-zero-residual ties break toward intra
INTRA_IN_INTER_BITS = 6.0
MV_BIT_SCALE = 2.0

# reference/compound selection runs at two levels so the penalties
# model what the syntax actually charges: ref signaling and the second
# MV are paid once per CODED block, so a whole superblock switching
# together is much cheaper per unit than a lone 16x16 deviating (which
# also fragments the partition merge).  SB-level penalties are per
# 16-unit-summed SAD (16 units/SB); DEV_PEN is the extra charge for a
# unit deviating from its SB's winner.  The values below are the
# qindex-160 operating point; the live penalties scale with the
# SAD-domain lambda (rdo.sad_lambda, av1_get_sad_per_bit semantics) so
# the rate charge tracks the quantizer across the BD-rate ladder.
REF_PEN_SB = 768.0           # non-primary single ref, per SB
COMP_PEN_SB = 640.0          # averaged compound (2 MVs + comp syntax)
DEV_PEN = 320.0              # per-unit deviation from the SB winner
SEL_MV_W = 16.0              # weight of the mv-bits proxy in selection
PEN_TUNE_QINDEX = 160        # the qindex the constants were tuned at


def selection_pens(qindex: int, bd: int = 8) -> np.ndarray:
    """[ref_pen_sb, comp_pen_sb, dev_pen, sel_mv_w] scaled to the
    frame's quantizer (traced DATA under jit — no recompiles)."""
    from .rdo import sad_lambda

    s = sad_lambda(int(qindex), bd) / sad_lambda(PEN_TUNE_QINDEX, bd)
    return np.asarray([REF_PEN_SB * s, COMP_PEN_SB * s, DEV_PEN * s,
                       SEL_MV_W * s], np.float32)


def _mc_cost_maps(resid_padded, buf_w, buf_h, qindex, lam, bd, xp,
                  shapes=omd.INTER_SHAPES):
    """Per-shape RD cost of coding the (motion-compensated) residual:
    same unit-DCT/quantizer model as the intra pass, pred = MC.  64-dim
    shapes model TX_64-family semantics: coefficients beyond the
    top-left 32x32 band are zeroed (their energy counts as distortion,
    they cost no rate)."""
    out = {}
    for (w, h) in shapes:
        blocks = omd.grid_blocks(resid_padded, w, h, buf_w, buf_h, xp)
        zbin, rnd, step = omd._quant_maps(w, h, qindex,
                                          qz.build_quantizer(bd)[0], xp)
        dh = xp.asarray(omd._dct_mat(h))
        dwt = xp.asarray(omd._dct_mat(w).T)
        cf = dh @ blocks.astype(xp.float32) @ dwt
        ac = xp.abs(cf)
        q = xp.floor((ac + rnd) / step)
        q = xp.where(ac >= zbin, xp.maximum(q, 0.0), 0.0)
        if w > 32 or h > 32:
            band = np.zeros((h, w), np.float32)
            band[:32, :32] = 1.0
            q = q * xp.asarray(band)
        err = ac - q * step
        sse = (err * err).sum(axis=(-1, -2))
        nnz = (q > 0).sum(axis=(-1, -2)).astype(xp.float32)
        mag = xp.log2(1.0 + q).sum(axis=(-1, -2))
        bits = omd.RATE_NNZ * nnz + omd.RATE_MAG * mag \
            + omd.RATE_TXB * (nnz > 0).astype(xp.float32) + INTER_MODE_BITS
        out[(w, h)] = sse + lam * bits
    return out


def _nested_to_grid(a, n_sby, n_sbx, oy, ox, xp):
    """[N, oy, ox] per-SB nested -> frame grid [n_sby*oy, n_sbx*ox]."""
    return a.reshape(n_sby, n_sbx, oy, ox).transpose(0, 2, 1, 3) \
        .reshape(n_sby * oy, n_sbx * ox)


def _take16(stack, idx, xp):
    """stack [K, nr16, nc16, ...]; idx [nr16, nc16] -> [nr16, nc16, ...]."""
    ix = idx.reshape((1,) + idx.shape + (1,) * (stack.ndim - 3))
    return xp.take_along_axis(stack, ix, axis=0)[0]


MC_PAD = 80                   # edge pad for the per-unit MC gather
JOINT_R = 3                   # full-pel joint-refine reach per arm


def _joint_arm(refp, s16, fixed_pred, arm_k, seed_r, seed_c, pos_y,
               pos_x, xp):
    """Joint compound refinement of one arm: with the other direction's
    prediction FIXED, search this arm at full-pel offsets within
    +-JOINT_R of the seed MV, minimizing the COMPOUND (averaged) SAD —
    av1_compound_single_motion_search's shape.  Independent per-arm
    minima break the compound error-cancellation whenever the two
    layers of a scene move differently; this restores it.

    refp: [K, H+2*MC_PAD, W+2*MC_PAD]; s16/fixed_pred:
    [nr16, nc16, 16, 16]; seeds in 1/8-pel.  Returns (comp_pred,
    mv_r, mv_c, sad) with the chosen arm MV in 1/8-pel units."""
    nr16, nc16 = seed_r.shape
    n16 = nr16 * nc16
    B = JOINT_R
    win = 16 + 2 * B
    ipy = pos_y + (seed_r.reshape(-1) >> 3)
    ipx = pos_x + (seed_c.reshape(-1) >> 3)
    oy = xp.clip(ipy - B + MC_PAD, 0, refp.shape[1] - win)
    ox = xp.clip(ipx - B + MC_PAD, 0, refp.shape[2] - win)
    ar = xp.asarray(np.arange(win))
    rows = oy[:, None, None] + ar[None, :, None]
    cols = ox[:, None, None] + ar[None, None, :]
    patch = refp[arm_k.reshape(-1)[:, None, None], rows, cols] \
        .astype(xp.int32)
    fx = fixed_pred.reshape(n16, 16, 16).astype(xp.int32)
    sblk = s16.reshape(n16, 16, 16).astype(xp.int32)
    best_sad = best_dy = best_dx = None
    for dy in range(2 * B + 1):
        for dx in range(2 * B + 1):
            pb = patch[:, dy:dy + 16, dx:dx + 16]
            comp = (fx + pb + 1) >> 1
            sad = xp.abs(sblk - comp).sum((-1, -2)).astype(xp.int32)
            if best_sad is None:
                best_sad = sad
                best_dy = xp.full(sad.shape, dy, xp.int32)
                best_dx = xp.full(sad.shape, dx, xp.int32)
            else:
                take = sad < best_sad
                best_sad = xp.where(take, sad, best_sad)
                best_dy = xp.where(take, dy, best_dy)
                best_dx = xp.where(take, dx, best_dx)
    # the clip on oy/ox means the realized MV comes from the window
    # origin, not the seed
    mv_r = ((oy - MC_PAD + best_dy) - pos_y) * 8
    mv_c = ((ox - MC_PAD + best_dx) - pos_x) * 8
    ar16 = xp.asarray(np.arange(16))
    prows = best_dy[:, None, None] + ar16[None, :, None]   # [n16,16,1]
    pcols = best_dx[:, None, None] + ar16[None, None, :]   # [n16,1,16]
    pb = patch[xp.asarray(np.arange(n16))[:, None, None], prows, pcols]
    comp = ((fx + pb + 1) >> 1).reshape(nr16, nc16, 16, 16)
    return (comp, mv_r.reshape(nr16, nc16), mv_c.reshape(nr16, nc16),
            best_sad.reshape(nr16, nc16))


def inter_frame_maps(src_plane, ref_planes, buf_w, buf_h, qindex, lam,
                     mode_bits, bd=8, xp=np, row0=0, with_intra=True,
                     bwd_mask=(False,), allow_compound=False,
                     rel_dists=None, coarse_r=None, pens=None):
    """(intra_maps, inter_cost_maps, sel_fields, mvbits16): the full
    open-loop decision state for one inter frame against up to three
    references.  MVs are quarter-pel (1/8-unit values, multiples of 2):
    full-pel frame ME (ops/bme.frame_me) + exact-filter subpel
    refinement (bme.subpel_refine16), independently per reference.

    ``ref_planes``: one [H, W] plane or a [K, H, W] stack;
    ``bwd_mask[k]`` marks backward references (display order after the
    current frame).  With ``allow_compound`` and at least one reference
    in each direction, an averaged compound candidate (best-forward +
    best-backward per unit) joins the per-unit selection.

    ``sel_fields`` is a dict of [nr16, nc16] maps:
      sel     winning candidate (0..K-1 single ref, K = compound)
      mv_r/mv_c      chosen MV (forward MV for compound), 1/8-pel
      mv1_r/mv1_c    backward MV for compound units (0 elsewhere)
      fwd_i/bwd_i    global ref indices the compound pairs

    Spatial sharding: with ``row0`` > 0, ``src_plane`` is a stripe at
    global row ``row0`` while references stay full frames (replicated
    across shards); outputs are bit-identical to the same rows of the
    unsharded run.  The intra maps need their own halo machinery, so
    sharded callers pass ``with_intra=False``."""
    src = xp.asarray(src_plane).astype(xp.int32)
    refs = xp.asarray(ref_planes)
    if refs.ndim == 2:
        refs = refs[None]
    K = int(refs.shape[0])
    if pens is None:
        pens = np.asarray([REF_PEN_SB, COMP_PEN_SB, DEV_PEN, SEL_MV_W],
                          np.float32)
    pens = xp.asarray(pens).astype(xp.float32)
    if rel_dists is None:
        rel_dists = np.asarray([1 if b else -1 for b in bwd_mask[:K]],
                               np.int32)
    # rel_dists is DATA (a traced array under jit), never part of the
    # compiled program: random-access GOPs vary distances per frame and
    # a static distance would recompile the 1080p program every frame
    rel_dists = xp.asarray(rel_dists).astype(xp.int32)
    if coarse_r is None:
        coarse_r = bme.COARSE_R
    if not isinstance(coarse_r, (tuple, list)):
        coarse_r = (coarse_r,) * K
    stripe_h = src.shape[0]
    nr16, nc16 = stripe_h // 16, buf_w // 16

    mv_r_all, mv_c_all, pred_all, mvb_all = [], [], [], []
    for k in range(K):
        ref = refs[k].astype(xp.int32)
        # far references need proportionally wider coarse search: at
        # distance d, content moving v px/frame sits v*d away.  The
        # window is PER-REF (a near LAST pays a small search while a
        # far GOLDEN pays the wide one) and static per compiled
        # program; distances themselves stay traced data.
        me = bme.frame_me(src, ref, xp, row0, coarse_r=coarse_r[k])
        n_sby, n_sbx = me["grid"]
        mv16_dy, mv16_dx, _ = me[(16, 16)]       # [N, 4, 4] pixel MVs
        mv_r16 = _nested_to_grid(mv16_dy, n_sby, n_sbx, 4, 4, xp)
        mv_c16 = _nested_to_grid(mv16_dx, n_sby, n_sbx, 4, 4, xp)
        mvq8_r, mvq8_c, pred = bme.subpel_refine16(
            src, ref, mv_r16, mv_c16, buf_w, buf_h, bd, xp, row0)
        # mv signaling proxy: distance from this ref's SB-level coarse
        # predictor
        sb_r, sb_c, _ = me[(64, 64)]             # [N, 1, 1]
        sb_r16 = xp.repeat(xp.repeat(sb_r.reshape(n_sby, n_sbx), 4, 0),
                           4, 1)
        sb_c16 = xp.repeat(xp.repeat(sb_c.reshape(n_sby, n_sbx), 4, 0),
                           4, 1)
        d_r = xp.abs(mvq8_r - sb_r16 * 8).astype(xp.float32)
        d_c = xp.abs(mvq8_c - sb_c16 * 8).astype(xp.float32)
        mvb = MV_BIT_SCALE * (xp.log2(1.0 + d_r / 8.0)
                              + xp.log2(1.0 + d_c / 8.0))
        mv_r_all.append(mvq8_r)
        mv_c_all.append(mvq8_c)
        pred_all.append(pred)
        mvb_all.append(mvb)

    mv_r_all = xp.stack(mv_r_all)                # [K, nr16, nc16]
    mv_c_all = xp.stack(mv_c_all)
    mvb_all = xp.stack(mvb_all)                  # [K, nr16, nc16] f32
    preds = xp.stack(pred_all)                   # [K, stripe_h, buf_w]

    s16 = src.reshape(nr16, 16, nc16, 16).transpose(0, 2, 1, 3)
    p16 = preds.reshape(K, nr16, 16, nc16, 16).transpose(0, 1, 3, 2, 4)
    sad = xp.abs(s16[None] - p16).sum((-1, -2)).astype(xp.float32)
    base = sad + pens[3] * mvb_all                    # [K, nr16, nc16]

    fwd_list = [k for k in range(K) if not bwd_mask[k]]
    bwd_list = [k for k in range(K) if bwd_mask[k]]
    do_comp = bool(allow_compound and fwd_list and bwd_list)
    zero_i = xp.zeros((nr16, nc16), xp.int32)
    comp_mv = None
    if do_comp:
        f_gl = xp.asarray(np.asarray(fwd_list, np.int32))
        b_gl = xp.asarray(np.asarray(bwd_list, np.int32))
        fi = f_gl[xp.argmin(base[xp.asarray(fwd_list)], axis=0)
                  if len(fwd_list) > 1 else zero_i]
        bi = b_gl[xp.argmin(base[xp.asarray(bwd_list)], axis=0)
                  if len(bwd_list) > 1 else zero_i]
        pf = _take16(p16, fi, xp)
        pb = _take16(p16, bi, xp)
        mvf_r = _take16(mv_r_all, fi, xp)
        mvf_c = _take16(mv_c_all, fi, xp)
        mvb_r = _take16(mv_r_all, bi, xp)
        mvb_c_ = _take16(mv_c_all, bi, xp)
        # JOINT compound refinement: when a scene's layers move
        # differently, the independently-best fwd/bwd MVs usually align
        # DIFFERENT layers and their average cancels nothing.  With one
        # arm fixed, re-searching the other around the MIRRORED MV
        # (-mv * d_other/d_this) by COMPOUND SAD restores the
        # error-cancelling pair (both arms on the same layer, errors
        # antisymmetric) — av1_compound_single_motion_search's job in
        # the reference's jnt candidates.
        df = xp.maximum(xp.abs(rel_dists[fi]), 1)
        db = xp.maximum(xp.abs(rel_dists[bi]), 1)

        def _mirror(mvq8, d_from, d_to):
            # floor-div is identical under numpy and jax (device/host
            # bit-equality); the +-JOINT_R search absorbs rounding
            q = mvq8 >> 1
            m = -((q * d_to * 2 + d_from) // (2 * d_from)) * 2
            return xp.clip(m, -512, 512).astype(xp.int32)

        refp_all = xp.pad(refs.astype(xp.int32),
                          ((0, 0), (MC_PAD, MC_PAD), (MC_PAD, MC_PAD)),
                          mode="edge")
        gy, gx = np.meshgrid(np.arange(nr16) * 16, np.arange(nc16) * 16,
                             indexing="ij")
        pos_y = xp.asarray(gy.ravel()) + row0
        pos_x = xp.asarray(gx.ravel())
        cb, cb_mvr, cb_mvc, sad_b = _joint_arm(
            refp_all, s16, pf, bi, _mirror(mvf_r, df, db),
            _mirror(mvf_c, df, db), pos_y, pos_x, xp)
        cf, cf_mvr, cf_mvc, sad_f = _joint_arm(
            refp_all, s16, pb, fi, _mirror(mvb_r, db, df),
            _mirror(mvb_c_, db, df), pos_y, pos_x, xp)
        p0 = (pf + pb + 1) >> 1
        pairs = (
            (p0, mvf_r, mvf_c, mvb_r, mvb_c_),
            (cb, mvf_r, mvf_c, cb_mvr, cb_mvc),
            (cf, cf_mvr, cf_mvc, mvb_r, mvb_c_),
        )
        sads = xp.stack(
            [xp.abs(s16 - p0).sum((-1, -2)).astype(xp.float32),
             sad_b.astype(xp.float32), sad_f.astype(xp.float32)])
        pick = xp.argmin(sads, axis=0)                  # [nr16, nc16]
        sad_c = xp.min(sads, axis=0)
        comp16 = _take16(xp.stack([p[0] for p in pairs]), pick, xp)
        comp_mv = tuple(
            _take16(xp.stack([p[i] for p in pairs]), pick, xp)
            for i in range(1, 5))                       # fr, fc, br, bc
        mvb_c = _take16(mvb_all, fi, xp) + _take16(mvb_all, bi, xp)
        base = xp.concatenate(
            [base, (sad_c + pens[3] * mvb_c)[None]], axis=0)
        cand16 = xp.concatenate([p16, comp16[None]], axis=0)
    else:
        fi = bi = zero_i
        cand16 = p16

    # SB-level winner (sum of unit scores over each 4x4-unit SB), then
    # per-unit selection with a deviation charge away from it
    nc = base.shape[0]                                # K or K+1
    nsy, nsx = nr16 // 4, nc16 // 4
    sb_base = base[:, :nsy * 4, :nsx * 4] \
        .reshape(nc, nsy, 4, nsx, 4).sum((2, 4))
    pen_sel = np.zeros(nc, np.float32)
    pen_sel[1:K] = 1.0
    comp_sel = np.zeros(nc, np.float32)
    if do_comp:
        comp_sel[K] = 1.0
    sb_pen = xp.asarray(pen_sel) * pens[0] + xp.asarray(comp_sel) * pens[1]
    sb_sel = xp.argmin(sb_base + sb_pen[:, None, None],
                       axis=0).astype(xp.int32)       # [nsy, nsx]
    sb_sel16 = xp.repeat(xp.repeat(sb_sel, 4, 0), 4, 1)
    if sb_sel16.shape != (nr16, nc16):                # non-/4 stripes
        sb_sel16 = xp.pad(sb_sel16,
                          ((0, nr16 - sb_sel16.shape[0]),
                           (0, nc16 - sb_sel16.shape[1])), mode="edge")
    ks = xp.arange(nc, dtype=xp.int32)[:, None, None]
    score = base + pens[2] * (ks != sb_sel16[None]).astype(xp.float32)

    sel = xp.argmin(score, axis=0).astype(xp.int32)   # [nr16, nc16]
    pred_fin = _take16(cand16, sel, xp)               # [nr16,nc16,16,16]
    pred_plane = pred_fin.transpose(0, 2, 1, 3).reshape(stripe_h, buf_w)

    is_comp = sel == K if do_comp else xp.zeros_like(sel, dtype=bool)
    kk = xp.where(is_comp, fi, xp.minimum(sel, K - 1))
    mv_r = _take16(mv_r_all, kk, xp)
    mv_c = _take16(mv_c_all, kk, xp)
    if comp_mv is not None:
        mv_r = xp.where(is_comp, comp_mv[0], mv_r)
        mv_c = xp.where(is_comp, comp_mv[1], mv_c)
        mv1_r = xp.where(is_comp, comp_mv[2], 0)
        mv1_c = xp.where(is_comp, comp_mv[3], 0)
    else:
        mv1_r = xp.zeros_like(mv_r)
        mv1_c = xp.zeros_like(mv_c)
    mvbits16 = xp.where(is_comp,
                        _take16(mvb_all, fi, xp) + _take16(mvb_all, bi, xp),
                        _take16(mvb_all, kk, xp))

    resid = src - pred_plane
    resid_padded = xp.pad(resid, omd.PAD, mode="edge")
    inter_cost = _mc_cost_maps(resid_padded, buf_w, stripe_h, qindex, lam,
                               bd, xp)

    sel_fields = dict(sel=sel, mv_r=mv_r, mv_c=mv_c,
                      mv1_r=mv1_r, mv1_c=mv1_c, fwd_i=fi, bwd_i=bi)
    intra = None
    if with_intra:
        padded_src = omd.pad_plane(src, xp)
        intra = omd.intra_decision_arrays(padded_src, buf_w, buf_h,
                                          qindex, lam, mode_bits, bd, xp)
    return intra, inter_cost, sel_fields, mvbits16


_SEL_KEYS = ("sel", "mv_r", "mv_c", "mv1_r", "mv1_c", "fwd_i", "bwd_i")


@functools.lru_cache(maxsize=16)
def _jitted_inter(buf_w: int, buf_h: int, bd: int, n_refs: int,
                  bwd_mask: tuple, allow_compound: bool,
                  coarse_r=bme.COARSE_R):
    import jax
    import jax.numpy as jnp

    def run(src_u8, qindex, lam, mode_bits, rel_dists, pens, *refs_u8):
        # refs arrive as SEPARATE arguments so callers can pass
        # device-resident planes (uploaded once per coded picture at
        # DPB refresh, not once per referencing frame)
        refs32 = jnp.stack([r.astype(jnp.int32) for r in refs_u8])
        intra, inter_cost, sf, mvb = inter_frame_maps(
            src_u8.astype(jnp.int32), refs32,
            buf_w, buf_h, qindex, lam, mode_bits, bd, jnp,
            bwd_mask=bwd_mask, allow_compound=allow_compound,
            rel_dists=rel_dists, coarse_r=coarse_r, pens=pens)
        parts = []
        for s in omd.ALL_SHAPES:
            m, c = intra[s]
            parts.append(m.astype(jnp.float32).ravel())
            parts.append(c.ravel())
        for s in omd.INTER_SHAPES:
            parts.append(inter_cost[s].ravel())
        parts += [sf[k].astype(jnp.float32).ravel() for k in _SEL_KEYS]
        parts.append(mvb.ravel())
        return jnp.concatenate(parts)

    return jax.jit(run)


def inter_maps_dispatch(src, refs, buf_w, buf_h, qindex, lam, mode_bits,
                        bd, use_jax, bwd_mask=None, allow_compound=False,
                        rel_dists=None):
    """Run inter_frame_maps as ONE jitted device program (or the numpy
    reference), returning numpy results.

    ``refs``: a [K, H, W] array OR a list of K planes; list entries may
    be device-resident jax arrays (the DPB uploads each coded picture's
    ME plane once; passing the same array again costs no transfer)."""
    if isinstance(refs, (list, tuple)):
        ref_list = list(refs)
    else:
        refs = np.asarray(refs)
        if refs.ndim == 2:
            refs = refs[None]
        ref_list = list(refs)
    if bwd_mask is None:
        bwd_mask = (False,) * len(ref_list)
    bwd_mask = tuple(bool(b) for b in bwd_mask)
    if rel_dists is None:
        rel_dists = tuple(1 if b else -1 for b in bwd_mask[:len(ref_list)])
    rel_arr = np.asarray([int(d) for d in rel_dists], np.int32)
    coarse_r = tuple(bme.coarse_r_for_dist(int(d)) for d in rel_arr)
    if use_jax:
        try:
            fn = _jitted_inter(buf_w, buf_h, bd, len(ref_list), bwd_mask,
                               bool(allow_compound), coarse_r)
            dt = np.uint8 if bd == 8 else np.uint16
            flat = np.asarray(fn(np.asarray(src).astype(dt, copy=False)
                                 if not hasattr(src, "devices") else src,
                                 np.int32(qindex), float(lam),
                                 np.asarray(mode_bits, np.float32),
                                 rel_arr, selection_pens(qindex, bd),
                                 *ref_list))
            intra, inter_cost = {}, {}
            off = 0
            for s in omd.ALL_SHAPES:
                w, h = s
                nr, nc = buf_h // h, buf_w // w
                n = nr * nc
                m = flat[off:off + n].reshape(nr, nc).astype(np.int32)
                c = flat[off + n:off + 2 * n].reshape(nr, nc)
                intra[s] = (m, c)
                off += 2 * n
            for s in omd.INTER_SHAPES:
                w, h = s
                nr, nc = buf_h // h, buf_w // w
                inter_cost[s] = flat[off:off + nr * nc].reshape(nr, nc)
                off += nr * nc
            nr16, nc16 = buf_h // 16, buf_w // 16
            n = nr16 * nc16
            sf = {}
            for k in _SEL_KEYS:
                sf[k] = flat[off:off + n].reshape(nr16, nc16) \
                    .astype(np.int32)
                off += n
            mvb = flat[off:off + n].reshape(nr16, nc16)
            return intra, inter_cost, sf, mvb
        except ImportError:
            pass
    return inter_frame_maps(np.asarray(src),
                            np.stack([np.asarray(r) for r in ref_list]),
                            buf_w, buf_h, qindex, lam,
                            mode_bits, bd, np, bwd_mask=bwd_mask,
                            allow_compound=allow_compound,
                            rel_dists=rel_arr, coarse_r=coarse_r,
                            pens=selection_pens(qindex, bd))


class BatchedDecider(BatchedIntraDecider):
    """Key frames: batched intra plan; inter frames: batched intra+ME
    plan with per-block intra/inter choice over multiple references and
    averaged compound."""

    def __init__(self, use_jax=None):
        super().__init__(use_jax)
        self._inter = None          # {(w,h): is_inter bool map}
        self._sf = None             # per-16 selection field maps
        self._names = None          # global ref index -> named ref
        # buf-aligned narrow ME planes per padded-ref identity: a recon
        # is referenced by several later frames, so the pad-slice +
        # dtype-narrow copy is paid once per coded picture, not per use
        # (the cached entry keeps the planes list alive so ids are safe)
        self._me_plane_cache = {}

    def plan_superblock(self, codec, mi_row, mi_col):
        if codec.fh.frame_type == FrameType.KEY_FRAME:
            self._inter = None
            return super().plan_superblock(codec, mi_row, mi_col)
        if self._planned_for is codec:
            return
        self._planned_for = codec
        if codec.refs is None or codec.buf_h < bme.SB + 2 * (
                bme.REFINE_R + bme.MARGIN):
            self._plan = None
            self._modes = None
            self._inter = None
            return
        self._plan_inter(codec)

    def _ref_plane(self, codec, name, device=False):
        """Buf-aligned narrow ME plane for a named ref; with ``device``
        a jax array uploaded ONCE per coded picture (later frames that
        reference the same picture reuse the device-resident copy — no
        per-frame host->device transfer)."""
        from .frame_codec import REF_PAD

        dt = np.uint8 if codec.seq.bit_depth == 8 else np.uint16
        planes = codec.refs[name]
        key = (id(planes), codec.buf_h, codec.buf_w)
        hit = self._me_plane_cache.get(key)
        if hit is not None and hit[0] is planes:
            if not device:
                return hit[1]
            if hit[2] is not None:
                return hit[2]
            try:
                import jax
                dev = jax.device_put(hit[1])
                self._me_plane_cache[key] = (planes, hit[1], dev)
                return dev
            except ImportError:
                return hit[1]
        ref_planes = planes[0]
        ref_y = np.asarray(ref_planes)[REF_PAD:REF_PAD + codec.buf_h,
                                       REF_PAD:REF_PAD + codec.buf_w]
        if ref_y.shape != (codec.buf_h, codec.buf_w):
            # 128px superblock buffers can outrun the REF_PAD margin:
            # edge-extend to the buf-aligned dims
            full = np.empty((codec.buf_h, codec.buf_w), ref_y.dtype)
            h0, w0 = ref_y.shape
            full[:h0, :w0] = ref_y
            full[:h0, w0:] = ref_y[:, w0 - 1:w0]
            full[h0:, :] = full[h0 - 1:h0, :]
            ref_y = full
        ref_y = np.ascontiguousarray(ref_y).astype(dt)
        dev = None
        if device:
            try:
                import jax
                dev = jax.device_put(ref_y)
            except ImportError:
                pass
        if len(self._me_plane_cache) > 12:
            self._me_plane_cache.pop(next(iter(self._me_plane_cache)))
        self._me_plane_cache[key] = (planes, ref_y, dev)
        return dev if dev is not None else ref_y

    def _plan_params(self, codec):
        """(names, bwd_mask, allow_comp, rel): the plan's static shape
        — shared by the in-line path and the cross-frame prefetch."""
        names = codec.search_refs()[:3]
        # pad to a FIXED ref count: one compiled device program per
        # geometry instead of one per {1,2,3}-ref frame (a duplicated
        # ref never wins selection — argmin ties break to the original)
        while self.use_jax and 0 < len(names) < 3:
            names = names + [names[0]]
        # the "backward" side of a compound pair follows the NAMED ref
        # class (BWDREF..ALTREF), not display order: bidirectional
        # compound syntax codes ref1 with the comp_bwdref tree
        # (_code_comp_ref_frames), so the pair must split by name class
        bwd_mask = tuple(n >= 5 for n in names)
        allow_comp = bool(codec.fh.reference_select
                          and getattr(codec, "compound_level", 1) > 0
                          and any(bwd_mask) and not all(bwd_mask))
        ref_dists = getattr(codec, "ref_dists", None)
        rel = tuple(
            (ref_dists.get(n, 1 if n >= 5 else -1) if ref_dists
             else (1 if n >= 5 else -1)) for n in names)
        return names, bwd_mask, allow_comp, rel

    # cross-frame prefetch state: {display: (key, future)} where key =
    # (qindex, names, rel, allow_comp) must match at retrieval
    _prefetch_inter: dict | None = None

    def prefetch_inter(self, display: int, src_plane, me_refs: dict,
                       names: list, rel: tuple, ref_displays: tuple,
                       qindex: int, reference_select: bool,
                       compound_level: int,
                       buf_w: int, buf_h: int, bd: int):
        """Submit the NEXT frame's device plan while the host codes the
        current one (open-loop: ME runs on reference SOURCES, so the
        plan has no dependency on the in-flight reconstruction — the
        reference's source-based ME process, EbMotionEstimationProcess).
        The caller predicts ``names``/``rel``; _plan_inter verifies the
        prediction and falls back to the in-line path on mismatch."""
        from ..entropy.tables import FrameCdfs
        from .batched_md import _PrefetchWorker
        from .rdo import rd_lambda

        if BatchedDecider._executor is None:
            BatchedDecider._executor = _PrefetchWorker()
        if self._prefetch_inter is None:
            self._prefetch_inter = {}
        while self.use_jax and 0 < len(names) < 3:
            names = names + [names[0]]
            rel = rel + (rel[0],)
            ref_displays = ref_displays + (ref_displays[0],)
        bwd_mask = tuple(n >= 5 for n in names)
        allow_comp = bool(reference_select and compound_level > 0
                          and any(bwd_mask) and not all(bwd_mask))
        key = (qindex, tuple(names), tuple(rel), tuple(ref_displays),
               allow_comp)
        if display in self._prefetch_inter \
                and self._prefetch_inter[display][0] == key:
            return
        lam = rd_lambda(qindex, bd)
        mode_bits = default_mode_bits(FrameCdfs(qindex))
        refs = [me_refs[n] for n in names]
        fut = BatchedDecider._executor.submit(
            inter_maps_dispatch, src_plane, refs, buf_w, buf_h,
            qindex, lam, mode_bits, bd, self.use_jax, bwd_mask,
            allow_comp, rel)
        self._prefetch_inter[display] = (key, fut)

    def _take_prefetched_inter(self, codec, key):
        if not self._prefetch_inter:
            return None
        got = self._prefetch_inter.pop(codec.fh.order_hint, None)
        if got is None:
            return None
        if got[0] != key:
            from ..profiling import LOG
            LOG.debug("prefetch_inter mismatch d=%d want=%s got=%s",
                      codec.fh.order_hint, key, got[0])
            got[1].cancel()
            return None
        return got[1].result()

    def _plan_inter(self, codec):
        from .rdo import rd_lambda

        lam = rd_lambda(codec.fh.base_q_idx, codec.seq.bit_depth)
        names, bwd_mask, allow_comp, rel = self._plan_params(codec)
        self._names = names
        if self.use_jax:
            try:
                import jax
                dt = np.uint8 if codec.seq.bit_depth == 8 else np.uint16
                # one upload per frame, shared with the DLF/CDEF chain
                codec.dev_source = tuple(
                    jax.device_put(np.ascontiguousarray(p).astype(
                        dt, copy=False)) for p in codec.source)
            except ImportError:
                pass
        me_refs = getattr(codec, "me_refs", None)
        ref_disp = getattr(codec, "me_ref_displays", None)
        key = (codec.fh.base_q_idx, tuple(names), tuple(rel),
               tuple(ref_disp[n] for n in names) if ref_disp else (),
               allow_comp)
        got = self._take_prefetched_inter(codec, key) \
            if me_refs is not None else None
        if got is not None:
            intra, inter_cost, sf, mvbits16 = got
            # the prefetch planned with qindex-default mode bits; keep
            # the in-line path identical (determinism regardless of
            # prefetch timing)
            mode_bits = None
        else:
            from ..entropy.tables import FrameCdfs
            mode_bits = default_mode_bits(FrameCdfs(codec.fh.base_q_idx)) \
                if me_refs is not None else default_mode_bits(codec.fc)
            if me_refs is not None:
                # open-loop: ME against reference SOURCES (the coded
                # pictures' pre-recon planes), decoupling the device
                # plan from the reconstruction chain
                refs = [me_refs[n] for n in names]
            else:
                refs = [self._ref_plane(codec, n, device=self.use_jax)
                        for n in names]
            src = codec.dev_source[0] \
                if getattr(codec, "dev_source", None) is not None \
                else codec.source[0]
            intra, inter_cost, sf, mvbits16 = inter_maps_dispatch(
                src, refs, codec.buf_w, codec.buf_h,
                codec.fh.base_q_idx, lam, mode_bits,
                codec.seq.bit_depth,
                self.use_jax, bwd_mask, allow_comp, rel)
        sf = {k: np.asarray(v) for k, v in sf.items()}
        self._sf = sf
        mvb = np.asarray(mvbits16)

        # frame-level interpolation-filter decision before any replay
        # MC runs (read_interpolation_filter syntax; the reference
        # searches per-block, EbEncInterPrediction.c
        # interpolation_filter_search — frame-level captures the
        # content-global part of that gain)
        codec.fh.interpolation_filter = self._select_interp_filter(
            codec, sf, names)

        # per-shape combined cost + choice (vectorized over the grids):
        # a shape is inter-eligible when every 16x16 unit it covers made
        # the SAME choice (ref/compound pair + MVs -> one coded block);
        # sub-16 shapes inherit the parent unit's choice
        self._modes = {s: np.asarray(m) for s, (m, _) in intra.items()}
        self._inter = {}
        cost = {}
        unif_keys = ("sel", "fwd_i", "bwd_i", "mv_r", "mv_c",
                     "mv1_r", "mv1_c")
        for (w, h) in omd.INTER_SHAPES:
            nc = np.asarray(inter_cost[(w, h)])
            if (w, h) in intra:
                ic = np.asarray(intra[(w, h)][1]) \
                    + lam * INTRA_IN_INTER_BITS
            else:
                # 64-px shapes are inter-only: intra stays <= 32 (the
                # key-frame tool set); the DP splits where inter is
                # ineligible
                ic = np.full(nc.shape, np.inf, np.float32)
            nr, ncol = ic.shape
            fy, fx = max(h // 16, 1), max(w // 16, 1)
            pr = np.arange(nr) * h // 16
            pc = np.arange(ncol) * w // 16
            ok = np.ones(ic.shape, bool)
            for key in unif_keys:
                m = sf[key]
                base = m[np.ix_(pr, pc)]
                for dy in range(fy):
                    for dx in range(fx):
                        ok &= m[np.ix_(pr + dy, pc + dx)] == base
            mvcost = mvb[np.ix_(pr, pc)]
            total_inter = np.where(ok, nc + lam * mvcost, np.inf)
            use_inter = total_inter < ic
            self._inter[(w, h)] = use_inter
            cost[(w, h)] = np.where(use_inter, total_inter, ic)
        self._build_plan(codec, cost, lam)

    def _select_interp_filter(self, codec, sf, names):
        """3-way frame-level filter pick: sampled SAD of the planned
        fractional-MV units under REGULAR/SMOOTH/SHARP taps.  REGULAR
        wins ties (the ME/cost maps were modeled with it)."""
        sel, mvr, mvc = sf["sel"], sf["mv_r"], sf["mv_c"]
        frac = ((mvr % 8) != 0) | ((mvc % 8) != 0)
        # units that stay fully inside the visible frame
        nr, nc = mvr.shape
        vr = (np.arange(nr) + 1) * 16 <= codec.fh.frame_height
        vc = (np.arange(nc) + 1) * 16 <= codec.fh.frame_width
        frac &= vr[:, None] & vc[None, :]
        idx = np.argwhere(frac)
        if len(idx) < 8:
            return 0
        step = max(1, len(idx) // 96)
        idx = idx[::step][:96]
        src = codec.source[0]
        fh = codec.fh
        keep = fh.interpolation_filter
        totals = []
        for flt in (0, 1, 2):
            fh.interpolation_filter = flt
            s = 0
            for ui, uj in idx:
                y, x = int(ui) * 16, int(uj) * 16
                sv = int(sel[ui, uj])
                ref = names[sv] if sv < len(names) \
                    else names[int(sf["fwd_i"][ui, uj])]
                mv = (int(mvr[ui, uj]), int(mvc[ui, uj]))
                pred = codec.predict_inter(0, mv, x, y, 16, 16, ref)
                s += int(np.abs(src[y:y + 16, x:x + 16].astype(np.int32)
                                - pred).sum())
            totals.append(s)
        fh.interpolation_filter = keep
        best = int(np.argmin(totals))
        if best and totals[best] >= totals[0] * 0.998:
            return 0
        return best

    def _build_plan(self, codec, cost, lam):
        """Partition DP over the combined cost maps (shared vectorized
        form, batched_md.partition_dp), up to 64x64 NONE on inter
        frames (coherent motion codes as one block)."""
        from .batched_md import _partition_bits, partition_dp

        pbits = {b: _partition_bits(codec.fc, b) for b in (8, 16, 32, 64)}
        self._plan = partition_dp(cost, lam, pbits, codec.mi_rows,
                                  codec.mi_cols, bsizes=(16, 32, 64))

    # -- replay ---------------------------------------------------------

    def _decide_compound(self, codec, x, y, bw, bh, mi_row, mi_col, w4,
                         h4, u16):
        """Replay a compound-selected unit against the true compound MV
        stack (NEW_NEW vs NEAREST_NEAREST, like the per-block search)."""
        sf = self._sf
        rf = self._names[int(sf["fwd_i"][u16])]
        rb = self._names[int(sf["bwd_i"][u16])]
        mv0 = (int(sf["mv_r"][u16]), int(sf["mv_c"][u16]))
        mv1 = (int(sf["mv1_r"][u16]), int(sf["mv1_c"][u16]))
        in_frame = lambda mv: codec.mv_window_in_frame(mv, x, y, bw, bh)
        stack = mp.find_mv_stack(
            codec.mi, mi_row, mi_col, w4, h4, rf,
            codec.mi_rows, codec.mi_cols, sb_mi=codec.seq.sb_size // 4,
            sign_bias=codec.sign_bias, ref_frame1=rb, tile=codec.tile,
            **codec.gm_stack_kwargs(rf, rb, mi_row, mi_col, w4, h4)).stack
        lower = lambda mv: mp.lower_mv_precision(mv, False, False)
        ps = float(selection_pens(codec.fh.base_q_idx,
                                  codec.seq.bit_depth)[3]) / SEL_MV_W
        trials = [(mp.NEW_NEWMV, mv0, mv1, 96 * ps)]
        if stack:
            trials.append((mp.NEAREST_NEARESTMV,
                           lower(stack[0][0]), lower(stack[0][1]), 0))
        src_blk = codec.source[0][y:y + bh, x:x + bw].astype(np.int32)
        best = None
        for mode, m0, m1, pen in trials:
            if not (in_frame(m0) and in_frame(m1)):
                continue
            pred = codec.predict_compound(0, m0, m1, x, y, bw, bh, rf, rb)
            sad = int(np.abs(src_blk - pred).sum()) + pen
            if best is None or sad < best[0]:
                best = (sad, mode, m0, m1)
        if best is None:
            return None
        _, mode, m0, m1 = best
        return BlockDecision(is_inter=True, inter_mode=mode,
                             mv=(int(m0[0]), int(m0[1])),
                             mv1=(int(m1[0]), int(m1[1])),
                             ref=rf, ref1=rb)

    def decide_inter(self, codec, x, y, bw, bh, mi_row, mi_col, w4,
                     h4=None):
        if h4 is None:
            h4 = w4
        if self._inter is None or (bw, bh) not in self._inter:
            return super().decide_inter(codec, x, y, bw, bh, mi_row,
                                        mi_col, w4, h4)
        bi, bj = y // bh, x // bw
        if not self._inter[(bw, bh)][bi, bj]:
            return self.decide(codec, x, y, bw, bh)
        sf = self._sf
        u16 = (y // 16, x // 16)
        sel = int(sf["sel"][u16])
        if sel >= len(self._names):            # compound unit
            d = self._decide_compound(codec, x, y, bw, bh, mi_row,
                                      mi_col, w4, h4, u16)
            if d is not None:
                return d
            sel = int(sf["fwd_i"][u16])        # windows failed: single
        ref = self._names[sel]
        mv = (int(sf["mv_r"][u16]), int(sf["mv_c"][u16]))
        stack_res = mp.find_mv_stack(
            codec.mi, mi_row, mi_col, w4, h4, ref,
            codec.mi_rows, codec.mi_cols, sb_mi=codec.seq.sb_size // 4,
            sign_bias=codec.sign_bias, tile=codec.tile)
        nearest = tuple(stack_res.ref_mv_list[0])
        near = tuple(stack_res.ref_mv_list[1])
        # mini candidate refinement against the true MVP stack: the
        # device plan supplies NEWMV; NEAREST/NEAR/GLOBAL often code
        # almost for free (the reference's candidate classes)
        src_blk = codec.source[0][y:y + bh, x:x + bw].astype(np.int32)
        ps = float(selection_pens(codec.fh.base_q_idx,
                                  codec.seq.bit_depth)[3]) / SEL_MV_W
        cands = []
        if codec.mv_window_in_frame(mv, x, y, bw, bh):
            cands.append((mv, mp.NEWMV, 96 * ps))
        if codec.mv_window_in_frame(nearest, x, y, bw, bh):
            cands.append((nearest, mp.NEARESTMV, 0))
        if len(stack_res.stack) >= 2 and near != nearest \
                and codec.mv_window_in_frame(near, x, y, bw, bh):
            cands.append((near, mp.NEARMV, 16 * ps))
        if codec.mv_window_in_frame((0, 0), x, y, bw, bh):
            cands.append(((0, 0), mp.GLOBALMV, 32 * ps))
        if not cands:
            return self.decide(codec, x, y, bw, bh)
        best = None
        for cmv, cmode, pen in cands:
            pred = codec.predict_inter(0, cmv, x, y, bw, bh, ref)
            sad = int(np.abs(src_blk - pred).sum()) + pen
            if best is None or sad < best[0]:
                best = (sad, cmv, cmode)
        _, mv, mode = best
        if mode == mp.NEWMV and mv == nearest:
            mode = mp.NEARESTMV
        return BlockDecision(is_inter=True, inter_mode=mode,
                             mv=(int(mv[0]), int(mv[1])),
                             ref_mv_idx=0, ref=ref)

    def decide(self, codec, x, y, bw, bh) -> BlockDecision:
        if self._modes is not None and (bw, bh) in self._modes:
            m = int(self._modes[(bw, bh)][y // bh, x // bw])
            mode = PredictionMode(m)
            d = BlockDecision(y_mode=mode)
            d.uv_mode = m if mode <= PredictionMode.PAETH_PRED else 0
            return d
        return super().decide(codec, x, y, bw, bh)
