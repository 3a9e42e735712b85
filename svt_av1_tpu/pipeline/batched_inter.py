"""Frame-batched inter mode decision: device ME + open-loop RD maps.

Extends the batched intra decider to inter frames: one device pass runs
full-frame motion estimation against LAST (ops/bme.py — coarse /8
search + 8x8 SAD pyramid refinement, the reference's HME/
integer_search_sb shape), builds a 16x16-granular motion-compensated
prediction, scores every block shape on the residual through the same
DCT/quantizer cost model as the intra pass, and the partition DP picks
per-block intra-vs-inter and the partition tree.  Motion granularity is
16x16: larger inter blocks are allowed when their children's MVs agree
(the common coherent-motion case), smaller blocks inherit the parent MV
— so every coded block's residual model matches the MV it will code.

The serial conformant pass replays the plan; NEAREST/NEAR/GLOBAL/NEW
selection happens there against the true (tile-bounded) MV stack.
"""
from __future__ import annotations

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


def _mc_cost_maps(resid_padded, buf_w, buf_h, qindex, lam, bd, xp):
    """Per-shape RD cost of coding the (motion-compensated) residual:
    same unit-DCT/quantizer model as the intra pass, pred = MC."""
    out = {}
    for (w, h) in omd.ALL_SHAPES:
        blocks = omd.grid_blocks(resid_padded, w, h, buf_w, buf_h, xp)
        zbin, rnd, step = omd._quant_maps(w, h, qindex,
                                          qz.build_quantizer(bd)[0], xp)
        dh = xp.asarray(omd._dct_mat(h))
        dwt = xp.asarray(omd._dct_mat(w).T)
        cf = dh @ blocks.astype(xp.float32) @ dwt
        ac = xp.abs(cf)
        q = xp.floor((ac + rnd) / step)
        q = xp.where(ac >= zbin, xp.maximum(q, 0.0), 0.0)
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


def inter_frame_maps(src_plane, ref_plane, buf_w, buf_h, qindex, lam,
                     mode_bits, bd=8, xp=np, row0=0, with_intra=True):
    """(intra_maps, inter_cost_maps, mv16_q8, mvbits16): the full
    open-loop decision state for one inter frame against one reference.
    MVs are quarter-pel (1/8-unit values, multiples of 2): full-pel
    frame ME (ops/bme.frame_me) + exact-filter subpel refinement
    (bme.subpel_refine16).

    Spatial sharding: with ``row0`` > 0, ``src_plane`` is a stripe at
    global row ``row0`` while ``ref_plane`` stays the full frame
    (references are replicated across shards); the ME/MC/cost outputs
    are bit-identical to the same rows of the unsharded run.  The
    intra maps need their own halo machinery, so sharded callers pass
    ``with_intra=False``."""
    src = xp.asarray(src_plane).astype(xp.int32)
    ref = xp.asarray(ref_plane).astype(xp.int32)
    me = bme.frame_me(src, ref, xp, row0)
    n_sby, n_sbx = me["grid"]
    stripe_h = src.shape[0]
    nr16, nc16 = stripe_h // 16, buf_w // 16

    mv16_dy, mv16_dx, _ = me[(16, 16)]           # [N, 4, 4] pixel MVs
    mv_r16 = _nested_to_grid(mv16_dy, n_sby, n_sbx, 4, 4, xp)
    mv_c16 = _nested_to_grid(mv16_dx, n_sby, n_sbx, 4, 4, xp)
    mvq8_r, mvq8_c, pred = bme.subpel_refine16(
        src, ref, mv_r16, mv_c16, buf_w, buf_h, bd, xp, row0)

    resid = src - pred
    resid_padded = xp.pad(resid, omd.PAD, mode="edge")
    inter_cost = _mc_cost_maps(resid_padded, buf_w, stripe_h, qindex, lam,
                               bd, xp)

    # mv signaling proxy: distance from the SB-level coarse predictor
    sb_r, sb_c, _ = me[(64, 64)]                 # [N, 1, 1]
    sb_r16 = xp.repeat(xp.repeat(
        sb_r.reshape(n_sby, n_sbx), 4, 0), 4, 1)
    sb_c16 = xp.repeat(xp.repeat(
        sb_c.reshape(n_sby, n_sbx), 4, 0), 4, 1)
    d_r = xp.abs(mvq8_r - sb_r16 * 8).astype(xp.float32)
    d_c = xp.abs(mvq8_c - sb_c16 * 8).astype(xp.float32)
    mvbits16 = MV_BIT_SCALE * (xp.log2(1.0 + d_r / 8.0)
                               + xp.log2(1.0 + d_c / 8.0))

    intra = None
    if with_intra:
        padded_src = omd.pad_plane(src, xp)
        intra = omd.intra_decision_arrays(padded_src, buf_w, buf_h,
                                          qindex, lam, mode_bits, bd, xp)
    return intra, inter_cost, (mvq8_r, mvq8_c), mvbits16


import functools


@functools.lru_cache(maxsize=8)
def _jitted_inter(buf_w: int, buf_h: int, bd: int):
    import jax
    import jax.numpy as jnp

    def run(src_u8, ref_u8, qindex, lam, mode_bits):
        intra, inter_cost, (mvdy, mvdx), mvb = inter_frame_maps(
            src_u8.astype(jnp.int32), ref_u8.astype(jnp.int32),
            buf_w, buf_h, qindex, lam, mode_bits, bd, jnp)
        parts = []
        for s in omd.ALL_SHAPES:
            m, c = intra[s]
            parts.append(m.astype(jnp.float32).ravel())
            parts.append(c.ravel())
        for s in omd.ALL_SHAPES:
            parts.append(inter_cost[s].ravel())
        parts += [mvdy.astype(jnp.float32).ravel(),
                  mvdx.astype(jnp.float32).ravel(), mvb.ravel()]
        return jnp.concatenate(parts)

    return jax.jit(run)


def inter_maps_dispatch(src, ref, buf_w, buf_h, qindex, lam, mode_bits,
                        bd, use_jax):
    """Run inter_frame_maps as ONE jitted device program (or the numpy
    reference), returning numpy results."""
    if use_jax:
        try:
            fn = _jitted_inter(buf_w, buf_h, bd)
            dt = np.uint8 if bd == 8 else np.uint16
            flat = np.asarray(fn(np.asarray(src).astype(dt),
                                 np.asarray(ref).astype(dt),
                                 np.int32(qindex), float(lam),
                                 np.asarray(mode_bits, np.float32)))
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
            for s in omd.ALL_SHAPES:
                w, h = s
                nr, nc = buf_h // h, buf_w // w
                inter_cost[s] = flat[off:off + nr * nc].reshape(nr, nc)
                off += nr * nc
            nr16, nc16 = buf_h // 16, buf_w // 16
            n = nr16 * nc16
            mvdy = flat[off:off + n].reshape(nr16, nc16).astype(np.int32)
            off += n
            mvdx = flat[off:off + n].reshape(nr16, nc16).astype(np.int32)
            off += n
            mvb = flat[off:off + n].reshape(nr16, nc16)
            return intra, inter_cost, (mvdy, mvdx), mvb
        except ImportError:
            pass
    return inter_frame_maps(src, ref, buf_w, buf_h, qindex, lam,
                            mode_bits, bd, np)


class BatchedDecider(BatchedIntraDecider):
    """Key frames: batched intra plan; inter frames: batched intra+ME
    plan with per-block intra/inter choice."""

    def __init__(self, use_jax=None):
        super().__init__(use_jax)
        self._inter = None          # {(w,h): is_inter bool map}
        self._mv16 = None           # [nr16, nc16, 2] full-pel

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

    def _plan_inter(self, codec):
        from .rdo import rd_lambda

        lam = rd_lambda(codec.fh.base_q_idx, codec.seq.bit_depth)
        mode_bits = default_mode_bits(codec.fc)
        ref_planes = codec.refs[1][0]       # LAST, padded by REF_PAD
        from .frame_codec import REF_PAD
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
        intra, inter_cost, (mvdy, mvdx), mvbits16 = inter_maps_dispatch(
            codec.source[0], ref_y, codec.buf_w, codec.buf_h,
            codec.fh.base_q_idx, lam, mode_bits, codec.seq.bit_depth,
            self.use_jax)
        mv_r = np.asarray(mvdy)                  # [nr16, nc16], 1/8-pel
        mv_c = np.asarray(mvdx)
        mvb = np.asarray(mvbits16)
        self._mv16 = np.stack([mv_r, mv_c], axis=-1)

        # per-shape combined cost + choice (vectorized over the grids):
        # a shape is inter-eligible when every 16x16 MV it covers agrees
        # (one coded MV per block); sub-16 shapes inherit the parent MV
        self._modes = {s: np.asarray(m) for s, (m, _) in intra.items()}
        self._inter = {}
        cost = {}
        for (w, h) in omd.ALL_SHAPES:
            ic = np.asarray(intra[(w, h)][1]) + lam * INTRA_IN_INTER_BITS
            nc = np.asarray(inter_cost[(w, h)])
            nr, ncol = ic.shape
            fy, fx = max(h // 16, 1), max(w // 16, 1)
            pr = np.arange(nr) * h // 16
            pc = np.arange(ncol) * w // 16
            base_r = mv_r[np.ix_(pr, pc)]
            base_c = mv_c[np.ix_(pr, pc)]
            ok = np.ones(ic.shape, bool)
            for dy in range(fy):
                for dx in range(fx):
                    ok &= (mv_r[np.ix_(pr + dy, pc + dx)] == base_r)                         & (mv_c[np.ix_(pr + dy, pc + dx)] == base_c)
            mvcost = mvb[np.ix_(pr, pc)]
            total_inter = np.where(ok, nc + lam * mvcost, np.inf)
            use_inter = total_inter < ic
            self._inter[(w, h)] = use_inter
            cost[(w, h)] = np.where(use_inter, total_inter, ic)
        self._build_plan(codec, cost, lam)

    def _build_plan(self, codec, cost, lam):
        """Partition DP over the combined cost maps (shared vectorized
        form, batched_md.partition_dp)."""
        from .batched_md import _partition_bits, partition_dp

        pbits = {b: _partition_bits(codec.fc, b) for b in (8, 16, 32)}
        self._plan = partition_dp(cost, lam, pbits, codec.mi_rows,
                                  codec.mi_cols)

    # -- replay ---------------------------------------------------------

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
        mv16 = self._mv16[y // 16, x // 16]
        mv = (int(mv16[0]), int(mv16[1]))        # already 1/8-pel
        ref = 1                                  # LAST
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
        cands = []
        if codec.mv_window_in_frame(mv, x, y, bw, bh):
            cands.append((mv, mp.NEWMV, 96))
        if codec.mv_window_in_frame(nearest, x, y, bw, bh):
            cands.append((nearest, mp.NEARESTMV, 0))
        if len(stack_res.stack) >= 2 and near != nearest \
                and codec.mv_window_in_frame(near, x, y, bw, bh):
            cands.append((near, mp.NEARMV, 16))
        if codec.mv_window_in_frame((0, 0), x, y, bw, bh):
            cands.append(((0, 0), mp.GLOBALMV, 32))
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
