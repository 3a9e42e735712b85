"""Frame-batched mode decision: the TPU-side replacement for the
per-block RDO loop on key frames.

One device pass (ops/omd.py) scores every intra mode for every block at
all candidate shapes; a tiny host DP then composes the partition tree
(NONE/HORZ/VERT/SPLIT) from the per-shape cost maps, mirroring the
semantics of FrameCodec._partition (boundary nodes forced to SPLIT).
The conformant coding pass replays the plan — decisions are open-loop
(source edges), reconstruction stays exact, matching the reference's
PD0 decoupling (EbEncDecProcess.c:4534, design doc :732-734).
"""
from __future__ import annotations

import numpy as np

from ..constants import FrameType, PredictionMode
from ..ops import omd
from .frame_codec import (ModeDecider, BlockDecision, PARTITION_NONE,
                          PARTITION_HORZ, PARTITION_VERT, PARTITION_SPLIT)


def _sym_bits(icdf: np.ndarray, sym: int) -> float:
    prev = 32768 if sym == 0 else int(icdf[sym - 1])
    p = (prev - int(icdf[sym])) / 32768.0
    return float(-np.log2(max(p, 1e-6)))


def default_mode_bits(fc) -> tuple:
    """Approximate per-mode signaling bits from the default CDFs:
    kf y-mode (neutral neighbor ctx) + the delta-0 angle symbol for
    directional modes."""
    cdf = fc.kf_y_mode[0][0]
    out = []
    for m in range(13):
        bits = _sym_bits(cdf, m)
        if PredictionMode.V_PRED <= m <= PredictionMode.D67_PRED:
            bits += _sym_bits(fc.angle_delta[m - 1], 3)
        out.append(round(bits, 3))
    return tuple(out)


def _partition_bits(fc, bsize: int) -> dict:
    bsl = (bsize // 8).bit_length() - 1
    cdf = fc.partition[bsl * 4]
    return {p: _sym_bits(cdf, p) for p in
            (PARTITION_NONE, PARTITION_HORZ, PARTITION_VERT,
             PARTITION_SPLIT)}


class BatchedIntraDecider(ModeDecider):
    """Key-frame decider driven by the batched open-loop device pass.

    Non-key frames fall back to the base per-block path (the batched
    inter pass lands separately)."""

    def __init__(self, use_jax: bool | None = None):
        super().__init__(block_size=32)
        if use_jax is None:
            from .frame_codec import _device_filters
            use_jax = _device_filters()
        self.use_jax = use_jax
        self._plan = None
        self._modes = None
        self._planned_for = None

    # -- planning -----------------------------------------------------

    # -- pipeline overlap (the SRM analog's first slice): the device
    # decision pass for frame N+1 runs on a worker thread while the host
    # packs frame N; jax releases the GIL during device execution -------

    _executor = None
    _prefetch: dict | None = None

    def prefetch(self, display: int, source_plane, buf_w: int, buf_h: int,
                 qindex: int, bd: int):
        import concurrent.futures as cf

        from ..entropy.tables import FrameCdfs
        from .rdo import rd_lambda

        if BatchedIntraDecider._executor is None:
            BatchedIntraDecider._executor =                 cf.ThreadPoolExecutor(max_workers=1)
        if self._prefetch is None:
            self._prefetch = {}
        lam = rd_lambda(qindex, bd)
        mode_bits = default_mode_bits(FrameCdfs(qindex))
        fut = BatchedIntraDecider._executor.submit(
            omd.intra_decision_frame, source_plane, buf_w, buf_h,
            qindex, lam, mode_bits, bd, self.use_jax)
        self._prefetch[display] = (qindex, fut)

    def _take_prefetched(self, codec):
        if not self._prefetch:
            return None
        got = self._prefetch.pop(codec.fh.order_hint, None)
        if got is None:
            return None
        qindex, fut = got
        if qindex != codec.fh.base_q_idx:
            fut.cancel()
            return None
        return fut.result()

    def plan_superblock(self, codec, mi_row, mi_col):
        if codec.fh.frame_type != FrameType.KEY_FRAME:
            self._planned_for = None
            self._plan = None
            self._modes = None
            return
        if self._planned_for is codec:
            return
        self._planned_for = codec
        self._plan_frame(codec)

    def _plan_frame(self, codec):
        from .rdo import rd_lambda

        lam = rd_lambda(codec.fh.base_q_idx, codec.seq.bit_depth)
        mode_bits = default_mode_bits(codec.fc)
        maps = self._take_prefetched(codec)
        if maps is None:
            maps = omd.intra_decision_frame(
                codec.source[0], codec.buf_w, codec.buf_h,
                codec.fh.base_q_idx, lam, mode_bits,
                bd=codec.seq.bit_depth, use_jax=self.use_jax)
        self._modes = {s: m for s, (m, _) in maps.items()}
        cost = {s: c for s, (_, c) in maps.items()}
        pbits = {b: _partition_bits(codec.fc, b) for b in (8, 16, 32)}
        self._plan = {}
        mi_rows, mi_cols = codec.mi_rows, codec.mi_cols

        def visited(r, c):
            return r < mi_rows and c < mi_cols

        def eval_node(bsize, r, c) -> float:
            """Mirrors FrameCodec._partition: returns subtree cost and
            records the choice in the plan."""
            if not visited(r, c):
                return 0.0
            if bsize == 8:
                return float(cost[(8, 8)][r // 2, c // 2])
            bs_mi = bsize // 4
            hbs = bs_mi // 2
            half = bsize // 2
            boundary = not (r + hbs < mi_rows and c + hbs < mi_cols)
            pb = pbits[bsize]

            def split_cost():
                return sum(eval_node(half, rr, cc) for rr, cc in
                           ((r, c), (r, c + hbs), (r + hbs, c),
                            (r + hbs, c + hbs)))

            if boundary:
                self._plan[(bsize, r, c)] = PARTITION_SPLIT
                return split_cost()

            bi, bj = r // bs_mi, c // bs_mi           # block index at size
            none_c = float(cost[(bsize, bsize)][bi, bj]) \
                + lam * pb[PARTITION_NONE]
            horz = cost[(bsize, half)]                 # (w=bsize, h=half)
            horz_c = float(horz[2 * bi, bj] + horz[2 * bi + 1, bj]) \
                + lam * pb[PARTITION_HORZ]
            vert = cost[(half, bsize)]
            vert_c = float(vert[bi, 2 * bj] + vert[bi, 2 * bj + 1]) \
                + lam * pb[PARTITION_VERT]
            # evaluate children first (recursion fills sub-plan); the
            # plan entries below this node are only read when SPLIT wins
            split_c = split_cost() + lam * pb[PARTITION_SPLIT]
            best = min((none_c, PARTITION_NONE), (horz_c, PARTITION_HORZ),
                       (vert_c, PARTITION_VERT), (split_c, PARTITION_SPLIT))
            self._plan[(bsize, r, c)] = best[1]
            return best[0]

        # evaluate every 32-aligned root node (8 mi apart) — the walk
        # splits 64/128 superblocks down to them
        for r in range(0, mi_rows, 8):
            for c in range(0, mi_cols, 8):
                eval_node(32, r, c)

    # -- replay interface ----------------------------------------------

    def partition(self, bsize, mi_row, mi_col, has_rows=True, has_cols=True):
        if self._plan is not None:
            p = self._plan.get((bsize, mi_row, mi_col))
            if p is not None:
                return p
        return super().partition(bsize, mi_row, mi_col, has_rows, has_cols)

    def decide(self, codec, x, y, bw, bh) -> BlockDecision:
        if self._modes is None or (bw, bh) not in self._modes:
            return super().decide(codec, x, y, bw, bh)
        m = int(self._modes[(bw, bh)][y // bh, x // bw])
        mode = PredictionMode(m)
        d = BlockDecision(y_mode=mode)
        d.uv_mode = m if mode <= PredictionMode.PAETH_PRED else 0
        return d
