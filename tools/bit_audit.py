#!/usr/bin/env python
"""Per-syntax-family bit audit of one encode: where do the bits go?

Wraps the tile coder's categorized call sites with tell_bits() deltas
(exclusive attribution via a category stack) and histograms the coded
blocks, so inter-quality work can target the real bit sinks instead of
guessing.  Reference analog: the aom/SVT "stats_output" style breakdown
the reference derives from its rate estimation counters.

Usage: python tools/bit_audit.py [--frames 8] [--qp 40] [--gop ld]
       [--width 640 --height 360] [--preset 8]
"""
import argparse
import collections
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from svt_av1_tpu.pipeline import frame_codec as fcmod
from svt_av1_tpu.native import tile_coder as tc


class Audit:
    def __init__(self):
        self.bits = collections.Counter()
        self.stack = []          # (category, bits_at_entry_excl)
        self.blocks = collections.Counter()   # (bsize, kind) -> count
        self.skip_blocks = collections.Counter()
        self.frame_bits = []
        self.modes = collections.Counter()
        self.nnz = collections.Counter()
        self.pred_sad = collections.Counter()
        self.pred_px = collections.Counter()
        self.frame_q = {}
        self.fr_sad = collections.Counter()
        self.fr_px = collections.Counter()

    def reset_frames(self):
        self.frame_bits = []


AUDIT = Audit()


def _wrap(cls, name, category):
    orig = getattr(cls, name)

    def run(self, *a, **k):
        io = getattr(self, "io", None)
        ec = getattr(io, "ec", None) if io is not None else None
        if ec is None:
            return orig(self, *a, **k)
        t0 = ec.tell_bits()
        AUDIT.stack.append([category, 0.0])
        try:
            return orig(self, *a, **k)
        finally:
            dt = ec.tell_bits() - t0
            _, inner = AUDIT.stack.pop()
            AUDIT.bits[category] += dt - inner
            if AUDIT.stack:
                AUDIT.stack[-1][1] += dt

    setattr(cls, name, run)


def _wrap_mv():
    orig = fcmod.encode_mv

    def run(ec, *a, **k):
        t0 = ec.tell_bits()
        try:
            return orig(ec, *a, **k)
        finally:
            dt = ec.tell_bits() - t0
            AUDIT.bits["mv"] += dt
            if AUDIT.stack:
                AUDIT.stack[-1][1] += dt

    fcmod.encode_mv = run
    fcmod.FrameCodec.__init__  # touch


def _wrap_record_mi():
    orig = fcmod.FrameCodec._record_mi

    def run(self, mi_row, mi_col, w4, h4, decision, skip):
        if not self.io.is_decoder:
            key = (w4 * 4, h4 * 4,
                   "inter" if decision.is_inter else "intra")
            AUDIT.blocks[key] += 1
            if skip:
                AUDIT.skip_blocks[key] += 1
            if decision.is_inter:
                AUDIT.modes[int(decision.inter_mode)] += 1
        return orig(self, mi_row, mi_col, w4, h4, decision, skip)

    fcmod.FrameCodec._record_mi = run


def _wrap_coeff_planes():
    """Split coefficient bits by plane (luma vs chroma) at the txb
    writer, and count nnz."""
    from svt_av1_tpu.entropy.native_ec import NativeRangeEncoder

    orig = NativeRangeEncoder.write_coeffs_fast

    def run(self, fc, qcoeff, tx_size, tx_type, plane_type, sk_ctx,
            dc_ctx, eob, tx_type_writer=None):
        t0 = self.tell_bits()
        try:
            return orig(self, fc, qcoeff, tx_size, tx_type, plane_type,
                        sk_ctx, dc_ctx, eob, tx_type_writer)
        finally:
            dt = self.tell_bits() - t0
            AUDIT.bits["coeff_uv" if plane_type else "coeff_y"] += dt
            AUDIT.nnz["uv" if plane_type else "y"] += int(
                np.count_nonzero(qcoeff))

    NativeRangeEncoder.write_coeffs_fast = run


def _wrap_pred_quality():
    """Accumulate |src - pred| per plane for inter blocks (prediction
    quality, pre-quantization), per frame (keyed on order_hint)."""
    orig = fcmod.FrameCodec._compute_block_inter

    def run(self, decision, x, y, bw, bh):
        out = orig(self, decision, x, y, bw, bh)
        kind = "inter" if decision.is_inter else "intra"
        disp = int(self.fh.order_hint)
        AUDIT.frame_q[disp] = int(self.fh.base_q_idx)
        for t in out:
            p = "uv" if t["plane"] else "y"
            src = self.source[t["plane"]][t["py"]:t["py"] + t["ph"],
                                          t["px"]:t["px"] + t["pw"]]
            AUDIT.pred_sad[(kind, p)] += int(
                np.abs(src.astype(np.int64) - t["pred"]).sum())
            AUDIT.pred_px[(kind, p)] += src.size
            if p == "y":
                AUDIT.fr_sad[disp] += int(
                    np.abs(src.astype(np.int64) - t["pred"]).sum())
                AUDIT.fr_px[disp] += src.size
        return out

    fcmod.FrameCodec._compute_block_inter = run


def install():
    # force the Python walk (the native coder can't report categories)
    tc.try_encode_tiles_native = lambda *a, **k: None
    tc.try_encode_tiles_native_inter = lambda *a, **k: None
    _wrap(fcmod.FrameCodec, "_code_partition", "partition")
    _wrap(fcmod.FrameCodec, "_write_residual", "coeff")
    _wrap(fcmod.FrameCodec, "_write_residual_inter", "coeff")
    _wrap(fcmod.FrameCodec, "_code_block_tx_size", "txsize")
    _wrap(fcmod.FrameCodec, "_block", "block_other")
    _wrap(fcmod.FrameCodec, "_block_inter", "block_other")
    _wrap_mv()
    _wrap_record_mi()
    _wrap_coeff_planes()
    _wrap_pred_quality()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--qp", type=int, default=40)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--gop", default="ld", choices=("ai", "ld"))
    ap.add_argument("--preset", type=int, default=8)
    args = ap.parse_args()

    install()
    sys.path.insert(0, str(Path(__file__).parent))
    from quality_compare import synth_clip

    from svt_av1_tpu.api import Encoder
    from svt_av1_tpu.config import EncoderConfig

    frames = synth_clip(args.width, args.height, args.frames)
    keyint = 1 if args.gop == "ai" else args.frames + 1
    cfg = EncoderConfig(source_width=args.width,
                        source_height=args.height, qp=args.qp,
                        enc_mode=args.preset,
                        intra_period_length=keyint - 1 if keyint > 0
                        else -2)
    enc = Encoder(cfg)
    pkts = []
    for f in frames:
        got = enc.send_picture(f)
        pkts += got
        for p in got:
            AUDIT.frame_bits.append(len(p) * 8)
    for p in enc.flush():
        pkts.append(p)
        AUDIT.frame_bits.append(len(p) * 8)
    total = sum(len(p) * 8 for p in pkts)
    cat_total = sum(AUDIT.bits.values())

    print(f"\ntotal packet bits: {total}  (categorized {cat_total})")
    print(f"{'category':<14} {'bits':>10}  share")
    for cat, b in AUDIT.bits.most_common():
        print(f"{cat:<14} {b:>10.0f}  {100.0 * b / cat_total:5.1f}%")
    print("\nblock histogram (coded blocks, % skip):")
    for key, n in sorted(AUDIT.blocks.items()):
        sk = AUDIT.skip_blocks.get(key, 0)
        print(f"  {key[0]:>3}x{key[1]:<3} {key[2]:<6} {n:>6}"
              f"  skip {100.0 * sk / n:5.1f}%")
    names = {13: "NEARESTMV", 14: "NEARMV", 15: "GLOBALMV", 16: "NEWMV",
             17: "NEAREST_NEARESTMV", 18: "NEAR_NEARMV", 23: "GLOBAL_GLOBALMV",
             24: "NEW_NEWMV"}
    print("\ninter mode histogram:")
    for m, n in AUDIT.modes.most_common():
        print(f"  {names.get(m, m)}: {n}")
    print("\nper-frame bits:", AUDIT.frame_bits)
    print("\nprediction quality (mean |src-pred| per px, pre-quant):")
    for k in sorted(AUDIT.pred_sad):
        px = max(AUDIT.pred_px[k], 1)
        print(f"  {k[0]:<6} {k[1]:<3} {AUDIT.pred_sad[k] / px:7.3f}"
              f"  ({px} px)")
    print("\nnnz coefficients:", dict(AUDIT.nnz))
    print("\nper-frame qindex / luma pred |err|:")
    for d in sorted(AUDIT.frame_q):
        sad = AUDIT.fr_sad[d] / max(AUDIT.fr_px[d], 1)
        print(f"  display {d}: qindex {AUDIT.frame_q[d]}"
              f"  pred|err| {sad:6.3f}")


if __name__ == "__main__":
    main()
