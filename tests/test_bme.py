"""Batched frame ME (ops/bme.py) + the batched inter decider."""
import numpy as np
import pytest

from svt_av1_tpu.ops import bme


def test_translation_recovered():
    """A pure translation within the refinement range is recovered with
    SAD 0 on every block whose reference window is in-frame — including
    the first superblock row/column (edge-window regression)."""
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (192, 256)).astype(np.int32)
    src = np.roll(np.roll(ref, 5, 0), -3, 1)      # mv = (-5, +3)
    out = bme.frame_me(src, ref, np)
    mvr, mvc, sad = (np.asarray(v) for v in out[(16, 16)])
    n_sby, n_sbx = out["grid"]
    zero = sad == 0
    # wrap seams confined to the last +-8px; everything else exact
    assert zero.mean() > 0.6
    ok = (mvr[zero] == -5).all() and (mvc[zero] == 3).all()
    assert ok
    # first SB row/col blocks below the 5px wrap seam must be exact
    # (edge-window regression: negative MVs reachable at the frame edge)
    assert sad[0, 1:, :].max() == 0           # SB (0, 0) sub-rows 1..3
    assert sad[1, 1:, :].max() == 0           # SB (0, 1)


def test_shapes_aggregate_consistency():
    """Aggregated shape SADs at a common offset equal the sum of their
    8x8 children."""
    rng = np.random.default_rng(3)
    wsz = bme.SB + 2 * bme.REFINE_R
    src = rng.integers(0, 256, (64, 64)).astype(np.int32)
    win = rng.integers(0, 256, (wsz, wsz)).astype(np.int32)
    s8 = bme.sad8_surfaces(src[None], win[None], np)
    a16 = bme.aggregate(s8, 2, 2, np)
    manual = (s8[0, 0, 0] + s8[0, 0, 1] + s8[0, 1, 0] + s8[0, 1, 1])
    np.testing.assert_array_equal(a16[0, 0, 0], manual)


def test_inter_decider_e2e_own_decoder(tmp_path):
    """Fast-preset inter path end-to-end against our own decoder (the
    reference cross-check lives in the e2e/tile suites)."""
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.batched_inter import BatchedDecider

    yy, xx = np.mgrid[0:96, 0:128]
    frames = []
    for i in range(4):
        y = (120 + 50 * np.sin((xx - 3 * i) / 9)
             + 40 * np.cos((yy - 2 * i) / 13)).clip(0, 255).astype(np.uint8)
        u = np.full((48, 64), 128, np.uint8)
        v = np.full((48, 64), 120, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=128, source_height=96, qp=40,
                        intra_period_length=-1, hierarchical_levels=0)
    path = str(tmp_path / "bi.ivf")
    recons = encode_ivf(frames, cfg, path, BatchedDecider(use_jax=False))
    ours, _ = decode_ivf(path)
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")


def test_mv_window_allows_padded_edge_reach():
    """MC windows may overhang the visible frame into the edge-replicated
    reference pad (spec 7.11.3.3 clamps sample reads to the frame, i.e.
    infinite edge extension): edge blocks keep their motion instead of
    degrading to zero-MV/intra.  Reach beyond the pad stays rejected."""
    from svt_av1_tpu.bitstream.headers import SequenceHeader, FrameHeader
    from svt_av1_tpu.constants import FrameType
    from svt_av1_tpu.pipeline.frame_codec import FrameCodec, REF_PAD

    seq = SequenceHeader(max_frame_width=64, max_frame_height=64)
    fh = FrameHeader(frame_type=FrameType.INTER_FRAME, frame_width=64,
                     frame_height=64, base_q_idx=100)
    codec = FrameCodec(seq, fh)
    # right-edge block, 4px rightward MV: window overhangs by 4+taps
    assert codec.mv_window_in_frame((0, 32), 48, 0, 16, 16)
    # subpel tap overhang alone (quarter-pel at the very edge)
    assert codec.mv_window_in_frame((0, 2), 48, 0, 16, 16)
    # reach beyond the pad is rejected (would silently clip the read)
    too_far = (REF_PAD + 24) * 8
    assert not codec.mv_window_in_frame((0, too_far), 48, 0, 16, 16)
    assert not codec.mv_window_in_frame((-too_far, 0), 0, 0, 16, 16)


def test_edge_blocks_stay_inter_on_panning_content(tmp_path):
    """A clip panning 4px/frame: with padded-edge MC the trailing edge
    column codes inter (previously every edge block fell back to
    zero-ish MVs or intra, measurably wrecking prediction)."""
    from svt_av1_tpu.api import Encoder
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.batched_inter import BatchedDecider
    from svt_av1_tpu.pipeline import frame_codec as fc
    from svt_av1_tpu.constants import FrameType

    rng = np.random.default_rng(7)
    base = rng.integers(30, 220, (96, 256)).astype(np.uint8)
    frames = []
    for i in range(3):
        y = base[:, 4 * i:4 * i + 128].copy()
        u = np.full((48, 64), 128, np.uint8)
        v = np.full((48, 64), 120, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=128, source_height=96, qp=32,
                        intra_period_length=-1, hierarchical_levels=0)
    seen = {"intra_edge": 0, "inter_edge": 0}
    orig = fc.FrameCodec._record_mi

    def spy(self, mi_row, mi_col, w4, h4, decision, skip):
        if (not self.io.is_decoder
                and self.fh.frame_type != FrameType.KEY_FRAME
                and (mi_col + w4) * 4 >= self.fh.frame_width - 8):
            key = "inter_edge" if decision.is_inter else "intra_edge"
            seen[key] += 1
        return orig(self, mi_row, mi_col, w4, h4, decision, skip)

    from svt_av1_tpu.native import tile_coder as tc
    native = (tc.try_encode_tiles_native, tc.try_encode_tiles_native_inter)
    fc.FrameCodec._record_mi = spy
    tc.try_encode_tiles_native = lambda *a, **k: None
    tc.try_encode_tiles_native_inter = lambda *a, **k: None
    try:
        enc = Encoder(cfg, BatchedDecider(use_jax=False))
        for f in frames:
            enc.send_picture(f)
        enc.flush()
    finally:
        fc.FrameCodec._record_mi = orig
        tc.try_encode_tiles_native, tc.try_encode_tiles_native_inter = native
    assert seen["inter_edge"] > 0
    assert seen["inter_edge"] >= 3 * seen["intra_edge"]
