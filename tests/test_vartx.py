"""Inter var-tx (TX_MODE_SELECT on inter frames): recursive txfm_split
syntax (write_tx_size_vartx / read_var_tx_size analogs), the txfm
context model, and the coding-time MV revalidation that the RD presets
rely on (stale cached NEAREST/NEAR MVs vs the final MV stacks)."""
from pathlib import Path

import numpy as np
import pytest

from svt_av1_tpu.api import Encoder, decode_ivf, encode_ivf
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.constants import TxSize

from test_e2e import needs_refdec, ref_decode, synthetic_clip


def _moving_clip(w, h, n, seed=3):
    """Two layers moving at different speeds (exercises NEAR/GLOBAL
    modes and nontrivial residuals on inter frames)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    tex = rng.normal(0, 12, (h * 2, w * 2))
    frames = []
    for i in range(n):
        bg = 100 + 50 * np.sin((xx + 2 * i) / 23)
        t = tex[int(1.7 * i):int(1.7 * i) + h,
                int(3.1 * i):int(3.1 * i) + w]
        y = (bg + t + rng.normal(0, 2, (h, w))).clip(0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        frames.append((y, u, v))
    return frames


def test_txfm_split_ctx_range():
    """txfm_partition contexts stay inside the 21-entry table."""
    from svt_av1_tpu.pipeline.frame_codec import FrameCodec
    from svt_av1_tpu.bitstream.headers import FrameHeader, SequenceHeader

    seq = SequenceHeader(max_frame_width=64, max_frame_height=64)
    fh = FrameHeader(frame_width=64, frame_height=64)
    codec = FrameCodec(seq, fh)
    for ts in (TxSize.TX_64X64, TxSize.TX_32X32, TxSize.TX_32X16,
               TxSize.TX_16X16, TxSize.TX_8X8):
        for fill in (0, 8, 64):
            codec.txfm_above[:] = fill
            codec.txfm_left[:] = fill
            for bw, bh in ((64, 64), (64, 32), (32, 32), (16, 16), (8, 8)):
                if TxSize(ts) > TxSize.TX_8X8 and max(bw, bh) < 16:
                    continue
                ctx = codec._txfm_split_ctx(ts, 0, 0, bw, bh)
                assert 0 <= ctx < 21, (ts, fill, bw, bh, ctx)


def test_effective_drl_idx_clamps():
    """A stale requested index is reconstructed exactly as _code_drl
    would code it against a shorter stack."""
    from svt_av1_tpu.pipeline.frame_codec import FrameCodec
    from svt_av1_tpu.pipeline import mv_pred as mp
    from svt_av1_tpu.bitstream.headers import FrameHeader, SequenceHeader

    seq = SequenceHeader(max_frame_width=64, max_frame_height=64)
    codec = FrameCodec(seq, FrameHeader(frame_width=64, frame_height=64))
    one = [(((0, 0), (0, 0)), 640)]
    three = [(((0, 0), (0, 0)), 640)] * 3
    assert codec._effective_drl_idx(mp.NEWMV, one, 1) == 0
    assert codec._effective_drl_idx(mp.NEWMV, three, 1) == 1
    assert codec._effective_drl_idx(mp.NEARMV, one, 2) == 0
    assert codec._effective_drl_idx(mp.NEARMV, three, 2) == 1


@needs_refdec
@pytest.mark.parametrize("enc_mode", [4, 2])
def test_vartx_inter_conformance(tmp_path, enc_mode):
    """TX_MODE_SELECT inter GOPs decode bit-exactly on the reference
    decoder and on ours (em2 adds 8px blocks + AB/4-way shapes, the
    combination that exercises the MV revalidation)."""
    w, h, n = 192, 128, 5
    frames = _moving_clip(w, h, n)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        enc_mode=enc_mode, intra_period_length=n)
    path = tmp_path / f"vartx{enc_mode}.ivf"
    recons = encode_ivf(frames, cfg, str(path))
    dec_frames, _ = decode_ivf(str(path))
    assert len(dec_frames) == n
    for i in range(n):
        for p in range(3):
            np.testing.assert_array_equal(
                np.asarray(dec_frames[i][p]),
                np.asarray(recons[i][p]).astype(np.uint8))
    ref = ref_decode(path, w, h)
    for i in range(n):
        for p in range(3):
            np.testing.assert_array_equal(
                ref[i][p], np.asarray(recons[i][p]).astype(np.uint8))


@needs_refdec
def test_vartx_forced_splits_conformant(tmp_path):
    """Force tx depth 1 on every inter block: the recursive txfm_split
    syntax itself (not just the depth-0 degenerate form) must decode
    bit-exactly on the reference decoder."""
    from svt_av1_tpu.pipeline import frame_codec as fcmod

    orig = fcmod.FrameCodec.__init__

    def patched(self, *a, **k):
        orig(self, *a, **k)
        self.force_tx_depth = 1

    fcmod.FrameCodec.__init__ = patched
    try:
        w, h, n = 192, 128, 4
        frames = _moving_clip(w, h, n)
        cfg = EncoderConfig(source_width=w, source_height=h, qp=36,
                            enc_mode=4, intra_period_length=n)
        path = tmp_path / "forced.ivf"
        recons = encode_ivf(frames, cfg, str(path))
    finally:
        fcmod.FrameCodec.__init__ = orig
    ref = ref_decode(path, w, h)
    for i in range(n):
        for p in range(3):
            np.testing.assert_array_equal(
                ref[i][p], np.asarray(recons[i][p]).astype(np.uint8))
