"""Multi-tile encode: per-tile contexts, tile sizes, tile-bounded
prediction/MVP availability; conformance vs the reference decoder
(EbEntropyCodingProcess.c:357 per-tile reset, set_tile_info parity)."""
import numpy as np
import pytest

from svt_av1_tpu.api import encode_ivf, decode_ivf
from svt_av1_tpu.config import EncoderConfig
from test_e2e import synthetic_clip, ref_decode, REF_DECAPP

needs_refdec = pytest.mark.skipif(not REF_DECAPP.exists(),
                                  reason="reference DecApp not built")


def _check(tmp_path, cfg, frames, name):
    w, h = cfg.source_width, cfg.source_height
    path = str(tmp_path / f"{name}.ivf")
    recons = encode_ivf(frames, cfg, path)
    ours, _ = decode_ivf(path)
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p],
                                          err_msg=f"own f{i} p{p}")
    if REF_DECAPP.exists():
        refs = ref_decode(path, w, h)
        assert len(refs) == len(ours)
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(o[p], r[p],
                                              err_msg=f"ref f{i} p{p}")


@needs_refdec
@pytest.mark.parametrize("tc,tr", [(1, 0), (0, 1), (1, 1), (2, 1)])
def test_tiles_all_intra(tmp_path, tc, tr):
    w, h = 352, 288                     # 6x5 superblocks
    frames = synthetic_clip(w, h, 2, seed=21)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        tile_columns=tc, tile_rows=tr)
    _check(tmp_path, cfg, frames, f"t{tc}{tr}")


@needs_refdec
def test_tiles_inter_gop(tmp_path):
    """Tile-bounded MVP/neighbor availability on an inter GOP."""
    w, h = 352, 288
    frames = synthetic_clip(w, h, 6, seed=22)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        tile_columns=1, tile_rows=1,
                        intra_period_length=-1, hierarchical_levels=2)
    _check(tmp_path, cfg, frames, "tinter")


@needs_refdec
def test_tiles_with_filters(tmp_path):
    """Tiles + DLF/CDEF/LR (filters run frame-wide across tile edges)."""
    import svt_av1_tpu.pipeline.frame_codec as fc
    w, h = 176, 144
    frames = synthetic_clip(w, h, 2, seed=23)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=46,
                        enc_mode=6, tile_columns=1)
    orig = fc.FrameCodec.search_lr
    fc.FrameCodec.search_lr = lambda self, lam=0.0: orig(self, 0.0)
    try:
        _check(tmp_path, cfg, frames, "tfilt")
    finally:
        fc.FrameCodec.search_lr = orig


def test_tile_rects_uniform():
    """Uniform spacing may yield fewer tiles than 1<<log2 (spec loop)."""
    from svt_av1_tpu.bitstream.headers import SequenceHeader, FrameHeader
    from svt_av1_tpu.pipeline.frame_codec import FrameCodec

    seq = SequenceHeader(max_frame_width=320, max_frame_height=192)
    fh = FrameHeader(frame_width=320, frame_height=192,
                     tile_cols_log2=2, tile_rows_log2=0)
    codec = FrameCodec(seq, fh)
    rects = codec.tile_rects()
    # 5 sb cols, log2=2 -> width 2 sb -> 3 tile cols
    assert len(rects) == 3
    assert rects[0] == (0, 0, 48, 32)
    assert rects[-1][3] == codec.mi_cols
