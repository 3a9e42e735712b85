"""Native tile coder (coder_native.c) vs the Python walk: byte-identical
tile blobs and identical codec state for plan-replayed key frames."""
import numpy as np
import pytest

from svt_av1_tpu.bitstream.headers import SequenceHeader, FrameHeader
from svt_av1_tpu.constants import FrameType
from svt_av1_tpu.native import tile_coder
from svt_av1_tpu.pipeline.frame_codec import FrameCodec
from svt_av1_tpu.pipeline.batched_md import BatchedIntraDecider

pytestmark = pytest.mark.skipif(not tile_coder.available(),
                                reason="coder_native not built")


def _mk(w, h, seed=0, bd=8, qidx=60, tiles=(0, 0), edge_filter=True):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 70 * np.sin(xx / 11) + 50 * np.cos(yy / 7)
         + rng.integers(-25, 26, (h, w))).clip(0, (1 << bd) - 1)
    u = (128 + 40 * np.sin(yy[: (h + 1) // 2, : (w + 1) // 2] / 5)
         ).clip(0, (1 << bd) - 1)
    v = (128 - 40 * np.cos(xx[: (h + 1) // 2, : (w + 1) // 2] / 9)
         ).clip(0, (1 << bd) - 1)
    dt = np.uint8 if bd == 8 else np.uint16
    planes = (y.astype(dt), u.astype(dt), v.astype(dt))
    seq = SequenceHeader(max_frame_width=w, max_frame_height=h, bit_depth=bd)
    seq.enable_intra_edge_filter = edge_filter
    fh = FrameHeader(frame_type=FrameType.KEY_FRAME, frame_width=w,
                     frame_height=h, base_q_idx=qidx,
                     tile_cols_log2=tiles[0], tile_rows_log2=tiles[1])
    return seq, fh, planes


def _encode(seq, fh, planes, native: bool):
    codec = FrameCodec(seq, fh, source_planes=planes)
    decider = BatchedIntraDecider(use_jax=False)
    if not native:
        decider.plan_replayable = False       # forces the python walk
    blobs = codec.encode_tiles(decider)
    return codec, blobs


@pytest.mark.parametrize("w,h,qidx,tiles", [
    (128, 128, 60, (0, 0)),
    (136, 72, 40, (0, 0)),       # non-SB-aligned boundary splits
    (192, 128, 140, (1, 0)),     # two tile columns
    (96, 96, 20, (0, 0)),        # low q: dense coefficients
])
def test_native_matches_python(w, h, qidx, tiles):
    seq, fh, planes = _mk(w, h, qidx=qidx, tiles=tiles)
    c_py, b_py = _encode(seq, fh, planes, native=False)
    seq2, fh2, _ = _mk(w, h, qidx=qidx, tiles=tiles)
    c_nt, b_nt = _encode(seq2, fh2, planes, native=True)
    assert len(b_py) == len(b_nt)
    for a, b in zip(b_py, b_nt):
        assert a == b
    for p in range(3):
        np.testing.assert_array_equal(c_py.recon[p], c_nt.recon[p])
        np.testing.assert_array_equal(c_py.tx_w_grid[p], c_nt.tx_w_grid[p])
        np.testing.assert_array_equal(c_py.tx_h_grid[p], c_nt.tx_h_grid[p])
        np.testing.assert_array_equal(c_py.bedge_x[p], c_nt.bedge_x[p])
        np.testing.assert_array_equal(c_py.bedge_y[p], c_nt.bedge_y[p])
    np.testing.assert_array_equal(c_py.y_modes, c_nt.y_modes)
    np.testing.assert_array_equal(c_py.skips, c_nt.skips)


def test_native_used_for_eligible_frame(monkeypatch):
    seq, fh, planes = _mk(96, 64)
    called = {}
    orig = tile_coder.try_encode_tiles_native

    def spy(codec, decider):
        out = orig(codec, decider)
        called["native"] = out is not None
        return out

    monkeypatch.setattr(tile_coder, "try_encode_tiles_native", spy)
    codec = FrameCodec(seq, fh, source_planes=planes)
    codec.encode_tiles(BatchedIntraDecider(use_jax=False))
    assert called["native"]


def test_native_declines_edge_filter_off():
    seq, fh, planes = _mk(64, 64, edge_filter=True)
    codec = FrameCodec(seq, fh, source_planes=planes)
    codec.lr_units = [[], [], []]           # LR syntax -> python path
    dec = BatchedIntraDecider(use_jax=False)
    assert tile_coder.try_encode_tiles_native(codec, dec) is None
