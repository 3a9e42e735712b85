"""Fused DLF+CDEF device chain vs the sequential host path: identical
searched level/strengths and bit-identical filtered planes."""
import numpy as np
import pytest

from svt_av1_tpu.bitstream.headers import SequenceHeader, FrameHeader
from svt_av1_tpu.constants import FrameType
from svt_av1_tpu.pipeline.frame_codec import FrameCodec
from svt_av1_tpu.pipeline.batched_md import BatchedIntraDecider


def _coded_frame(w, h, qidx=80, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 70 * np.sin(xx / 11) + 50 * np.cos(yy / 7)
         + rng.integers(-20, 21, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 40 * np.sin(yy[:h // 2, :w // 2] / 5)).clip(0, 255)\
        .astype(np.uint8)
    v = (128 - 40 * np.cos(xx[:h // 2, :w // 2] / 9)).clip(0, 255)\
        .astype(np.uint8)
    seq = SequenceHeader(max_frame_width=w, max_frame_height=h)
    seq.enable_restoration = False
    seq.enable_cdef = True
    fh = FrameHeader(frame_type=FrameType.KEY_FRAME, frame_width=w,
                     frame_height=h, base_q_idx=qidx,
                     filter_level=(8, 8), filter_level_uv=(8, 8))
    codec = FrameCodec(seq, fh, source_planes=(y, u, v))
    codec.encode_tiles(BatchedIntraDecider(use_jax=False))
    return codec


@pytest.mark.slow
def test_chain_matches_sequential(monkeypatch):
    monkeypatch.setenv("SVT_TPU_DEVICE", "1")
    monkeypatch.setenv("SVT_TPU_DLF_DEVICE", "0")   # host DLF reference
    from svt_av1_tpu.ops.filter_chain import dlf_cdef_chain
    from svt_av1_tpu.ops import dlf as dlf_ops

    a = _coded_frame(128, 96)
    b = _coded_frame(128, 96)

    ran = dlf_cdef_chain(a)
    assert ran

    # sequential reference: host DLF at the level the chain searched,
    # then host CDEF at the strengths it searched
    lvl = a.fh.filter_level[0]
    b.fh.filter_level = (lvl, lvl)
    b.fh.filter_level_uv = (lvl, lvl)
    if lvl > 0:
        for p in range(3):
            sx = 1 if p else 0
            dlf_ops.loop_filter_plane(
                b.recon[p], b.tx_w_grid[p], b.tx_h_grid[p], b.skip_grid[p],
                b.bedge_x[p], b.bedge_y[p],
                (b.fh.frame_width + sx) >> sx,
                (b.fh.frame_height + sx) >> sx,
                lvl, lvl, b.fh.sharpness, p > 0, 8)
    b.fh.cdef_y_strengths = a.fh.cdef_y_strengths
    b.fh.cdef_uv_strengths = a.fh.cdef_uv_strengths
    monkeypatch.setenv("SVT_TPU_DEVICE", "0")      # host cdef apply
    b.apply_cdef()

    for p in range(3):
        np.testing.assert_array_equal(a.recon[p], b.recon[p])


def test_chain_declines_without_cdef():
    from svt_av1_tpu.ops.filter_chain import dlf_cdef_chain
    codec = _coded_frame(64, 64)
    codec.seq.enable_cdef = False
    assert not dlf_cdef_chain(codec)
