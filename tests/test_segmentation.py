"""Segmentation + variance AQ: ALT_Q segments on intra frames with
spatial-predicted segment ids, conformant vs the reference decoder
(segmentation_params / read_segment_id / get_qindex parity)."""
import numpy as np
import pytest

from svt_av1_tpu.api import encode_ivf, decode_ivf
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.frame_codec import FrameCodec
from test_e2e import ref_decode, REF_DECAPP

needs_refdec = pytest.mark.skipif(not REF_DECAPP.exists(),
                                  reason="reference DecApp not built")


def test_neg_interleave_roundtrip():
    for mx in range(1, 9):
        for ref in range(mx):
            for x in range(mx):
                d = FrameCodec._neg_interleave(x, ref, mx)
                assert 0 <= d < mx
                assert FrameCodec._neg_deinterleave(d, ref, mx) == x


def _aq_clip(w, h, n, seed=12):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = (120 + 60 * np.sin(xx / 40 + i * .2)).astype(np.float64)
        y[40:100, 40:120] += rng.normal(0, 40, (60, 80))
        y = y.clip(0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y, u, v))
    return frames


@needs_refdec
@pytest.mark.parametrize("enc_mode,keyint", [(5, 1), (4, 2)])
def test_segmentation_aq_conformance(tmp_path, enc_mode, keyint):
    w, h = 176, 144
    frames = _aq_clip(w, h, 3)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=45,
                        enc_mode=enc_mode, intra_period_length=keyint,
                        hierarchical_levels=2,
                        enable_adaptive_quantization=1)
    path = tmp_path / "seg.ivf"
    encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    refs = ref_decode(path, w, h)
    # streams must actually carry segments
    from svt_av1_tpu.bitstream.headers import parse_frame_header
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")
