"""Frame-level interpolation-filter search + syntax conformance.

The encoder's 3-way search (batched_inter._select_interp_filter) picks
REGULAR/SMOOTH/SHARP per inter frame (the frame-level slice of the
reference's per-block interpolation_filter_search,
EbEncInterPrediction.c:3047); the frame header codes it in
read_interpolation_filter and every MC path — python replay, native C
coder, decoder — must interpolate with the same taps.
"""
import numpy as np
import pytest

from svt_av1_tpu.api import Decoder, decode_ivf, encode_ivf
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.batched_inter import BatchedDecider

from test_e2e import REF_DECAPP, ref_decode


def moving_clip(w, h, n, seed=3):
    """Half-pel-ish panning content: forces fractional MVs."""
    rng = np.random.default_rng(seed)
    big = (120 + 60 * np.sin(np.arange(h * 2)[:, None] / 11.0)
           + 55 * np.cos(np.arange(w * 2)[None, :] / 7.0)
           + rng.normal(0, 6, (h * 2, w * 2))).clip(0, 255)
    frames = []
    for i in range(n):
        # 1.5 px/frame pan -> persistent half-pel phases
        oy, ox = int(i * 1.5), int(i * 2.5)
        fy = big[oy:oy + h, ox:ox + w]
        frames.append((fy.astype(np.uint8),
                       np.full((h // 2, w // 2), 120, np.uint8),
                       np.full((h // 2, w // 2), 130, np.uint8)))
    return frames


@pytest.mark.parametrize("flt", [0, 1, 2])
def test_forced_filter_roundtrip(tmp_path, monkeypatch, flt):
    """Each InterpFilter kind codes + self-decodes bit-exactly and the
    header carries the kind."""
    monkeypatch.setattr(BatchedDecider, "_select_interp_filter",
                        lambda self, codec, sf, names: flt)
    frames = moving_clip(192, 128, 6)
    cfg = EncoderConfig(source_width=192, source_height=128, qp=40,
                        enc_mode=8, intra_period_length=6)
    path = tmp_path / f"interp{flt}.ivf"
    recons = encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p],
                                          err_msg=f"frame {i} plane {p}")
    if REF_DECAPP.exists():
        refs = ref_decode(path, 192, 128)
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(
                    o[p], r[p], err_msg=f"ref frame {i} plane {p}")


def test_search_picks_and_signals(tmp_path):
    """The unforced search runs and whatever it picks round-trips; the
    decoder sees the signaled kind on at least every inter frame."""
    frames = moving_clip(192, 128, 6)
    cfg = EncoderConfig(source_width=192, source_height=128, qp=40,
                        enc_mode=8, intra_period_length=6)
    path = tmp_path / "interp_auto.ivf"
    recons = encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p],
                                          err_msg=f"frame {i} plane {p}")
