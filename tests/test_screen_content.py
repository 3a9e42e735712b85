"""Screen-content tools: palette + intra block copy.

Syntax roundtrips, encoder effectiveness on screen content, and
conformance against the reference decoder (analog of the reference's
palette/IBC coverage in its e2e screen-content configs)."""
import subprocess

import numpy as np
import pytest

from svt_av1_tpu.api import Encoder, decode_ivf
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy.tables import FrameCdfs
from svt_av1_tpu.io.ivf import IvfWriter
from svt_av1_tpu.pipeline import frame_codec as fcmod
from svt_av1_tpu.pipeline import palette as pl
from svt_av1_tpu.pipeline.frame_codec import SymbolReader, SymbolWriter
from test_e2e import REF_DECAPP

needs_refdec = pytest.mark.skipif(not REF_DECAPP.exists(),
                                  reason="reference DecApp not built")


def test_palette_colors_roundtrip_fuzz():
    rng = np.random.default_rng(3)
    for trial in range(200):
        n = int(rng.integers(2, 9))
        colors = sorted(rng.choice(256, size=n, replace=False).tolist())
        nc = int(rng.integers(0, 17))
        cache = sorted(rng.choice(256, size=nc, replace=False).tolist())
        w = SymbolWriter()
        pl.write_colors_y(w, cache, colors, 8)
        r = SymbolReader(w.ec.done())
        assert pl.read_colors_y(r, cache, n, 8) == colors, trial


def test_palette_color_map_roundtrip_fuzz():
    rng = np.random.default_rng(5)
    for trial in range(40):
        size = int(rng.integers(2, 9))
        bw = bh = int(rng.choice([8, 16, 32]))
        cmap = rng.integers(0, size, (bh, bw)).astype(np.int32)
        fc, fc2 = FrameCdfs(100), FrameCdfs(100)
        w = SymbolWriter()
        pl.code_color_map(w, fc, cmap.copy(), bw, bh, size, 0, bw, bh)
        r = SymbolReader(w.ec.done())
        got = pl.code_color_map(r, fc2, None, bw, bh, size, 0, bw, bh)
        assert np.array_equal(got, cmap), trial


def _screen_clip(w=256, h=128):
    rng = np.random.default_rng(11)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = np.full((h, w), 200, np.uint8)
    y[(xx // 32 + yy // 32) % 2 == 0] = 60
    for r in range(8, h, 12):
        cols = rng.choice(w, size=40, replace=False)
        y[r:r + 2, cols] = 20
        y[r:r + 2, (cols + 1) % w] = 235
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return [(y, u, v)] * 2


def _tiled_clip(w=512, h=256):
    # Wide enough that legal delay-4 DVs exist: same-row sources must
    # sit >=256 px back (INTRABC_DELAY_PIXELS), so the frame spans 8
    # SB64 columns and 4 SB64 rows.
    rng = np.random.default_rng(4)
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    tile = (120 + 60 * np.sin(xx / 5.7) * np.cos(yy / 4.3)
            + rng.normal(0, 18, (64, 64))).clip(0, 255).astype(np.uint8)
    y = np.tile(tile, (h // 64, w // 64))
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    return [(y, u, v)]


def _encode(frames, w, h, tmp_path, name, **kw):
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        enc_mode=8, intra_period_length=-2, **kw)
    enc = Encoder(cfg)
    pkts = []
    for f in frames:
        pkts += enc.send_picture(f)
    pkts += enc.flush()
    path = tmp_path / name
    with open(path, "wb") as fh:
        wtr = IvfWriter(fh, w, h)
        for i, p in enumerate(pkts):
            wtr.write_frame(p, i)
        wtr.close()
    return path, sum(len(p) for p in pkts)


def _check_ref_decode(path, frames, w, h, tmp_path):
    ours, _ = decode_ivf(str(path))
    yuv = tmp_path / "ref.yuv"
    subprocess.run([str(REF_DECAPP), "-i", str(path), "-o", str(yuv)],
                   check=True, capture_output=True,
                   env={"LD_LIBRARY_PATH": str(REF_DECAPP.parent)})
    data = yuv.read_bytes()
    fsz = w * h * 3 // 2
    for i, o in enumerate(ours):
        raw = np.frombuffer(data[i * fsz:(i + 1) * fsz], np.uint8)
        pls = (raw[:w * h].reshape(h, w),
               raw[w * h:w * h * 5 // 4].reshape(h // 2, w // 2),
               raw[w * h * 5 // 4:].reshape(h // 2, w // 2))
        for pi, (a, b) in enumerate(zip(o, pls)):
            np.testing.assert_array_equal(np.asarray(a, np.uint8), b,
                                          err_msg=f"f{i} p{pi}")


class _Spy:
    def __init__(self):
        self.pal = 0
        self.ibc = 0

    def __enter__(self):
        self._orig = fcmod.FrameCodec._record_mi
        spy = self

        def run(codec, mi_row, mi_col, w4, h4, decision, skip):
            if not codec.io.is_decoder:
                if decision.palette_colors:
                    spy.pal += 1
                if decision.use_intrabc:
                    spy.ibc += 1
            return spy._orig(codec, mi_row, mi_col, w4, h4, decision,
                             skip)

        fcmod.FrameCodec._record_mi = run
        return self

    def __exit__(self, *a):
        fcmod.FrameCodec._record_mi = self._orig


@needs_refdec
def test_palette_wins_on_screen_content(tmp_path):
    frames = _screen_clip()
    _, off = _encode(frames, 256, 128, tmp_path, "off.ivf",
                     screen_content_mode=0)
    with _Spy() as spy:
        path, on = _encode(frames, 256, 128, tmp_path, "on.ivf",
                           screen_content_mode=1)
    assert spy.pal > 20, spy.pal
    assert on < 0.7 * off, (on, off)         # measured: -62%
    _check_ref_decode(path, frames, 256, 128, tmp_path)


@needs_refdec
def test_intrabc_wins_on_repeated_texture(tmp_path):
    frames = _tiled_clip()
    _, off = _encode(frames, 512, 256, tmp_path, "off.ivf",
                     screen_content_mode=0)
    with _Spy() as spy:
        path, on = _encode(frames, 512, 256, tmp_path, "on.ivf",
                           screen_content_mode=1)
    assert spy.ibc > 5, spy.ibc
    assert on < 0.8 * off, (on, off)
    _check_ref_decode(path, frames, 512, 256, tmp_path)


def test_palette_knob_honesty(tmp_path):
    frames = _screen_clip()
    _, a = _encode(frames, 256, 128, tmp_path, "a.ivf",
                   screen_content_mode=1, palette_level=0,
                   intrabc_mode=0)
    _, b = _encode(frames, 256, 128, tmp_path, "b.ivf",
                   screen_content_mode=1)
    assert a != b


def test_dv_valid_enforces_delay_4():
    """is_dv_valid must enforce INTRABC_DELAY_PIXELS=256 = four 64-px
    superblocks of reconstruction delay (EbInterPrediction.h:42)."""
    class _Seq:
        sb_size = 64
        monochrome = False

    fc = fcmod.FrameCodec.__new__(fcmod.FrameCodec)
    fc.seq = _Seq()
    fc.tile = (0, 0, 64, 160)          # 640x256 px tile
    fc.num_planes = 3
    # active block at SB64 row 0, col 8 (x=512); same row.
    mi_row, mi_col = 0, 128            # x = 512 px
    # 192 px back: inside the delay window -> invalid (was accepted
    # when the delay was 1 SB64).
    assert not fc._dv_valid((0, -192 * 8), mi_row, mi_col, 64, 64)
    # 256 px back = exactly 4 SB64s: src index == active - 4 -> still
    # invalid (spec requires strictly more than the delay).
    assert not fc._dv_valid((0, -256 * 8), mi_row, mi_col, 64, 64)
    # 320 px back clears the 4-SB64 delay.
    assert fc._dv_valid((0, -320 * 8), mi_row, mi_col, 64, 64)
    # one SB row up, same column: wavefront makes it legal.
    assert fc._dv_valid((-64 * 8, 0), 16, mi_col, 64, 64)
