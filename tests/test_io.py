"""Container and frame I/O tests (Y4M, raw YUV, IVF)."""
import io
from fractions import Fraction

import numpy as np

from svt_av1_tpu.io import IvfReader, IvfWriter, Y4MReader, Y4MWriter
from svt_av1_tpu.io.y4m import VideoInfo, read_yuv_frames


def _rand_frame(rng, w, h, depth=8):
    dt = np.uint8 if depth == 8 else np.uint16
    hi = 256 if depth == 8 else 1024
    y = rng.integers(0, hi, size=(h, w)).astype(dt)
    u = rng.integers(0, hi, size=(h // 2, w // 2)).astype(dt)
    v = rng.integers(0, hi, size=(h // 2, w // 2)).astype(dt)
    return y, u, v


def test_y4m_roundtrip_8bit():
    rng = np.random.default_rng(0)
    info = VideoInfo(32, 16, Fraction(30, 1), 8, "420")
    frames = [_rand_frame(rng, 32, 16) for _ in range(3)]
    buf = io.BytesIO()
    w = Y4MWriter(buf, info)
    for f in frames:
        w.write(f)
    buf.seek(0)
    r = Y4MReader(buf)
    assert r.info.width == 32 and r.info.height == 16
    assert r.info.frame_rate == Fraction(30, 1)
    got = list(r)
    assert len(got) == 3
    for (gy, gu, gv), (y, u, v) in zip(got, frames):
        np.testing.assert_array_equal(gy, y)
        np.testing.assert_array_equal(gu, u)
        np.testing.assert_array_equal(gv, v)


def test_y4m_roundtrip_10bit():
    rng = np.random.default_rng(1)
    info = VideoInfo(16, 8, Fraction(24000, 1001), 10, "420")
    frames = [_rand_frame(rng, 16, 8, 10)]
    buf = io.BytesIO()
    w = Y4MWriter(buf, info)
    for f in frames:
        w.write(f)
    buf.seek(0)
    r = Y4MReader(buf)
    assert r.info.bit_depth == 10
    got = next(iter(r))
    np.testing.assert_array_equal(got[0], frames[0][0])


def test_raw_yuv_reader(tmp_path):
    rng = np.random.default_rng(2)
    info = VideoInfo(16, 16, Fraction(30, 1), 8, "420")
    frames = [_rand_frame(rng, 16, 16) for _ in range(2)]
    p = tmp_path / "clip.yuv"
    with open(p, "wb") as f:
        for fr in frames:
            for plane in fr:
                f.write(plane.tobytes())
    got = read_yuv_frames(str(p), info)
    assert len(got) == 2
    np.testing.assert_array_equal(got[1][2], frames[1][2])


def test_ivf_roundtrip(tmp_path):
    p = tmp_path / "out.ivf"
    payloads = [b"\x12" * 10, b"frame2", b"x" * 1000]
    with IvfWriter(str(p), 352, 288, Fraction(30, 1)) as w:
        for i, pl in enumerate(payloads):
            w.write_frame(pl, pts=i)
    r = IvfReader(str(p))
    assert (r.width, r.height) == (352, 288)
    assert r.frame_count == 3
    got = list(r)
    assert [g[0] for g in got] == payloads
    assert [g[1] for g in got] == [0, 1, 2]
    r.close()
