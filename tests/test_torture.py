"""Cross-feature conformance torture: every major tool active in one
stream (the analog of the reference's long-run e2e configs)."""
import numpy as np
import pytest

from svt_av1_tpu.api import encode_ivf, decode_ivf
from svt_av1_tpu.config import EncoderConfig, RateControlMode
from test_e2e import ref_decode, REF_DECAPP

needs_refdec = pytest.mark.skipif(not REF_DECAPP.exists(),
                                  reason="reference DecApp not built")


def _clip(n=11, w=176, h=144):
    rng = np.random.default_rng(17)
    yy, xx = np.mgrid[0:h, 0:w]
    base = rng.integers(0, 255, (h * 2, w * 2)).astype(np.uint8)
    out = []
    for i in range(n):
        y = (0.6 * np.roll(np.roll(base, 2 * i, 0), 3 * i, 1)[:h, :w]
             + 0.4 * (120 + 70 * np.sin(xx / 15 + i * .3))
             ).clip(0, 255).astype(np.uint8)
        u = (128 + 30 * np.sin(yy[:h // 2, :w // 2] / 5 + i * .2)
             ).astype(np.uint8)
        v = (128 - 25 * np.cos(xx[:h // 2, :w // 2] / 9)).astype(np.uint8)
        out.append((y, u, v))
    return out


@pytest.mark.slow
@needs_refdec
def test_all_features_8bit(tmp_path):
    frames = _clip()
    cfg = EncoderConfig(
        source_width=176, source_height=144, qp=44, enc_mode=6,
        intra_period_length=7, hierarchical_levels=3,
        rate_control_mode=RateControlMode.VBR, target_bit_rate=500_000,
        frame_rate=30, film_grain_denoise_strength=6, tf_level=1)
    path = str(tmp_path / "t.ivf")
    encode_ivf(frames, cfg, path)
    ours, _ = decode_ivf(path)
    refs = ref_decode(path, 176, 144)
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p],
                                          err_msg=f"f{i} p{p}")


@pytest.mark.slow
@needs_refdec
def test_all_features_10bit(tmp_path):
    frames = [tuple((p.astype(np.uint16) << 2) for p in f)
              for f in _clip(7)]
    cfg = EncoderConfig(source_width=176, source_height=144, qp=44,
                        enc_mode=6, encoder_bit_depth=10,
                        intra_period_length=-1, hierarchical_levels=2)
    path = str(tmp_path / "t10.ivf")
    encode_ivf(frames, cfg, path)
    ours, _ = decode_ivf(path)
    import os
    import subprocess
    env = dict(os.environ, LD_LIBRARY_PATH=str(REF_DECAPP.parent))
    out = str(tmp_path / "t10.yuv")
    subprocess.run([str(REF_DECAPP), "-i", path, "-o", out],
                   env=env, check=True, capture_output=True, timeout=300)
    data = open(out, "rb").read()
    w, h = 176, 144
    fsz = w * h * 3                      # bytes: Y + U + V at 2 B/px
    for i in range(len(ours)):
        off = i * fsz
        ry = np.frombuffer(data[off:off + w * h * 2],
                           np.uint16).reshape(h, w)
        np.testing.assert_array_equal(ours[i][0], ry, err_msg=f"f{i} y")
        off += w * h * 2
        cw, chh = w // 2, h // 2
        for p, name in ((1, "u"), (2, "v")):
            rc = np.frombuffer(data[off:off + cw * chh * 2],
                               np.uint16).reshape(chh, cw)
            np.testing.assert_array_equal(ours[i][p], rc,
                                          err_msg=f"f{i} {name}")
            off += cw * chh * 2
