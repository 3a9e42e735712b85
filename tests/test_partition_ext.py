"""Extended partition/TX-space conformance: 64-px coding blocks, AB and
4-way partition shapes, and intra TX size selection (TX_MODE_SELECT) —
all verified bit-exact against the reference decoder (the analog of the
reference's e2e conformance runs over EbEncDecProcess PD passes and
read_tx_size/parse_partition)."""
import numpy as np
import pytest

from svt_av1_tpu.api import encode_ivf, decode_ivf
from svt_av1_tpu.config import EncoderConfig
from test_e2e import ref_decode, REF_DECAPP

needs_refdec = pytest.mark.skipif(not REF_DECAPP.exists(),
                                  reason="reference DecApp not built")


def _mixed_clip(w, h, n, seed=5):
    """Smooth gradients (64x64 NONE territory) + textured patches
    (small-block / split-tx territory)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = (120 + 60 * np.sin(xx / 90 + i * .2) + 40 * np.cos(yy / 70)
             ).clip(0, 255).astype(np.uint8)
        y[:64, :64] = rng.integers(0, 255, (64, 64))
        for _ in range(6):
            px, py = rng.integers(0, w - 16), rng.integers(0, h - 16)
            y[py:py + 16, px:px + 16] = rng.integers(0, 255, (16, 16))
        u = (128 + 20 * np.sin(yy[:h // 2, :w // 2] / 40)).astype(np.uint8)
        v = (128 - 20 * np.cos(xx[:h // 2, :w // 2] / 40)).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _assert_conformant(frames, cfg, path, w, h):
    encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    refs = ref_decode(path, w, h)
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")
    return ours


@needs_refdec
@pytest.mark.parametrize("keyint", [1, 3])
def test_64px_blocks_conformance(tmp_path, keyint):
    """64x64 / 64x32 / 32x64 coding blocks (TX_64 coefficient rules)."""
    w, h = 256, 192
    frames = _mixed_clip(w, h, 3)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=50, enc_mode=4,
                        intra_period_length=keyint, hierarchical_levels=2)
    _assert_conformant(frames, cfg, tmp_path / "b64.ivf", w, h)


@needs_refdec
def test_tx_select_and_ab_partitions_conformance(tmp_path):
    """TX_MODE_SELECT intra tx depths + AB/4-way partition shapes in one
    stream (key + inter frames)."""
    w, h = 128, 96
    frames = _mixed_clip(w, h, 3, seed=11)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=35, enc_mode=3,
                        intra_period_length=2, hierarchical_levels=2)
    _assert_conformant(frames, cfg, tmp_path / "txsel.ivf", w, h)
