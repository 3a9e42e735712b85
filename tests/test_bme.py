"""Batched frame ME (ops/bme.py) + the batched inter decider."""
import numpy as np
import pytest

from svt_av1_tpu.ops import bme


def test_translation_recovered():
    """A pure translation within the refinement range is recovered with
    SAD 0 on every block whose reference window is in-frame — including
    the first superblock row/column (edge-window regression)."""
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (192, 256)).astype(np.int32)
    src = np.roll(np.roll(ref, 5, 0), -3, 1)      # mv = (-5, +3)
    out = bme.frame_me(src, ref, np)
    mvr, mvc, sad = (np.asarray(v) for v in out[(16, 16)])
    n_sby, n_sbx = out["grid"]
    zero = sad == 0
    # wrap seams confined to the last +-8px; everything else exact
    assert zero.mean() > 0.6
    ok = (mvr[zero] == -5).all() and (mvc[zero] == 3).all()
    assert ok
    # first SB row/col blocks below the 5px wrap seam must be exact
    # (edge-window regression: negative MVs reachable at the frame edge)
    assert sad[0, 1:, :].max() == 0           # SB (0, 0) sub-rows 1..3
    assert sad[1, 1:, :].max() == 0           # SB (0, 1)


def test_shapes_aggregate_consistency():
    """Aggregated shape SADs at a common offset equal the sum of their
    8x8 children."""
    rng = np.random.default_rng(3)
    wsz = bme.SB + 2 * bme.REFINE_R
    src = rng.integers(0, 256, (64, 64)).astype(np.int32)
    win = rng.integers(0, 256, (wsz, wsz)).astype(np.int32)
    s8 = bme.sad8_surfaces(src[None], win[None], np)
    a16 = bme.aggregate(s8, 2, 2, np)
    manual = (s8[0, 0, 0] + s8[0, 0, 1] + s8[0, 1, 0] + s8[0, 1, 1])
    np.testing.assert_array_equal(a16[0, 0, 0], manual)


def test_inter_decider_e2e_own_decoder(tmp_path):
    """Fast-preset inter path end-to-end against our own decoder (the
    reference cross-check lives in the e2e/tile suites)."""
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.batched_inter import BatchedDecider

    yy, xx = np.mgrid[0:96, 0:128]
    frames = []
    for i in range(4):
        y = (120 + 50 * np.sin((xx - 3 * i) / 9)
             + 40 * np.cos((yy - 2 * i) / 13)).clip(0, 255).astype(np.uint8)
        u = np.full((48, 64), 128, np.uint8)
        v = np.full((48, 64), 120, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=128, source_height=96, qp=40,
                        intra_period_length=-1, hierarchical_levels=0)
    path = str(tmp_path / "bi.ivf")
    recons = encode_ivf(frames, cfg, path, BatchedDecider(use_jax=False))
    ours, _ = decode_ivf(path)
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")
