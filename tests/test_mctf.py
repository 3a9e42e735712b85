"""MCTF (alt-ref temporal filtering): weighting behavior + denoise
effect (EbTemporalFiltering.c planewise analog)."""
import numpy as np

from svt_av1_tpu.pipeline import mctf


def test_noise_estimator_monotone():
    rng = np.random.default_rng(0)
    base = np.full((64, 64), 128.0)
    lo = (base + rng.normal(0, 2, base.shape)).clip(0, 255).astype(np.uint8)
    hi = (base + rng.normal(0, 12, base.shape)).clip(0, 255).astype(np.uint8)
    assert mctf.estimate_noise(hi) > mctf.estimate_noise(lo) > 0


def test_static_noisy_frames_average_toward_mean():
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:64, 0:64]
    clean = (100 + 60 * np.sin(xx / 7) + 40 * np.cos(yy / 9)).clip(0, 255)
    mk = lambda: ((clean + rng.normal(0, 8, clean.shape)).clip(0, 255)
                  .astype(np.uint8))
    c = (mk(), np.full((32, 32), 128, np.uint8),
         np.full((32, 32), 128, np.uint8))
    neighbors = [(mk(), c[1], c[2]) for _ in range(4)]
    out = mctf.temporal_filter(c, neighbors, qp=40)
    err_in = np.abs(c[0].astype(float) - clean).mean()
    err_out = np.abs(out[0].astype(float) - clean).mean()
    assert err_out < err_in * 0.8, (err_in, err_out)


def test_mismatched_neighbor_gets_little_weight():
    rng = np.random.default_rng(2)
    c_y = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    c = (c_y, np.full((32, 32), 128, np.uint8),
         np.full((32, 32), 128, np.uint8))
    unrelated = (rng.integers(0, 255, (64, 64)).astype(np.uint8), c[1], c[2])
    out = mctf.temporal_filter(c, [unrelated], qp=40)
    # center must dominate: output stays close to the center frame
    assert np.abs(out[0].astype(int) - c_y.astype(int)).mean() < 8
