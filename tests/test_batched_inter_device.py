"""Device (jitted) vs numpy equivalence for the batched inter decision
program — the check VERDICT r2 flagged as missing.  Integer outputs
(MVs) must match exactly; float cost surfaces may differ in ULPs from
XLA reassociation, so they get the same closeness gate as the intra
test (tests/test_omd.py)."""
import numpy as np
import pytest

from svt_av1_tpu.ops import omd
from svt_av1_tpu.pipeline import batched_inter as bi
from svt_av1_tpu.pipeline.batched_md import default_mode_bits
from svt_av1_tpu.entropy.tables import FrameCdfs

pytest.importorskip("jax")


def _clip(buf_w, buf_h, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:buf_h, 0:buf_w]
    ref = (100 + 60 * np.sin(xx / 13) + 40 * np.cos(yy / 9)
           + rng.integers(-12, 13, (buf_h, buf_w))).clip(0, 255)
    # rigid shift + noise: gives the ME a real field to find
    src = np.roll(ref, (3, -5), axis=(0, 1)) \
        + rng.integers(-4, 5, (buf_h, buf_w))
    return src.clip(0, 255).astype(np.uint8), ref.astype(np.uint8)


def test_inter_maps_device_matches_numpy():
    buf_w = buf_h = 128
    src, ref = _clip(buf_w, buf_h)
    qindex, lam = 60, 900.0
    mode_bits = default_mode_bits(FrameCdfs(qindex))

    host = bi.inter_frame_maps(src, ref, buf_w, buf_h, qindex, lam,
                               mode_bits, 8, np)
    dev = bi.inter_maps_dispatch(src, ref, buf_w, buf_h, qindex, lam,
                                 mode_bits, 8, use_jax=True)
    h_intra, h_inter, (h_mvdy, h_mvdx), h_mvb = host
    d_intra, d_inter, (d_mvdy, d_mvdx), d_mvb = dev

    # integer MV fields: exact
    np.testing.assert_array_equal(np.asarray(h_mvdy), d_mvdy)
    np.testing.assert_array_equal(np.asarray(h_mvdx), d_mvdx)
    np.testing.assert_allclose(np.asarray(h_mvb), d_mvb, atol=1e-4)

    for s in omd.ALL_SHAPES:
        hm, hc = np.asarray(h_intra[s][0]), np.asarray(h_intra[s][1])
        dm, dc = d_intra[s]
        assert (hm == dm).mean() > 0.97, s
        close = np.isclose(hc, dc, rtol=2e-4, atol=2.0).mean()
        assert close > 0.99, (s, close)
        hic = np.asarray(h_inter[s])
        dic = np.asarray(d_inter[s])
        close = np.isclose(hic, dic, rtol=2e-4, atol=2.0).mean()
        assert close > 0.99, ("inter", s, close)
