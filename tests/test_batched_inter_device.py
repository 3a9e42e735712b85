"""Device (jitted) vs numpy equivalence for the batched inter decision
program — the check VERDICT r2 flagged as missing.  Integer outputs
(MVs, selection fields) must match exactly; float cost surfaces may
differ in ULPs from XLA reassociation, so they get the same closeness
gate as the intra test (tests/test_omd.py).  Covers single-reference,
multi-reference and compound-enabled programs."""
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
    past = (100 + 60 * np.sin(xx / 13) + 40 * np.cos(yy / 9)
            + rng.integers(-12, 13, (buf_h, buf_w))).clip(0, 255)
    # the future ref carries its own pattern; the source is the moving
    # midpoint (a cross-fade) so forward, backward AND averaged-compound
    # prediction each win somewhere
    fut = (120 + 70 * np.sin(xx / 7 + 2) + 30 * np.cos(yy / 17)
           + rng.integers(-12, 13, (buf_h, buf_w))).clip(0, 255)
    mid = (np.roll(past, (3, -5), axis=(0, 1)).astype(np.int32)
           + np.roll(fut, (-2, 4), axis=(0, 1)).astype(np.int32) + 1) // 2
    w = xx / max(buf_w - 1, 1)
    src = (np.roll(past, (3, -5), axis=(0, 1)) * (w < 0.33)
           + mid * ((w >= 0.33) & (w < 0.67))
           + np.roll(fut, (-2, 4), axis=(0, 1)) * (w >= 0.67)
           + rng.integers(-2, 3, (buf_h, buf_w))).clip(0, 255)
    return (src.astype(np.uint8), past.astype(np.uint8),
            fut.astype(np.uint8))


def _run_pair(refs, bwd_mask, allow_comp):
    buf_w = buf_h = 128
    src, past, fut = _clip(buf_w, buf_h)
    all_refs = {"past": past, "fut": fut}
    stack = np.stack([all_refs[r] for r in refs])
    qindex, lam = 60, 900.0
    mode_bits = default_mode_bits(FrameCdfs(qindex))

    host = bi.inter_frame_maps(src, stack, buf_w, buf_h, qindex, lam,
                               mode_bits, 8, np, bwd_mask=bwd_mask,
                               allow_compound=allow_comp,
                               pens=bi.selection_pens(qindex, 8))
    dev = bi.inter_maps_dispatch(src, stack, buf_w, buf_h, qindex, lam,
                                 mode_bits, 8, use_jax=True,
                                 bwd_mask=bwd_mask,
                                 allow_compound=allow_comp)
    return host, dev


def _check(host, dev, check_intra=True):
    h_intra, h_inter, h_sf, h_mvb = host
    d_intra, d_inter, d_sf, d_mvb = dev

    # integer selection fields: exact
    for k in bi._SEL_KEYS:
        np.testing.assert_array_equal(np.asarray(h_sf[k]), d_sf[k], k)
    np.testing.assert_allclose(np.asarray(h_mvb), d_mvb, atol=1e-4)

    for s in omd.ALL_SHAPES:
        if check_intra:
            hm, hc = np.asarray(h_intra[s][0]), np.asarray(h_intra[s][1])
            dm, dc = d_intra[s]
            assert (hm == dm).mean() > 0.97, s
            close = np.isclose(hc, dc, rtol=2e-4, atol=2.0).mean()
            assert close > 0.99, (s, close)
        hic = np.asarray(h_inter[s])
        dic = np.asarray(d_inter[s])
        close = np.isclose(hic, dic, rtol=2e-4, atol=2.0).mean()
        assert close > 0.99, ("inter", s, close)


@pytest.mark.slow
def test_inter_maps_device_matches_numpy_single():
    host, dev = _run_pair(("past",), (False,), False)
    _check(host, dev)
    # single-ref plans select candidate 0 everywhere
    assert not np.asarray(dev[2]["sel"]).any()


@pytest.mark.slow
def test_inter_maps_device_matches_numpy_multiref():
    host, dev = _run_pair(("past", "fut"), (False, True), False)
    _check(host, dev, check_intra=False)
    # both references must win somewhere on this clip
    sel = np.asarray(dev[2]["sel"])
    assert (sel == 0).any() and (sel == 1).any()


@pytest.mark.slow
def test_inter_maps_device_matches_numpy_compound():
    host, dev = _run_pair(("past", "fut"), (False, True), True)
    _check(host, dev, check_intra=False)
    sel = np.asarray(dev[2]["sel"])
    assert (sel == 2).any(), "compound never selected"
    # compound units carry a second MV and the fwd/bwd pair indices
    comp = sel == 2
    assert np.asarray(dev[2]["fwd_i"])[comp].max() == 0
    assert np.asarray(dev[2]["bwd_i"])[comp].min() == 1
