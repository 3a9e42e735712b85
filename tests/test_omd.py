"""Open-loop batched mode decision (ops/omd.py, pipeline/batched_md.py).

Covers: batched predictors bit-match the per-block normative predictor
(edge filter off, full availability — the PD0 contract), the jax and
numpy paths of the decision pass agree on ranking structure, and the
frame plan replays into a conformant stream.
"""
import os
import subprocess

import numpy as np
import pytest

from svt_av1_tpu.ops import omd
from svt_av1_tpu.ops import intra as iops
from test_e2e import synthetic_clip, ref_decode, REF_DECAPP

needs_refdec = pytest.mark.skipif(not REF_DECAPP.exists(),
                                  reason="reference DecApp not built")


@pytest.mark.parametrize("shape", omd.ALL_SHAPES)
def test_batched_predictors_bit_match(shape):
    w, h = shape
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, (96, 128)).astype(np.int32)
    padded = omd.pad_plane(plane)
    above, left = omd.grid_edges(padded, w, h, 128, 96)
    nr, nc = above.shape[:2]
    ts = omd.txsize_for(w, h)
    for mode in omd.ALL_MODES:
        pred = omd.predict_mode(mode, above, left, w, h)
        for (r, c) in [(1, 1), (nr - 1, nc - 1), (2, 1)]:
            y0, x0 = r * h, c * w
            ab = padded[omd.PAD + y0 - 1,
                        omd.PAD + x0: omd.PAD + x0 + w + h]
            lf = padded[omd.PAD + y0: omd.PAD + y0 + w + h,
                        omd.PAD + x0 - 1]
            tl = int(padded[omd.PAD + y0 - 1, omd.PAD + x0 - 1])
            ref = iops.predict_intra_block(
                mode, 0, ts, ab, lf, tl, w, h, h, w,
                filt_type=0, disable_edge_filter=True)
            assert np.array_equal(pred[r, c], ref), (shape, mode, r, c)


@pytest.mark.slow
def test_numpy_jax_paths_agree():
    """The numpy reference path and the jitted path must produce the
    same decisions (identical integer predictions; float cost math may
    differ in summation order, so compare the chosen modes on content
    with clear winners)."""
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:96, 0:128]
    plane = (120 + 80 * np.sin(xx / 11) + 40 * np.cos(yy / 7)
             ).astype(np.int32)
    mb = tuple([2.0] * 13)
    a = omd.intra_decision_frame(plane, 128, 96, 60, 100.0, mb,
                                 use_jax=False)
    b = omd.intra_decision_frame(plane, 128, 96, 60, 100.0, mb,
                                 use_jax=True)
    for s in omd.ALL_SHAPES:
        ma, ca = a[s]
        mbm, cb = b[s]
        # costs match to float tolerance; modes match except where the
        # two best candidates tie within rounding
        close = np.isclose(ca, cb, rtol=1e-5).mean()
        assert close > 0.99, (s, close)
        assert (ma == mbm).mean() > 0.97, (s, (ma == mbm).mean())


@needs_refdec
def test_batched_decider_conformance(tmp_path):
    """Streams planned by the batched decider decode bit-exactly on the
    reference decoder (syntax legality of the DP plan)."""
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.batched_md import BatchedIntraDecider

    w, h = 176, 144
    frames = synthetic_clip(w, h, 3, seed=9)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40)
    path = str(tmp_path / "omd.ivf")
    encode_ivf(frames, cfg, path, BatchedIntraDecider(use_jax=False))
    ours, _ = decode_ivf(path)
    refs = ref_decode(path, w, h)
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")


@needs_refdec
def test_batched_decider_conformance_device(tmp_path):
    """Same but through the jitted device path (cpu backend in tests)
    with device CDEF enabled — the production configuration."""
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.batched_md import BatchedIntraDecider

    os.environ["SVT_TPU_DEVICE"] = "1"
    try:
        w, h = 64, 64            # small: keeps the CPU-XLA compile cheap
        frames = synthetic_clip(w, h, 2, seed=13)
        cfg = EncoderConfig(source_width=w, source_height=h, qp=36)
        path = str(tmp_path / "omdj.ivf")
        encode_ivf(frames, cfg, path, BatchedIntraDecider(use_jax=True))
        ours, _ = decode_ivf(path)
        refs = ref_decode(path, w, h)
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(o[p], r[p],
                                              err_msg=f"f{i} p{p}")
    finally:
        os.environ["SVT_TPU_DEVICE"] = "0"
