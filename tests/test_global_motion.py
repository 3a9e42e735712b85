"""Global motion: header syntax round-trip and end-to-end conformance
with an estimated ROTZOOM model (EbGlobalMotionEstimation.c /
read_global_motion_params parity)."""
import numpy as np
import pytest

from svt_av1_tpu.api import encode_ivf, decode_ivf
from svt_av1_tpu.bitstream import headers as H
from svt_av1_tpu.bitstream.bits import BitWriter, BitReader
from svt_av1_tpu.config import EncoderConfig
from test_e2e import ref_decode, REF_DECAPP

needs_refdec = pytest.mark.skipif(not REF_DECAPP.exists(),
                                  reason="reference DecApp not built")


def test_gm_header_roundtrip():
    one = 1 << 16
    cases = [
        (H.GM_IDENTITY, H.GM_IDENTITY_MAT),
        (H.GM_TRANSLATION, (5 << 14, -(3 << 14), one, 0, 0, one)),
        (H.GM_ROTZOOM, ((7 << 10), -(2 << 10), one + (25 << 1), (13 << 1),
                        -(13 << 1), one + (25 << 1))),
        (H.GM_AFFINE, ((1 << 10), (2 << 10), one + (10 << 1), (4 << 1),
                       (6 << 1), one - (8 << 1))),
    ]
    gm = tuple(cases + [(H.GM_IDENTITY, H.GM_IDENTITY_MAT)] * 3)

    class FH:
        global_motion = gm

    w = BitWriter()
    H._write_global_motion(w, FH)
    w.byte_align()
    r = BitReader(w.bytes())

    class FH2:
        global_motion = ()

    H._parse_global_motion(r, FH2)
    for a, b in zip(gm, FH2.global_motion):
        assert a[0] == b[0] and tuple(a[1]) == tuple(b[1])


def _pan_clip(w, h, n, dx=3, dy=1, seed=9):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h * 3, w * 3)).astype(np.float32)
    # smooth so block ME locks onto the pan
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), ax, base)
    base = base.astype(np.uint8)
    frames = []
    for i in range(n):
        y = base[h + dy * i:h + dy * i + h, w + dx * i:w + dx * i + w].copy()
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y, u, v))
    return frames


@needs_refdec
def test_gm_pan_conformance(tmp_path):
    """Panning clip: the encoder estimates and signals a global model;
    GLOBALMV blocks (warp MC where eligible) decode bit-exactly on the
    reference decoder."""
    W, Hh = 176, 144
    frames = _pan_clip(W, Hh, 4)
    cfg = EncoderConfig(source_width=W, source_height=Hh, qp=40,
                        enc_mode=5, intra_period_length=-1,
                        hierarchical_levels=0, pred_structure=2)
    path = tmp_path / "gm.ivf"
    # a global model must actually be signaled for this test to mean
    # anything
    import svt_av1_tpu.pipeline.global_motion as G
    est = []
    orig = G.estimate_rotzoom
    G.estimate_rotzoom = lambda s_, r_: est.append(orig(s_, r_)) or est[-1]
    try:
        encode_ivf(frames, cfg, str(path))
    finally:
        G.estimate_rotzoom = orig
    assert any(e is not None for e in est), "no global model estimated"
    ours, _ = decode_ivf(str(path))
    refs = ref_decode(path, W, Hh)
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")
