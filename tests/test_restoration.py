"""Loop restoration (Wiener): subexp coding roundtrip, stripe geometry,
and end-to-end conformance with forced-on filtering (the analog of the
reference's selfguided/wiener filter tests + e2e)."""
import numpy as np
import pytest

from svt_av1_tpu.entropy import subexp as se
from svt_av1_tpu.ops import restoration as lr
from svt_av1_tpu.pipeline.frame_codec import SymbolWriter, SymbolReader


def test_subexp_roundtrip_all_tap_ranges():
    for k in range(3):
        lo = lr.WIENER_TAPS_MIN[k]
        hi = lr.WIENER_TAPS_MAX[k] + 1
        kk = lr.WIENER_SUBEXP_K[k]
        for r in range(lo, hi, 3):
            for val in range(lo, hi):
                w = SymbolWriter()
                assert se.code_signed_subexp_ref(w, val, lo, hi, kk, r) == val
                rd = SymbolReader(w.ec.done())
                assert se.code_signed_subexp_ref(rd, None, lo, hi, kk, r) == val


def test_unit_geometry_matches_reference_rules():
    # 288 rows, 128 unit: last unit absorbs remainder < 1.5*size
    assert lr.unit_limits(288, 128) == [(0, 128), (128, 288)]
    assert lr.unit_limits(352, 128) == [(0, 128), (128, 256), (256, 352)]
    assert lr.count_units(288, 128) == 2
    assert lr.count_units(352, 128) == 3
    # vertical spans shift up by the 8px unit offset
    assert lr.unit_limits_vert(288, 128, 0) == [(0, 120), (120, 288)]


def test_stripe_spans():
    # first stripe is 8 shorter; stripes land on 64k-8 boundaries
    assert lr._stripe_spans(0, 144, 0) == [(0, 56), (56, 120), (120, 144)]
    assert lr._stripe_spans(120, 288, 0) == [(120, 184), (184, 248),
                                             (248, 288)]


def test_wiener_stripe_identity_taps():
    # zero side taps -> pure passthrough of the center pixel
    rng = np.random.default_rng(0)
    ext = rng.integers(0, 256, (26, 40)).astype(np.int32)
    out = lr.wiener_stripe_vh(ext, [0, 0, 0], [0, 0, 0], 8)
    assert np.array_equal(out, ext[3:23, 3:37])


@pytest.mark.parametrize("size", [(176, 144), (352, 288)])
def test_lr_forced_e2e_conformance(tmp_path, size):
    import svt_av1_tpu.pipeline.frame_codec as fc
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from test_e2e import ref_decode, REF_DECAPP

    w, h = size
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = [(
        (120 + 50 * np.sin(xx / 9) + rng.integers(-30, 31, (h, w))
         ).clip(0, 255).astype(np.uint8),
        (128 + 30 * np.sin(yy[:h // 2, :w // 2] / 5)).astype(np.uint8),
        (128 - 20 * np.cos(xx[:h // 2, :w // 2] / 7)).astype(np.uint8))]
    orig = fc.FrameCodec.search_lr
    fc.FrameCodec.search_lr = lambda self, lam=0.0: orig(self, 0.0)
    try:
        cfg = EncoderConfig(source_width=w, source_height=h, qp=52,
                            enc_mode=6)
        path = str(tmp_path / "lr.ivf")
        recons = encode_ivf(frames, cfg, path)
        ours, _ = decode_ivf(path)
        for p in range(3):
            np.testing.assert_array_equal(ours[0][p], recons[0][p])
        if REF_DECAPP.exists():
            refs = ref_decode(path, w, h)
            for p in range(3):
                np.testing.assert_array_equal(ours[0][p], refs[0][p])
    finally:
        fc.FrameCodec.search_lr = orig
