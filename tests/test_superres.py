"""Super-resolution: normative upscale vs the C oracle + end-to-end
conformance across denominators (EbSuperRes.c parity)."""
import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_tpu.ops import superres as sr

needs_oracle = pytest.mark.skipif(not oracle.available(),
                                  reason="reference oracle lib not built")


def test_scaled_dim():
    assert sr.scaled_dim(176, 8) == 176
    assert sr.scaled_dim(176, 16) == 88
    assert sr.scaled_dim(176, 12) == 117
    assert sr.scaled_dim(20, 16) == 16        # min-16 clamp


@needs_oracle
@pytest.mark.parametrize("cw,uw", [(88, 176), (156, 176), (117, 176),
                                   (59, 88), (78, 88), (99, 176)])
def test_upscale_matches_reference(cw, uw):
    L = oracle.lib()
    fn = L.upscale_normative_rect
    fn.restype = None
    fn.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 3 \
        + [ctypes.c_void_p] + [ctypes.c_int] * 7
    rng = np.random.default_rng(1)
    h = 8
    buf = np.zeros((h, cw + 16), np.uint8)
    inner = rng.integers(0, 256, (h, cw)).astype(np.uint8)
    buf[:, 8:8 + cw] = inner
    out = np.zeros((h, uw), np.uint8)
    step, x0 = sr._x_params(cw, uw)
    fn(buf.ctypes.data + 8, h, cw, cw + 16, out.ctypes.data, h, uw, uw,
       step, x0, 1, 1)
    got = sr.upscale_plane(inner.astype(np.int32), cw, uw, h)
    assert np.array_equal(got, out.astype(np.int32))


@needs_oracle
@pytest.mark.parametrize("denom", [9, 12, 16])
def test_superres_e2e_conformance(tmp_path, denom):
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from test_e2e import synthetic_clip, ref_decode, REF_DECAPP

    w, h = 176, 144
    frames = synthetic_clip(w, h, 2, seed=4)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40, enc_mode=8,
                        superres_mode=1, superres_denom=denom)
    path = str(tmp_path / "sr.ivf")
    recons = encode_ivf(frames, cfg, path)
    ours, _ = decode_ivf(path)
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")
    if REF_DECAPP.exists():
        refs = ref_decode(path, w, h)
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(o[p], r[p],
                                              err_msg=f"ref f{i} p{p}")


@needs_oracle
@pytest.mark.parametrize("denom", [9, 13, 16])
def test_superres_with_loop_restoration(tmp_path, denom):
    """Superres + Wiener LR together: LR units live in the upscaled
    domain and _code_lr must apply the spec's superres column mapping
    (read_lr numerator/denominator, spec 5.11.57).  ADVICE r1 high."""
    import svt_av1_tpu.pipeline.frame_codec as fc
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from test_e2e import synthetic_clip, ref_decode, REF_DECAPP

    w, h = 176, 144
    frames = synthetic_clip(w, h, 2, seed=11)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=46, enc_mode=6,
                        superres_mode=1, superres_denom=denom)
    # force LR on (lambda 0) so the mapping is exercised even when the
    # filter would not win at the regular lambda
    orig = fc.FrameCodec.search_lr
    fc.FrameCodec.search_lr = lambda self, lam=0.0: orig(self, 0.0)
    try:
        path = str(tmp_path / "srlr.ivf")
        recons = encode_ivf(frames, cfg, path)
    finally:
        fc.FrameCodec.search_lr = orig
    ours, _ = decode_ivf(path)
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")
    if REF_DECAPP.exists():
        refs = ref_decode(path, w, h)
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(o[p], r[p],
                                              err_msg=f"ref f{i} p{p}")
