"""Self-guided restoration vs the reference C oracle + e2e conformance."""
import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_tpu.ops import restoration as lr

needs_oracle = pytest.mark.skipif(not oracle.available(),
                                  reason="reference oracle lib not built")


def _ref_apply(ext, ep, xqd, bd=8):
    """svt_apply_selfguided_restoration_c on a stripe-extended buffer
    (dat8 points at the interior; the C reads +-3 borders)."""
    L = oracle.lib()
    fn = L.svt_apply_selfguided_restoration_c
    fn.restype = None
    fn.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                   ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
                   ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                   ctypes.c_int, ctypes.c_int]
    h, w = ext.shape[0] - 6, ext.shape[1] - 6
    buf = np.ascontiguousarray(ext.astype(np.uint8))
    dst = np.zeros((h, w), np.uint8)
    xqd_arr = np.array(xqd, np.int32)
    # 2 x RESTORATION_UNITPELS_MAX = 2 * (256*3/2 + 2*3 + 16) *
    # (256*3/2 + 2*3 + 8) ints (EbRestoration.h:83) — flt1 is written at
    # that offset inside tmpbuf
    tmp = np.zeros(2 * (384 + 6 + 16) * (384 + 6 + 8) + 64, np.int32)
    stride = ext.shape[1]
    fn(buf.ctypes.data + 3 * stride + 3, w, h, stride, ep,
       xqd_arr.ctypes.data, dst.ctypes.data, w, tmp.ctypes.data, bd, 0)
    return dst.astype(np.int32)


@needs_oracle
@pytest.mark.parametrize("ep", list(range(16)))
@pytest.mark.parametrize("hw", [(64, 64), (32, 48), (20, 36)])
def test_sgr_matches_oracle(ep, hw):
    h, w = hw
    rng = np.random.default_rng(ep * 7 + h)
    ext = rng.integers(0, 256, (h + 6, w + 6)).astype(np.int32)
    xqd = [int(rng.integers(lr.SGRPROJ_PRJ_MIN0, lr.SGRPROJ_PRJ_MAX0 + 1)),
           int(rng.integers(lr.SGRPROJ_PRJ_MIN1, lr.SGRPROJ_PRJ_MAX1 + 1))]
    params, _, _ = lr._sgr_tables()
    r0, r1 = int(params[ep][0]), int(params[ep][1])
    dgd = ext[3:-3, 3:-3]
    flt0 = lr.sgr_stripe_flt(ext, ep, 0) if r0 else None
    flt1 = lr.sgr_stripe_flt(ext, ep, 1) if r1 else None
    got = lr._sgr_combine(dgd, flt0, flt1, ep, xqd, 8)
    ref = _ref_apply(ext, ep, xqd)
    np.testing.assert_array_equal(got, ref, err_msg=f"ep={ep} hw={hw}")


@needs_oracle
def test_sgr_flat_content():
    ext = np.full((38, 70), 131, np.int32)
    for ep in (0, 10, 14):
        params, _, _ = lr._sgr_tables()
        r0, r1 = int(params[ep][0]), int(params[ep][1])
        dgd = ext[3:-3, 3:-3]
        flt0 = lr.sgr_stripe_flt(ext, ep, 0) if r0 else None
        flt1 = lr.sgr_stripe_flt(ext, ep, 1) if r1 else None
        got = lr._sgr_combine(dgd, flt0, flt1, ep, [-20, 40], 8)
        ref = _ref_apply(ext, ep, [-20, 40])
        np.testing.assert_array_equal(got, ref, err_msg=f"ep={ep}")


@needs_oracle
def test_sgr_e2e_conformance(tmp_path):
    """SGR / switchable restoration streams decode bit-exactly on the
    reference decoder (forced-on LR across several frames)."""
    import svt_av1_tpu.pipeline.frame_codec as fc
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from test_e2e import synthetic_clip, ref_decode, REF_DECAPP

    if not REF_DECAPP.exists():
        pytest.skip("DecApp missing")
    w, h = 176, 144
    frames = synthetic_clip(w, h, 3, seed=31)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=50, enc_mode=6)
    orig = fc.FrameCodec.search_lr
    fc.FrameCodec.search_lr = lambda self, lam=0.0: orig(self, 0.0)
    try:
        path = str(tmp_path / "sgr.ivf")
        encode_ivf(frames, cfg, path)
    finally:
        fc.FrameCodec.search_lr = orig
    ours, _ = decode_ivf(path)
    refs = ref_decode(path, w, h)
    # sanity: at least one SGR unit must actually be in the stream
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")


@needs_oracle
def test_switchable_e2e_conformance(tmp_path):
    """RESTORE_SWITCHABLE: wiener + sgr + none mixed in one plane."""
    import svt_av1_tpu.pipeline.frame_codec as fc
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from test_e2e import synthetic_clip, ref_decode, REF_DECAPP

    if not REF_DECAPP.exists():
        pytest.skip("DecApp missing")
    w, h = 176, 144
    frames = synthetic_clip(w, h, 2, seed=37)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=50, enc_mode=6)
    orig = fc.FrameCodec.search_lr

    def forced(self, lam=0.0):
        used = orig(self, 0.0)
        # force alternating kinds per unit so the plane goes SWITCHABLE
        for p in range(self.num_planes):
            plan = self.lr_plan[p]
            i = 0
            for ur in range(len(plan)):
                for uc in range(len(plan[ur])):
                    if i % 3 == 0:
                        plan[ur][uc] = ("wiener", [3, -7, 15], [3, -7, 15])
                        if p > 0:
                            plan[ur][uc] = ("wiener", [0, -7, 15],
                                            [0, -7, 15])
                    elif i % 3 == 1:
                        plan[ur][uc] = ("sgr", 4, [0, 47])
                    else:
                        plan[ur][uc] = None
                    i += 1
        self.fh.lr_type = (lr.RESTORE_SWITCHABLE,) * 3
        return True

    fc.FrameCodec.search_lr = forced
    try:
        path = str(tmp_path / "sw.ivf")
        encode_ivf(frames, cfg, path)
    finally:
        fc.FrameCodec.search_lr = orig
    ours, _ = decode_ivf(path)
    refs = ref_decode(path, w, h)
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")
