"""Compound (jnt) convolve vs the reference C kernels
(svt_av1_jnt_convolve_{2d,x,y,2d_copy}_c, EbInterPrediction.c:552+)."""
import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_tpu.ops import inter as I

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference oracle lib not built")


class InterpFilterParams(ctypes.Structure):
    _fields_ = [("filter_ptr", ctypes.c_void_p), ("taps", ctypes.c_uint16),
                ("subpel_shifts", ctypes.c_uint16),
                ("interp_filter", ctypes.c_int)]


class ConvolveParams(ctypes.Structure):
    _fields_ = [("ref", ctypes.c_int32), ("do_average", ctypes.c_int32),
                ("dst", ctypes.c_void_p), ("dst_stride", ctypes.c_int32),
                ("round_0", ctypes.c_int32), ("round_1", ctypes.c_int32),
                ("plane", ctypes.c_int32), ("is_compound", ctypes.c_int32),
                ("use_jnt_comp_avg", ctypes.c_int32),
                ("fwd_offset", ctypes.c_int32), ("bck_offset", ctypes.c_int32),
                ("use_dist_wtd_comp_avg", ctypes.c_int32)]


def _fns():
    L = oracle.lib()
    gp = L.av1_get_interp_filter_params_with_block_size
    gp.restype = InterpFilterParams
    gp.argtypes = [ctypes.c_int, ctypes.c_int32]
    out = {}
    for name in ("2d", "x", "y", "2d_copy"):
        fn = getattr(L, f"svt_av1_jnt_convolve_{name}_c")
        fn.restype = None
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
                       ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                       ctypes.POINTER(InterpFilterParams),
                       ctypes.POINTER(InterpFilterParams),
                       ctypes.c_int32, ctypes.c_int32,
                       ctypes.POINTER(ConvolveParams)]
        out[name] = fn
    return gp, out


def ref_compound(ref0, ref1, x0, y0, x1, y1, w, h, sx, sy):
    """Reference two-pass compound average via the jnt C kernels."""
    gp, fns = _fns()
    variant = ("2d" if sx and sy else
               "x" if sx else "y" if sy else "2d_copy")
    fn = fns[variant]
    fp = gp(0, w)                        # REGULAR filter
    dst_conv = np.zeros((h, w), np.uint16)
    out = np.zeros((h, w), np.uint8)
    for i, (refp, px, py) in enumerate(((ref0, x0, y0), (ref1, x1, y1))):
        cp = ConvolveParams(
            ref=i, do_average=i, dst=dst_conv.ctypes.data, dst_stride=w,
            round_0=3, round_1=7, plane=0, is_compound=1,
            use_jnt_comp_avg=0, fwd_offset=0, bck_offset=0,
            use_dist_wtd_comp_avg=0)
        src_ptr = refp.ctypes.data + py * refp.shape[1] + px
        fn(src_ptr, refp.shape[1], out.ctypes.data, w, w, h,
           ctypes.byref(fp), ctypes.byref(fp), sx, sy, ctypes.byref(cp))
    return out


@pytest.mark.parametrize("sx,sy", [(0, 0), (5, 0), (0, 9), (7, 3)])
@pytest.mark.parametrize("w,h", [(8, 8), (16, 8), (4, 4), (32, 32)])
def test_jnt_convolve_matches_reference(sx, sy, w, h):
    rng = np.random.default_rng(3)
    ref0 = np.ascontiguousarray(rng.integers(0, 256, (h + 16, w + 16)),
                                dtype=np.uint8)
    ref1 = np.ascontiguousarray(rng.integers(0, 256, (h + 16, w + 16)),
                                dtype=np.uint8)
    x0, y0, x1, y1 = 5, 6, 7, 4
    want = ref_compound(ref0, ref1, x0, y0, x1, y1, w, h, sx, sy)
    b0 = I.jnt_convolve(ref0.astype(np.int32), x0, y0, w, h, sx, sy)
    b1 = I.jnt_convolve(ref1.astype(np.int32), x1, y1, w, h, sx, sy)
    got = I.jnt_average(b0, b1)
    assert np.array_equal(got, want.astype(np.int32)), (sx, sy, w, h)
