"""Warp filter bit-exactness vs the reference svt_av1_warp_affine_c and
svt_get_shear_params (EbWarpedMotion.c)."""
import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_tpu.ops import warp

needs_oracle = pytest.mark.skipif(not oracle.available(),
                                  reason="oracle library not built")

U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


class _ConvolveParams(ctypes.Structure):
    _fields_ = [("ref", ctypes.c_int32),
                ("do_average", ctypes.c_int32),
                ("dst", ctypes.c_void_p),
                ("dst_stride", ctypes.c_int32),
                ("round_0", ctypes.c_int32),
                ("round_1", ctypes.c_int32),
                ("plane", ctypes.c_int32),
                ("is_compound", ctypes.c_int32),
                ("use_jnt_comp_avg", ctypes.c_int32),
                ("fwd_offset", ctypes.c_int32),
                ("bck_offset", ctypes.c_int32)]


def _ref_warp(mat, ref, p_col, p_row, pw, ph, sub_x, sub_y, shear):
    L = oracle.lib()
    fn = L.svt_av1_warp_affine_c
    fn.restype = None
    fn.argtypes = [I32P, U8P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                   U8P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                   ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                   ctypes.POINTER(_ConvolveParams),
                   ctypes.c_int16, ctypes.c_int16, ctypes.c_int16,
                   ctypes.c_int16]
    h, w = ref.shape
    pred = np.zeros((ph, pw), np.uint8)
    cp = _ConvolveParams(do_average=0, dst=None, dst_stride=0, round_0=3,
                         round_1=11, plane=0, is_compound=0,
                         use_jnt_comp_avg=0, fwd_offset=0, bck_offset=0)
    a, b, g, d = shear
    fn(np.asarray(mat, np.int32), np.ascontiguousarray(ref, np.uint8),
       w, h, w, pred.reshape(-1), p_col, p_row, pw, ph, pw,
       sub_x, sub_y, ctypes.byref(cp), a, b, g, d)
    return pred.astype(np.int32)


def _rand_model(rng, kind="rotzoom"):
    one = 1 << warp.WARPEDMODEL_PREC_BITS
    while True:
        if kind == "translation":
            mat = [int(rng.integers(-(1 << 18), 1 << 18)) for _ in range(2)]
            mat += [one, 0, 0, one, 0, 0]
        elif kind == "rotzoom":
            a = one + int(rng.integers(-800, 800))
            b = int(rng.integers(-700, 700))
            mat = [int(rng.integers(-(1 << 18), 1 << 18)),
                   int(rng.integers(-(1 << 18), 1 << 18)),
                   a, b, -b, a, 0, 0]
        else:
            mat = [int(rng.integers(-(1 << 18), 1 << 18)),
                   int(rng.integers(-(1 << 18), 1 << 18)),
                   one + int(rng.integers(-800, 800)),
                   int(rng.integers(-600, 600)),
                   int(rng.integers(-600, 600)),
                   one + int(rng.integers(-800, 800)), 0, 0]
        if warp.get_shear_params(mat) is not None:
            return mat


@needs_oracle
@pytest.mark.parametrize("kind", ["translation", "rotzoom", "affine"])
@pytest.mark.parametrize("sub", [(0, 0), (1, 1)])
def test_warp_affine_matches_reference(kind, sub):
    rng = np.random.default_rng(
        ["translation", "rotzoom", "affine"].index(kind) * 7
        + sub[0] * 2 + sub[1])
    ref = rng.integers(0, 256, (96, 128)).astype(np.uint8)
    for trial in range(6):
        mat = _rand_model(rng, kind)
        shear = warp.get_shear_params(mat)
        pw, ph = [(8, 8), (16, 16), (32, 16), (8, 32)][trial % 4]
        p_col = int(rng.integers(0, 128 // (1 << sub[0]) - pw))
        p_row = int(rng.integers(0, 96 // (1 << sub[1]) - ph))
        got = warp.warp_affine(mat, ref.astype(np.int32), p_col, p_row,
                               pw, ph, sub[0], sub[1], *shear)
        want = _ref_warp(mat, ref, p_col, p_row, pw, ph, sub[0], sub[1],
                         shear)
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"{kind} sub={sub} t{trial}")


@needs_oracle
def test_shear_params_match_reference():
    L = oracle.lib()

    class _Wm(ctypes.Structure):
        _fields_ = [("wmtype", ctypes.c_int),
                    ("wmmat", ctypes.c_int32 * 8),
                    ("alpha", ctypes.c_int16), ("beta", ctypes.c_int16),
                    ("gamma", ctypes.c_int16), ("delta", ctypes.c_int16),
                    ("invalid", ctypes.c_int8)]

    fn = L.svt_get_shear_params
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.POINTER(_Wm)]
    rng = np.random.default_rng(3)
    checked = 0
    for _ in range(200):
        one = 1 << warp.WARPEDMODEL_PREC_BITS
        mat = [int(rng.integers(-(1 << 18), 1 << 18)),
               int(rng.integers(-(1 << 18), 1 << 18)),
               one + int(rng.integers(-3000, 3000)),
               int(rng.integers(-2500, 2500)),
               int(rng.integers(-2500, 2500)),
               one + int(rng.integers(-3000, 3000)), 0, 0]
        wm = _Wm()
        for i, v in enumerate(mat):
            wm.wmmat[i] = v
        ok_ref = fn(ctypes.byref(wm))
        got = warp.get_shear_params(mat)
        assert (got is not None) == bool(ok_ref), mat
        if got is not None:
            assert got == (wm.alpha, wm.beta, wm.gamma, wm.delta), mat
            checked += 1
    assert checked > 20


@needs_oracle
def test_find_projection_matches_reference():
    """find_affine_int + shear validation vs svt_find_projection."""
    L = oracle.lib()

    class _Wm(ctypes.Structure):
        _fields_ = [("wmtype", ctypes.c_int),
                    ("wmmat", ctypes.c_int32 * 8),
                    ("alpha", ctypes.c_int16), ("beta", ctypes.c_int16),
                    ("gamma", ctypes.c_int16), ("delta", ctypes.c_int16),
                    ("invalid", ctypes.c_int8)]

    I32A = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    fn = L.svt_find_projection
    fn.restype = ctypes.c_ubyte
    fn.argtypes = [ctypes.c_int, I32A, I32A, ctypes.c_int, ctypes.c_int,
                   ctypes.c_int, ctypes.POINTER(_Wm), ctypes.c_int,
                   ctypes.c_int]
    # BlockSize enum value for 16x16 is 6
    rng = np.random.default_rng(5)
    checked = 0
    for _ in range(300):
        n = int(rng.integers(1, 9))
        mi_row, mi_col = int(rng.integers(2, 30)), int(rng.integers(2, 30))
        bw = bh = 16
        cx, cy = mi_col * 4 + bw // 2 - 1, mi_row * 4 + bh // 2 - 1
        pts = np.zeros(16, np.int32)
        ptsr = np.zeros(16, np.int32)
        for i in range(n):
            x = (cx + int(rng.integers(-24, 24))) * 8
            y = (cy + int(rng.integers(-24, 24))) * 8
            pts[2 * i], pts[2 * i + 1] = x, y
            ptsr[2 * i] = x + int(rng.integers(-100, 100))
            ptsr[2 * i + 1] = y + int(rng.integers(-100, 100))
        mvy, mvx = int(rng.integers(-64, 64)) * 2, \
            int(rng.integers(-64, 64)) * 2
        wm = _Wm()
        wm.wmtype = 2
        bad = fn(n, pts.copy(), ptsr.copy(), 6, mvy, mvx,
                 ctypes.byref(wm), mi_row, mi_col)
        got = warp.find_projection(n, pts.tolist(), ptsr.tolist(),
                                   bw, bh, mvy, mvx, mi_row, mi_col)
        assert (got is None) == bool(bad), (n, mvy, mvx)
        if got is not None:
            assert tuple(got) == tuple(wm.wmmat[:6]), \
                (got, list(wm.wmmat[:6]))
            checked += 1
    assert checked > 50
