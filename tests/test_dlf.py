"""Deblocking filter kernel tests vs the reference oracle (analog of
DeblockTest.cc): our vectorized edge filters == svt_aom_lpf_*_c."""
import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_tpu.ops import dlf

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="no oracle lib")

U8P = ctypes.POINTER(ctypes.c_uint8)


def _thr(level, sharpness=0):
    bl, lim, hev = dlf._thresholds(level, sharpness)
    mk = lambda v: np.full(16, v, np.uint8)
    return mk(bl), mk(lim), mk(hev), (int(bl), int(lim), int(hev))


def _ptr(a, off=0):
    return ctypes.cast(a.ctypes.data + off, U8P)


@needs_oracle
@pytest.mark.parametrize("size", [4, 6, 8, 14])
@pytest.mark.parametrize("level", [3, 15, 35, 63])
def test_vertical_filters_match(size, level):
    L = oracle.lib()
    fn = getattr(L, f"svt_aom_lpf_vertical_{size}_c")
    fn.restype = None
    fn.argtypes = [U8P, ctypes.c_int32, U8P, U8P, U8P]
    blv, limv, hevv, (bl, lim, hev) = _thr(level)
    rng = np.random.default_rng(size * 100 + level)
    for trial in range(16):
        # 4 rows, 32 cols, edge at col 16
        buf = rng.integers(0, 256, size=(4, 32)).astype(np.uint8)
        if trial % 3 == 0:
            buf[:, :16] = rng.integers(100, 116, (4, 16))  # smooth-ish
            buf[:, 16:] = rng.integers(112, 128, (4, 16))
        want = buf.copy()
        fn(_ptr(want, 16), 32, _ptr(blv), _ptr(limv), _ptr(hevv))
        npx = {4: 2, 6: 3, 8: 4, 14: 7}[size]
        p = buf[:, 16 - npx:16].astype(np.int32)
        q = buf[:, 16:16 + npx].astype(np.int32)
        fp, fq = dlf._filter_line(p, q, bl, lim, hev, size)
        got = buf.astype(np.int32).copy()
        got[:, 16 - npx:16] = fp
        got[:, 16:16 + npx] = fq
        np.testing.assert_array_equal(got, want.astype(np.int32),
                                      err_msg=f"size={size} lvl={level} t={trial}")


@needs_oracle
@pytest.mark.parametrize("size", [4, 6, 8, 14])
def test_horizontal_filters_match(size):
    L = oracle.lib()
    fn = getattr(L, f"svt_aom_lpf_horizontal_{size}_c")
    fn.restype = None
    fn.argtypes = [U8P, ctypes.c_int32, U8P, U8P, U8P]
    blv, limv, hevv, (bl, lim, hev) = _thr(24)
    rng = np.random.default_rng(size)
    buf = rng.integers(100, 140, size=(32, 4)).astype(np.uint8)
    want = buf.copy()
    fn(_ptr(want, 16 * 4), 4, _ptr(blv), _ptr(limv), _ptr(hevv))
    npx = {4: 2, 6: 3, 8: 4, 14: 7}[size]
    p = buf[16 - npx:16, :].T.astype(np.int32)
    q = buf[16:16 + npx, :].T.astype(np.int32)
    fp, fq = dlf._filter_line(p, q, bl, lim, hev, size)
    got = buf.astype(np.int32).copy()
    got[16 - npx:16, :] = fp.T
    got[16:16 + npx, :] = fq.T
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_filter_levels_monotone():
    prev = 0
    for q in range(0, 256, 16):
        lvl = dlf.filter_levels_from_qindex(q)
        assert lvl >= prev
        prev = lvl
    assert dlf.filter_levels_from_qindex(255) <= dlf.MAX_LOOP_FILTER
