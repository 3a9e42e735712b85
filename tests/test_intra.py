"""Intra predictor tests vs the reference oracle (analog of
intrapred_test.cc / intrapred_dr_test.cc / FilterIntraPredTest.cc)."""
import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_tpu.constants import PredictionMode, TxSize, TX_WIDTH, TX_HEIGHT
from svt_av1_tpu.ops import intra

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="no oracle lib")

U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

SIZES = [TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X16, TxSize.TX_32X32,
         TxSize.TX_4X8, TxSize.TX_16X8, TxSize.TX_8X32, TxSize.TX_16X4,
         TxSize.TX_64X64]


def _edges(rng, w, h):
    """(above_with_topleft, left_with_topleft) uint8 buffers; index 16 is
    the first edge sample, index 15 the topleft (C's [-1])."""
    above = rng.integers(0, 256, size=16 + 2 * (w + h) + 16).astype(np.uint8)
    left = rng.integers(0, 256, size=16 + 2 * (w + h) + 16).astype(np.uint8)
    left[15] = above[15]
    return above, left


def _u8ptr(arr: np.ndarray, offset: int):
    return ctypes.cast(arr.ctypes.data + offset, ctypes.POINTER(ctypes.c_uint8))


def _call_named_pred(name, w, h, above, left):
    L = oracle.lib()
    fn = getattr(L, name)
    fn.restype = None
    fn.argtypes = [U8P, ctypes.c_longlong,
                   ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
    dst = np.zeros((h, w), dtype=np.uint8)
    # pointer offset 16 so C's index -1 (topleft) stays in bounds
    fn(dst.reshape(-1), w, _u8ptr(above, 16), _u8ptr(left, 16))
    return dst.astype(np.int32)


_MODE_FN = {
    PredictionMode.V_PRED: ("svt_aom_v_predictor_{}x{}_c", intra.v_predictor),
    PredictionMode.H_PRED: ("svt_aom_h_predictor_{}x{}_c", intra.h_predictor),
    PredictionMode.SMOOTH_PRED: ("svt_aom_smooth_predictor_{}x{}_c", intra.smooth_predictor),
    PredictionMode.SMOOTH_V_PRED: ("svt_aom_smooth_v_predictor_{}x{}_c", intra.smooth_v_predictor),
    PredictionMode.SMOOTH_H_PRED: ("svt_aom_smooth_h_predictor_{}x{}_c", intra.smooth_h_predictor),
}


@needs_oracle
@pytest.mark.parametrize("tx_size", SIZES)
@pytest.mark.parametrize("mode", list(_MODE_FN))
def test_simple_predictors_match(tx_size, mode):
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    rng = np.random.default_rng(int(tx_size) * 100 + mode)
    above, left = _edges(rng, w, h)
    name_tpl, ours = _MODE_FN[mode]
    want = _call_named_pred(name_tpl.format(w, h), w, h, above, left)
    got = ours(w, h, above[16:].astype(np.int32), left[16:].astype(np.int32))
    np.testing.assert_array_equal(np.asarray(got), want)


@needs_oracle
@pytest.mark.parametrize("tx_size", SIZES)
def test_dc_predictor_matches(tx_size):
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    rng = np.random.default_rng(int(tx_size))
    above, left = _edges(rng, w, h)
    want = _call_named_pred(f"svt_aom_dc_predictor_{w}x{h}_c", w, h, above, left)
    got = intra.dc_predictor(w, h, above[16:].astype(np.int32),
                             left[16:].astype(np.int32), True, True)
    np.testing.assert_array_equal(np.asarray(got), want)


@needs_oracle
def test_paeth_matches():
    L = oracle.lib()
    for tx_size in (TxSize.TX_4X4, TxSize.TX_16X16, TxSize.TX_8X16):
        w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
        rng = np.random.default_rng(7)
        above, left = _edges(rng, w, h)
        want = _call_named_pred(f"svt_aom_paeth_predictor_{w}x{h}_c", w, h, above, left)
        got = intra.paeth_predictor(w, h, above[16:].astype(np.int32),
                                    left[16:].astype(np.int32), int(above[15]))
        np.testing.assert_array_equal(np.asarray(got), want)


def _dr_args(fn):
    fn.restype = None
    return fn


@needs_oracle
@pytest.mark.parametrize("angle", [3, 30, 45, 60, 87])
@pytest.mark.parametrize("upsample", [0, 1])
def test_dr_z1_matches(angle, upsample):
    L = oracle.lib()
    fn = _dr_args(L.svt_av1_dr_prediction_z1_c)
    fn.argtypes = [U8P, ctypes.c_longlong, ctypes.c_int32, ctypes.c_int32,
                   U8P, U8P, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    w = h = 8
    rng = np.random.default_rng(angle)
    above = rng.integers(0, 256, size=128).astype(np.uint8)
    dst = np.zeros((h, w), dtype=np.uint8)
    dx = intra.get_dx(angle)
    fn(dst.reshape(-1), w, w, h, above, above, upsample, dx, 1)
    got = intra.dr_predictor_z1(w, h, above.astype(np.int32), upsample, dx)
    np.testing.assert_array_equal(np.asarray(got), dst.astype(np.int32))


@needs_oracle
@pytest.mark.parametrize("angle", [93, 120, 135, 150, 177])
@pytest.mark.parametrize("upsample", [(0, 0), (1, 0), (0, 1), (1, 1)])
def test_dr_z2_matches(angle, upsample):
    L = oracle.lib()
    fn = _dr_args(L.svt_av1_dr_prediction_z2_c)
    fn.argtypes = [U8P, ctypes.c_longlong, ctypes.c_int32, ctypes.c_int32,
                   ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                   ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_int32, ctypes.c_int32]
    ua, ul = upsample
    w = h = 8
    rng = np.random.default_rng(angle)
    above_buf = rng.integers(0, 256, size=64).astype(np.uint8)
    left_buf = rng.integers(0, 256, size=64).astype(np.uint8)
    dst = np.zeros((h, w), dtype=np.uint8)
    dx, dy = intra.get_dx(angle), intra.get_dy(angle)
    # C pointers positioned so that index -(1<<up) is valid
    off_a, off_l = 1 << ua, 1 << ul
    fn(dst.reshape(-1), w, w, h,
       _u8ptr(above_buf, off_a), _u8ptr(left_buf, off_l), ua, ul, dx, dy)
    got = intra.dr_predictor_z2(w, h, above_buf.astype(np.int32),
                                left_buf.astype(np.int32), ua, ul, dx, dy)
    np.testing.assert_array_equal(np.asarray(got), dst.astype(np.int32))


@needs_oracle
@pytest.mark.parametrize("angle", [183, 203, 225, 250, 267])
@pytest.mark.parametrize("upsample", [0, 1])
def test_dr_z3_matches(angle, upsample):
    L = oracle.lib()
    fn = _dr_args(L.svt_av1_dr_prediction_z3_c)
    fn.argtypes = [U8P, ctypes.c_longlong, ctypes.c_int32, ctypes.c_int32,
                   U8P, U8P, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    w = h = 8
    rng = np.random.default_rng(angle)
    left = rng.integers(0, 256, size=128).astype(np.uint8)
    dst = np.zeros((h, w), dtype=np.uint8)
    dy = intra.get_dy(angle)
    fn(dst.reshape(-1), w, w, h, left, left, upsample, 1, dy)
    got = intra.dr_predictor_z3(w, h, left.astype(np.int32), upsample, dy)
    np.testing.assert_array_equal(np.asarray(got), dst.astype(np.int32))


@needs_oracle
def test_upsample_intra_edge_matches():
    L = oracle.lib()
    fn = L.svt_av1_upsample_intra_edge_c
    fn.restype = None
    fn.argtypes = [U8P, ctypes.c_int32]
    fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32]
    rng = np.random.default_rng(1)
    for sz in (4, 8, 12, 16):
        buf = rng.integers(0, 256, size=64).astype(np.uint8)
        carr = buf.copy()
        p_off = 8  # C operates with p at offset 8 (so p[-2] valid)
        fn(_u8ptr(carr, p_off), sz)
        # ours: input has topleft at 0 = C p[-1] = buf[p_off - 1]
        inp = buf[p_off - 1:p_off + sz + 1].astype(np.int32)
        up = intra.upsample_intra_edge(inp, sz)
        # C result: p[-2 .. 2*sz-2] lives at carr[p_off-2 : p_off+2*sz-1]
        want = carr[p_off - 2: p_off + 2 * sz - 1].astype(np.int32)
        np.testing.assert_array_equal(up[:2 * sz + 1], want, err_msg=f"sz={sz}")


@needs_oracle
def test_filter_intra_edge_matches():
    L = oracle.lib()
    fn = L.svt_av1_filter_intra_edge_c
    fn.restype = None
    fn.argtypes = [U8P, ctypes.c_int32, ctypes.c_int32]
    rng = np.random.default_rng(2)
    for strength in (0, 1, 2, 3):
        for sz in (5, 9, 17, 33):
            buf = rng.integers(0, 256, size=sz).astype(np.uint8)
            want = buf.copy()
            fn(want, sz, strength)
            got = buf.astype(np.int32)
            intra.filter_intra_edge(got, sz, strength)
            np.testing.assert_array_equal(got, want.astype(np.int32))


@needs_oracle
@pytest.mark.parametrize("fi_mode", range(5))
def test_filter_intra_predictor_matches(fi_mode):
    L = oracle.lib()
    fn = L.svt_av1_filter_intra_predictor_c
    fn.restype = None
    fn.argtypes = [U8P, ctypes.c_longlong, ctypes.c_int,
                   ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                   ctypes.c_int32]
    for tx_size in (TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X8, TxSize.TX_32X32):
        w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
        rng = np.random.default_rng(fi_mode * 10 + tx_size)
        above, left = _edges(rng, w, h)
        dst = np.zeros((h, w), dtype=np.uint8)
        fn(dst.reshape(-1), w, int(tx_size),
           _u8ptr(above, 16), _u8ptr(left, 16), fi_mode)
        got = intra.filter_intra_predictor(w, h, above[16:].astype(np.int32),
                                           left[16:].astype(np.int32),
                                           int(above[15]), fi_mode)
        np.testing.assert_array_equal(np.asarray(got), dst.astype(np.int32),
                                      err_msg=f"{tx_size.name}")


def test_predict_intra_block_unavailable_edges():
    """No neighbors at all: DC gives 128, V gives 127, H gives 129."""
    got = intra.predict_intra_block(
        PredictionMode.DC_PRED, 0, TxSize.TX_8X8, None, None, None, 0, 0, 0, 0)
    assert np.all(np.asarray(got) == 128)
    got = intra.predict_intra_block(
        PredictionMode.V_PRED, 0, TxSize.TX_8X8, None, None, None, 0, 0, 0, 0)
    assert np.all(np.asarray(got) == 127)
    got = intra.predict_intra_block(
        PredictionMode.H_PRED, 0, TxSize.TX_8X8, None, None, None, 0, 0, 0, 0)
    assert np.all(np.asarray(got) == 129)
