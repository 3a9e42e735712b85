"""Quantization tests vs the reference oracle (analog of QuantAsmTest.cc)."""
import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_tpu.constants import TxSize, TxType, TX_WIDTH, TX_HEIGHT
from svt_av1_tpu.entropy.tables import scan_order
from svt_av1_tpu.ops import quant as qz
from svt_av1_tpu.ops import transforms as tf

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="no oracle lib")

I16P = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
U16P = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")


def _ref_quantize_b(coeffs2d, pq, qindex, tx_size):
    """Call the reference svt_aom_quantize_b_c_ii with our tables."""
    L = oracle.lib()
    fn = L.svt_aom_quantize_b_c_ii
    fn.restype = None
    h, w = coeffs2d.shape
    n = h * w
    log_scale = qz.tx_log_scale(tx_size)
    scan = np.ascontiguousarray(scan_order(w, h), dtype=np.int16)
    # raster coeffs indexed by scan need the packed 32-limit layout the
    # reference uses; for sizes <= 32 scan indexes the full plane directly.
    qcoeff = np.zeros(n, dtype=np.int32)
    dqcoeff = np.zeros(n, dtype=np.int32)
    eob = np.zeros(1, dtype=np.uint16)

    def pair(vec):
        return np.ascontiguousarray(vec, dtype=np.int16)

    fn.argtypes = [I32P, ctypes.c_longlong, I16P, I16P, I16P, I16P,
                   I32P, I32P, I16P, U16P, I16P, I16P,
                   ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
    fn(np.ascontiguousarray(coeffs2d.reshape(-1), dtype=np.int32), n,
       pair(pq.zbin[qindex]), pair(pq.round[qindex]), pair(pq.quant[qindex]),
       pair(pq.quant_shift[qindex]), qcoeff, dqcoeff, pair(pq.dequant[qindex]),
       eob, scan, scan, None, None, log_scale)
    return qcoeff.reshape(h, w), dqcoeff.reshape(h, w), int(eob[0])


@needs_oracle
@pytest.mark.parametrize("qindex", [1, 20, 60, 120, 200, 255])
@pytest.mark.parametrize("tx_size", [TxSize.TX_4X4, TxSize.TX_8X8,
                                     TxSize.TX_16X16, TxSize.TX_32X32,
                                     TxSize.TX_8X16, TxSize.TX_16X8])
def test_quantize_b_matches_reference(qindex, tx_size):
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    y, _, _ = qz.build_quantizer(8)
    rng = np.random.default_rng(qindex * 31 + tx_size)
    resid = rng.integers(-255, 256, size=(h, w))
    coeffs = np.asarray(tf.fwd_txfm2d(resid.astype(np.int32),
                                      TxType.DCT_DCT, tx_size))
    want_q, want_dq, want_eob = _ref_quantize_b(coeffs, y, qindex, tx_size)
    got_q, got_dq = qz.quantize_b(coeffs, qindex, y, tx_size)
    np.testing.assert_array_equal(np.asarray(got_q), want_q)
    np.testing.assert_array_equal(np.asarray(got_dq), want_dq)
    # eob from scan order
    scan = scan_order(w, h)
    nz = np.asarray(got_q).reshape(-1)[scan] != 0
    got_eob = int(np.max(np.nonzero(nz)[0]) + 1) if nz.any() else 0
    assert got_eob == want_eob


@needs_oracle
def test_quant_tables_match_reference_scalars():
    L = oracle.lib()
    for name in ("svt_av1_dc_quant_q3", "svt_av1_ac_quant_q3"):
        fn = getattr(L, name)
        fn.restype = ctypes.c_int16
        fn.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_int]
        ours = qz.dc_quant if "dc" in name else qz.ac_quant
        for bd in (8, 10):  # AomBitDepth enum values are the literal depths
            for q in (0, 1, 50, 128, 255):
                assert fn(q, 0, bd) == int(ours(q, 0, bd)), (name, q, bd)


def test_quantize_dequant_roundtrip_energy():
    """Quantization error is bounded by the step size."""
    y, _, _ = qz.build_quantizer(8)
    rng = np.random.default_rng(0)
    resid = rng.integers(-200, 201, size=(16, 16))
    coeffs = np.asarray(tf.fwd_txfm2d(resid.astype(np.int32),
                                      TxType.DCT_DCT, TxSize.TX_16X16))
    for qindex in (20, 100, 200):
        qc, dqc = qz.quantize_b(coeffs, qindex, y, TxSize.TX_16X16)
        step = int(y.dequant[qindex][1])
        err = np.abs(np.asarray(dqc) - coeffs)
        live = np.asarray(qc) != 0
        assert np.all(err[live] <= step)


def test_dequant_block_matches_quantize_dq():
    """Decoder dequant of encoder levels == encoder's dqcoeff."""
    y, _, _ = qz.build_quantizer(8)
    rng = np.random.default_rng(3)
    resid = rng.integers(-255, 256, size=(8, 8))
    coeffs = np.asarray(tf.fwd_txfm2d(resid.astype(np.int32),
                                      TxType.DCT_DCT, TxSize.TX_8X8))
    qc, dqc = qz.quantize_b(coeffs, 80, y, TxSize.TX_8X8)
    dec_dq = qz.dequant_block(np.asarray(qc), 80, y, TxSize.TX_8X8)
    np.testing.assert_array_equal(np.asarray(dec_dq), np.asarray(dqc))


@needs_oracle
@pytest.mark.parametrize("qindex", [1, 60, 140, 255])
@pytest.mark.parametrize("tx_size", [TxSize.TX_4X4, TxSize.TX_8X8,
                                     TxSize.TX_16X16, TxSize.TX_8X16])
def test_quantize_fp_matches_reference(qindex, tx_size):
    """svt_av1_quantize_fp_c parity (log_scale 0 sizes)."""
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    y, _, _ = qz.build_quantizer(8)
    rng = np.random.default_rng(qindex * 7 + tx_size)
    coeffs = rng.integers(-30000, 30000, (h, w)).astype(np.int32)
    qc, dqc = qz.quantize_fp(coeffs, qindex, y, tx_size)

    L = oracle.lib()
    fn = L.svt_av1_quantize_fp_c
    fn.restype = None
    n = w * h
    scan = np.ascontiguousarray(scan_order(w, h), dtype=np.int16)
    qcoeff = np.zeros(n, np.int32)
    dqcoeff = np.zeros(n, np.int32)
    eob = np.zeros(1, np.uint16)

    def pair(vec):
        return np.ascontiguousarray(vec, dtype=np.int16)

    fn.argtypes = [I32P, ctypes.c_longlong, I16P, I16P, I16P, I16P,
                   I32P, I32P, I16P, U16P, I16P, I16P]
    fn(np.ascontiguousarray(coeffs.reshape(-1), dtype=np.int32), n,
       pair(y.zbin[qindex]), pair(y.round_fp[qindex]),
       pair(y.quant_fp[qindex]), pair(y.quant_shift[qindex]),
       qcoeff, dqcoeff, pair(y.dequant[qindex]), eob, scan, scan)
    np.testing.assert_array_equal(np.asarray(qc), qcoeff.reshape(h, w))
    np.testing.assert_array_equal(np.asarray(dqc), dqcoeff.reshape(h, w))
