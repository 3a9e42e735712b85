"""Coefficient coding tests: enc/dec round-trip symmetry over realistic
quantized blocks, plus context-function checks vs the reference oracle
(analog of EncodeTxbAsmTest.cc)."""
import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_tpu.constants import TxSize, TxType, TX_WIDTH, TX_HEIGHT
from svt_av1_tpu.entropy import RangeDecoder, RangeEncoder, coeffs as cf
from svt_av1_tpu.entropy.tables import FrameCdfs
from svt_av1_tpu.ops import quant as qz
from svt_av1_tpu.ops import transforms as tf

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="no oracle lib")


def _quantized_block(rng, tx_size, tx_type, qindex):
    h = min(TX_HEIGHT[tx_size], 32)
    w = min(TX_WIDTH[tx_size], 32)
    fh, fw = TX_HEIGHT[tx_size], TX_WIDTH[tx_size]
    resid = rng.integers(-120, 121, size=(fh, fw)).astype(np.int32)
    c = np.asarray(tf.fwd_txfm2d(resid, tx_type, tx_size))
    y, _, _ = qz.build_quantizer(8)
    qc, _ = qz.quantize_b(c, qindex, y, tx_size)
    return np.asarray(qc)[:h, :w]


@pytest.mark.parametrize("tx_size", [TxSize.TX_4X4, TxSize.TX_8X8,
                                     TxSize.TX_16X16, TxSize.TX_32X32,
                                     TxSize.TX_8X16, TxSize.TX_16X4,
                                     TxSize.TX_64X64])
@pytest.mark.parametrize("tx_type", [TxType.DCT_DCT, TxType.ADST_DCT,
                                     TxType.IDTX, TxType.V_DCT])
@pytest.mark.parametrize("qindex", [40, 120])
def test_coeff_roundtrip(tx_size, tx_type, qindex):
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    if tx_type != TxType.DCT_DCT:
        if max(w, h) > 32 or (tx_type == TxType.IDTX and max(w, h) > 32):
            pytest.skip("invalid combo")
        if tx_type in (TxType.ADST_DCT,) and max(w, h) > 16:
            pytest.skip("invalid combo")
    rng = np.random.default_rng(tx_size * 100 + tx_type * 7 + qindex)
    blocks = [_quantized_block(rng, tx_size, tx_type, qindex) for _ in range(8)]

    enc = RangeEncoder()
    fce = FrameCdfs(qindex)
    culs_e = []
    for q in blocks:
        eob = cf.compute_eob(q, tx_size, tx_type)
        culs_e.append(cf.write_coeffs_txb(enc, fce, q, tx_size, tx_type,
                                          0, 4, 1, eob))
    data = enc.done()

    dec = RangeDecoder(data)
    fcd = FrameCdfs(qindex)
    for q, cul_e in zip(blocks, culs_e):
        got, eob, cul_d, _ = cf.parse_coeffs_txb(dec, fcd, tx_size, tx_type,
                                                 0, 4, 1)
        np.testing.assert_array_equal(got, q)
        assert cul_d == cul_e
        assert eob == cf.compute_eob(q, tx_size, tx_type)
    # symmetrical CDF adaptation
    np.testing.assert_array_equal(fce.coeff_base, fcd.coeff_base)
    np.testing.assert_array_equal(fce.txb_skip, fcd.txb_skip)
    np.testing.assert_array_equal(fce.dc_sign, fcd.dc_sign)


def test_all_zero_block():
    fce, fcd = FrameCdfs(100), FrameCdfs(100)
    q = np.zeros((8, 8), dtype=np.int32)
    enc = RangeEncoder()
    cul = cf.write_coeffs_txb(enc, fce, q, TxSize.TX_8X8, TxType.DCT_DCT,
                              0, 0, 0, 0)
    assert cul == 0
    dec = RangeDecoder(enc.done())
    got, eob, cul_d, _ = cf.parse_coeffs_txb(dec, fcd, TxSize.TX_8X8,
                                             TxType.DCT_DCT, 0, 0, 0)
    assert eob == 0 and cul_d == 0
    np.testing.assert_array_equal(got, q)


def test_large_level_golomb():
    """Levels beyond base+br range exercise the golomb tail."""
    fce, fcd = FrameCdfs(0), FrameCdfs(0)
    q = np.zeros((4, 4), dtype=np.int32)
    q[0, 0] = -1000
    q[0, 1] = 300
    q[1, 0] = 17
    enc = RangeEncoder()
    eob = cf.compute_eob(q, TxSize.TX_4X4, TxType.DCT_DCT)
    cf.write_coeffs_txb(enc, fce, q, TxSize.TX_4X4, TxType.DCT_DCT, 0, 2, 0, eob)
    dec = RangeDecoder(enc.done())
    got, _, _, _ = cf.parse_coeffs_txb(dec, fcd, TxSize.TX_4X4, TxType.DCT_DCT, 0, 2, 0)
    np.testing.assert_array_equal(got, q)


@needs_oracle
@pytest.mark.parametrize("tx_size", [TxSize.TX_4X4, TxSize.TX_8X8,
                                     TxSize.TX_16X16, TxSize.TX_32X32,
                                     TxSize.TX_16X8, TxSize.TX_4X16])
@pytest.mark.parametrize("tx_type", [TxType.DCT_DCT, TxType.V_DCT, TxType.H_DCT])
def test_nz_map_contexts_match_reference(tx_size, tx_type):
    """Our context derivation == svt_av1_get_nz_map_contexts_c."""
    L = oracle.lib()
    fn = L.svt_av1_get_nz_map_contexts_c
    fn.restype = None
    h = min(TX_HEIGHT[tx_size], 32)
    w = min(TX_WIDTH[tx_size], 32)
    rng = np.random.default_rng(tx_size * 31 + tx_type)
    q = _quantized_block(rng, tx_size, tx_type, 60)
    eob = cf.compute_eob(q, tx_size, tx_type)
    if eob == 0:
        pytest.skip("all-zero block")
    scan = np.ascontiguousarray(cf.scan_for(tx_size, tx_type), dtype=np.int16)
    # build C levels buffer (padded layout, uint8)
    stride = w + cf.TX_PAD_HOR
    # pad generously below: ctx derivation reads up to 4 rows past the block
    lbuf = np.zeros(4 * stride + stride * (h + 8) + 16, dtype=np.uint8)
    lev_off = 4 * stride  # TX_PAD_TOP rows (C sets levels = buf + TX_PAD_TOP*stride)
    lv = cf.txb_levels(q)
    lbuf[lev_off:lev_off + h * stride] = lv[:h].astype(np.uint8).reshape(-1)
    ctxs = np.zeros(32 * 32, dtype=np.int8)
    fn.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                   np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
                   ctypes.c_uint16, ctypes.c_int, ctypes.c_int,
                   np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")]
    fn(ctypes.cast(lbuf.ctypes.data + lev_off, ctypes.POINTER(ctypes.c_uint8)),
       scan, eob, int(tx_size), cf.TX_TYPE_TO_CLASS[tx_type], ctxs)
    bwl = w.bit_length() - 1
    levels = cf.txb_levels(q)
    for i in range(eob):
        pos = int(scan[i])
        want = int(ctxs[pos])
        got = cf.get_nz_map_ctx(levels, pos, bwl, h, i, i == eob - 1, w,
                                cf.TX_TYPE_TO_CLASS[tx_type])
        assert got == want, (tx_size.name, tx_type.name, i, pos, got, want)
