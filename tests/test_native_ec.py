"""Native range coder equivalence: the C packer must produce byte-
identical streams and identical CDF adaptation vs the Python reference."""
import numpy as np
import pytest

from svt_av1_tpu.constants import TxSize, TxType, TX_WIDTH, TX_HEIGHT
from svt_av1_tpu.entropy import RangeEncoder, RangeDecoder, coeffs as cf
from svt_av1_tpu.entropy.tables import FrameCdfs
from svt_av1_tpu.native import HAVE_NATIVE_EC
from svt_av1_tpu.ops import quant as qz
from svt_av1_tpu.ops import transforms as tf

needs_native = pytest.mark.skipif(not HAVE_NATIVE_EC,
                                  reason="native ec not built")


@needs_native
def test_symbol_stream_identical():
    from svt_av1_tpu.entropy.native_ec import NativeRangeEncoder
    rng = np.random.default_rng(0)
    fc_py, fc_c = FrameCdfs(100), FrameCdfs(100)
    py, ct = RangeEncoder(), NativeRangeEncoder()
    for _ in range(3000):
        k = rng.integers(0, 4)
        if k == 0:
            s = int(rng.integers(0, 13))
            py.encode_symbol(s, fc_py.kf_y_mode[1][2], 13)
            ct.encode_symbol(s, fc_c.kf_y_mode[1][2], 13)
        elif k == 1:
            b = int(rng.integers(0, 2))
            py.encode_bit(b)
            ct.encode_bit(b)
        elif k == 2:
            v, n = int(rng.integers(0, 256)), 8
            py.encode_literal(v, n)
            ct.encode_literal(v, n)
        else:
            s = int(rng.integers(0, 2))
            py.encode_symbol(s, fc_py.skip[1], 2)
            ct.encode_symbol(s, fc_c.skip[1], 2)
    assert py.done() == ct.done()
    np.testing.assert_array_equal(fc_py.kf_y_mode, fc_c.kf_y_mode)
    np.testing.assert_array_equal(fc_py.skip, fc_c.skip)


@needs_native
@pytest.mark.parametrize("tx_size", [TxSize.TX_4X4, TxSize.TX_8X8,
                                     TxSize.TX_16X16, TxSize.TX_32X32,
                                     TxSize.TX_16X8, TxSize.TX_64X64])
@pytest.mark.parametrize("tx_type", [TxType.DCT_DCT, TxType.V_DCT,
                                     TxType.ADST_ADST])
def test_write_coeffs_identical(tx_size, tx_type):
    from svt_av1_tpu.entropy.native_ec import NativeRangeEncoder
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    if tx_type != TxType.DCT_DCT and max(w, h) > 16:
        pytest.skip("invalid combo")
    rng = np.random.default_rng(tx_size * 7 + tx_type)
    y, _, _ = qz.build_quantizer(8)
    blocks = []
    for _ in range(6):
        resid = rng.integers(-200, 201, size=(h, w)).astype(np.int32)
        c = np.asarray(tf.fwd_txfm2d(resid, tx_type, tx_size))
        qc, _ = qz.quantize_b(c, 60, y, tx_size)
        blocks.append(np.asarray(qc)[:min(h, 32), :min(w, 32)])
    blocks.append(np.zeros_like(blocks[0]))   # all-zero block
    big = np.zeros_like(blocks[0])
    big[0, 0] = -4000                          # golomb path
    blocks.append(big)

    fc_py, fc_c = FrameCdfs(60), FrameCdfs(60)
    py, ct = RangeEncoder(), NativeRangeEncoder()
    for q in blocks:
        eob = cf.compute_eob(q, tx_size, tx_type)
        cul_py = cf.write_coeffs_txb(py, fc_py, q, tx_size, tx_type,
                                     0, 3, 1, eob)
        cul_c = ct.write_coeffs_fast(fc_c, q, tx_size, tx_type,
                                     0, 3, 1, eob)
        assert cul_py == cul_c
    assert py.done() == ct.done()
    for attr in ("coeff_base", "coeff_base_eob", "coeff_br", "txb_skip",
                 "dc_sign", "eob_extra"):
        np.testing.assert_array_equal(getattr(fc_py, attr),
                                      getattr(fc_c, attr), err_msg=attr)


@needs_native
def test_native_stream_decodable():
    """Native-written stream decodes with the Python decoder."""
    from svt_av1_tpu.entropy.native_ec import NativeRangeEncoder
    rng = np.random.default_rng(5)
    fc_e, fc_d = FrameCdfs(40), FrameCdfs(40)
    enc = NativeRangeEncoder()
    y, _, _ = qz.build_quantizer(8)
    blocks = []
    for _ in range(4):
        resid = rng.integers(-150, 151, size=(16, 16)).astype(np.int32)
        c = np.asarray(tf.fwd_txfm2d(resid, TxType.DCT_DCT, TxSize.TX_16X16))
        qc, _ = qz.quantize_b(c, 40, y, TxSize.TX_16X16)
        blocks.append(np.asarray(qc))
        eob = cf.compute_eob(blocks[-1], TxSize.TX_16X16, TxType.DCT_DCT)
        enc.write_coeffs_fast(fc_e, blocks[-1], TxSize.TX_16X16,
                              TxType.DCT_DCT, 0, 0, 0, eob)
    dec = RangeDecoder(enc.done())
    for q in blocks:
        got, _, _, _ = cf.parse_coeffs_txb(dec, fc_d, TxSize.TX_16X16,
                                           TxType.DCT_DCT, 0, 0, 0)
        np.testing.assert_array_equal(got, q)
