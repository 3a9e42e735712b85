"""Fused native block kernel vs the Python transform/quant/recon path.

Bit-exactness of block_native.code_block against fwd_txfm2d +
quantize_b + compute_eob + inv_txfm2d_add over every covered tx size,
tx type, bit depth and a qindex sweep."""
import numpy as np
import pytest

from svt_av1_tpu.constants import TxSize, TxType, TX_WIDTH, TX_HEIGHT
from svt_av1_tpu.entropy import coeffs as cf
from svt_av1_tpu.native import block_plan
from svt_av1_tpu.ops import quant as qz
from svt_av1_tpu.ops import transforms as tf

needs_native = pytest.mark.skipif(not block_plan.available(),
                                  reason="block_native not built")

# all sizes, including the 64-dim family (coded band clamps to 32x32)
SIZES = list(TxSize)


def _ref(resid, pred, pq, qindex, ts, tt, bd):
    coeffs = np.asarray(tf.fwd_txfm2d(resid, tt, ts, bd))
    qc, dqc = qz.quantize_b(coeffs, qindex, pq, ts)
    qc, dqc = np.asarray(qc), np.asarray(dqc)
    ch, cw = min(TX_HEIGHT[ts], 32), min(TX_WIDTH[ts], 32)
    eob = cf.compute_eob(qc[:ch, :cw], ts, tt)
    if eob == 0:
        dqc = np.zeros_like(dqc)
    recon = np.asarray(tf.inv_txfm2d_add(dqc, pred, tt, ts, bd))
    return qc, eob, recon


@needs_native
@pytest.mark.parametrize("ts", SIZES)
@pytest.mark.parametrize("bd", [8, 10])
def test_dct_all_sizes(ts, bd):
    rng = np.random.default_rng(int(ts) * 10 + bd)
    h, w = TX_HEIGHT[ts], TX_WIDTH[ts]
    pq = qz.build_quantizer(bd)[0]
    mx = (1 << bd) - 1
    for qindex in (1, 40, 120, 200, 255):
        pred = rng.integers(0, mx + 1, (h, w)).astype(np.int32)
        src = rng.integers(0, mx + 1, (h, w)).astype(np.int32)
        resid = src - pred
        got = block_plan.code_block(pq, qindex, ts, TxType.DCT_DCT, bd,
                                    resid, pred)
        assert got is not None
        qc, eob, rec = got
        rqc, reob, rrec = _ref(resid, pred, pq, qindex, ts,
                               TxType.DCT_DCT, bd)
        assert eob == reob, (ts, bd, qindex)
        np.testing.assert_array_equal(qc, rqc)
        np.testing.assert_array_equal(rec, rrec)


@needs_native
@pytest.mark.parametrize("tt", list(TxType))
def test_all_types_8x8_16x8_4x4(tt):
    rng = np.random.default_rng(int(tt) + 77)
    pq = qz.build_quantizer(8)[0]
    for ts in (TxSize.TX_8X8, TxSize.TX_16X8, TxSize.TX_4X4,
               TxSize.TX_4X8, TxSize.TX_16X16):
        h, w = TX_HEIGHT[ts], TX_WIDTH[ts]
        pred = rng.integers(0, 256, (h, w)).astype(np.int32)
        resid = rng.integers(-160, 160, (h, w)).astype(np.int32)
        got = block_plan.code_block(pq, 60, ts, tt, 8, resid, pred)
        qc, eob, rec = got
        rqc, reob, rrec = _ref(resid, pred, pq, 60, ts, tt, 8)
        assert eob == reob, (ts, tt)
        np.testing.assert_array_equal(qc, rqc, err_msg=f"{ts} {tt}")
        np.testing.assert_array_equal(rec, rrec, err_msg=f"{ts} {tt}")


@needs_native
def test_zero_residual_skip():
    pq = qz.build_quantizer(8)[0]
    pred = np.full((16, 16), 77, np.int32)
    got = block_plan.code_block(pq, 100, TxSize.TX_16X16, TxType.DCT_DCT,
                                8, np.zeros((16, 16), np.int32), pred)
    qc, eob, rec = got
    assert eob == 0 and not qc.any()
    np.testing.assert_array_equal(rec, pred)
