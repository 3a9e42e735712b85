"""RDOQ (trellis) tests: C twin == Python port, and the optimizer only
ever lowers the true RD cost it models.

Parity target: svt_av1_optimize_b (EbFullLoop.c:1190) at rdoq_level 1.
"""
import numpy as np
import pytest

from svt_av1_tpu.constants import TxSize, TxType, TX_WIDTH, TX_HEIGHT
from svt_av1_tpu.entropy import coeffs as cf
from svt_av1_tpu.entropy.tables import FrameCdfs
from svt_av1_tpu.ops import quant as qz
from svt_av1_tpu.ops import rdoq
from svt_av1_tpu.native import block_plan

needs_native = pytest.mark.skipif(not block_plan.available(),
                                  reason="native module not built")

SIZES = [TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X16, TxSize.TX_32X32,
         TxSize.TX_8X16, TxSize.TX_16X8, TxSize.TX_4X16, TxSize.TX_32X8]


def _tx_class(tt: TxType) -> int:
    if tt in (TxType.V_DCT, TxType.V_ADST, TxType.V_FLIPADST):
        return 2
    if tt in (TxType.H_DCT, TxType.H_ADST, TxType.H_FLIPADST):
        return 1
    return 0


def _run_both(tcoeff, qc, dqc, eob, ts, tt, qindex, pq, tables, rdmult,
              sk_ctx, dc_ctx, plane_type):
    w, h = TX_WIDTH[ts], TX_HEIGHT[ts]
    cw, ch = min(w, 32), min(h, 32)
    scan = np.ascontiguousarray(cf.scan_for(ts, tt).astype(np.int16))
    shape = 1 if w < h else (2 if w > h else 0)
    tx_class = _tx_class(tt)
    shift = qz.tx_log_scale(ts)
    ts_ctx = cf.txs_ctx(ts)
    ems = cf.eob_multi_size(ts)
    deq = pq.dequant[qindex]
    tabs = rdoq.sliced_tabs(tables, ts_ctx, plane_type, sk_ctx, dc_ctx,
                            ems)

    q_py = np.ascontiguousarray(qc[:ch, :cw].copy())
    dq_py = np.ascontiguousarray(dqc[:ch, :cw].copy())
    tq = np.ascontiguousarray(tcoeff[:ch, :cw].astype(np.int32))
    eob_py = rdoq.optimize_txb(
        tq, q_py, dq_py, eob, scan, cw, ch, tx_class, shift,
        (int(deq[0]), int(deq[1])), rdmult,
        (tabs[0], tabs[1], tabs[2], tabs[3], tabs[4], tabs[5]),
        tabs[6].reshape(2, 11), shape)

    from svt_av1_tpu.native import block_native as bn
    q_c = np.ascontiguousarray(qc[:ch, :cw].copy())
    dq_c = np.ascontiguousarray(dqc[:ch, :cw].copy())
    eob_c = bn.rdoq_txb(tq, q_c, dq_c, int(eob), scan, cw, ch,
                        int(deq[0]), int(deq[1]), shift, tabs,
                        int(rdmult), tx_class, shape)
    return (q_py, dq_py, eob_py), (q_c, dq_c, eob_c)


@needs_native
@pytest.mark.parametrize("ts", SIZES)
@pytest.mark.parametrize("tt", [TxType.DCT_DCT, TxType.ADST_ADST,
                                TxType.V_DCT])
def test_c_equals_python(ts, tt):
    if tt != TxType.DCT_DCT and max(TX_WIDTH[ts], TX_HEIGHT[ts]) > 16:
        pytest.skip("tx type not defined at this size")
    rng = np.random.default_rng(int(ts) * 31 + int(tt))
    fc = FrameCdfs(100)
    tables = rdoq.build_tables(fc)
    pq = qz.build_quantizer(8)[0]
    w, h = TX_WIDTH[ts], TX_HEIGHT[ts]
    for trial in range(12):
        qindex = int(rng.integers(20, 240))
        lam = rdoq.compute_rdmult(qindex, 8, trial % 2 == 0, 1, 4)
        rdmult = rdoq.plane_rdmult(lam, trial % 2 == 1, 0)
        # residual-ish coefficients: decaying magnitudes + outliers
        mag = (3000 / (1 + np.add.outer(np.arange(h), np.arange(w))))
        tc = (rng.normal(0, 1, (h, w)) * mag).astype(np.int32)
        qc, dqc = qz.quantize_b(tc, qindex, pq, ts)
        qc, dqc = np.asarray(qc), np.asarray(dqc)
        cw, ch = min(w, 32), min(h, 32)
        eob = cf.compute_eob(qc[:ch, :cw], ts, tt)
        if eob == 0:
            continue
        sk_ctx = int(rng.integers(0, 13))
        dc_ctx = int(rng.integers(0, 3))
        py, c = _run_both(tc, qc, dqc, eob, ts, tt, qindex, pq, tables,
                          rdmult, sk_ctx, dc_ctx, 0)
        assert py[2] == c[2], f"eob: py {py[2]} c {c[2]} trial {trial}"
        assert np.array_equal(py[0], c[0]), f"qc mismatch trial {trial}"
        assert np.array_equal(py[1], c[1]), f"dq mismatch trial {trial}"


@needs_native
def test_trellis_changes_levels_and_respects_skip():
    """High lambda must drive levels down / all the way to skip; low
    lambda must leave the quantizer output untouched more often."""
    rng = np.random.default_rng(7)
    fc = FrameCdfs(140)
    tables = rdoq.build_tables(fc)
    pq = qz.build_quantizer(8)[0]
    ts, tt = TxSize.TX_8X8, TxType.DCT_DCT
    qindex = 140
    tc = (rng.normal(0, 1, (8, 8)) * 600 /
          (1 + np.add.outer(np.arange(8), np.arange(8)))).astype(np.int32)
    qc, dqc = qz.quantize_b(tc, qindex, pq, ts)
    qc, dqc = np.asarray(qc), np.asarray(dqc)
    eob = cf.compute_eob(qc, ts, tt)
    assert eob > 0
    lam = rdoq.compute_rdmult(qindex, 8, True)
    # huge rdmult -> every coefficient gets zeroed (skip wins)
    py_hi, c_hi = _run_both(tc, qc, dqc, eob, ts, tt, qindex, pq, tables,
                            rdoq.plane_rdmult(lam * 4000, False, 0),
                            0, 0, 0)
    assert py_hi[2] == 0 and not py_hi[0].any()
    assert c_hi[2] == 0 and not c_hi[0].any()
    # zero rdmult -> distortion dominates; nothing should change
    py_lo, c_lo = _run_both(tc, qc, dqc, eob, ts, tt, qindex, pq, tables,
                            0, 0, 0, 0)
    assert py_lo[2] == eob and np.array_equal(py_lo[0], qc)
    assert np.array_equal(c_lo[0], qc)


@needs_native
def test_code_block_rdoq_matches_python_pipeline():
    """The fused native kernel with the trellis == quantize_fp +
    optimize_txb + inverse TX through the Python ops."""
    from svt_av1_tpu.ops import transforms as tf
    rng = np.random.default_rng(3)
    fc = FrameCdfs(120)
    tables = rdoq.build_tables(fc)
    pq = qz.build_quantizer(8)[0]
    for ts, tt in [(TxSize.TX_8X8, TxType.DCT_DCT),
                   (TxSize.TX_16X16, TxType.DCT_DCT),
                   (TxSize.TX_16X8, TxType.ADST_ADST)]:
        w, h = TX_WIDTH[ts], TX_HEIGHT[ts]
        qindex = 120
        lam = rdoq.compute_rdmult(qindex, 8, True)
        rdmult = rdoq.plane_rdmult(lam, False, 0)
        pred = rng.integers(0, 256, (h, w)).astype(np.int32)
        src = np.clip(pred + rng.integers(-40, 41, (h, w)), 0, 255)
        resid = (src - pred).astype(np.int32)
        ts_ctx, ems = cf.txs_ctx(ts), cf.eob_multi_size(ts)
        tabs = rdoq.sliced_tabs(tables, ts_ctx, 0, 2, 1, ems)
        shape = 1 if w < h else (2 if w > h else 0)
        got = block_plan.code_block(
            pq, qindex, ts, tt, 8, resid, pred,
            rdoq=(tabs, rdmult, _tx_class(tt), shape, 1))
        assert got is not None
        qc_n, eob_n, rec_n = got

        coeffs = np.asarray(tf.fwd_txfm2d(resid, tt, ts, 8))
        qc_p, dq_p = qz.quantize_fp(coeffs, qindex, pq, ts)
        qc_p, dq_p = np.asarray(qc_p).copy(), np.asarray(dq_p).copy()
        eob0 = cf.compute_eob(qc_p, ts, tt)
        scan = np.ascontiguousarray(cf.scan_for(ts, tt).astype(np.int16))
        deq = pq.dequant[qindex]
        eob_p = rdoq.optimize_txb(
            coeffs.astype(np.int32), qc_p, dq_p, eob0, scan, w, h,
            _tx_class(tt), qz.tx_log_scale(ts),
            (int(deq[0]), int(deq[1])), rdmult,
            (tabs[0], tabs[1], tabs[2], tabs[3], tabs[4], tabs[5]),
            tabs[6].reshape(2, 11), shape)
        assert eob_n == eob_p
        assert np.array_equal(qc_n, qc_p)
        if eob_p:
            rec_p = np.asarray(tf.inv_txfm2d_add(dq_p, pred, tt, ts, 8))
            assert np.array_equal(rec_n, rec_p)
