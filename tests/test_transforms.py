"""Transform engine tests.

Tier 1 (always): structural invariants + fwd/inv round-trip accuracy vs a
float DCT oracle (the analog of test/ref/TxfmRef.cc double-precision
checks).
Tier 2 (oracle): bit-exact equivalence against the reference C kernels
for every size x type x pattern, mirroring FwdTxfm2dAsmTest/
InvTxfm2dAsmTest.
"""
import numpy as np
import pytest

import oracle
from svt_av1_tpu.constants import TxSize, TxType, TX_WIDTH, TX_HEIGHT
from svt_av1_tpu.ops import transforms as tf

ALL_SIZES = list(TxSize)

# Valid (size, type) pairs: ADST only for dims <= 16, IDTX family <= 32.
def _valid(tx_size: TxSize, tx_type: TxType) -> bool:
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    vt, ht = tf._VTX[tx_type], tf._HTX[tx_type]
    for kind, n in ((vt, h), (ht, w)):
        if kind in (tf.ADST, tf.FLIPADST) and n > 16:
            return False
        if kind == tf.IDTX and n > 32:
            return False
        if kind == tf.DCT and n > 64:
            return False
    return True


def _patterns(rng, w, h, bd):
    mx = (1 << bd) - 1
    return [
        rng.integers(-mx, mx + 1, size=(h, w)),
        np.full((h, w), mx),
        np.full((h, w), -mx),
        np.zeros((h, w), dtype=np.int64),
    ]


@pytest.mark.parametrize("tx_size", ALL_SIZES)
def test_dct_roundtrip_accuracy(tx_size):
    """fwd then inv recovers the residual to within quantization noise."""
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    rng = np.random.default_rng(int(tx_size))
    # smooth residual (gradient + mild noise): representative content whose
    # energy survives the 64-pt high-frequency drop
    yy, xx = np.mgrid[0:h, 0:w]
    resid = (40 * np.sin(xx / 7) + 30 * np.cos(yy / 9)
             + rng.integers(-8, 9, size=(h, w))).astype(np.int32)
    coeffs = tf.fwd_txfm2d(resid, TxType.DCT_DCT, tx_size, bd=8)
    pred = np.full((h, w), 128, dtype=np.int32)
    recon = tf.inv_txfm2d_add(coeffs, pred, TxType.DCT_DCT, tx_size, bd=8)
    target = np.clip(pred + resid, 0, 255)
    err = np.abs(recon.astype(np.int64) - target)
    # 64-pt sizes normatively drop coeffs outside the top-left 32x32, so
    # the noise floor cannot round-trip (verified identical to reference)
    tol = 4 if max(w, h) == 64 else 3
    assert err.mean() <= tol, f"mean err {err.mean()}"


def test_dc_only_energy():
    """A flat residual concentrates in the DC coefficient."""
    resid = np.full((8, 8), 100, dtype=np.int32)
    coeffs = tf.fwd_txfm2d(resid, TxType.DCT_DCT, TxSize.TX_8X8)
    total = np.abs(coeffs).sum()
    assert np.abs(coeffs[0, 0]) / total > 0.999


def test_batched_matches_single():
    rng = np.random.default_rng(1)
    batch = rng.integers(-255, 256, size=(5, 16, 16)).astype(np.int32)
    got = tf.fwd_txfm2d(batch, TxType.ADST_DCT, TxSize.TX_16X16)
    for i in range(5):
        single = tf.fwd_txfm2d(batch[i], TxType.ADST_DCT, TxSize.TX_16X16)
        np.testing.assert_array_equal(got[i], single)


needs_oracle = pytest.mark.skipif(not oracle.available(),
                                  reason="reference oracle lib not built")


@needs_oracle
@pytest.mark.parametrize("tx_size", ALL_SIZES)
@pytest.mark.parametrize("tx_type", list(TxType))
def test_fwd_matches_reference(tx_size, tx_type):
    if not _valid(tx_size, tx_type):
        pytest.skip("invalid size/type combo")
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    rng = np.random.default_rng(1000 + tx_size * 16 + tx_type)
    for resid in _patterns(rng, w, h, 8):
        want = oracle.fwd_txfm2d(resid, int(tx_type), bd=8)
        got = tf.fwd_txfm2d(resid.astype(np.int32), tx_type, tx_size, bd=8)
        if max(w, h) == 64:  # reference keeps unused high-freq energy
            want = want[:min(h, 32), :min(w, 32)]
            got = np.asarray(got)[:min(h, 32), :min(w, 32)]
        np.testing.assert_array_equal(np.asarray(got), want,
                                      err_msg=f"{tx_size.name}/{tx_type.name}")


@needs_oracle
@pytest.mark.parametrize("tx_size", ALL_SIZES)
@pytest.mark.parametrize("tx_type", list(TxType))
def test_inv_matches_reference(tx_size, tx_type):
    if not _valid(tx_size, tx_type):
        pytest.skip("invalid size/type combo")
    w, h = TX_WIDTH[tx_size], TX_HEIGHT[tx_size]
    rng = np.random.default_rng(2000 + tx_size * 16 + tx_type)
    # realistic coeff magnitudes: forward-transformed random residual
    resid = rng.integers(-255, 256, size=(h, w))
    coeffs = oracle.fwd_txfm2d(resid, int(tx_type), bd=8)
    if max(w, h) == 64:
        mask = np.zeros_like(coeffs)
        mask[:min(h, 32), :min(w, 32)] = 1
        coeffs = coeffs * mask
    pred = rng.integers(0, 256, size=(h, w))
    want = oracle.inv_txfm2d_add(coeffs, pred, int(tx_type), bd=8)
    got = tf.inv_txfm2d_add(coeffs.astype(np.int32), pred.astype(np.int32),
                            tx_type, tx_size, bd=8)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int64),
                                  err_msg=f"{tx_size.name}/{tx_type.name}")


@needs_oracle
def test_fwd_matches_reference_10bit():
    rng = np.random.default_rng(7)
    resid = rng.integers(-1023, 1024, size=(16, 16))
    want = oracle.fwd_txfm2d(resid, int(TxType.DCT_DCT), bd=10)
    got = tf.fwd_txfm2d(resid.astype(np.int32), TxType.DCT_DCT,
                        TxSize.TX_16X16, bd=10)
    np.testing.assert_array_equal(np.asarray(got), want)
