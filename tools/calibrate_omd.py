"""Fit the omd coefficient-rate proxy against the native trial packer.

bits ~ A*nnz + B*sum(log2(1+|q|)) + C*(nnz>0): least-squares over random
blocks spanning content energies, block sizes and qindex values.
Run from the repo root; prints the fitted constants."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from svt_av1_tpu.constants import TxSize, TxType, TX_WIDTH, TX_HEIGHT
from svt_av1_tpu.entropy import coeffs as cf
from svt_av1_tpu.entropy.tables import FrameCdfs
from svt_av1_tpu.ops import quant as qz
from svt_av1_tpu.ops import transforms as tf
from svt_av1_tpu.pipeline.rdo import _RateProbe


def main():
    rng = np.random.default_rng(11)
    rows = []
    sizes = [TxSize.TX_8X8, TxSize.TX_16X16, TxSize.TX_32X32,
             TxSize.TX_16X8, TxSize.TX_8X16]
    pq = qz.build_quantizer(8)[0]
    for qindex in (40, 80, 120, 160, 200, 240):
        fc = FrameCdfs(qindex)
        probe = _RateProbe(fc)
        for ts in sizes:
            h, w = TX_HEIGHT[ts], TX_WIDTH[ts]
            for amp in (4, 12, 30, 70, 140):
                for _ in range(6):
                    # mix of smooth + noise residuals
                    yy, xx = np.mgrid[0:h, 0:w]
                    f = rng.uniform(0.05, 0.8)
                    resid = (amp * np.sin(xx * f + rng.uniform(0, 6))
                             * np.cos(yy * f * 0.7)
                             + rng.normal(0, amp / 3, (h, w))
                             ).astype(np.int32)
                    coeffs = np.asarray(tf.fwd_txfm2d(
                        resid, TxType.DCT_DCT, ts, 8))
                    qc, _ = qz.quantize_b(coeffs, qindex, pq, ts)
                    qc = np.asarray(qc)
                    ch, cw = min(h, 32), min(w, 32)
                    eob = cf.compute_eob(qc[:ch, :cw], ts, TxType.DCT_DCT)
                    bits = probe.coeff_bits(qc[:ch, :cw], ts,
                                            TxType.DCT_DCT, 0, 0, 0, eob)
                    aq = np.abs(qc)
                    nnz = int((aq > 0).sum())
                    mag = float(np.log2(1.0 + aq).sum())
                    rows.append((nnz, mag, float(nnz > 0), bits))
    rows = np.array(rows)
    X, y = rows[:, :3], rows[:, 3]
    coef, res, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ coef
    rel = np.abs(pred - y)[y > 4] / y[y > 4]
    print(f"RATE_NNZ = {coef[0]:.3f}")
    print(f"RATE_MAG = {coef[1]:.3f}")
    print(f"RATE_TXB = {coef[2]:.3f}")
    print(f"median rel err: {np.median(rel):.3f}  n={len(y)}")


if __name__ == "__main__":
    main()
