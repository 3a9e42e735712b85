"""Spec-table integrity tests: CDF layout invariants, quantizer lookups,
scan order permutations."""
import numpy as np
import pytest

from svt_av1_tpu.entropy import tables


def test_quant_lookup_endpoints():
    # Spec anchor values: qindex 0 is lossless-ish step 4 (Q3)
    assert tables.dc_q(0, 8) == 4
    assert tables.ac_q(0, 8) == 4
    assert tables.ac_q(255, 8) == 1828
    assert tables.dc_q(255, 8) == 1336
    # 10-bit tables are larger-valued
    assert tables.ac_q(128, 10) > tables.ac_q(128, 8)


def test_quant_monotone():
    for bd in (8, 10):
        dcs = [tables.dc_q(q, bd) for q in range(256)]
        acs = [tables.ac_q(q, bd) for q in range(256)]
        assert all(b >= a for a, b in zip(dcs, dcs[1:]))
        assert all(b >= a for a, b in zip(acs, acs[1:]))


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 16), (32, 32),
                                 (4, 8), (16, 8), (8, 32), (16, 4)])
def test_scan_is_permutation(w, h):
    for kind in ("default", "mrow", "mcol"):
        scan = tables.scan_order(w, h, kind)
        assert sorted(scan.tolist()) == list(range(w * h))


def test_scan_64_reuses_32():
    np.testing.assert_array_equal(
        tables.scan_order(64, 64), tables.scan_order(32, 32))


def test_default_scan_4x4_zigzag():
    # First diagonal entries of the spec's zigzag scan
    scan = tables.scan_order(4, 4)
    assert scan[:5].tolist() == [0, 1, 4, 8, 5]


def test_frame_cdfs_layout():
    fc = tables.FrameCdfs(base_qindex=100)
    # icdf rows end with 0 (terminal) then counter 0 at init
    assert fc.skip.shape == (3, 3)
    assert np.all(fc.skip[:, 1] == 0)       # icdf[nsyms-1] == 0
    assert np.all(fc.skip[:, 2] == 0)       # counter
    # partition ctx rows are non-increasing over valid symbols
    row = fc.partition[0][:10]
    assert all(int(a) >= int(b) for a, b in zip(row, row[1:]))


def test_frame_cdfs_qctx_selection():
    lo = tables.FrameCdfs(base_qindex=10)
    hi = tables.FrameCdfs(base_qindex=200)
    assert not np.array_equal(lo.txb_skip, hi.txb_skip)
    assert tables.get_qctx(20) == 0
    assert tables.get_qctx(21) == 1
    assert tables.get_qctx(120) == 2
    assert tables.get_qctx(121) == 3


def test_frame_cdfs_copy_independent():
    fc = tables.FrameCdfs(0)
    cp = fc.copy()
    fc.skip[0, 0] = 123
    assert cp.skip[0, 0] != 123 or fc.skip[0, 0] == cp.skip[0, 0] - 0  # deep copy
    assert cp.skip[0, 0] != 123


def test_ssim_vectorized_matches_window_loop():
    import numpy as np
    from svt_av1_tpu.utils import metrics
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-6, 7, a.shape), 0, 255)
    fast = metrics.ssim(a, b)
    slow = metrics._ssim_8x8(a, b)
    assert abs(fast - slow) < 1e-9
    assert metrics.ssim(a, a) == 1.0
