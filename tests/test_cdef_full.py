"""Full-plane (device-form) CDEF vs the unit-window reference form.

The unit-window implementation is oracle-tested (test_cdef.py); the
full-plane form must match it bit-for-bit, including the exact int32
digit arithmetic replacing the int64 direction cost."""
import numpy as np
import pytest

from svt_av1_tpu.ops import cdef as cd


def _mk(seed, fw, fh):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (fh, fw)).astype(np.int32)
    u = rng.integers(0, 256, (fh // 2, fw // 2)).astype(np.int32)
    v = rng.integers(0, 256, (fh // 2, fw // 2)).astype(np.int32)
    return [y, u, v]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("fw,fh", [(64, 64), (88, 72), (48, 40)])
def test_find_dir_grid_matches(seed, fw, fh):
    planes = _mk(seed, fw, fh)
    # build unit windows the frame path builds (incl. VERY_LARGE edges)
    r1 = (-(-fh // 8))
    c1 = (-(-fw // 8))
    by, bx = np.meshgrid(np.arange(r1), np.arange(c1), indexing="ij")
    by, bx = by.ravel().astype(np.int32), bx.ravel().astype(np.int32)
    win = cd._extract_windows(planes[0], by, bx, 8, 8, fw, fh)
    dirs_ref, var_ref = cd.find_dir(win[:, 2:10, 2:10].astype(np.uint16), 0)

    padded = cd.pad_very_large(planes[0], fw, fh, 8)
    units = cd._units_of(padded, fw, fh, 8, np)
    dirs, var = cd.find_dir_grid(units, 0)
    assert np.array_equal(dirs.ravel(), dirs_ref)
    assert np.array_equal(var.ravel(), var_ref)


def test_find_dir_grid_10bit():
    rng = np.random.default_rng(7)
    y = rng.integers(0, 1024, (40, 48)).astype(np.int32)
    r1, c1 = 5, 6
    by, bx = np.meshgrid(np.arange(r1), np.arange(c1), indexing="ij")
    by, bx = by.ravel().astype(np.int32), bx.ravel().astype(np.int32)
    win = cd._extract_windows(y, by, bx, 8, 8, 48, 40)
    dirs_ref, var_ref = cd.find_dir(win[:, 2:10, 2:10].astype(np.uint16), 2)
    padded = cd.pad_very_large(y, 48, 40, 8)
    dirs, var = cd.find_dir_grid(cd._units_of(padded, 48, 40, 8, np), 2)
    assert np.array_equal(dirs.ravel(), dirs_ref)
    assert np.array_equal(var.ravel(), var_ref)


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("fw,fh", [(64, 64), (88, 72), (176, 144)])
@pytest.mark.parametrize("ystr,uvstr", [(9, 6), (4, 0), (0, 5), (63, 15)])
@pytest.mark.parametrize("bd", [8, 10])
def test_apply_full_matches_windows(seed, fw, fh, ystr, uvstr, bd):
    planes = _mk(seed, fw, fh)
    if bd == 10:
        planes = [p * 4 for p in planes]
    mi_rows, mi_cols = fh // 4, fw // 4
    rng = np.random.default_rng(seed + 99)
    skips = rng.integers(0, 2, (mi_rows, mi_cols)).astype(np.int32)

    ref = cd.cdef_frame([p.copy() for p in planes], skips, mi_rows,
                        mi_cols, ystr, uvstr, 5, bd)

    # full-plane path
    uh, uw = -(-fh // 8), -(-fw // 8)
    s = np.ones((uh * 2, uw * 2), bool)
    s[:mi_rows, :mi_cols] = skips != 0
    nonskip = ~s.reshape(uh, 2, uw, 2).all(axis=(1, 3))
    cs = max(bd - 8, 0)
    padded = cd.pad_very_large(planes[0], fw, fh, 8)
    dirs, var = cd.find_dir_grid(
        (cd._units_of(padded, fw, fh, 8, np).astype(np.uint16)
         ).astype(np.int32), cs)
    got = cd.cdef_plane_full([p.copy() for p in planes], dirs, var,
                             nonskip, fw, fh, ystr, uvstr, 5, bd)
    for p in range(3):
        np.testing.assert_array_equal(got[p], ref[p], err_msg=f"plane {p}")
