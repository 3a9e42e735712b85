"""CDEF kernels vs the reference C oracle (EbCdef.c), mirroring the
reference's CdefTest.cc equivalence strategy."""
import numpy as np
import pytest

from svt_av1_tpu.ops import cdef
import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference oracle lib not built")

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("coeff_shift", [0, 2])
def test_find_dir_matches_reference(coeff_shift):
    hi = 256 << coeff_shift
    blocks = RNG.integers(0, hi, size=(64, 8, 8)).astype(np.uint16)
    # include flat + strong-edge blocks
    blocks[0] = 128 << coeff_shift
    blocks[1] = (np.arange(8)[None, :] * 30) << coeff_shift
    blocks[2] = (np.arange(8)[:, None] * 30) << coeff_shift
    dirs, var = cdef.find_dir(blocks, coeff_shift)
    for i, b in enumerate(blocks):
        d_ref, v_ref = oracle.cdef_find_dir(b, coeff_shift)
        assert dirs[i] == d_ref, i
        assert var[i] == v_ref, i


@pytest.mark.parametrize("bsize8", [True, False])
@pytest.mark.parametrize("coeff_shift", [0, 2])
def test_filter_block_matches_reference(bsize8, coeff_shift):
    h = w = 8 if bsize8 else 4
    hi = 256 << coeff_shift
    n = 40
    wins = RNG.integers(0, hi, size=(n, h + 4, w + 4)).astype(np.uint16)
    # sprinkle CDEF_VERY_LARGE border pixels like frame edges produce
    wins[5, :2, :] = cdef.CDEF_VERY_LARGE
    wins[6, :, -2:] = cdef.CDEF_VERY_LARGE
    dirs = RNG.integers(0, 8, size=n).astype(np.int32)
    for pri in (0, 1, 4, 15 << coeff_shift, (3 << coeff_shift) | 1):
        for sec in (0, 1, 2, 4 << coeff_shift):
            damping = (5 if h == 8 else 4) + coeff_shift
            got = cdef.filter_blocks(
                wins.astype(np.int32), dirs,
                np.full(n, pri, np.int32), sec, damping, damping,
                coeff_shift)
            for i in range(n):
                ref = oracle.cdef_filter_block(
                    wins[i], pri, sec, int(dirs[i]), damping, damping,
                    bsize8, coeff_shift)
                assert np.array_equal(got[i], ref.astype(np.int32)), (
                    i, pri, sec)


def test_adjust_strength_matches_reference_formula():
    var = np.array([0, 1, 63, 64, 65, 640, 1 << 14, 1 << 22], np.int64)
    got = cdef.adjust_strength(12, var)

    def ref_one(v):
        if v == 0:
            return 0
        i = min((v >> 6).bit_length() - 1, 12) if (v >> 6) else 0
        return (12 * (4 + i) + 8) >> 4

    assert list(got) == [ref_one(int(v)) for v in var]


def test_nonskip_units_spec_rule():
    skips = np.zeros((4, 4), np.int32)
    skips[:2, :2] = 1                      # top-left 8x8 all-skip
    skips[0, 2] = 1                        # partial skip: still filtered
    by, bx = cdef._nonskip_units(skips, 4, 4)
    assert set(zip(by.tolist(), bx.tolist())) == {(0, 1), (1, 0), (1, 1)}
