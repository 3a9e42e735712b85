"""Wedge / diffwtd / inter-intra mask parity vs the reference oracle."""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.ops import masks

import oracle

# our (w,h) -> reference BlockSize enum
_BSIZE_ENUM = {(8, 8): 3, (8, 16): 4, (16, 8): 5, (16, 16): 6,
               (16, 32): 7, (32, 16): 8, (32, 32): 9,
               (8, 32): 18, (32, 8): 19}


@pytest.fixture(scope="module")
def lib():
    l = oracle.lib()
    if l is None:
        pytest.skip("oracle lib not built")
    l.svt_av1_init_wedge_masks()
    return l


@pytest.mark.parametrize("wh", sorted(_BSIZE_ENUM))
def test_wedge_masks_bit_exact(lib, wh):
    w, h = wh
    fn = lib.av1_get_contiguous_soft_mask
    fn.restype = ctypes.POINTER(ctypes.c_uint8)
    for idx in range(16):
        for sign in (0, 1):
            p = fn(ctypes.c_int(idx), ctypes.c_int(sign),
                   ctypes.c_int(_BSIZE_ENUM[wh]))
            ref = np.ctypeslib.as_array(p, shape=(h, w)).copy()
            ours = masks.wedge_mask(w, h, idx, sign)
            np.testing.assert_array_equal(ours, ref,
                                          err_msg=f"{wh} idx{idx} s{sign}")


@pytest.mark.parametrize("wh", sorted(_BSIZE_ENUM))
@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_smooth_interintra_masks(lib, wh, mode):
    w, h = wh
    out = np.zeros((h, w), np.uint8)
    lib.build_smooth_interintra_mask(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(w), ctypes.c_int(_BSIZE_ENUM[wh]),
        ctypes.c_int(mode))
    np.testing.assert_array_equal(
        masks.smooth_interintra_mask(w, h, mode), out,
        err_msg=f"{wh} mode{mode}")


def test_diffwtd_and_blend_roundtrip():
    """diffwtd mask + d16 blend against hand-checked AOM semantics."""
    rng = np.random.default_rng(0)
    bd = 8
    offset_bits = bd + 2 * 7 - 3
    base = 1 << (offset_bits - 7)
    c0 = rng.integers(0, 4 * base, (16, 16)).astype(np.int32)
    c1 = rng.integers(0, 4 * base, (16, 16)).astype(np.int32)
    m = masks.diffwtd_mask_d16(c0, c1, 0, bd)
    mi = masks.diffwtd_mask_d16(c0, c1, 1, bd)
    assert (m + mi == 64).all()
    assert m.min() >= 0 and m.max() <= 64
    out = masks.blend_a64_d16(c0, c1, m, 0, 0, bd)
    assert out.min() >= 0 and out.max() <= 255
    # mask==64 -> pure pred0 path must equal the jnt average round of c0
    full = masks.blend_a64_d16(c0, c0, np.full((16, 16), 64, np.uint8),
                               0, 0, bd)
    half = masks.blend_a64_d16(c0, c0, np.full((16, 16), 32, np.uint8),
                               0, 0, bd)
    np.testing.assert_array_equal(full, half)
