"""Motion estimation + inter convolve tests (analogs of SadTest.cc,
convolve_2d_test.cc)."""
import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_tpu.ops import inter, me

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="no oracle lib")


# ---------------------------------------------------------------- SAD ----

def test_sad_full_search_matches_direct():
    rng = np.random.default_rng(0)
    block = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    window = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    got = me.sad_full_search(block, window)
    assert got.shape == (17, 25)
    for y in (0, 5, 16):
        for x in (0, 9, 24):
            want = np.abs(window[y:y + 16, x:x + 16].astype(int)
                          - block.astype(int)).sum()
            assert got[y, x] == want


def test_sad8x8_pyramid_aggregation():
    rng = np.random.default_rng(1)
    sb = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    window = rng.integers(0, 256, (80, 80)).astype(np.uint8)
    sad8 = me.sad8x8_grid(sb, window)
    assert sad8.shape == (8, 8, 17, 17)
    # aggregate to 16x16 and check one position against direct SAD
    sad16 = me.aggregate_sads(sad8, 16)
    assert sad16.shape == (4, 4, 17, 17)
    # 16x16 block at (16,16) within the SB; position (3,5) in the window
    # corresponds to ref offset (3+16, 5+16)
    blk = sb[16:32, 16:32]
    want = np.abs(window[16 + 3:16 + 19, 16 + 5:16 + 21].astype(int)
                  - blk.astype(int)).sum()
    assert sad16[1, 1, 3, 5] == want
    sad64 = me.aggregate_sads(sad8, 64)
    assert sad64.shape == (1, 1, 17, 17)
    assert sad64[0, 0, 0, 0] == np.abs(window[:64, :64].astype(int)
                                       - sb.astype(int)).sum()


def test_hierarchical_me_finds_global_shift():
    """A pure translation must be recovered exactly."""
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, (256, 320)).astype(np.uint8)
    # smooth it so decimation aliasing doesn't break level 0
    base = (base.astype(np.int32) + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, (1, 1), (0, 1))) // 4
    shift_x, shift_y = 12, -8
    ref = base
    src = np.roll(np.roll(base, -shift_y, axis=0), -shift_x, axis=1)
    mv_x, mv_y, sad = me.hierarchical_me(src, ref, 128, 128, 64)
    assert (mv_x, mv_y) == (shift_x, shift_y), (mv_x, mv_y, sad)
    assert sad == 0


@needs_oracle
def test_sad_matches_reference_kernel():
    L = oracle.lib()
    fn = L.svt_nxm_sad_kernel_helper_c
    fn.restype = ctypes.c_uint32
    U8P = ctypes.POINTER(ctypes.c_uint8)
    fn.argtypes = [U8P, ctypes.c_uint32, U8P, ctypes.c_uint32,
                   ctypes.c_uint32, ctypes.c_uint32]
    rng = np.random.default_rng(3)
    for bw, bh in ((16, 16), (64, 64), (32, 16)):
        src = np.ascontiguousarray(rng.integers(0, 256, (bh, bw)), dtype=np.uint8)
        ref = np.ascontiguousarray(rng.integers(0, 256, (bh, bw)), dtype=np.uint8)
        want = fn(src.ctypes.data_as(U8P), bw, ref.ctypes.data_as(U8P), bw, bh, bw)
        got = int(me.sad_full_search(src, ref)[0, 0])
        assert got == want


# ----------------------------------------------------------- convolve ----

def _conv_params_buf():
    # ConvolveParams layout: we only need round_0/round_1/is_compound for
    # the sr paths; build the struct as raw ints matching convolve.h
    class CP(ctypes.Structure):  # EbDefinitions.h:379 ConvolveParams
        _fields_ = [("ref", ctypes.c_int32),
                    ("do_average", ctypes.c_int32),
                    ("dst", ctypes.c_void_p),
                    ("dst_stride", ctypes.c_int32),
                    ("round_0", ctypes.c_int32),
                    ("round_1", ctypes.c_int32),
                    ("plane", ctypes.c_int32),
                    ("is_compound", ctypes.c_int32),
                    ("use_jnt_comp_avg", ctypes.c_int32),
                    ("fwd_offset", ctypes.c_int32),
                    ("bck_offset", ctypes.c_int32),
                    ("use_dist_wtd_comp_avg", ctypes.c_int32)]
    cp = CP()
    cp.do_average = 0
    cp.is_compound = 0
    cp.round_0 = 3
    cp.round_1 = 11
    return cp


def _filter_params(taps=8, kind=0):
    class FP(ctypes.Structure):
        _fields_ = [("filter_ptr", ctypes.c_void_p),
                    ("taps", ctypes.c_uint16),
                    ("subpel_shifts", ctypes.c_uint16),
                    ("interp_filter", ctypes.c_int32)]
    from svt_av1_tpu.entropy.tables import table
    name = {0: "sub_pel_filters_8", 1: "sub_pel_filters_8smooth",
            2: "sub_pel_filters_8sharp"}[kind]
    arr = np.ascontiguousarray(table(name), dtype=np.int16)
    fp = FP()
    fp.filter_ptr = arr.ctypes.data
    fp.taps = 8
    fp.subpel_shifts = 16
    fp.interp_filter = kind
    return fp, arr  # keep arr alive


@needs_oracle
@pytest.mark.parametrize("subx,suby", [(0, 0), (8, 0), (0, 8), (8, 8),
                                       (5, 11), (15, 1)])
@pytest.mark.parametrize("kind", [0, 1, 2])
def test_convolve_2d_matches_reference(subx, suby, kind):
    L = oracle.lib()
    rng = np.random.default_rng(subx * 31 + suby + kind)
    W, H = 32, 16
    src = np.ascontiguousarray(rng.integers(0, 256, (H + 16, W + 16)),
                               dtype=np.uint8)
    dst = np.zeros((H, W), dtype=np.uint8)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    fpx, keep1 = _filter_params(kind=kind)
    fpy, keep2 = _filter_params(kind=kind)
    cp = _conv_params_buf()
    if subx and suby:
        fn = L.svt_av1_convolve_2d_sr_c
    elif subx:
        fn = L.svt_av1_convolve_x_sr_c
    elif suby:
        fn = L.svt_av1_convolve_y_sr_c
    else:
        fn = L.svt_av1_convolve_2d_copy_sr_c
    fn.restype = None
    fn.argtypes = [U8P, ctypes.c_int32, U8P, ctypes.c_int32,
                   ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_void_p, ctypes.c_void_p,
                   ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p]
    src_off = 8 * (W + 16) + 8   # block origin at (8, 8)
    fn(ctypes.cast(src.ctypes.data + src_off, U8P), W + 16,
       dst.ctypes.data_as(U8P), W, W, H,
       ctypes.byref(fpx), ctypes.byref(fpy), subx, suby, ctypes.byref(cp))
    got = np.asarray(inter.convolve_2d_sr(src, 8, 8, W, H, subx, suby,
                                          kind, kind))
    np.testing.assert_array_equal(got, dst.astype(np.int32),
                                  err_msg=f"sub=({subx},{suby}) kind={kind}")
