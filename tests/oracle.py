"""ctypes bindings to the reference C kernels (conformance oracle).

The reference library is compiled once into /tmp/refbin/liboracle.so with
default symbol visibility (see .claude/skills/verify/SKILL.md for the
build recipe).  Tests using the oracle skip gracefully when it is absent.

This is the TPU build's analog of the reference's own C-vs-SIMD
equivalence tests (test/FwdTxfm2dAsmTest.cc etc.): our batched kernels
must match the reference C kernels bit-exactly.
"""
from __future__ import annotations

import ctypes
import functools
import os
from pathlib import Path

import numpy as np

ORACLE_PATH = Path(os.environ.get("SVT_ORACLE_LIB", "/tmp/refbin/liboracle.so"))

I16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
I32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
U16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
U8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


@functools.cache
def lib() -> ctypes.CDLL | None:
    if not ORACLE_PATH.exists():
        return None
    L = ctypes.CDLL(str(ORACLE_PATH), mode=os.RTLD_LAZY)
    # Populate the rtcd function-pointer tables (C-only build: flags=0),
    # otherwise helpers like svt_memcpy are NULL.
    L.setup_common_rtcd_internal(ctypes.c_uint64(0))
    L.setup_rtcd_internal(ctypes.c_uint64(0))
    return L


def available() -> bool:
    return lib() is not None


@functools.cache
def fwd_txfm2d_fn(w: int, h: int):
    """Reference forward transform entry for a given size."""
    L = lib()
    name = (f"svt_av1_transform_two_d_{w}x{h}_c" if w == h
            else f"svt_av1_fwd_txfm2d_{w}x{h}_c")
    fn = getattr(L, name)
    fn.argtypes = [I16, I32, ctypes.c_uint32, ctypes.c_int, ctypes.c_uint8]
    fn.restype = None
    return fn


def fwd_txfm2d(residual: np.ndarray, tx_type: int, bd: int = 8) -> np.ndarray:
    h, w = residual.shape
    out = np.zeros(h * w, dtype=np.int32)
    src = np.ascontiguousarray(residual, dtype=np.int16)
    fwd_txfm2d_fn(w, h)(src.reshape(-1), out, w, tx_type, bd)
    return out.reshape(h, w)


# TxSize enum value per (w, h), matching the reference's TxSize ordering.
_TX_SIZE_OF = {
    (4, 4): 0, (8, 8): 1, (16, 16): 2, (32, 32): 3, (64, 64): 4,
    (4, 8): 5, (8, 4): 6, (8, 16): 7, (16, 8): 8, (16, 32): 9,
    (32, 16): 10, (32, 64): 11, (64, 32): 12, (4, 16): 13, (16, 4): 14,
    (8, 32): 15, (32, 8): 16, (16, 64): 17, (64, 16): 18,
}
# Which rect sizes take (tx_size) / (tx_size, eob) extra args.
_INV_EXTRA_TXSIZE = {(4, 8), (8, 4), (4, 16), (16, 4)}


@functools.cache
def inv_txfm2d_add_fn(w: int, h: int):
    L = lib()
    fn = getattr(L, f"svt_av1_inv_txfm2d_add_{w}x{h}_c")
    base = [I32, U16, ctypes.c_int32, U16, ctypes.c_int32, ctypes.c_int]
    if (w, h) in _INV_EXTRA_TXSIZE:
        base += [ctypes.c_int, ctypes.c_int32]          # tx_size, bd
    elif w == h:
        base += [ctypes.c_int32]                        # bd
    else:
        base += [ctypes.c_int, ctypes.c_int32, ctypes.c_int32]  # tx_size, eob, bd
    fn.argtypes = base
    fn.restype = None
    return fn


def inv_txfm2d_add(coeffs: np.ndarray, pred: np.ndarray, tx_type: int,
                   bd: int = 8) -> np.ndarray:
    """Reference inverse transform + add.  coeffs is the full [h, w]
    plane; 64-point sizes pass the packed top-left 32x32 region like the
    reference API expects."""
    h, w = pred.shape
    cw, ch = min(w, 32), min(h, 32)
    packed = np.ascontiguousarray(coeffs[:ch, :cw], dtype=np.int32)
    recon = np.ascontiguousarray(pred, dtype=np.uint16)
    out = np.zeros_like(recon)
    fn = inv_txfm2d_add_fn(w, h)
    args = [packed.reshape(-1), recon.reshape(-1), w, out.reshape(-1), w, tx_type]
    if (w, h) in _INV_EXTRA_TXSIZE:
        args += [_TX_SIZE_OF[(w, h)], bd]
    elif w == h:
        args += [bd]
    else:
        args += [_TX_SIZE_OF[(w, h)], w * h, bd]
    fn(*args)
    return out


# --------------------------------------------------------------------------
# CDEF (EbCdef.c svt_cdef_find_dir_c:133, svt_cdef_filter_block_c:204)
# --------------------------------------------------------------------------

@functools.cache
def _cdef_fns():
    L = lib()
    fd = L.svt_cdef_find_dir_c
    fd.argtypes = [U16, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
                   ctypes.c_int32]
    fd.restype = ctypes.c_int32
    fb = L.svt_cdef_filter_block_c
    fb.argtypes = [ctypes.c_void_p, U16, ctypes.c_int32, ctypes.c_void_p,
                   ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_int32]
    fb.restype = None
    return fd, fb


def cdef_find_dir(block8: np.ndarray, coeff_shift: int = 0):
    """Reference direction search on one 8x8 uint16 block."""
    fd, _ = _cdef_fns()
    buf = np.ascontiguousarray(block8, dtype=np.uint16)
    var = ctypes.c_int32(0)
    d = fd(buf.reshape(-1), 8, ctypes.byref(var), coeff_shift)
    return int(d), int(var.value)


CDEF_BSTRIDE = 144  # ALIGN_POWER_OF_TWO(128 + 16, 3)


def cdef_filter_block(window: np.ndarray, pri_strength: int,
                      sec_strength: int, direction: int, pri_damping: int,
                      sec_damping: int, bsize_8x8: bool,
                      coeff_shift: int = 0) -> np.ndarray:
    """Reference CDEF of one block.  window is [h+4, w+4] uint16 with the
    2-px borders; returns [h, w] uint16."""
    _, fb = _cdef_fns()
    h = 8 if bsize_8x8 else 4
    w = 8 if bsize_8x8 else 4
    inbuf = np.full((h + 4, CDEF_BSTRIDE), 16384, np.uint16)
    inbuf[:, :w + 4] = window
    out = np.zeros((h, w), np.uint16)
    # in-pointer targets the block center origin; taps reach the borders
    # via negative offsets, so pass an interior address of the buffer
    center = inbuf.ctypes.data + 2 * (2 * CDEF_BSTRIDE + 2)
    # BLOCK_8X8 = 3 in the BlockSize enum; BLOCK_4X4 = 0
    fb(None, out.reshape(-1), w, center,
       pri_strength, sec_strength, direction, pri_damping, sec_damping,
       3 if bsize_8x8 else 0, coeff_shift)
    return out
