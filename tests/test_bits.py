"""Bit-level descriptor round-trip tests (spec section 4 descriptors)."""
import numpy as np
import pytest

from svt_av1_tpu.bitstream import BitWriter, BitReader, leb128_encode, leb128_decode


def test_f_roundtrip():
    w = BitWriter()
    values = [(5, 3), (0, 1), (1, 1), (1023, 10), (0, 7), (77, 8), (1, 2)]
    for v, n in values:
        w.f(v, n)
    w.byte_align()
    r = BitReader(w.bytes())
    for v, n in values:
        assert r.f(n) == v


@pytest.mark.parametrize("value", [0, 1, 2, 3, 7, 8, 100, 2**16, 2**30])
def test_uvlc_roundtrip(value):
    w = BitWriter()
    w.uvlc(value)
    w.byte_align()
    assert BitReader(w.bytes()).uvlc() == value


@pytest.mark.parametrize("value,n", [(0, 5), (7, 5), (-8, 5), (-1, 3), (3, 3)])
def test_su_roundtrip(value, n):
    w = BitWriter()
    w.su(value, n)
    w.byte_align()
    assert BitReader(w.bytes()).su(n) == value


@pytest.mark.parametrize("n", [1, 2, 3, 5, 7, 8, 9, 100])
def test_ns_roundtrip(n):
    for value in range(n):
        w = BitWriter()
        w.ns(value, n)
        w.byte_align()
        assert BitReader(w.bytes()).ns(n) == value


@pytest.mark.parametrize("value", [0, 1, 127, 128, 300, 2**21, 2**32 - 1])
def test_leb128_roundtrip(value):
    data = leb128_encode(value)
    got, pos = leb128_decode(data)
    assert got == value and pos == len(data)


def test_leb128_fixed_size():
    data = leb128_encode(5, fixed_size=2)
    assert len(data) == 2
    got, pos = leb128_decode(data)
    assert got == 5 and pos == 2


def test_trailing_bits():
    w = BitWriter()
    w.f(3, 3)
    w.trailing_bits()
    data = w.bytes()
    assert len(data) == 1
    assert data[0] == 0b01110000
