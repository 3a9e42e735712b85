"""Range coder tests: encoder/decoder round-trip under random symbol
streams, CDF adaptation symmetry, and boundary patterns.

This is the analog of the reference's BitstreamWriterTest.cc — here the
oracle is exact enc/dec inversion (the coder pair must agree bit-for-bit
for all streams), plus cross-checks against the reference decoder run on
full bitstreams in the e2e tests.
"""
import numpy as np
import pytest

from svt_av1_tpu.entropy import (
    RangeEncoder,
    RangeDecoder,
    update_cdf,
    icdf_with_counter,
)


def random_icdf(rng, nsyms):
    """Random valid icdf with strictly positive symbol probabilities."""
    cuts = np.sort(rng.choice(np.arange(1, 32768), size=nsyms - 1, replace=False))
    cum = np.concatenate([cuts, [32768]])
    return icdf_with_counter(list(cum))


@pytest.mark.parametrize("nsyms", [2, 3, 4, 8, 13, 16])
def test_cdf_roundtrip_static(nsyms):
    rng = np.random.default_rng(nsyms)
    icdf = random_icdf(rng, nsyms)
    syms = rng.integers(0, nsyms, size=2000)
    enc = RangeEncoder()
    for s in syms:
        enc.encode_cdf(int(s), icdf, nsyms)
    data = enc.done()
    dec = RangeDecoder(data)
    for s in syms:
        assert dec.decode_cdf(icdf, nsyms) == s


@pytest.mark.parametrize("nsyms", [2, 4, 11, 16])
def test_cdf_roundtrip_adaptive(nsyms):
    rng = np.random.default_rng(100 + nsyms)
    icdf0 = random_icdf(rng, nsyms)
    syms = rng.integers(0, nsyms, size=3000)

    enc = RangeEncoder()
    enc_icdf = icdf0.copy()
    for s in syms:
        enc.encode_symbol(int(s), enc_icdf, nsyms)
    data = enc.done()

    dec = RangeDecoder(data)
    dec_icdf = icdf0.copy()
    for s in syms:
        assert dec.decode_symbol(dec_icdf, nsyms) == s
    np.testing.assert_array_equal(enc_icdf, dec_icdf)


def test_bool_and_literal_roundtrip():
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, size=500)
    lits = [(int(v), int(n)) for n in rng.integers(1, 16, size=100)
            for v in [rng.integers(0, 1 << n)]]
    probs = rng.integers(1, 255, size=500)

    enc = RangeEncoder()
    for b, p in zip(bits, probs):
        enc.encode_bool_prob8(int(b), int(p))
    for v, n in lits:
        enc.encode_literal(v, n)
    data = enc.done()

    dec = RangeDecoder(data)
    for b, p in zip(bits, probs):
        assert dec.decode_bool_prob8(int(p)) == b
    for v, n in lits:
        assert dec.decode_literal(n) == v


def test_skewed_distribution_roundtrip():
    # heavily skewed CDF exercises the EC_MIN_PROB floor path
    icdf = icdf_with_counter([32704, 32736, 32752, 32768])
    nsyms = 4
    syms = [0] * 100 + [3, 2, 1] * 30 + [0] * 100
    enc = RangeEncoder()
    e = icdf.copy()
    for s in syms:
        enc.encode_symbol(s, e, nsyms)
    data = enc.done()
    dec = RangeDecoder(data)
    d = icdf.copy()
    for s in syms:
        assert dec.decode_symbol(d, nsyms) == s


def test_empty_stream_done():
    enc = RangeEncoder()
    data = enc.done()
    assert isinstance(data, bytes)


def test_update_cdf_counter_saturates():
    icdf = icdf_with_counter([16384, 32768])
    for _ in range(40):
        update_cdf(icdf, 0, 2)
    assert icdf[2] == 32


def test_tell_bits_monotone():
    rng = np.random.default_rng(3)
    icdf = random_icdf(rng, 8)
    enc = RangeEncoder()
    prev = enc.tell_bits()
    for s in rng.integers(0, 8, size=200):
        enc.encode_cdf(int(s), icdf, 8)
        now = enc.tell_bits()
        assert now >= prev
        prev = now
    # tell is an upper bound on the final size
    assert len(enc.done()) * 8 <= prev + 64
