"""Bit helpers vs exhaustive pure-Python oracles of the C++ semantics."""

import numpy as np

from imageencoder_tpu.utils.bits import (bit_length, bits_needed, ffs,
                                         round_half_away, round_to_byte,
                                         shift_signed)


def cpp_bits_needed(value: int) -> int:
    """Literal transcription of the loop semantics (utils.hpp:226-243)."""
    bits = 1
    while True:
        masked = value & ((1 << bits) - 1)
        shifted = (masked << (16 - bits)) & 0xFFFF
        if shifted >= 0x8000:
            shifted -= 0x10000
        restored = shifted >> (16 - bits)
        if restored == value:
            return bits
        bits += 1


def cpp_shift_signed(value: int, b: int) -> int:
    if b == 0:
        return 0
    v = value & ((1 << b) - 1)
    if v & (1 << (b - 1)):
        v -= 1 << b
    return v


def test_bits_needed_exhaustive_int16():
    vals = np.arange(-32768, 32768, dtype=np.int32)
    got = bits_needed(vals)
    # oracle on a sample grid + all small values (full loop is slow in python)
    sample = np.concatenate([np.arange(-1025, 1026),
                             np.arange(-32768, 32768, 997)])
    expect = np.array([cpp_bits_needed(int(v)) for v in sample])
    assert np.array_equal(bits_needed(sample), expect)
    # structural properties on the full range
    assert got.min() == 1 and got.max() == 16
    assert bits_needed(np.array([32767]))[0] == 16
    assert bits_needed(np.array([-32768]))[0] == 16


def test_bit_length():
    assert bit_length(np.array([0, 1, 2, 3, 4, 255, 256, 65535])).tolist() == \
        [0, 1, 2, 2, 3, 8, 9, 16]


def test_ffs_matches_reference_for_positive():
    vals = np.array([1, 2, 3, 7, 8, 16, 255, 1024])
    assert ffs(vals).tolist() == [1, 2, 2, 3, 4, 5, 8, 11]


def test_shift_signed_roundtrip():
    rng = np.random.default_rng(0)
    for b in range(1, 17):
        lo, hi = -(1 << (b - 1)), (1 << (b - 1)) - 1
        vals = rng.integers(lo, hi + 1, size=100)
        truncated = vals & ((1 << b) - 1)
        got = shift_signed(truncated, np.full(100, b))
        assert np.array_equal(got, vals), b
        expect = [cpp_shift_signed(int(t), b) for t in truncated]
        assert got.tolist() == expect


def test_shift_signed_zero_bits():
    assert shift_signed(np.array([5]), np.array([0]))[0] == 0


def test_round_half_away():
    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49, -0.49])
    assert round_half_away(x).tolist() == [1, 2, 3, -1, -2, -3, 0, -0]


def test_round_to_byte():
    assert [round_to_byte(b) for b in (0, 1, 7, 8, 9, 16)] == [0, 1, 1, 1, 2, 2]


def test_jax_consistency():
    import jax.numpy as jnp

    vals = np.arange(-512, 513, dtype=np.int32)
    assert np.array_equal(np.asarray(bits_needed(jnp.asarray(vals))), bits_needed(vals))
    assert np.array_equal(
        np.asarray(shift_signed(jnp.asarray(vals & 0x3FF), jnp.full(1025, 10))),
        shift_signed(vals & 0x3FF, np.full(1025, 10)))
