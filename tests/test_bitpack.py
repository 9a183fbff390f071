import numpy as np
import pytest

from imageencoder_tpu.ops.bitpack import (BitReader, BitWriter, pack_fields,
                                          read_fields, to_bits)


def test_pack_read_roundtrip():
    rng = np.random.default_rng(9)
    nbits = rng.integers(0, 17, size=500).astype(np.int64)
    values = np.array([int(rng.integers(0, 1 << b)) if b else 0 for b in nbits],
                      dtype=np.int64)
    data, total = pack_fields(values, nbits)
    assert total == nbits.sum()
    bits = to_bits(data)
    offsets = np.cumsum(nbits) - nbits
    got = read_fields(bits, offsets, nbits)
    assert np.array_equal(got, values.astype(np.uint32))


def test_pack_truncates_values():
    # put() emits only the low bits (negative coefficients rely on this)
    data, _ = pack_fields(np.array([-1], dtype=np.int64), np.array([4]))
    assert to_bits(data)[:4].tolist() == [1, 1, 1, 1]


def test_msb_first_order():
    data, _ = pack_fields(np.array([0b101, 0b01], dtype=np.int64),
                          np.array([3, 2]))
    assert to_bits(data)[:5].tolist() == [1, 0, 1, 0, 1]


def test_reader_past_end_returns_zero():
    r = BitReader(b"\xff")
    assert r.get(8) == 0xFF
    assert r.get(8) == 0  # reference BitStream.cpp:14-28


def test_writer_matches_pack():
    w = BitWriter()
    w.put(5, 19)
    w.put_bit(1)
    w.put(15, 936)
    data = w.getvalue()
    r = BitReader(data)
    assert r.get(5) == 19 and r.get_bit() == 1 and r.get(15) == 936


def test_native_pack_matches_numpy():
    from imageencoder_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime not built")
    rng = np.random.default_rng(10)
    nbits = rng.integers(0, 17, size=1000).astype(np.int32)
    values = rng.integers(-(1 << 30), 1 << 30, size=1000).astype(np.int64)
    a, ta = pack_fields(values, nbits.astype(np.int64))
    b, tb = native.pack_fields_native(values, nbits)
    assert a == b and ta == tb
