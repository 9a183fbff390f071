"""Huffman layer unit tests: round-trip, fallback, dict format, reference
stream interop (the codec-level cross-tests live in test_image_parity /
test_video_parity; these cover the layer in isolation)."""

import numpy as np
import pytest

from imageencoder_tpu.ops.huffman import (canonical_codes, code_lengths,
                                          huffman_decode, huffman_encode)


def roundtrip(payload: bytes) -> bytes:
    enc = huffman_encode(payload)
    if enc[0] >> 7:
        return huffman_decode(enc)
    # fallback: [0 bit][raw]
    bits = np.unpackbits(np.frombuffer(enc, dtype=np.uint8))
    return np.packbits(bits[1:]).tobytes()[:len(payload)]


@pytest.mark.parametrize("seed,n", [(0, 1000), (1, 65536), (2, 3)])
def test_roundtrip_random(seed, n):
    rng = np.random.default_rng(seed)
    # Skewed distribution so compression actually happens.
    data = rng.choice(64, p=np.ones(64) / 64, size=n).astype(np.uint8).tobytes()
    out = roundtrip(data)
    assert out[:len(data)] == data


def test_roundtrip_compressible():
    data = (b"aaaabbbcc" * 5000)
    enc = huffman_encode(data)
    assert enc[0] >> 7 == 1  # dict present
    assert len(enc) < len(data)
    assert huffman_decode(enc)[:len(data)] == data


def test_incompressible_falls_back():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    enc = huffman_encode(data)
    assert enc[0] >> 7 == 0  # fallback flag
    assert len(enc) == len(data) + 1  # shipped-build padding parity
    bits = np.unpackbits(np.frombuffer(enc, dtype=np.uint8))
    assert np.packbits(bits[1:]).tobytes()[:len(data)] == data


def test_single_symbol_falls_back():
    # Reference emits a zero-length code that decodes forever
    # (Huffman.cpp:154-180); we force the fallback instead.
    data = b"\x42" * 100
    enc = huffman_encode(data)
    assert enc[0] >> 7 == 0


def test_deterministic():
    data = (b"the quick brown fox " * 200)
    assert huffman_encode(data) == huffman_encode(data)


def test_code_lengths_kraft():
    rng = np.random.default_rng(5)
    freqs = rng.integers(0, 1000, 256)
    freqs[freqs < 50] = 0
    if np.count_nonzero(freqs) < 2:
        freqs[:2] = 1
    lengths = code_lengths(freqs)
    present = lengths > 0
    assert np.all(lengths[present] <= 15)
    # Kraft inequality with equality for a complete code.
    assert np.isclose(np.sum(2.0 ** -lengths[present]), 1.0)


def test_limit_lengths_rebalance():
    """Fibonacci frequencies force natural code depths > 15, exercising the
    _limit_lengths fold (ops/huffman.py): capped at 15, Kraft-valid,
    prefix-free after canonical assignment, and round-trip exact."""
    n_sym = 24
    fib = [1, 1]
    while len(fib) < n_sym:
        fib.append(fib[-1] + fib[-2])
    freqs = np.zeros(256, dtype=np.int64)
    freqs[:n_sym] = fib

    # The natural (uncapped) Huffman depth for this profile exceeds 15.
    import heapq
    heap = sorted(float(f) for f in fib)
    heapq.heapify(heap)
    depth_bound = 0
    while len(heap) > 1:
        a, b = heapq.heappop(heap), heapq.heappop(heap)
        heapq.heappush(heap, a + b)
        depth_bound += 1
    assert depth_bound > 15  # sanity: the cap is actually engaged

    lengths = code_lengths(freqs)
    present = lengths > 0
    assert np.count_nonzero(present) == n_sym
    assert lengths[present].max() <= 15
    assert np.sum(2.0 ** -lengths[present].astype(np.float64)) <= 1.0 + 1e-12

    words, lengths = canonical_codes(lengths)
    codes = [format(words[s], f"0{lengths[s]}b") for s in range(256)
             if lengths[s] > 0]
    for a in codes:
        for b in codes:
            if a != b:
                assert not b.startswith(a)

    data = np.repeat(np.arange(n_sym, dtype=np.uint8), fib).tobytes()
    # Trailing padding bits may decode to extra symbols (reference parity,
    # Huffman.cpp:376-383); downstream parsing ignores them.
    got = roundtrip(data)
    assert got[:len(data)] == data and len(got) - len(data) <= 8


def test_canonical_codes_prefix_free():
    freqs = np.zeros(256, dtype=np.int64)
    freqs[:16] = np.arange(1, 17) ** 3
    lengths = code_lengths(freqs)
    words, lengths = canonical_codes(lengths)
    codes = [(format(words[s], f"0{lengths[s]}b")) for s in range(256)
             if lengths[s] > 0]
    for a in codes:
        for b in codes:
            if a != b:
                assert not b.startswith(a)


def test_native_code_lengths_matches_python():
    """The native tree build must be bit-identical to the Python fallback
    (same packed-key heap semantics) across skewed/sparse/deep histograms."""
    from imageencoder_tpu.ops.huffman import _py_code_lengths_tree
    from imageencoder_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    for it in range(400):
        style = it % 5
        if style == 0:
            freqs = rng.integers(0, 1000, 256)
        elif style == 1:
            freqs = np.zeros(256, np.int64)
            k = int(rng.integers(2, 256))
            freqs[rng.choice(256, k, replace=False)] = rng.integers(1, 10, k)
        elif style == 2:
            freqs = rng.zipf(1.3, 256).clip(0, 10**7).astype(np.int64)
        elif style == 3:  # deep-tree profiles (exponential spread)
            freqs = (2.0 ** rng.uniform(0, 45, 256)).astype(np.int64)
        else:
            freqs = rng.integers(0, 3, 256)
        if np.count_nonzero(freqs) < 2:
            continue
        assert np.array_equal(
            _py_code_lengths_tree(freqs),
            native.huffman_code_lengths_native(freqs)), it


def test_code_lengths_degrades_without_native(monkeypatch):
    """A broken native runtime (e.g. a stale .so missing the symbol) must
    fall back to the Python tree build, not crash the encode; the <2-symbol
    ValueError contract must survive either way."""
    from imageencoder_tpu.runtime import native

    def boom(freqs):
        raise AttributeError("huffman_code_lengths missing from stale lib")

    monkeypatch.setattr(native, "huffman_code_lengths_native", boom)
    freqs = np.zeros(256, np.int64)
    freqs[10], freqs[20], freqs[30] = 5, 3, 1
    lengths = code_lengths(freqs)
    assert lengths[10] == 1 and lengths[20] == 2 and lengths[30] == 2
    with pytest.raises(ValueError):
        code_lengths(np.eye(1, 256, 7, dtype=np.int64)[0])


def test_device_huffman_matches_host():
    import jax.numpy as jnp

    from imageencoder_tpu.ops.huffman import huffman_encode_device

    rng = np.random.default_rng(8)
    inner = rng.choice(32, size=5000).astype(np.uint8).tobytes()
    # Stage the inner bytes as uint32 words (big-endian), padded.
    buf = np.frombuffer(inner, dtype=np.uint8)
    pad = (-len(buf)) % 4
    wbuf = np.concatenate([buf, np.zeros(pad + 40, np.uint8)])
    words = jnp.asarray(wbuf.view(">u4").astype(np.uint32))
    dev = huffman_encode_device(words, len(inner) * 8)
    host = huffman_encode(inner)
    assert dev == host


def test_device_huffman_fallback_matches_host():
    import jax.numpy as jnp

    from imageencoder_tpu.ops.huffman import huffman_encode_device

    rng = np.random.default_rng(9)
    inner = rng.integers(0, 256, 2048, dtype=np.uint8).tobytes()
    buf = np.frombuffer(inner, dtype=np.uint8)
    wbuf = np.concatenate([buf, np.zeros(((-len(buf)) % 4) + 8, np.uint8)])
    words = jnp.asarray(wbuf.view(">u4").astype(np.uint32))
    dev = huffman_encode_device(words, len(inner) * 8)
    host = huffman_encode(inner)
    assert dev == host


def test_group_split_over_127_entries():
    """More than 127 symbols at one code length forces the 7-bit group
    header to split (MAX_GROUP, Huffman.cpp:40-42 silently corrupts there;
    we split like the format intends). Construct: one dominant symbol plus
    ~200 equally-rare ones -> most codes share a length."""
    rng = np.random.default_rng(11)
    data = bytearray(b"\x00" * 20000)
    rare = rng.integers(1, 210, 2000)
    pos = rng.choice(20000, 2000, replace=False)
    for p, s in zip(pos, rare):
        data[p] = int(s)
    data = bytes(data)
    enc = huffman_encode(data)
    assert enc[0] >> 7 == 1  # dict engaged
    from imageencoder_tpu.ops.huffman import parse_dict
    from imageencoder_tpu.ops.bitpack import BitReader

    entries = parse_dict(BitReader(enc))
    lengths = {}
    for sym, word, ln in entries:
        lengths.setdefault(ln, 0)
        lengths[ln] += 1
    assert max(lengths.values()) > 127  # the split case actually occurred
    assert huffman_decode(enc)[:len(data)] == data


def test_native_byte_histogram_matches_bincount():
    import numpy as np

    from imageencoder_tpu.runtime.native import available, byte_histogram_native

    if not available():
        import pytest

        pytest.skip("native runtime not built")
    rng = np.random.default_rng(7)
    for n in (0, 1, 255, 65537, 1 << 20):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        got = byte_histogram_native(data)
        want = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
        np.testing.assert_array_equal(got, want)


def test_decode_rejects_non_prefix_dict():
    """The reference encoder can emit dicts whose true code lengths >= 16
    wrapped in its 4-bit field (non-prefix; its own decoder crashes on
    them — docs/PARITY.md).  Ours must fail loudly, not decode garbage."""
    import pytest

    from imageencoder_tpu.ops.bitpack import BitWriter
    from imageencoder_tpu.ops.huffman import huffman_decode
    from imageencoder_tpu.utils.exceptions import StreamFormatError

    w = BitWriter()
    # dict: group of two "1-bit" codes (wrapped 17s) + a 7-bit group —
    # Kraft sum 2*(1/2) + 3*(1/128) > 1.
    w.put_bit(1)           # huffman flag / first group has-items
    w.put(7, 2)            # seq len
    w.put(4, 1)            # bit len 1
    for sym, code in ((0, 0), (1, 1)):
        w.put(8, sym)
        w.put(1, code)
    w.put_bit(1)           # second group
    w.put(7, 3)
    w.put(4, 7)
    for sym, code in ((2, 1), (3, 2), (4, 3)):
        w.put(8, sym)
        w.put(7, code)
    w.put_bit(0)           # stop
    w.put(32, 0xDEADBEEF)  # some payload bits
    data = w.getvalue()
    assert data[0] & 0x80
    with pytest.raises(StreamFormatError):
        huffman_decode(data)


def test_decode_rejects_zero_length_code_dict():
    """Round-4 soak find: the reference's 4-bit length wrap also hits
    16 -> 0, emitting a 2-symbol dict with both code lengths ZERO and
    Kraft sum exactly 1 (112x96 rle=1 video, docs/PARITY.md).  A
    zero-length code can never advance the bit cursor; ours must reject
    the dict rather than hang or decode garbage."""
    import pytest

    from imageencoder_tpu.ops.bitpack import BitWriter
    from imageencoder_tpu.ops.huffman import huffman_decode
    from imageencoder_tpu.utils.exceptions import StreamFormatError

    w = BitWriter()
    w.put_bit(1)           # huffman flag / first group has-items
    w.put(7, 2)            # seq len
    w.put(4, 0)            # bit len 0 (wrapped 16)
    for sym in (230, 237):
        w.put(8, sym)      # zero code bits follow
    w.put_bit(0)           # stop
    w.put(32, 0xDEADBEEF)  # some payload bits
    data = w.getvalue()
    assert data[0] & 0x80
    with pytest.raises(StreamFormatError):
        huffman_decode(data)


def test_decode_rejects_prefix_violation_with_kraft_one():
    """A corrupt dict can keep Kraft sum <= 1 while one code prefixes
    another ({a: "0", b: "00", c: "11"} — Kraft 1/2+1/4+1/4 = 1): a
    Kraft bound alone misses it, but no code tree can represent it, so
    validate_dict_entries must reject it (symbol b is unreachable and
    the payload would decode to silently wrong bytes)."""
    import pytest

    from imageencoder_tpu.ops.bitpack import BitWriter
    from imageencoder_tpu.ops.huffman import huffman_decode
    from imageencoder_tpu.utils.exceptions import StreamFormatError

    w = BitWriter()
    w.put_bit(1)           # huffman flag / first group has-items
    w.put(7, 1)            # seq len 1
    w.put(4, 1)            # bit len 1
    w.put(8, 10)           # sym a
    w.put(1, 0)            # code "0"
    w.put_bit(1)           # second group
    w.put(7, 2)            # seq len 2
    w.put(4, 2)            # bit len 2
    for sym, code in ((11, 0), (12, 3)):  # codes "00", "11"
        w.put(8, sym)
        w.put(2, code)
    w.put_bit(0)           # stop
    w.put(32, 0xDEADBEEF)  # some payload bits
    data = w.getvalue()
    assert data[0] & 0x80
    with pytest.raises(StreamFormatError):
        huffman_decode(data)


def test_decode_rejects_duplicate_code_dict():
    """Two symbols on the same code word ({a: "1", b: "1"}) — Kraft sum
    exactly 1 again; the tree insert would silently overwrite symbol a,
    so the strict validation must reject the dict instead."""
    import pytest

    from imageencoder_tpu.ops.bitpack import BitWriter
    from imageencoder_tpu.ops.huffman import huffman_decode
    from imageencoder_tpu.utils.exceptions import StreamFormatError

    w = BitWriter()
    w.put_bit(1)           # huffman flag / first group has-items
    w.put(7, 2)            # seq len 2
    w.put(4, 1)            # bit len 1
    for sym in (10, 11):
        w.put(8, sym)
        w.put(1, 1)        # both on code "1"
    w.put_bit(0)           # stop
    w.put(32, 0xDEADBEEF)  # some payload bits
    data = w.getvalue()
    assert data[0] & 0x80
    with pytest.raises(StreamFormatError):
        huffman_decode(data)
