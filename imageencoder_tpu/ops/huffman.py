"""Whole-stream byte-level Huffman coding with fallback-if-bigger.

Wire format (reference Huffman.cpp:36-46, 233-344, Huffman.hpp:139-141):

  dict:    repeated groups of
             [1-bit has-items = 1][7-bit group length][4-bit code length]
             then per entry [8-bit symbol][code-length-bit code]
           terminated by a single 0 bit.  (A leading 0 bit therefore doubles
           as the "no Huffman" flag for the whole stream.)
  payload: each input byte replaced by its code, MSB-first.
  fallback: if the compressed stream is not strictly smaller than the input,
           emit [0 bit][raw input bytes] instead (Huffman.cpp:329-341);
           the shipped build then writes ceil((1+8n)/8) = n+1 bytes, with the
           final partial byte zero (observed; buffers are zero-initialized).

Differences from the reference (deliberate, documented):
  * deterministic tree build: the reference's code assignment depends on
    std::unordered_map iteration order (Huffman.cpp:269-276) and is not
    reproducible across toolchains (SURVEY §2 quirks); we break ties by
    (frequency, first-symbol) so our streams are byte-deterministic.  All
    Huffman trees are optimal, so payload size matches the reference's to
    within dict-serialization noise — and either decoder reads either stream.
  * code lengths are limited to 15 bits and groups split at 127 entries:
    the reference masks lengths to 4 bits and group sizes to 7 bits
    (Huffman.cpp:40-42), silently corrupting streams that exceed them; we
    adjust the code-length distribution (JPEG-style) instead.
  * single-symbol histograms force the fallback: the reference emits a
    zero-length code whose decode loops forever (Huffman.cpp:154-180).

Encode is vectorized: device-friendly histogram, host tree build (256
symbols), then a LUT gather + the shared prefix-sum bit packer.  Decode uses
a byte-level FSM table (native C++ fast path in runtime/, numpy fallback).
"""

from __future__ import annotations

import heapq

import numpy as np

from .bitpack import BitReader, BitWriter, pack_fields

KEY_BITS = 8
MAX_CODE_LEN = 15  # must fit the 4-bit dict header field
MAX_GROUP = 127  # must fit the 7-bit group length field


def code_lengths(freqs: np.ndarray) -> np.ndarray:
    """Huffman code length per symbol (0 for absent symbols), max 15.

    Deterministic: heap ties broken by smallest first-symbol.  The native
    runtime carries a bit-identical twin of the tree build (fuzz-pinned by
    test_huffman::test_native_code_lengths_matches_python);
    :func:`_py_code_lengths_tree` is its fallback.
    """
    lengths = None
    try:
        from ..runtime.native import huffman_code_lengths_native

        lengths = huffman_code_lengths_native(np.asarray(freqs))
    except ValueError:
        raise  # < 2 symbols — same contract as the Python fallback
    except Exception:
        # Any native failure (lib missing, stale .so without this symbol,
        # loader error) degrades to the Python tree build, matching the
        # other native call sites.
        pass
    if lengths is None:
        lengths = _py_code_lengths_tree(freqs)
    if lengths.max() > MAX_CODE_LEN:
        lengths = _limit_lengths(lengths, MAX_CODE_LEN)
    return lengths


def _py_code_lengths_tree(freqs: np.ndarray) -> np.ndarray:
    """Pure-Python Huffman tree build (unlimited lengths).  Heap entries
    are single packed ints ``(freq << 17) | (tiebreak << 9) | id`` — the
    three fields occupy disjoint bit ranges (tiebreak <= 255, id <= 510),
    so integer order == the (freq, tiebreak, id) lexicographic order of the
    tuple form, at a fraction of the compare cost.
    """
    syms = np.nonzero(np.asarray(freqs)[:256] > 0)[0]
    n_syms = len(syms)
    if n_syms < 2:
        raise ValueError("need >= 2 distinct symbols")
    heap = [(int(freqs[s]) << 17) | (int(s) << 9) | i
            for i, s in enumerate(syms)]
    heapq.heapify(heap)
    children = {}  # internal id -> (left_id, right_id)
    next_id = n_syms
    pop = heapq.heappop
    push = heapq.heappush
    while len(heap) > 1:
        e1 = pop(heap)
        e2 = pop(heap)
        t1 = (e1 >> 9) & 0xFF
        t2 = (e2 >> 9) & 0xFF
        children[next_id] = (e1 & 0x1FF, e2 & 0x1FF)
        push(heap, (((e1 >> 17) + (e2 >> 17)) << 17)
             | (min(t1, t2) << 9) | next_id)
        next_id += 1

    # Parent ids always exceed child ids, so one descending sweep assigns
    # every depth (no DFS stack).
    depth = [0] * next_id
    for nid in range(next_id - 1, n_syms - 1, -1):
        l, r = children[nid]
        d = depth[nid] + 1
        depth[l] = d
        depth[r] = d
    lengths = np.zeros(256, dtype=np.int32)
    lengths[syms] = np.maximum(np.asarray(depth[:n_syms], dtype=np.int32), 1)
    return lengths


def _limit_lengths(lengths: np.ndarray, cap: int) -> np.ndarray:
    """JPEG-style adjust: fold over-long codes back under ``cap`` bits.

    Every move below preserves Kraft sum <= 1, so the adjusted distribution
    always admits a canonical prefix code (canonical_codes assigns codes
    from lengths alone).  Kraft-checked by test_huffman_limit_lengths.
    """
    hist = np.bincount(lengths[lengths > 0]).astype(np.int64)
    for ln in range(len(hist) - 1, cap, -1):
        while hist[ln] > 1:
            # Retire a PAIR of codes at depth ln: one moves to ln-1 (Kraft
            # neutral: 2*2^-ln == 2^-(ln-1)); the slot is paid for by
            # splitting one code at some occupied depth j <= ln-2 into two
            # at j+1 (also Kraft neutral).
            j = ln - 2
            while j > 0 and hist[j] == 0:
                j -= 1
            if j == 0:
                # No splittable shallower code.  Unreachable while the total
                # Kraft sum is 1 and the alphabet has <= 2^(cap-1) symbols
                # (all-deep distributions sum below 1; fuzzed over 2000 deep
                # profiles).  A silent adjust here would drop a symbol, so
                # fail loudly — callers fall back to the raw-copy path.
                raise ValueError("length-limit rebalance ran out of "
                                 "splittable depths (invalid code profile)")
            hist[ln] -= 2
            hist[ln - 1] += 1
            hist[j + 1] += 2
            hist[j] -= 1
        if hist[ln] == 1:
            # Odd leftover: cannot happen for a true Huffman profile (the
            # deepest occupied level always has an even count when the
            # Kraft sum is 1), and "promoting" it to ln-1 would INCREASE
            # the Kraft sum by 2^-ln — i.e. could break prefix-freeness.
            # Fail loudly instead of silently emitting a bad profile.
            raise ValueError("length-limit rebalance left an odd code at "
                             f"depth {ln} (invalid Huffman profile)")
    # Reassign lengths: shortest codes to most frequent symbols (stable).
    order = np.argsort(lengths, kind="stable")
    present = order[lengths[order] > 0]
    # sort present symbols by original length then symbol for determinism
    new_lengths = np.zeros_like(lengths)
    lens_sorted = np.repeat(np.arange(len(hist)), np.maximum(hist, 0))
    assert len(lens_sorted) == len(present), (hist, len(present))
    new_lengths[present] = lens_sorted
    return new_lengths


def canonical_codes(lengths: np.ndarray):
    """Assign canonical codes: shorter first, then by symbol. Returns (words, lengths)."""
    words = np.zeros(256, dtype=np.uint32)
    code = 0
    prev_len = 0
    for ln in np.unique(lengths[lengths > 0]):
        syms = np.nonzero(lengths == ln)[0]
        code <<= int(ln) - prev_len
        prev_len = int(ln)
        words[syms] = code + np.arange(len(syms), dtype=np.uint32)
        code += len(syms)
    return words, lengths


class _FieldSeq:
    """BitWriter-compatible read-only view over (value, nbits) field arrays
    (the subset the packers consume: .values/.nbits/.position/getvalue)."""

    __slots__ = ("values", "nbits", "position")

    def __init__(self, values: np.ndarray, nbits: np.ndarray):
        self.values = values
        self.nbits = nbits
        self.position = int(nbits.sum())

    def getvalue(self) -> bytes:
        out, _ = pack_fields(self.values, self.nbits)
        return out


def _dict_and_codes(freqs: np.ndarray):
    """Canonical codes + serialized dict for a byte histogram.

    Returns (dict_writer, words, lengths) or None when < 2 symbols exist
    (the caller falls back; the reference would emit a zero-length code
    whose decode loops forever, Huffman.cpp:154-180).
    """
    try:
        lengths = code_lengths(freqs)
    except ValueError:
        return None
    words, lengths = canonical_codes(lengths)

    # Serialize dict: groups by code length, LONGEST first (Huffman.cpp:272
    # sorts descending by length), entries within a group by symbol.
    # Built as (value, nbits) field arrays — same wire bits as a BitWriter
    # put-loop at a fraction of the Python cost; the returned shim carries
    # the .values/.nbits interface the packers consume.
    vparts, bparts = [], []
    for ln in np.unique(lengths[lengths > 0])[::-1]:
        syms = np.nonzero(lengths == ln)[0]
        for start in range(0, len(syms), MAX_GROUP):
            chunk = syms[start:start + MAX_GROUP]
            n = len(chunk)
            v = np.empty(2 + 2 * n, dtype=np.int64)
            b = np.empty(2 + 2 * n, dtype=np.int64)
            v[0] = 0x80 | n  # 1-bit has-items + 7-bit length
            b[0] = 8
            v[1] = int(ln)
            b[1] = 4
            v[2::2] = chunk
            b[2::2] = KEY_BITS
            v[3::2] = words[chunk]
            b[3::2] = int(ln)
            vparts.append(v)
            bparts.append(b)
    vparts.append(np.zeros(1, dtype=np.int64))  # stop header bit
    bparts.append(np.ones(1, dtype=np.int64))
    w = _FieldSeq(np.concatenate(vparts), np.concatenate(bparts))
    return w, words, lengths


def huffman_encode(inner) -> bytes:
    """Compress ``inner`` (whole-byte stream — bytes or any uint8 buffer;
    the encode hot paths pass a zero-copy ndarray view of the packed
    stream); fallback to [0][raw] if bigger."""
    try:
        from ..runtime.native import byte_histogram_native

        freqs = byte_histogram_native(inner)
    except Exception:
        data = np.frombuffer(inner, dtype=np.uint8)
        freqs = np.bincount(data, minlength=256)
    return huffman_encode_with_hist(inner, freqs)


def huffman_encode_with_hist(inner: bytes, freqs: np.ndarray) -> bytes:
    """huffman_encode with a precomputed byte histogram of ``inner``.

    The sharded encode paths compute the histogram as a psum of per-shard
    device histograms (parallel/sharding.py) — the distributed equivalent
    of the reference's serial histogram loop (Huffman.cpp:236-243) — so
    the host never rescans the stream for statistics.
    """
    built = _dict_and_codes(freqs)
    if built is None:
        return _fallback(inner)
    w, words, lengths = built

    # Total size is known from the histogram alone — decide the
    # fallback-if-bigger (Huffman.cpp:329-341) BEFORE encoding anything.
    dict_bits = int(np.sum(np.asarray(w.nbits, dtype=np.int64)))
    total_bits = dict_bits + int(
        np.dot(freqs.astype(np.int64), lengths.astype(np.int64)))
    if len(inner) < (total_bits + 7) // 8:
        return _fallback(inner)

    try:
        from ..runtime.native import huffman_pack_bytes_native

        # One native pass: per-byte LUT + chunk-parallel bit append — no
        # int64 field tensors materialize.
        prefix, _ = pack_fields(np.asarray(w.values, dtype=np.int64),
                                np.asarray(w.nbits, dtype=np.int64))
        return huffman_pack_bytes_native(inner, words, lengths, prefix,
                                         dict_bits, total_bits)
    except Exception as e:
        from ..runtime.native import warn_fallback
        warn_fallback("huffman_pack_bytes", e)

    # Numpy fallback: LUT gather + shared packer.
    data = np.frombuffer(inner, dtype=np.uint8)
    pay_vals = words[data].astype(np.int64)
    pay_bits = lengths[data].astype(np.int64)
    all_vals = np.concatenate([np.asarray(w.values, dtype=np.int64), pay_vals])
    all_bits = np.concatenate([np.asarray(w.nbits, dtype=np.int64), pay_bits])
    out, tb = pack_fields(all_vals, all_bits)
    assert tb == total_bits
    return out


def _fallback(inner: bytes) -> bytes:
    """[0 bit][raw bytes], padded to len(inner)+1 bytes (shipped-build parity)."""
    data = np.frombuffer(inner, dtype=np.uint8)
    vals = np.concatenate([[0], data]).astype(np.int64)
    nbits = np.concatenate([[1], np.full(len(data), 8)]).astype(np.int64)
    out, _ = pack_fields(vals, nbits, pad_to_bytes=len(inner) + 1)
    return out


def parse_dict(reader: BitReader):
    """Read dict groups; returns list of (symbol, word, length). Empty if flag bit 0."""
    entries = []
    while reader.get_bit():
        seq_len = reader.get(7)
        bit_len = reader.get(4)
        for _ in range(seq_len):
            sym = reader.get(KEY_BITS)
            word = reader.get(bit_len)
            entries.append((sym, word, bit_len))
    return entries


def validate_dict_entries(entries) -> None:
    """Strict prefix validation of parsed dict entries; raises
    StreamFormatError on any dict no code tree can represent.

    The reference ENCODER can emit invalid dicts: it stores code lengths
    in a 4-bit field but builds unlimited-depth trees, so depths >= 16
    silently wrap (17 -> "1", 16 -> zero-length); its own decoder crashes
    on such streams (docs/PARITY.md).  Decoding one would only produce
    garbage — fail loudly instead.  A Kraft bound alone is NOT enough:
    wrapped or corrupt dicts can keep Kraft sum <= 1 while a code is a
    prefix of (or equal to) another, so this builds the tree and rejects
    zero-length codes, duplicate codes, and prefix violations directly.
    (Our encoder's canonical codes are 15-bit length-limited and can
    never trip this.)
    """
    from ..utils.exceptions import StreamFormatError

    try:  # native tree build (the Python loop below cost ~0.2 ms/decode)
        from ..runtime.native import validate_huffman_dict_native

        rc = validate_huffman_dict_native(entries)
    except Exception:
        rc = None  # fall through to the Python loop
    if rc is not None:
        if rc == 0:
            return
        if rc == -1:
            raise StreamFormatError(
                "invalid Huffman dictionary: zero-length code (the "
                "reference encoder's 4-bit length-field wrap, 16 -> 0)")
        raise StreamFormatError(
            "invalid Huffman dictionary: duplicate code or a code that "
            "extends/prefixes another (non-prefix dict)")

    children = [[-1, -1]]
    leaf = [False]
    for _sym, word, ln in entries:
        if ln < 1:
            raise StreamFormatError(
                "invalid Huffman dictionary: zero-length code (the "
                "reference encoder's 4-bit length-field wrap, 16 -> 0)")
        node = 0
        for k in range(ln - 1, -1, -1):
            if leaf[node]:
                raise StreamFormatError(
                    "invalid Huffman dictionary: a code extends another "
                    "(non-prefix; reference length-field wrap or corrupt "
                    "stream)")
            bit = (word >> k) & 1
            if children[node][bit] == -1:
                children[node][bit] = len(children)
                children.append([-1, -1])
                leaf.append(False)
            node = children[node][bit]
        if leaf[node] or children[node] != [-1, -1]:
            raise StreamFormatError(
                "invalid Huffman dictionary: duplicate code or a code "
                "that prefixes another (non-prefix dict)")
        leaf[node] = True


def _build_tree(entries):
    """Code tree as arrays: children[node][bit] -> node (-1 absent), symbol[node]."""
    children = [[-1, -1]]
    symbol = [-1]
    for sym, word, ln in entries:
        node = 0
        for k in range(ln - 1, -1, -1):
            bit = (word >> k) & 1
            if children[node][bit] == -1:
                children.append([-1, -1])
                symbol.append(-1)
                children[node][bit] = len(children) - 1
            node = children[node][bit]
        symbol[node] = sym
    return children, symbol


def _build_fsm(entries):
    """Byte-level FSM over the code tree: T[state, byte] -> (next, nsym, syms[8])."""
    children, symbol = _build_tree(entries)
    n = len(children)
    next_state = np.zeros((n, 256), dtype=np.int32)
    n_out = np.zeros((n, 256), dtype=np.int8)
    out_syms = np.zeros((n, 256, 8), dtype=np.uint8)
    for state in range(n):
        for byte in range(256):
            node = state
            outs = []
            for k in range(7, -1, -1):
                bit = (byte >> k) & 1
                nxt = children[node][bit]
                if nxt == -1:
                    # Invalid path (can't happen with full trees from the
                    # reference; incomplete canonical trees stall at root).
                    node = 0
                    continue
                node = nxt
                if symbol[node] >= 0:
                    outs.append(symbol[node])
                    node = 0
            next_state[state, byte] = node
            n_out[state, byte] = len(outs)
            out_syms[state, byte, :len(outs)] = outs
    return next_state, n_out, out_syms


def _device_stages():
    """jit-compiled device halves of the Huffman encoder (built lazily).

    Stage 1: byte histogram straight from the packed uint32 words.
    Stage 2: per-byte code gather + the shared two-level bit packer, dict
    bits OR'd into the prefix.  The inner stream never visits the host on
    the compress path — only the final compressed words do.
    """
    import jax
    import jax.numpy as jnp

    from .device_pack import pack_blocks_device

    DICT_WORDS = 256  # dict upper bound: ~6.1k bits for all 256 symbols

    def words_to_u8(words):
        w = words[:, None]
        sh = jnp.array([24, 16, 8, 0], dtype=jnp.uint32)[None, :]
        return ((w >> sh) & jnp.uint32(0xFF)).astype(jnp.uint8).reshape(-1)

    @jax.jit
    def byte_hist(words, nbytes):
        data = words_to_u8(words)
        idx = jnp.arange(data.shape[0], dtype=jnp.int32)
        # Route out-of-stream lanes to overflow bin 256.
        routed = jnp.where(idx < nbytes, data.astype(jnp.int32), 256)
        return jnp.bincount(routed, length=257)[:256].astype(jnp.int32)

    @jax.jit
    def pack_payload(words, nbytes, code_w, code_l, start_bit, dict_words):
        data = words_to_u8(words)
        nbyte_lanes = data.shape[0]
        idx = jnp.arange(nbyte_lanes, dtype=jnp.int32)
        vals = code_w[data].astype(jnp.int32)
        nbits = jnp.where(idx < nbytes, code_l[data], 0).astype(jnp.int32)
        rows = (nbyte_lanes + 15) // 16
        pad = rows * 16 - nbyte_lanes
        vals = jnp.pad(vals, (0, pad)).reshape(rows, 16)
        nbits = jnp.pad(nbits, (0, pad)).reshape(rows, 16)
        n_out = (nbyte_lanes * MAX_CODE_LEN) // 32 + DICT_WORDS + 8
        # start_bit = dict length in bits, < DICT_WORDS * 32.
        out, total = pack_blocks_device(vals, nbits, start_bit, n_out,
                                        start_words_bound=DICT_WORDS)
        out = out.at[:DICT_WORDS].set(out[:DICT_WORDS] | dict_words)
        return out, total

    return byte_hist, pack_payload, DICT_WORDS


_DEVICE_STAGES = None


def huffman_encode_device(words, total_bits: int):
    """Device-side Huffman over a packed inner stream (uint32 words).

    NOTE: this is the STANDALONE variant — it dispatches its own histogram
    pass (one extra device round trip) for callers that already hold a
    packed stream but no statistics.  The production encode path uses
    :func:`huffman_encode_from_meta`, which receives the histogram fused
    into the encode dispatch (ops/pipeline.make_encode_packed_hist); prefer
    that whenever you control the producing pipeline.

    words: device uint32 array holding the complete inner stream starting at
    bit 0; total_bits: its bit length.  Returns the final stream bytes
    (dict + payload, or the [0][raw] fallback when not smaller, exactly like
    :func:`huffman_encode`).
    """
    global _DEVICE_STAGES
    if _DEVICE_STAGES is None:
        _DEVICE_STAGES = _device_stages()
    byte_hist, pack_payload, dict_words_n = _DEVICE_STAGES

    import jax.numpy as jnp

    from .device_pack import words_to_bytes

    inner_bytes = (int(total_bits) + 7) // 8
    # Trim the padded pack buffer to a power-of-two bucket: the packer's
    # worst-case allocation is ~6x the actual stream, and the Huffman
    # stages' work scales with the buffer, not the stream.  Buckets keep
    # the number of distinct jit shapes logarithmic.
    need = (inner_bytes + 3) // 4
    bucket = 1024
    while bucket < need:
        bucket *= 2
    if bucket < words.shape[0]:
        words = words[:bucket]
    freqs = np.asarray(byte_hist(words, np.int32(inner_bytes)))
    built = _dict_and_codes(freqs)
    if built is None:
        return _fallback(words_to_bytes(words, total_bits))
    w, code_words, lengths = built

    dict_stream = w.getvalue()
    dbuf = np.zeros(dict_words_n * 4, dtype=np.uint8)
    dbuf[:len(dict_stream)] = np.frombuffer(dict_stream, dtype=np.uint8)
    out, out_total = pack_payload(
        words, np.int32(inner_bytes),
        jnp.asarray(code_words.astype(np.uint32)),
        jnp.asarray(lengths.astype(np.int32)),
        np.int32(w.position), jnp.asarray(dbuf.view(">u4").astype(np.uint32)))

    if inner_bytes < (int(out_total) + 7) // 8:
        return _fallback(words_to_bytes(words, total_bits))
    return words_to_bytes(out, int(out_total))


def huffman_encode_from_meta(words, meta) -> bytes:
    """Minimum-round-trip device Huffman: takes the (words, meta) pair from
    ops/pipeline.make_encode_packed_hist (meta[0]=total_bits, meta[1:]=byte
    histogram, already on host) and emits the final stream.

    The compressed size is computed ON HOST as dict_bits + freqs·code_lens,
    so the only remaining device traffic is the payload-pack dispatch and a
    single exact-size D2H of the compressed words.
    """
    global _DEVICE_STAGES
    if _DEVICE_STAGES is None:
        _DEVICE_STAGES = _device_stages()
    _, pack_payload, dict_words_n = _DEVICE_STAGES

    import jax.numpy as jnp

    from .device_pack import words_to_bytes

    meta = np.asarray(meta)
    total_bits = int(meta[0])
    freqs = meta[1:]
    inner_bytes = (total_bits + 7) // 8
    built = _dict_and_codes(freqs)
    if built is None:
        return _fallback(words_to_bytes(words, total_bits))
    w, code_words, lengths = built
    out_total = w.position + int(freqs.astype(np.int64) @ lengths)
    if inner_bytes < (out_total + 7) // 8:
        return _fallback(words_to_bytes(words, total_bits))

    need = (inner_bytes + 3) // 4
    bucket = 1024
    while bucket < need:
        bucket *= 2
    if bucket < words.shape[0]:
        words = words[:bucket]

    dict_stream = w.getvalue()
    dbuf = np.zeros(dict_words_n * 4, dtype=np.uint8)
    dbuf[:len(dict_stream)] = np.frombuffer(dict_stream, dtype=np.uint8)
    out, _ = pack_payload(
        words, np.int32(inner_bytes),
        jnp.asarray(code_words.astype(np.uint32)),
        jnp.asarray(lengths.astype(np.int32)),
        np.int32(w.position), jnp.asarray(dbuf.view(">u4").astype(np.uint32)))
    out_bytes = (out_total + 7) // 8
    nw = (out_bytes + 3) // 4
    return np.asarray(out[:nw]).astype(">u4").tobytes()[:out_bytes]


def parse_dict_bytes(data: bytes):
    """Parse the serialized dict from the head of a Huffman stream.

    Returns (entries, end_bit).  The dict occupies a few hundred bytes at
    most (<= 256 symbols of <= 15-bit codes), so the Python fallback only
    materializes a prefix; the native parser reads the bytes directly.
    """
    try:
        from ..runtime.native import parse_huffman_dict_native

        return parse_huffman_dict_native(data)
    except Exception:
        pass  # bit-level fallback below
    prefix = data[:65536]
    reader = BitReader(prefix)
    entries = parse_dict(reader)
    if reader.position >= len(prefix) * 8 and len(data) > len(prefix):
        reader = BitReader(data)  # pathological dict straddling the prefix
        entries = parse_dict(reader)
    return entries, reader.position


def huffman_decode(data: bytes) -> bytes:
    """Decompress a stream whose first bit is 1 (dict present).

    Decodes every bit to the end of the buffer, like the reference
    (Huffman.cpp:376-383) — trailing padding may decode to extra symbols,
    which downstream parsing ignores.
    """
    out = huffman_decode_view(data)
    return out.tobytes() if isinstance(out, np.ndarray) else out


def huffman_decode_view(data: bytes):
    """huffman_decode, but the native path returns a zero-copy uint8 view
    of the decoded payload instead of bytes — the image-decode hot path
    hands it straight to the native offset walk / extract (which only
    need the buffer protocol), skipping a ~2.4 MB copy per ex4 stream.
    Falls back to bytes when the native runtime is unavailable."""
    entries, dict_end = parse_dict_bytes(data)
    if not entries:
        raise ValueError("huffman_decode called on a stream without a dict")
    validate_dict_entries(entries)

    try:
        from ..runtime.native import huffman_fsm_decode_native

        return huffman_fsm_decode_native(data, dict_end, entries,
                                         as_array=True)
    except Exception as e:
        from ..runtime.native import warn_fallback
        warn_fallback("huffman_fsm_decode", e)

    next_state, n_out, out_syms = _build_fsm(entries)
    tree_children, tree_symbol = _build_tree(entries)
    from .bitpack import to_bits

    bits = to_bits(data)
    pos = dict_end

    # Consume bits one at a time until byte alignment, then switch to the FSM.
    prefix_syms = []
    node = 0
    while pos % 8 != 0 and pos < len(bits):
        nxt = tree_children[node][bits[pos]]
        pos += 1
        if nxt == -1:
            node = 0
            continue
        node = nxt
        if tree_symbol[node] >= 0:
            prefix_syms.append(tree_symbol[node])
            node = 0

    # FSM state ids equal tree node ids (identical insertion order).
    state = node
    byte_stream = np.frombuffer(data, dtype=np.uint8)[pos // 8:]
    outs: list[int] = []
    for byte in byte_stream.tolist():  # sequential walk; native path replaces this
        c = n_out[state, byte]
        if c:
            outs.extend(out_syms[state, byte, :c])
        state = next_state[state, byte]
    return (np.asarray(prefix_syms + outs, dtype=np.uint8)).tobytes()
