"""On-device two-level bitstream packer (the TPU replacement for the
reference's serial BitStreamWriter loop, BitStream.cpp:61-77).

The serial writer is a bit-position carry chain; the parallel formulation
splits it in two levels, both data-parallel:

  level 1 (intra-block): each block owns F fields whose widths are known
    (vals/nbits from ops/pipeline.py).  An exclusive per-block cumsum gives
    each field's local bit offset; every field's value is deposited into the
    block's private uint32 register file (ceil(F*16/32) words — fields are
    at most 16 bits) with shifts + one-hot selects.

  level 2 (global): an exclusive cumsum of block bit-lengths gives every
    block's absolute start offset.  Each block's local words are funnel-
    shifted by (start & 31) into one extra word and scatter-added at
    (start >> 5).  Neighbouring blocks share at most a boundary word with
    disjoint bits, so add == or and the scatter needs no ordering.

Everything is int32/uint32 lane arithmetic — exact on TPU — and the only
host transfer is the packed words themselves (the whole point: the fields
tensor is ~20x larger than the packed stream).

The packed stream starts at bit offset ``start_bit`` (the caller ORs its
host-built header into the zero-prefix afterwards).
"""

from __future__ import annotations

import numpy as np

MAX_FIELD_BITS = 16  # coefficients, counts, mvecs, Huffman codes all fit
HEADER_WORDS = 64  # host header prefix capacity (2048 bits)


def local_words(n_fields: int) -> int:
    """Register-file words per record: worst case every field at 16 bits."""
    return (n_fields * MAX_FIELD_BITS + 31) // 32


def packed_words_bound(n_records: int, n_fields: int) -> int:
    """Static output allocation covering any record content plus header."""
    return n_records * local_words(n_fields) + HEADER_WORDS


def header_to_words(header: bytes) -> np.ndarray:
    """Pad a host-packed header to the fixed uint32[HEADER_WORDS] prefix."""
    assert len(header) <= HEADER_WORDS * 4, len(header)
    buf = np.zeros(HEADER_WORDS * 4, dtype=np.uint8)
    buf[:len(header)] = np.frombuffer(header, dtype=np.uint8)
    return buf.view(">u4").astype(np.uint32)


def pack_blocks_device(vals, nbits, start_bit, n_words: int, starts=None):
    """Pack per-block fields into a global uint32 word array on device.

    vals:  int32 [N, F] field values (will be truncated to field width)
    nbits: int32 [N, F] field widths, 0 = skip (<= 16)
    start_bit: traced int32 scalar — absolute bit offset of block 0
    n_words: static output size (upper bound; tail words stay 0)
    starts: optional int32 [N] absolute bit offset per block; when given,
        blocks land at these positions instead of the dense cumsum layout
        (callers guarantee non-overlap; used for segmented/aligned packing).

    Returns (words uint32 [n_words] MSB-first within each word,
             total_bits int32 scalar incl. start_bit).
    """
    import jax.numpy as jnp

    n, f = vals.shape
    nb = nbits.astype(jnp.int32)
    u32 = jnp.uint32

    lw = local_words(f)

    # Level 1: local offsets and the per-block register file.
    local_off = jnp.cumsum(nb, axis=1) - nb  # [N, F] exclusive
    block_bits = jnp.sum(nb, axis=1)  # [N]

    mask = ((jnp.uint32(1) << nb.astype(u32)) - jnp.uint32(1))
    v = vals.astype(u32) & jnp.where(nb > 0, mask, jnp.uint32(0))

    wi = (local_off >> 5).astype(jnp.int32)  # word index, 0..lw-1
    bo = (local_off & 31).astype(jnp.int32)  # bit offset in word
    avail = 32 - bo
    fits = nb <= avail
    # Bits for word wi (aligned so the field's MSB lands at bit `bo`).
    # Both where-branches evaluate, so every shift amount is clamped valid.
    sh1 = jnp.clip(avail - nb, 0, 31).astype(u32)
    sh1r = jnp.clip(nb - avail, 0, 31).astype(u32)
    part1 = jnp.where(fits, v << sh1, v >> sh1r)
    # Spill bits for word wi+1.
    spill = jnp.where(fits, 0, nb - avail).astype(u32)
    part2 = jnp.where(fits, jnp.uint32(0),
                      (v << ((32 - spill) % 32).astype(u32)) & jnp.uint32(0xFFFFFFFF))
    part2 = jnp.where(spill > 0, part2, jnp.uint32(0))
    part1 = jnp.where(nb > 0, part1, jnp.uint32(0))

    # One-hot accumulate into [N, lw].
    lanes = jnp.arange(lw, dtype=jnp.int32)[None, None, :]
    sel1 = (lanes == wi[:, :, None])
    sel2 = (lanes == (wi + 1)[:, :, None])
    local = (jnp.sum(jnp.where(sel1, part1[:, :, None], jnp.uint32(0)),
                     axis=1, dtype=u32)
             | jnp.sum(jnp.where(sel2, part2[:, :, None], jnp.uint32(0)),
                       axis=1, dtype=u32))

    # Level 2: global funnel shift + scatter.
    if starts is None:
        starts = (jnp.cumsum(block_bits) - block_bits
                  + jnp.asarray(start_bit, jnp.int32))  # [N]
    else:
        starts = starts.astype(jnp.int32)
    total_bits = starts[-1] + block_bits[-1] if n else jnp.asarray(start_bit)

    s = (starts & 31).astype(u32)[:, None]  # [N,1]
    base = (starts >> 5).astype(jnp.int32)  # [N]
    # shifted[k] = (local[k-1] << (32-s)) | (local[k] >> s), local[-1]=0
    ext = jnp.concatenate([local, jnp.zeros((n, 1), u32)], axis=1)
    prev_ext = jnp.concatenate([jnp.zeros((n, 1), u32), local], axis=1)
    lo = jnp.where(s > 0, prev_ext << ((32 - s) % 32).astype(u32), jnp.uint32(0))
    hi = jnp.where(s > 0, ext >> s, ext)
    shifted = lo | hi  # [N, lw+1]

    idx = base[:, None] + jnp.arange(lw + 1, dtype=jnp.int32)[None, :]
    words = jnp.zeros((n_words,), u32).at[idx.reshape(-1)].add(
        shifted.reshape(-1), mode="drop")
    return words, total_bits


def words_to_bytes(words: np.ndarray, total_bits: int) -> bytes:
    """Host-side: big-endian word serialization, trimmed to whole bytes."""
    nbytes = (int(total_bits) + 7) // 8
    nw = (nbytes + 3) // 4
    return np.asarray(words[:nw]).astype(">u4").tobytes()[:nbytes]
