"""RLE block stats + field expansion vs a per-block oracle transcribing the
reference's createRLESequence/streamEncoded (Block.cpp:186-232, 372-413)."""

import numpy as np

from imageencoder_tpu.ops import rle
from imageencoder_tpu.ops.bitpack import pack_fields
from tests.test_bits import cpp_bits_needed


def oracle_block_bits(zz, use_rle):
    """Emit the exact (value, nbits) field list the reference writes."""
    k = len(zz)
    # createRLESequence
    entries = []  # (zeroes, value)
    zeroes = 0
    info_bits = 0
    info_data = 0
    for v in zz:
        if v == 0:
            zeroes += 1
        else:
            entries.append((zeroes, int(v)))
            info_bits = max(info_bits, cpp_bits_needed(int(v)))
            info_data += 1 + zeroes
            zeroes = 0
    # ffs(info_data); ffs(0) resolves to data_bits >= 1 on the shipped build
    ffs_val = info_data.bit_length()
    info_bits = max(info_bits, ffs_val, 1)

    fields = [(info_bits, 4)]
    length = info_data
    if use_rle:
        if length == k and entries and entries[-1][0]:
            length -= entries[-1][0] + 1
        fields.append((length, info_bits))
    else:
        length = k

    remaining = length
    for zeroes, value in entries:
        if remaining <= 0:
            break
        for _ in range(zeroes):
            fields.append((0, info_bits))
            remaining -= 1
        fields.append((value, info_bits))
        remaining -= 1
    for _ in range(remaining):
        fields.append((0, info_bits))
    return fields


def _compare(blocks, use_rle):
    stats = rle.block_stats(blocks, use_rle)
    vals, nbits = rle.block_fields(blocks, stats, use_rle)
    for i in range(blocks.shape[0]):
        expect = oracle_block_bits(blocks[i], use_rle)
        live = nbits[i] > 0
        got = list(zip(vals[i][live].tolist(), nbits[i][live].tolist()))
        want = [(v, b) for (v, b) in expect]
        # compare packed bits (values are truncated on the wire)
        got_b = pack_fields(np.array([g[0] for g in got]),
                            np.array([g[1] for g in got]))
        want_b = pack_fields(np.array([w[0] for w in want]),
                             np.array([w[1] for w in want]))
        assert got_b == want_b, (i, blocks[i], got, want)


def test_random_blocks_rle_and_not():
    rng = np.random.default_rng(7)
    blocks = rng.integers(-40, 40, size=(200, 16)).astype(np.int32)
    blocks[rng.random(blocks.shape) < 0.6] = 0
    _compare(blocks, True)
    _compare(blocks, False)


def test_edge_cases():
    k = 16
    cases = [
        np.zeros(k, np.int32),                        # all zero (UB-pinned)
        np.eye(1, k, 0, dtype=np.int32)[0],           # DC only
        np.eye(1, k, k - 1, dtype=np.int32)[0] * 5,   # only last element
        np.full(k, -1, np.int32),                     # full, no gap
        np.r_[np.full(k - 2, 3, np.int32), 0, 7],     # full, gap 1 (strip quirk)
        np.r_[np.zeros(k - 1, np.int32), 1],          # zeros then last nonzero
        np.r_[np.full(k - 1, 2, np.int32), 4],        # full, no leading zeros
    ]
    blocks = np.stack(cases)
    _compare(blocks, True)
    _compare(blocks, False)


def test_strip_quirk_drops_final_nonzero():
    """RLE: full block whose last nonzero has a preceding zero run loses it."""
    k = 16
    blk = np.r_[np.full(k - 3, 3, np.int32), 0, 0, 7][None]
    stats = rle.block_stats(blk, True)
    assert stats["count"][0] == k - 3  # 13 kept, gap of 2 + final 7 dropped
    assert stats["n_payload"][0] == k - 3


def test_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    blocks = rng.integers(-300, 300, size=(128, 16)).astype(np.int32)
    blocks[rng.random(blocks.shape) < 0.5] = 0
    for use_rle in (True, False):
        s_np = rle.block_stats(blocks, use_rle)
        s_jx = rle.block_stats(jnp.asarray(blocks), use_rle)
        for key in s_np:
            assert np.array_equal(s_np[key], np.asarray(s_jx[key])), key
        v_np, b_np = rle.block_fields(blocks, s_np, use_rle)
        v_jx, b_jx = rle.block_fields(jnp.asarray(blocks), s_jx, use_rle)
        assert np.array_equal(v_np, np.asarray(v_jx))
        assert np.array_equal(b_np, np.asarray(b_jx))
