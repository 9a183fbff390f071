"""Pallas sequential-grid packer vs the scatter packer: bit-exact on every
dense layout (interpret mode on the CPU mesh; the TPU-compiled kernel is
exercised by tools/tpu_smoke.py and bench.py on real hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageencoder_tpu.ops.device_pack import pack_blocks_device
from imageencoder_tpu.ops.pallas_pack import CHUNK, pack_records_pallas


@pytest.mark.parametrize("n,f,start", [
    (1, 3, 0),            # single record
    (257, 18, 171),       # image-shaped records, odd count
    (CHUNK, 18, 2047),    # exactly one chunk
    (CHUNK + 5, 16, 37),  # crosses a chunk boundary (carry word)
    (2 * CHUNK + 3, 18, 169),  # several chunks, carry chain
])
def test_pallas_matches_scatter(n, f, start):
    rng = np.random.default_rng(n * 7 + f)
    nbits = rng.integers(0, 17, (n, f)).astype(np.int32)
    vals = rng.integers(-(2 ** 15), 2 ** 15, (n, f)).astype(np.int32)
    nw = n * 9 + 70
    ws, ts = pack_blocks_device(jnp.asarray(vals), jnp.asarray(nbits),
                                jnp.int32(start), nw, method="scatter")
    wp, tp = pack_records_pallas(jnp.asarray(vals), jnp.asarray(nbits),
                                 jnp.int32(start), nw, interpret=True)
    assert int(ts) == int(tp)
    assert np.array_equal(np.asarray(ws), np.asarray(wp))


def test_pallas_word_aligned_chunk_boundary():
    """A chunk ending exactly on a word boundary must carry a zero word."""
    n, f = CHUNK + 8, 4
    nbits = np.full((n, f), 8, dtype=np.int32)  # 32 bits per record
    vals = np.arange(n * f, dtype=np.int32).reshape(n, f) & 0xFF
    nw = n + 20
    ws, ts = pack_blocks_device(jnp.asarray(vals), jnp.asarray(nbits),
                                jnp.int32(0), nw, method="scatter")
    wp, tp = pack_records_pallas(jnp.asarray(vals), jnp.asarray(nbits),
                                 jnp.int32(0), nw, interpret=True)
    assert int(ts) == int(tp)
    assert np.array_equal(np.asarray(ws), np.asarray(wp))


def test_pallas_empty():
    wp, tp = pack_records_pallas(jnp.zeros((0, 4), jnp.int32),
                                 jnp.zeros((0, 4), jnp.int32),
                                 jnp.int32(9), 4, interpret=True)
    assert int(tp) == 9 and np.asarray(wp).shape == (4,)


@pytest.mark.parametrize("pattern", ["all_zero", "all_max", "alternating",
                                     "single_field", "first_last"])
def test_pallas_edge_patterns(pattern):
    """Adversarial width patterns: all-empty records, all-maximal records
    (bound exactly reached), 0/16 alternation, and content only at the
    chunk edges."""
    n, f = CHUNK + 17, 18
    if pattern == "all_zero":
        nbits = np.zeros((n, f), np.int32)
    elif pattern == "all_max":
        nbits = np.full((n, f), 16, np.int32)
    elif pattern == "alternating":
        nbits = np.tile(np.array([0, 16] * (f // 2), np.int32), (n, 1))
    elif pattern == "single_field":
        nbits = np.zeros((n, f), np.int32)
        nbits[:, 3] = 5
    else:  # first_last
        nbits = np.zeros((n, f), np.int32)
        nbits[0] = 16
        nbits[-1] = 16
    rng = np.random.default_rng(1)
    vals = rng.integers(-(2 ** 15), 2 ** 15, (n, f)).astype(np.int32)
    nw = n * 9 + 70
    ws, ts = pack_blocks_device(jnp.asarray(vals), jnp.asarray(nbits),
                                jnp.int32(7), nw, method="scatter")
    wp, tp = pack_records_pallas(jnp.asarray(vals), jnp.asarray(nbits),
                                 jnp.int32(7), nw, interpret=True)
    assert int(ts) == int(tp)
    assert np.array_equal(np.asarray(ws), np.asarray(wp))


def _locals_from_fields(vals, nbits, lw):
    """Reference level-1: per-record register files + length row (numpy)."""
    n, f = vals.shape
    rows_pad = -(-(lw + 1) // 8) * 8
    out = np.zeros((rows_pad, n), np.uint32)
    for i in range(n):
        acc = 0
        bits = 0
        for j in range(f):
            b = int(nbits[i, j])
            if b:
                acc = (acc << b) | (int(vals[i, j]) & ((1 << b) - 1))
                bits += b
        out[lw, i] = bits
        word = acc << (32 * lw - bits) if bits else 0
        for w in range(lw):
            out[w, i] = (word >> (32 * (lw - 1 - w))) & 0xFFFFFFFF
    return out


@pytest.mark.parametrize("dense", [False, True])
def test_pack_locals_capped_vs_fallback(dense):
    """The capped merge tree and the worst-case fallback produce identical
    streams: `dense=True` builds adversarial all-maximal records that
    overflow the cap schedule (the lax.cond takes the fallback branch),
    `dense=False` stays on the capped fast path; both must equal the
    BitWriter-order concatenation."""
    from imageencoder_tpu.ops.bitpack import pack_fields
    from imageencoder_tpu.ops.pallas_pack import pack_locals_pallas

    rng = np.random.default_rng(5 if dense else 6)
    n, f, lw = CHUNK + 37, 18, 6
    if dense:
        nbits = np.full((n, f), 10, np.int32)  # 180 bits/record >> caps
    else:
        nbits = rng.integers(0, 5, (n, f)).astype(np.int32)
    vals = rng.integers(0, 2 ** 9, (n, f)).astype(np.int32)
    start = 169

    locals_np = _locals_from_fields(vals, nbits, lw)
    n_pad = -(-n // CHUNK) * CHUNK
    locals_np = np.pad(locals_np, ((0, 0), (0, n_pad - n)))

    exp_vals = np.concatenate([[0], (vals & ((1 << np.maximum(nbits, 1)) - 1))
                               .ravel()]).astype(np.int64)
    exp_bits = np.concatenate([[start], nbits.ravel()]).astype(np.int64)
    exp_bytes, exp_total = pack_fields(exp_vals, exp_bits)

    nw = n * (lw + 1) + 70
    words, total = pack_locals_pallas(jnp.asarray(locals_np), lw,
                                      jnp.int32(start), nw, interpret=True)
    assert int(total) == exp_total
    got = np.asarray(words).astype(">u4").tobytes()[:(exp_total + 7) // 8]
    assert got == exp_bytes
