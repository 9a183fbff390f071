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
