"""On-device bit packer vs the host packer (bit-exact equivalence)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageencoder_tpu.ops import bitpack
from imageencoder_tpu.ops.device_pack import pack_blocks_device, words_to_bytes
from imageencoder_tpu.ops.pipeline import (make_encode_fields,
                                           make_encode_packed)


@pytest.mark.parametrize("seed,start", [(0, 0), (1, 37), (2, 171), (3, 8)])
def test_pack_matches_host(seed, start):
    rng = np.random.default_rng(seed)
    n, f = 257, 18
    nbits = rng.integers(0, 17, (n, f)).astype(np.int32)
    vals = rng.integers(-(2 ** 15), 2 ** 15, (n, f)).astype(np.int32)

    fn = jax.jit(pack_blocks_device, static_argnums=(3,))
    words, total = fn(jnp.asarray(vals), jnp.asarray(nbits),
                      jnp.asarray(start, jnp.int32), n * 9 + 4)
    dev = words_to_bytes(words, int(total))

    host, tb = bitpack.pack_fields(
        np.concatenate([[0], vals.ravel()]),
        np.concatenate([[start], nbits.ravel()]))
    assert int(total) == tb
    assert dev == host


def test_full_image_pack_equivalence():
    """Device-packed stream == host-packed stream of the same device fields."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 96), dtype=np.uint8)
    quant = np.full((4, 4), 7.0, dtype=np.float32)

    fields = make_encode_fields(4, True, "reference")
    vals, nbits = fields(img, quant)
    host, tb = bitpack.pack_fields(np.asarray(vals).ravel(),
                                   np.asarray(nbits).ravel())

    from imageencoder_tpu.ops.device_pack import HEADER_WORDS

    packed = make_encode_packed(4, True, "reference")
    words, total = packed(img, quant, np.int32(0),
                          np.zeros(HEADER_WORDS, np.uint32))
    assert int(total) == tb
    assert words_to_bytes(words, int(total)) == host


def test_empty_width_fields_skipped():
    vals = np.array([[3, 0, 5]], dtype=np.int32)
    nbits = np.array([[4, 0, 3]], dtype=np.int32)
    fn = jax.jit(pack_blocks_device, static_argnums=(3,))
    words, total = fn(jnp.asarray(vals), jnp.asarray(nbits),
                      jnp.asarray(0, jnp.int32), 12)
    assert int(total) == 7
    host, _ = bitpack.pack_fields(vals.ravel(), nbits.ravel())
    assert words_to_bytes(words, int(total)) == host


@pytest.mark.parametrize("n,f,start", [(1, 3, 0), (2, 5, 7), (257, 18, 171),
                                       (1024, 18, 2047), (777, 16, 0)])
def test_merge_matches_scatter(n, f, start):
    """The log-depth merge packer (the TPU fast path) must be bit-identical
    to the scatter packer for every dense layout."""
    rng = np.random.default_rng(n * 7 + f)
    nbits = rng.integers(0, 17, (n, f)).astype(np.int32)
    vals = rng.integers(-(2 ** 15), 2 ** 15, (n, f)).astype(np.int32)
    nw = n * 9 + 70
    ws, ts = pack_blocks_device(jnp.asarray(vals), jnp.asarray(nbits),
                                jnp.int32(start), nw, method="scatter")
    wm, tm = pack_blocks_device(jnp.asarray(vals), jnp.asarray(nbits),
                                jnp.int32(start), nw, method="merge")
    assert int(ts) == int(tm)
    assert np.array_equal(np.asarray(ws), np.asarray(wm))


def test_merge_zero_length_records():
    """Records whose every field is width 0 contribute nothing anywhere."""
    vals = np.array([[3, 0], [0, 0], [5, 1]], dtype=np.int32)
    nbits = np.array([[4, 0], [0, 0], [3, 2]], dtype=np.int32)
    ws, ts = pack_blocks_device(jnp.asarray(vals), jnp.asarray(nbits),
                                jnp.int32(5), 8, method="scatter")
    wm, tm = pack_blocks_device(jnp.asarray(vals), jnp.asarray(nbits),
                                jnp.int32(5), 8, method="merge")
    assert int(ts) == int(tm) == 5 + 4 + 5
    assert np.array_equal(np.asarray(ws), np.asarray(wm))
