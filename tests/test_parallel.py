"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the sharded encode step (parallel/sharding.py) produces
exactly the same wire-format fields — and therefore bit-identical streams —
as the single-device path, plus the correctness of its collectives
(all_gather prefix offsets, psum histogram).
"""

import numpy as np
import pytest

import jax

from imageencoder_tpu.ops import bitpack
from imageencoder_tpu.ops.blockify import blockify
from imageencoder_tpu.ops.pipeline import make_encode_fields_from_blocks
from imageencoder_tpu.parallel import make_mesh, make_sharded_encode_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(42)
    # Smooth-ish content so RLE paths are exercised (not max-entropy noise).
    base = rng.integers(0, 256, size=(4, 8, 8)).astype(np.float64)
    up = np.kron(base, np.ones((1, 8, 8)))  # [4, 64, 64]
    return np.clip(up + rng.normal(0, 4, up.shape), 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def quant():
    return np.full((4, 4), 10.0, dtype=np.float32)


def test_sharded_fields_match_single_device(frames, quant):
    mesh = make_mesh(8)
    step = make_sharded_encode_step(mesh)
    vals_s, nbits_s, base, hist = jax.block_until_ready(step(frames, quant))

    single = make_encode_fields_from_blocks(4, True, "reference")
    for f in range(frames.shape[0]):
        vals_1, nbits_1 = single(blockify(frames[f], 4), quant)
        np.testing.assert_array_equal(np.asarray(vals_s)[f], np.asarray(vals_1))
        np.testing.assert_array_equal(np.asarray(nbits_s)[f], np.asarray(nbits_1))


def test_sharded_stream_assembly_bit_identical(frames, quant):
    """Stripes concatenated at their all_gather'd base offsets == serial pack."""
    mesh = make_mesh(8)
    s = mesh.shape["block"]
    step = make_sharded_encode_step(mesh)
    vals, nbits, base, _ = jax.block_until_ready(step(frames, quant))
    vals, nbits, base = map(np.asarray, (vals, nbits, base))

    f = 0
    serial, total = bitpack.pack_fields(vals[f].ravel(), nbits[f].ravel())

    # Reassemble from per-stripe packs placed at their base offsets.
    n_loc = vals.shape[1] // s
    bitbuf = np.zeros(((total + 7) // 8) * 8, dtype=np.uint8)
    for stripe in range(s):
        sl = slice(stripe * n_loc, (stripe + 1) * n_loc)
        data, nb = bitpack.pack_fields(vals[f, sl].ravel(), nbits[f, sl].ravel())
        off = int(base[f, stripe])
        assert off == int(nbits[f, :stripe * n_loc].sum())
        bitbuf[off:off + nb] = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8))[:nb]
    assert np.packbits(bitbuf).tobytes() == serial


def test_psum_histogram(frames, quant):
    mesh = make_mesh(8)
    step = make_sharded_encode_step(mesh)
    vals, nbits, base, hist = jax.block_until_ready(step(frames, quant))
    widths = np.asarray(vals)[:, :, 0].ravel()
    expect = np.bincount(widths, minlength=17)[:17]
    np.testing.assert_array_equal(np.asarray(hist), expect)


def test_mesh_factorization():
    m = make_mesh(8)
    assert m.shape["frame"] * m.shape["block"] == 8
    m = make_mesh(8, frame_axis=2)
    assert m.shape["frame"] == 2 and m.shape["block"] == 4
