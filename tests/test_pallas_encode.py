"""Fused encode front end (ops/pallas_encode.py) — interpret-mode tests.

Packing logic is validated EXACTLY: the expected stream is built from the
same Kronecker-factorized f32 coefficients the kernel computes (jnp on the
CPU backend lowers to the same XLA dot as interpret-mode Pallas), run
through the reference stats/fields path (ops/rle.py) and the scatter
packer.  Numerics are validated separately: the Kronecker coefficients may
differ from the einsum path by +-1 on rounding-tie coefficients (the
documented f32 device tie class, docs/PARITY.md) and must do so rarely.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageencoder_tpu.ops.dct import dct_matrix
from imageencoder_tpu.ops.device_pack import pack_blocks_device, \
    packed_words_bound
from imageencoder_tpu.ops.pallas_encode import (CHUNK, blockify_columns,
                                                coeff_bound_bits,
                                                encode_locals,
                                                frontend_lw,
                                                frontend_matrices)
from imageencoder_tpu.ops.pallas_pack import pack_locals_pallas
from imageencoder_tpu.ops.pipeline import fields_from_coeffs, \
    transform_quantize
from imageencoder_tpu.ops.rle import block_stats
from imageencoder_tpu.utils.quant import QuantMatrix

MATRIX = "/root/reference/bin/matrix.txt"
MATRIX8 = "/root/reference/bin/matrix8_1.txt"


def kron_coeffs(img, qv, b, norm):
    """The kernel's coefficient definition, replicated with host jnp ops
    (same XLA CPU dots as interpret-mode Pallas)."""
    a, bz, zz = frontend_matrices(b, norm)
    n = (img.shape[0] // b) * (img.shape[1] // b)
    x = blockify_columns(jnp.asarray(img), b, n)
    m = jnp.dot(jnp.asarray(a), x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.dot(jnp.asarray(bz), m, precision=jax.lax.Precision.HIGHEST)
    qzz = jnp.asarray(qv, jnp.float32).reshape(-1)[jnp.asarray(zz)]
    z = y / qzz[:, None]
    t = jnp.trunc(z)
    inc = jnp.where(jnp.abs(z - t) >= 0.5,
                    jnp.where(z >= 0.0, 1.0, -1.0), 0.0)
    return (t + inc).astype(jnp.int32).T  # [N, K] zig-zag order


def quant_for(b):
    return QuantMatrix.from_file(MATRIX8 if b == 8 else MATRIX, size=b)


@pytest.mark.parametrize("h,w,use_rle,b,norm", [
    (64, 64, True, 4, "reference"),
    (32, 48, True, 4, "reference"),
    (64, 64, False, 4, "reference"),
    (20, 24, True, 4, "reference"),
    (64, 64, True, 8, "ortho"),
    (256, 260, True, 4, "reference"),
])
def test_fused_frontend_stream_parity(h, w, use_rle, b, norm):
    rng = np.random.default_rng(h * 1000 + w)
    img = (rng.integers(0, 256, (h, w)).astype(np.uint8) // 2 + 64).astype(
        np.uint8)
    qv = quant_for(b).as_float(np.float32)

    cz = kron_coeffs(img, qv, b, norm)
    vals, nbits = fields_from_coeffs(cz, use_rle)
    n = vals.shape[0]
    nw = packed_words_bound(n, vals.shape[1])
    w_ref, t_ref = pack_blocks_device(vals, nbits, jnp.int32(37), nw,
                                      method="scatter")

    locs, nrec = encode_locals(jnp.asarray(img), qv, b, use_rle, norm,
                               interpret=True)
    assert nrec == n
    w_new, t_new = pack_locals_pallas(locs, frontend_lw(b, norm),
                                      jnp.int32(37), nw, interpret=True)
    assert int(t_ref) == int(t_new)
    assert jnp.array_equal(w_ref, w_new)


@pytest.mark.parametrize("b,norm", [(4, "reference"), (8, "ortho")])
def test_kron_coeffs_match_einsum_within_tie_class(b, norm):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64), np.uint8)
    qv = quant_for(b).as_float(np.float32)
    dm = jnp.asarray(np.asarray(dct_matrix(b, norm), np.float32))
    cz_e = np.asarray(transform_quantize(jnp.asarray(img), jnp.asarray(qv),
                                         dm, b))
    cz_k = np.asarray(kron_coeffs(img, qv, b, norm))
    diff = np.abs(cz_e - cz_k)
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 0.005  # rounding ties only


@pytest.mark.parametrize("b,norm", [(4, "reference"), (4, "ortho"),
                                    (8, "reference"), (8, "ortho")])
def test_coeff_bound_holds(b, norm):
    """The lw-register bound relies on |coeff| < 2**(db-1); verify the
    bound against adversarial extreme images (all-0 / all-255 / checker)."""
    db = coeff_bound_bits(b, norm)
    qv = np.ones((b, b), np.float32)  # worst (smallest legal) quant
    ext = [np.zeros((b * 4, b * 4), np.uint8),
           np.full((b * 4, b * 4), 255, np.uint8)]
    chk = np.indices((b * 4, b * 4)).sum(0) % 2 * 255
    ext.append(chk.astype(np.uint8))
    rng = np.random.default_rng(0)
    ext.append(rng.integers(0, 2, (b * 4, b * 4)).astype(np.uint8) * 255)
    for img in ext:
        cq = np.asarray(kron_coeffs(img, qv, b, norm))
        stats = block_stats(cq, True)
        assert int(stats["data_bits"].max()) <= db
        k2 = b * b
        rec = 4 + stats["data_bits"] + stats["n_payload"] * stats["data_bits"]
        assert int(rec.max()) <= 32 * frontend_lw(b, norm)


def test_padded_records_emit_nothing():
    """N not a CHUNK multiple: padded lanes must contribute zero bits."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (8, 8), np.uint8)  # 4 records << CHUNK
    qv = quant_for(4).as_float(np.float32)
    locs, n = encode_locals(jnp.asarray(img), qv, 4, True, "reference",
                            interpret=True)
    assert n == 4
    lw = frontend_lw(4, "reference")
    lens = np.asarray(locs)[lw].astype(np.int64)
    assert (lens[4:] == 0).all()
    assert (lens[:4] > 0).all()


def test_batch_fused_matches_per_image_pack():
    """_batch_encode_fused segment bytes == per-image fused pack at
    start_bit = header bits (same kron numerics on both sides)."""
    from imageencoder_tpu.models.batch import _batch_encode_fused
    from imageencoder_tpu.models.headers import write_image_header
    from imageencoder_tpu.ops.bitpack import BitWriter
    from imageencoder_tpu.ops.device_pack import words_to_bytes

    rng = np.random.default_rng(5)
    bsz, h, w = 3, 32, 64
    imgs = (rng.integers(0, 256, (bsz, h, w)).astype(np.uint8) // 2
            + 64).astype(np.uint8)
    quant = quant_for(4)
    qv = quant.as_float(np.float32)

    writer = BitWriter()
    write_image_header(writer, quant, True, w, h)
    hdr_bits = writer.position

    words, seg_start, seg_bits = _batch_encode_fused(
        jnp.asarray(imgs), jnp.asarray(qv), jnp.int32(hdr_bits), 4, True,
        "reference", interpret=True)
    words = np.asarray(words)
    seg_start = np.asarray(seg_start)
    seg_bits = np.asarray(seg_bits)

    n = (h // 4) * (w // 4)
    lw = frontend_lw(4, "reference")
    for i in range(bsz):
        locs, _ = encode_locals(jnp.asarray(imgs[i]), qv, 4, True,
                                "reference", interpret=True)
        wi, ti = pack_locals_pallas(locs, lw, jnp.int32(hdr_bits),
                                    n * lw + 4 + 2 * lw, interpret=True)
        want = words_to_bytes(np.asarray(wi), int(ti))
        nbytes = (int(seg_bits[i]) + 7) // 8
        got = words[seg_start[i]:seg_start[i] + (nbytes + 3) // 4]
        got = got.astype(">u4").tobytes()[:nbytes]
        assert int(ti) == int(seg_bits[i])
        assert got == want, i
