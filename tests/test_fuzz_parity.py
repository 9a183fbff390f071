"""Seeded fuzz parity: many small images with adversarial content/quant
against the reference binaries — catches wire-format edge cases (extreme
coefficient widths, all-zero blocks, RLE strip corners, tiny dims).

Parity definition: the huffman-unwrapped inner payload must be bit-exact
(dict serialization is toolchain-nondeterministic, so sizes may differ by
a few bytes while payloads agree)."""

import numpy as np
import pytest

from imageencoder_tpu.models.image import decode_image, encode_image
from imageencoder_tpu.utils.quant import QuantMatrix

from tests.oracle import ReferenceCodec


def adversarial_images(rng):
    """Content chosen to stress coefficient-width and RLE extremes."""
    yield np.zeros((8, 8), np.uint8)                       # all-zero blocks
    yield np.full((8, 8), 255, np.uint8)                   # max DC
    cb = np.indices((16, 16)).sum(0) % 2 * 255             # checkerboard: max AC
    yield cb.astype(np.uint8)
    yield np.kron(rng.integers(0, 2, (4, 4)) * 255,
                  np.ones((4, 4))).astype(np.uint8)        # block edges
    yield rng.integers(0, 256, (12, 20), np.uint8)         # noise, odd dims
    yield np.tile(np.arange(256, dtype=np.uint8), (4, 1))[:, :64]  # ramp
    g = np.linspace(0, 255, 24 * 24).reshape(24, 24)
    yield g.astype(np.uint8)                               # smooth gradient
    yield rng.integers(120, 136, (16, 16), np.uint8)       # near-flat


QUANTS = [
    np.ones((4, 4), np.uint32),                 # q=1: widest coefficients
    np.full((4, 4), 255, np.uint32),            # heavy: all-zero AC
    np.array([[2, 4, 6, 8], [4, 4, 6, 8],
              [6, 6, 6, 8], [8, 8, 8, 8]], np.uint32),
    np.array([[1, 1, 1, 1], [1, 1, 1, 1],
              [1, 1, 1, 64], [1, 1, 64, 512]], np.uint32),  # mixed extremes
]


@pytest.fixture(scope="module")
def ref():
    return ReferenceCodec()


@pytest.mark.parametrize("qi", range(len(QUANTS)))
@pytest.mark.parametrize("use_rle", [True, False])
def test_fuzz_inner_payload_parity(tmp_path, ref, qi, use_rle):
    rng = np.random.default_rng(qi)
    qm = QUANTS[qi]
    quant = QuantMatrix(qm)
    qfile = tmp_path / f"q{qi}.txt"
    qfile.write_text("\n".join(" ".join(str(v) for v in row)
                               for row in qm))

    for i, img in enumerate(adversarial_images(rng)):
        h, w = img.shape
        ref_enc = ref.encode_image(img, str(qfile), use_rle,
                                   name=f"f{qi}_{int(use_rle)}_{i}")
        our_enc = encode_image(img, quant, use_rle, use_huffman=True)
        ri = _inner(ref_enc)
        oi = _inner(our_enc)
        # Compare exactly the parse-defined stream extent (bitwise: the
        # Huffman unwrap decodes trailing pad bits into junk beyond it).
        end_bits = _stream_bits(oi)
        if not ref_enc[0] >> 7:
            # The reference's Huffman FALLBACK overflows its output buffer
            # by one bit (Huffman.cpp:332-340, SURVEY quirks) — verified:
            # the stream's tail bits change with unrelated heap state (e.g.
            # the job's file-name length flips them).  Trust nothing in the
            # last two bytes of the reference stream.
            end_bits = min(end_bits, (len(ref_enc) - 2) * 8 - 1)
        full, rem = divmod(end_bits, 8)
        assert len(ri) * 8 >= end_bits and len(oi) * 8 >= end_bits
        assert ri[:full] == oi[:full], (qi, use_rle, i)
        if rem:
            m = (0xFF00 >> rem) & 0xFF
            assert ri[full] & m == oi[full] & m, (qi, use_rle, i)
        # And our decoder round-trips our own stream.
        dec = decode_image(our_enc)
        assert dec.shape == img.shape


def _inner(stream: bytes) -> bytes:
    from imageencoder_tpu.ops.huffman import huffman_decode

    if stream[0] >> 7:
        return huffman_decode(stream)
    bits = np.unpackbits(np.frombuffer(stream, dtype=np.uint8))
    return np.packbits(bits[1:]).tobytes()


def _stream_bits(inner: bytes) -> int:
    """Meaningful bit extent of an inner stream, by parsing it."""
    from imageencoder_tpu.models.headers import read_image_header
    from imageencoder_tpu.models.image import walk_block_offsets
    from imageencoder_tpu.ops import bitpack
    from imageencoder_tpu.ops.bitpack import BitReader

    bits = bitpack.to_bits(inner)
    r = BitReader(bits, 0)
    quant, use_rle, w, h = read_image_header(r, 4)
    n_blocks = (w // 4) * (h // 4)
    *_, end = walk_block_offsets(bits, r.position, n_blocks, use_rle)
    return int(end)
