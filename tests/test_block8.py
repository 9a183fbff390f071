"""8x8 block support (proper orthonormal DCT — the reference's 8x8 is a
recompile with a 4x4-only scale factor, algo.cpp:294-297; ours is correct
under norm='ortho' and works on both backends)."""

import numpy as np
import pytest

from imageencoder_tpu.models.image import decode_image, encode_image
from imageencoder_tpu.utils.metrics import psnr
from imageencoder_tpu.utils.quant import QuantMatrix


@pytest.fixture(scope="module")
def quant8():
    return QuantMatrix.from_file("/root/reference/bin/matrix8_1.txt", size=8)


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_roundtrip_8x8(backend, quant8):
    rng = np.random.default_rng(1)
    img = np.kron(rng.integers(0, 256, (16, 16)),
                  np.ones((8, 8))).astype(np.uint8)
    enc = encode_image(img, quant8, True, use_huffman=True, norm="ortho",
                       backend=backend, block_size=8)
    dec = decode_image(enc, norm="ortho", backend=backend, block_size=8)
    assert dec.shape == img.shape
    assert psnr(img, dec) > 40


def test_8x8_backends_compatible(quant8):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    enc_np = encode_image(img, quant8, True, use_huffman=False, norm="ortho",
                          backend="numpy", block_size=8)
    # numpy stream decodes on the jax backend and vice versa
    dec = decode_image(enc_np, norm="ortho", backend="jax", block_size=8)
    dec2 = decode_image(enc_np, norm="ortho", backend="numpy", block_size=8)
    assert np.abs(dec.astype(int) - dec2.astype(int)).max() <= 1  # f32 ties
