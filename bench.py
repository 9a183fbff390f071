"""Headline benchmark: end-to-end image encode throughput on one chip.

Matches the reference's headline metric (README.md:187-197): wall-clock to
encode bin/ex4.raw (4096x912, the largest shipped fixture) with RLE +
whole-stream Huffman.  Reference baseline: 461.9 ms on an i7-7700K with
OpenMP (BASELINE.md) = 8.09 Mpix/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 3735552 / 0.4619 / 1e6  # ex4 OpenMP+Huffman encode, README.md:193


def main() -> int:
    from imageencoder_tpu.models.image import decode_image, encode_image
    from imageencoder_tpu.utils.quant import QuantMatrix

    raw = np.fromfile("/root/reference/bin/ex4.raw", dtype=np.uint8)
    img = raw.reshape(912, 4096)
    quant = QuantMatrix.from_file("/root/reference/bin/matrix.txt")

    # Warm-up: trigger jit compilation + native-runtime build.
    enc = encode_image(img, quant, use_rle=True, use_huffman=True, backend="jax")

    # Sanity: stream must round-trip through our own decoder.
    dec = decode_image(enc, backend="jax")
    assert dec.shape == img.shape, (dec.shape, img.shape)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        enc = encode_image(img, quant, use_rle=True, use_huffman=True,
                           backend="jax")
        times.append(time.perf_counter() - t0)
    best = min(times)
    mpix_s = img.size / best / 1e6

    print(json.dumps({
        "metric": "image_encode_throughput_ex4",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
