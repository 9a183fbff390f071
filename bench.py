"""Headline benchmark: end-to-end image encode throughput on one chip.

Matches the reference's headline metric (README.md:187-197): wall-clock to
encode bin/ex4.raw (4096x912, the largest shipped fixture) with RLE +
whole-stream Huffman, raw bytes in -> encoded stream out.  Reference
baseline: 461.9 ms on an i7-7700K with OpenMP (BASELINE.md) = 8.09 Mpix/s.

The encode is the fully-fused device pipeline (transform + quantize + RLE
stats + on-device bit packing, ops/pipeline.make_encode_packed) plus the
host Huffman stage; only the packed stream crosses the host<->device link.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 3735552 / 0.4619 / 1e6  # ex4 OpenMP+Huffman encode, README.md:193


def main() -> int:
    import jax

    from imageencoder_tpu.models.image import decode_image, encode_image
    from imageencoder_tpu.utils.quant import QuantMatrix

    raw = np.fromfile("/root/reference/bin/ex4.raw", dtype=np.uint8)
    img = raw.reshape(912, 4096)
    quant = QuantMatrix.from_file("/root/reference/bin/matrix.txt")

    def note(msg):
        print(f"[bench] +{time.perf_counter() - T0:7.1f}s {msg}",
              file=sys.stderr, flush=True)

    T0 = time.perf_counter()
    # Warm the transfer path first (the first D2H on this link pays a large
    # one-time initialization) and then the jit cache.
    np.asarray(jax.device_put(np.zeros(1024, np.uint8)))
    note("transfer path warm")
    enc = encode_image(img, quant, use_rle=True, use_huffman=True,
                       backend="jax")
    note(f"encode compiled+warm ({len(enc)} B)")

    # Sanity: stream must round-trip through our own decoder.
    dec = decode_image(enc, backend="jax")
    assert dec.shape == img.shape, (dec.shape, img.shape)
    note("decode sanity ok")

    # The dev-tunnel link this benchmark crosses has high throughput
    # variance; more runs + min gives a stable picture of the pipeline.
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        enc = encode_image(img, quant, use_rle=True, use_huffman=True,
                           backend="jax")
        times.append(time.perf_counter() - t0)
        note(f"run {i}: {times[-1] * 1e3:.1f} ms")
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
