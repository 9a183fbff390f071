"""Headline benchmark: end-to-end image encode throughput on one chip.

Matches the reference's headline metric (README.md:187-197): wall-clock to
encode bin/ex4.raw (4096x912, the largest shipped fixture) with RLE +
whole-stream Huffman, raw bytes in -> encoded stream out.  Reference
baseline: 461.9 ms on an i7-7700K with OpenMP (BASELINE.md) = 8.09 Mpix/s.

The encode is the fully-fused device pipeline (transform + quantize + RLE
stats + on-device Pallas bit packing, ops/pipeline.make_encode_packed) plus
the host Huffman stage; only the packed stream crosses the host<->device
link.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"extra" carries the secondary metrics the driver should track round over
round: device-only encode time (attributable progress — the e2e number
swings ~3x with tunnel weather), host decode time (reference: 327 ms ex4,
README.md:193), and video encode throughput (reference: 0.38 Mpix/s).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 3735552 / 0.4619 / 1e6  # ex4 OpenMP+Huffman encode, README.md:193
BASELINE_DECODE_MS = 327.0  # ex4 OpenMP decode, README.md:193
BASELINE_VIDEO_MPIX_S = 0.38  # 720p25, README.md:205-209


def main() -> int:
    import jax

    from imageencoder_tpu.models.image import decode_image, encode_image
    from imageencoder_tpu.utils.quant import QuantMatrix

    raw = np.fromfile("/root/reference/bin/ex4.raw", dtype=np.uint8)
    img = raw.reshape(912, 4096)
    quant = QuantMatrix.from_file("/root/reference/bin/matrix.txt")
    extra = {}

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
    dec = decode_image(enc, backend="fast")
    assert dec.shape == img.shape, (dec.shape, img.shape)
    note("decode sanity ok")

    # Device-only encode time: chained dispatches, one sync — attributable
    # round-over-round progress, independent of tunnel weather.
    try:
        import jax.numpy as jnp

        from imageencoder_tpu.ops.device_pack import HEADER_WORDS
        from imageencoder_tpu.ops.pipeline import make_encode_packed

        fn = make_encode_packed(4, True, "reference")
        di = jax.device_put(jnp.asarray(img))
        dq = jax.device_put(jnp.asarray(quant.as_float(np.float32)))
        hw = jax.device_put(jnp.zeros(HEADER_WORDS, jnp.uint32))
        w, t = fn(di, dq, np.int32(169), hw)
        w.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(8):
            w, t = fn(di, dq, np.int32(169), hw)
        w.block_until_ready()
        dev_ms = (time.perf_counter() - t0) / 8 * 1e3
        extra["device_encode_ms"] = round(dev_ms, 2)
        extra["device_encode_mpix_s"] = round(img.size / dev_ms / 1e3, 1)
        note(f"device-only encode {dev_ms:.2f} ms "
             f"({extra['device_encode_mpix_s']} Mpix/s)")
    except Exception as e:  # never fail the headline metric
        note(f"device-only encode failed: {e}")

    # Host decode (reference: 327 ms ex4 with OpenMP).
    try:
        for be in ("fast", "numpy"):
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                decode_image(enc, backend=be)
                times.append(time.perf_counter() - t0)
            extra[f"decode_{be}_ms"] = round(min(times) * 1e3, 1)
        extra["decode_vs_baseline"] = round(
            BASELINE_DECODE_MS / extra["decode_fast_ms"], 2)
        note(f"decode fast {extra['decode_fast_ms']} ms / parity "
             f"{extra['decode_numpy_ms']} ms")
    except Exception as e:
        note(f"decode bench failed: {e}")

    # Video encode (reference: ~0.38 Mpix/s on 720p25).
    try:
        from imageencoder_tpu.models.video import encode_video

        rng = np.random.default_rng(0)
        vw, vh, nf = 1280, 720, 25
        base = np.kron(rng.integers(0, 256, (vh // 8, vw // 8)),
                       np.ones((8, 8)))
        frames = []
        for f in range(nf):
            shifted = np.roll(base, (f * 2, f * 3), (0, 1))
            y = np.clip(shifted + rng.normal(0, 3, base.shape),
                        0, 255).astype(np.uint8)
            frames.append(y.tobytes() + bytes(vw * vh // 2))
        vdata = b"".join(frames)
        venc = encode_video(vdata, vw, vh, quant, True, 4, 16,
                            use_huffman=True, backend="jax")
        note(f"video encode compiled ({len(venc)} B)")
        t0 = time.perf_counter()
        venc = encode_video(vdata, vw, vh, quant, True, 4, 16,
                            use_huffman=True, backend="jax")
        v_s = time.perf_counter() - t0
        vmpix = vw * vh * nf / v_s / 1e6
        extra["video_encode_mpix_s"] = round(vmpix, 2)
        extra["video_encode_fps"] = round(nf / v_s, 1)
        extra["video_vs_baseline"] = round(vmpix / BASELINE_VIDEO_MPIX_S, 1)
        note(f"video encode {v_s:.2f} s = {vmpix:.1f} Mpix/s")
    except Exception as e:
        note(f"video bench failed: {e}")

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
        "extra": extra,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
