"""Exercise every concurrency-bearing native runtime path in one process.

Run under a sanitizer (tests/test_sanitizers.py):

    IER_NATIVE_LIB=.../libier_runtime_tsan.so LD_PRELOAD=libtsan.so.2 \
        TSAN_OPTIONS="halt_on_error=1 exitcode=66 suppressions=..." \
        python tools/sanitize_drive.py

Covers the OpenMP chunk-parallel packers with their shared-boundary-byte
atomic ORs (encode_pack_blocks, huffman_pack_bytes, pack_fields,
encode_frame_pack), the speculative-emit parallel Huffman FSM
(huffman_fsm_decode), the std::thread decode pipeline
(decode_image_pipelined via IER_PIPELINED_DECODE), and the OpenMP
extract/IDCT loops — the native analogue of the reference's one piece of
sanitizer rigor (BitStream.cpp:16-19's Valgrind fix).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("IER_PIPELINED_DECODE", "1")

import numpy as np  # noqa: E402

from imageencoder_tpu.models.image import decode_image, encode_image  # noqa: E402
from imageencoder_tpu.models.video import decode_video, encode_video  # noqa: E402
from imageencoder_tpu.utils.quant import QuantMatrix  # noqa: E402
from imageencoder_tpu.runtime.native import available  # noqa: E402


def main() -> int:
    assert available(), "native runtime (sanitized build) failed to load"
    quant = QuantMatrix.from_file("/root/reference/bin/matrix.txt")

    # Image: big enough that every packer and the FSM run chunk-parallel
    # (>4096 blocks, >64 KiB payloads).
    raw = np.fromfile("/root/reference/bin/ex1.raw", np.uint8)
    img = raw.reshape(936, 936)
    enc = encode_image(img, quant, use_rle=True, use_huffman=True,
                       backend="numpy")
    dec = decode_image(enc, backend="numpy")          # pipelined (env set)
    dec2 = decode_image(enc, backend="fast")
    assert np.array_equal(dec, dec2)
    os.environ.pop("IER_PIPELINED_DECODE", None)
    dec3 = decode_image(enc, backend="numpy")         # staged OpenMP chain
    assert np.array_equal(dec, dec3)
    os.environ["IER_PIPELINED_DECODE"] = "1"

    # Video: native motion search + one-pass frame encoder + fused decode,
    # both ref modes; GOP thread pool on decode.
    rng = np.random.default_rng(0)
    w, h, n = 256, 192, 6
    base = np.kron(rng.integers(0, 256, (h // 8, w // 8)), np.ones((8, 8)))
    frames = []
    for f in range(n):
        y = np.clip(np.roll(base, (2 * f, 3 * f), (0, 1))
                    + rng.normal(0, 4, base.shape), 0, 255).astype(np.uint8)
        frames.append(y.tobytes() + bytes(w * h // 2))
    data = b"".join(frames)
    for ref_mode in ("raw", "recon"):
        venc = encode_video(data, w, h, quant, True, 3, 16,
                            use_huffman=True, backend="numpy",
                            ref_mode=ref_mode)
        a, _, _ = decode_video(venc, backend="numpy")
        b, _, _ = decode_video(venc, backend="fast", workers=4)
        assert a == b
    print("sanitize_drive: ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
