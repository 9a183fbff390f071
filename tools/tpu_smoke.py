"""One-process smoke of every jax/TPU surface on REAL hardware.

Tests force the CPU backend (tests/conftest.py); this script is the
complementary pass on the actual chip:

    python tools/tpu_smoke.py          # ~3-6 min (tunnel init + compiles)

Covers: image encode/decode (both Huffman modes), 8x8 ortho, video
raw/recon/chunked, batched serving, and both shard_map steps on a 1-device
TPU mesh.  Prints ALL TPU SMOKE OK on success.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

out = sys.stdout
def log(*a): print(*a, file=out, flush=True)
from imageencoder_tpu import (QuantMatrix, encode_image, decode_image,
                              encode_video, decode_video)
from imageencoder_tpu.models.batch import encode_image_batch
np.asarray(jax.device_put(np.zeros(16, np.uint8)))
log("devices:", jax.devices())
q = QuantMatrix.from_file('/root/reference/bin/matrix.txt')
rng = np.random.default_rng(0)
img = np.kron(rng.integers(0,256,(16,16)), np.ones((8,8))).astype(np.uint8)  # 128x128

# 1. image jax both huffman modes + decode
for uh in (True, False):
    enc = encode_image(img, q, True, use_huffman=uh, backend='jax')
    dec = decode_image(enc, backend='jax')
    log("image jax huffman=%s: %d B, decode ok %s" % (uh, len(enc), dec.shape == img.shape))

# 2. 8x8 ortho on TPU
q8 = QuantMatrix.from_file('/root/reference/bin/matrix8_1.txt', size=8)
e8 = encode_image(img, q8, True, use_huffman=True, norm='ortho', backend='jax', block_size=8)
d8 = decode_image(e8, norm='ortho', backend='jax', block_size=8)
log("8x8 jax:", len(e8), d8.shape == img.shape)

# 3. video raw + recon + chunked(>32 frames)
frames = [np.roll(img, (2*k, -3*k), (0,1)) for k in range(36)]
data = b''.join(f.tobytes() + bytes([0x80])*(128*128//2) for f in frames)
for mode in ("raw", "recon"):
    enc = encode_video(data[: 8*(128*128*3//2)], 128, 128, q, True, 4, 16,
                       use_huffman=True, backend='jax', ref_mode=mode)
    dec, p, _ = decode_video(enc)
    log("video jax %s: %d B, frames %d" % (mode, len(enc), p.frame_count))
encc = encode_video(data, 128, 128, q, True, 4, 16, use_huffman=True, backend='jax')
decc, pc, _ = decode_video(encc)
log("video jax chunked 36f: %d B, frames %d, len ok %s" % (len(encc), pc.frame_count, len(decc) == len(data)))

# 4. batch
streams = encode_image_batch(np.stack([img, np.roll(img, 5, 1)]), q, True)
log("batch:", [len(s) for s in streams])

# 5. sharded steps on 1-device TPU mesh (fields + packed variants)
from imageencoder_tpu.parallel import (assemble_packed_stream, make_mesh,
                                       make_sharded_encode_packed,
                                       make_sharded_encode_step)
from imageencoder_tpu.parallel.video_sharding import (
    assemble_sharded_video_packed, make_sharded_video_packed,
    make_sharded_video_step)
from imageencoder_tpu.models.video import mvec_bits
mesh = make_mesh(1)
st = make_sharded_encode_step(mesh)
v, nb, base = jax.block_until_ready(st(np.stack(frames[:2]), np.asarray(q.as_float(np.float32))))
log("sharded image step on TPU mesh(1):", v.shape)
pst = make_sharded_encode_packed(mesh, mode="concat")
pw, pb, ph = jax.block_until_ready(pst(np.stack(frames[:2]),
                                       np.asarray(q.as_float(np.float32)),
                                       np.int32(16)))
inner, tb = assemble_packed_stream(pw, pb, 16, b"\x00\x00", mode="concat")
from imageencoder_tpu.ops import bitpack
serial, stot = bitpack.pack_fields(
    np.concatenate([[0], np.asarray(v).ravel()]),
    np.concatenate([[16], np.asarray(nb).ravel()]))
log("sharded PACKED image on TPU mesh(1): splice==serial", inner == serial)
assert inner == serial
vst = make_sharded_video_step(mesh, 4, 16, mvec_bits(16))
mv, bv, bn, b2 = jax.block_until_ready(vst(np.stack(frames[:1]), np.asarray(q.as_float(np.float32))))
log("sharded video step on TPU mesh(1):", bv.shape)
for mode in ("raw", "recon"):
    vps = make_sharded_video_packed(mesh, 4, 16, mvec_bits(16), ref_mode=mode)
    from imageencoder_tpu.models.headers import (VideoParams,
                                                 write_image_header,
                                                 write_video_params)
    from imageencoder_tpu.ops.bitpack import BitWriter
    wtr = BitWriter()
    write_image_header(wtr, q, True, 128, 128)
    write_video_params(wtr, VideoParams(4, 4, 16))
    mvw, blw, bb, vh = jax.block_until_ready(
        vps(np.stack(frames[:4]), np.asarray(q.as_float(np.float32)),
            np.int32(wtr.position)))
    stream = assemble_sharded_video_packed(mvw, blw, bb, 128, 128, q, True,
                                           4, 16, use_huffman=True, hist=vh)
    single = encode_video(data[: 4*(128*128*3//2)], 128, 128, q, True, 4, 16,
                          use_huffman=True, backend='jax', ref_mode=mode)
    log("sharded PACKED video %s on TPU mesh(1): == single-device %s"
        % (mode, stream == single))
    assert stream == single

# 6. fast host backend sanity
ef = encode_image(img, q, True, use_huffman=True, backend='fast')
dfast = decode_image(ef, backend='fast')
log("fast host backend:", len(ef), dfast.shape == img.shape)
log("ALL TPU SMOKE OK")
