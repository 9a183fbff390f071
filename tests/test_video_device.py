"""Whole-video device pipeline (ops/video_pipeline.py) vs the host path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageencoder_tpu.models.video import (decode_video, encode_video,
                                           split_yuv420)
from imageencoder_tpu.ops.motion import find_motion, predict_image
from imageencoder_tpu.ops.video_pipeline import _batched_motion
from imageencoder_tpu.utils.quant import QuantMatrix

from tests.test_video_parity import make_video

MATRIX = "/root/reference/bin/matrix.txt"


@pytest.fixture(scope="module")
def quant():
    return QuantMatrix.from_file(MATRIX)


def test_batched_motion_matches_per_frame():
    data, _ = make_video(smooth=False, seed=11)
    frames = split_yuv420(data, 64, 64)
    mv_d, pred_d = jax.jit(lambda f: _batched_motion(f, 4, 16))(
        jnp.asarray(frames))
    mv_d, pred_d = np.asarray(mv_d), np.asarray(pred_d)
    for f in range(1, len(frames)):
        if f % 4 == 0:
            continue
        mv_n, _ = find_motion(frames[f], frames[f - 1], 16)
        np.testing.assert_array_equal(mv_d[f], mv_n, err_msg=f"frame {f}")
        np.testing.assert_array_equal(
            pred_d[f], predict_image(frames[f - 1], mv_n, 64, 64))


def test_wide_frame_sad_search_falls_back_to_scan(monkeypatch):
    """Frames wider than 128 macroblocks (2048 px) exceed the Pallas
    SAD-map kernel's lane layout: sad_motion_search must route them to
    the lax.scan formulation instead of asserting (ADVICE r3)."""
    from imageencoder_tpu.ops import video_pipeline as vp

    rng = np.random.default_rng(3)
    h, w = 16, 2176  # 136 macroblock columns > 128
    cur = jnp.asarray(rng.integers(0, 256, (2, h, w), dtype=np.uint8))
    ref = jnp.asarray(rng.integers(0, 256, (2, h, w), dtype=np.uint8))

    monkeypatch.setattr(vp, "_SAD_MAPS_MODE", "scan")
    off_scan, pred_scan = vp.sad_motion_search(cur, ref, 4)
    # "interpret" would run the Pallas kernel; the width guard must send
    # this frame down the scan path (identical results, no assert).
    monkeypatch.setattr(vp, "_SAD_MAPS_MODE", "interpret")
    off_p, pred_p = vp.sad_motion_search(cur, ref, 4)
    np.testing.assert_array_equal(np.asarray(off_scan), np.asarray(off_p))
    np.testing.assert_array_equal(np.asarray(pred_scan), np.asarray(pred_p))


def test_device_video_stream_decodes(quant):
    data, frames_list = make_video(smooth=True)
    enc = encode_video(data, 64, 64, quant, True, 4, 16, use_huffman=True,
                       backend="jax")
    dec, params, (w, h) = decode_video(enc)
    assert (params.frame_count, w, h) == (8, 64, 64)
    ys = np.frombuffer(dec, dtype=np.uint8).reshape(8, -1)[:, :64 * 64]
    orig = np.stack([f.reshape(-1) for f in frames_list]).astype(float)
    mse = ((ys - orig) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 30


def test_device_vs_host_streams_nearly_identical(quant):
    """Only f32-vs-f64 rounding ties may differ (<0.1% of coefficients),
    so stream lengths match to within a few bytes and both decode."""
    data, _ = make_video(smooth=True, seed=2)
    a = encode_video(data, 64, 64, quant, True, 4, 16, use_huffman=False,
                     backend="numpy")
    b = encode_video(data, 64, 64, quant, True, 4, 16, use_huffman=False,
                     backend="jax")
    assert abs(len(a) - len(b)) <= 16
    da, _, _ = decode_video(a)
    db, _, _ = decode_video(b)
    ya = np.frombuffer(da, dtype=np.uint8).astype(np.int32)
    yb = np.frombuffer(db, dtype=np.uint8).astype(np.int32)
    assert np.abs(ya - yb).mean() < 0.5  # tie flips move pixels by ~1 rarely


def test_recon_scan_device_path(quant):
    """lax.scan recon-mode device encoder: decodable, near the host path."""
    from imageencoder_tpu.models.video import encode_video

    data, frames_list = make_video(smooth=False, seed=5)
    enc = encode_video(data, 64, 64, quant, True, 4, 16, use_huffman=True,
                       backend="jax", ref_mode="recon")
    dec, params, _ = decode_video(enc)
    assert params.frame_count == 8
    ys = np.frombuffer(dec, dtype=np.uint8).reshape(8, -1)[:, :64 * 64]
    orig = np.stack([f.reshape(-1) for f in frames_list]).astype(float)
    mse = ((ys - orig) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 28

    host = encode_video(data, 64, 64, quant, True, 4, 16, use_huffman=True,
                        backend="numpy", ref_mode="recon")
    assert abs(len(host) - len(enc)) < len(host) * 0.02  # f32/f64 tie drift


def _y_planes(raw: bytes, n: int, w: int = 64, h: int = 64):
    fs = w * h * 3 // 2
    a = np.frombuffer(raw, np.uint8).reshape(n, fs)
    return a[:, :w * h].astype(np.int32), a[:, w * h:]


def _assert_device_decode_matches(enc, n, block_size=4, motioncomp=True):
    """Device decode == numpy decode up to the documented f32/f64 IDCT
    rounding-tie class (docs/PARITY.md): |diff| <= 2, <0.1% of pixels."""
    dn, pn, (w, h) = decode_video(enc, motioncomp=motioncomp,
                                  block_size=block_size)
    dj, pj, (wj, hj) = decode_video(enc, motioncomp=motioncomp,
                                    backend="jax", block_size=block_size)
    assert (pn.frame_count, w, h) == (pj.frame_count, wj, hj)
    assert len(dn) == len(dj)
    ya, uva = _y_planes(dn, n, w, h)
    yb, uvb = _y_planes(dj, n, w, h)
    np.testing.assert_array_equal(uva, uvb)  # UV fill is exact
    d = np.abs(ya - yb)
    assert d.max() <= 2 and (d > 0).mean() < 1e-3, \
        f"max={d.max()} frac={(d > 0).mean()}"


def test_device_video_decode_matches_host(quant):
    """Fused per-GOP device decode (make_decode_video_device): prediction
    gather + residual IDCT + add + clamp in one lax.scan per chunk."""
    data, _ = make_video(smooth=True, seed=2)
    enc = encode_video(data, 64, 64, quant, True, 4, 16, use_huffman=True)
    _assert_device_decode_matches(enc, 8)


def test_device_video_decode_variants(quant):
    for n, gop, rle, mc, seed in [(6, 1, True, True, 7),   # all-I
                                  (8, 8, False, True, 7),  # no RLE
                                  (5, 3, True, True, 7),   # gop !| n
                                  (8, 4, True, False, 3)]:  # motioncomp off
        data, _ = make_video(n=n, smooth=True, seed=seed)
        enc = encode_video(data, 64, 64, quant, rle, gop, 16,
                           use_huffman=True)
        _assert_device_decode_matches(enc, n, motioncomp=mc)


def test_device_video_decode_chunked(quant):
    """>32 frames: decode runs GOP-aligned scan chunks; carry resets at
    each chunk's leading I-frame so chunks are independent."""
    data, _ = make_video(n=40, smooth=True, seed=7)
    enc = encode_video(data, 64, 64, quant, True, 4, 16, use_huffman=True)
    _assert_device_decode_matches(enc, 40)


def test_device_video_decode_block8():
    q8 = QuantMatrix.from_file("/root/reference/bin/matrix8_1.txt", 8)
    data, _ = make_video(n=6, smooth=True, seed=9)
    enc = encode_video(data, 64, 64, q8, True, 3, 16, use_huffman=True,
                       block_size=8)
    _assert_device_decode_matches(enc, 6, block_size=8)


def test_long_video_gop_chunking_identical(quant):
    """>32-frame device encode chunks by GOPs; stream must equal the
    unchunked device encode bit-for-bit."""
    import jax.numpy as jnp

    from imageencoder_tpu.models.headers import (VideoParams,
                                                 write_image_header,
                                                 write_video_params)
    from imageencoder_tpu.models.video import encode_video, mvec_bits
    from imageencoder_tpu.ops.bitpack import BitWriter
    from imageencoder_tpu.ops.device_pack import header_to_words, words_to_bytes
    from imageencoder_tpu.ops.video_pipeline import make_encode_video_packed

    data, _ = make_video(n=40, seed=31, smooth=False)
    chunked = encode_video(data, 64, 64, quant, True, 4, 16,
                           use_huffman=False, backend="jax")

    frames = split_yuv420(data, 64, 64)
    w = BitWriter()
    w.put_bit(0)
    write_image_header(w, quant, True, 64, 64)
    write_video_params(w, VideoParams(40, 4, 16))
    fn = make_encode_video_packed(4, 16, mvec_bits(16), 4, True, "reference")
    words, total = fn(jnp.asarray(frames),
                      jnp.asarray(quant.as_float(np.float32)),
                      np.int32(w.position),
                      jnp.asarray(header_to_words(w.getvalue())))
    unchunked = words_to_bytes(words, int(total))
    assert chunked == unchunked


def test_fused_video_locals_pack_matches_fields_path(quant):
    """_encode_video_locals (fused front end + mvec register files +
    merge-only packer, interpret mode) is bit-identical to the fields
    path packed with pack_blocks_device, on the SAME Kronecker-form
    coefficients (the kernel's numeric definition; test_pallas_encode.py
    validates that form against the einsum path separately)."""
    from imageencoder_tpu.models.video import mvec_bits
    from imageencoder_tpu.ops.device_pack import (pack_blocks_device,
                                                  packed_words_bound)
    from imageencoder_tpu.ops.pipeline import fields_from_coeffs
    from imageencoder_tpu.ops.video_pipeline import (_batched_motion_sadmap,
                                                     _encode_video_locals)
    from tests.test_pallas_encode import kron_coeffs

    f, h, w, gop, merange = 5, 64, 64, 2, 8
    data, frames_list = make_video(w=w, h=h, n=f, seed=31, smooth=False)
    frames = jnp.asarray(np.stack(frames_list))
    is_i = np.array([fi % gop == 0 for fi in range(f)])
    mvec, pred = _batched_motion_sadmap(frames, merange)
    x = jnp.where(jnp.asarray(is_i)[:, None, None],
                  frames.astype(jnp.float32),
                  frames.astype(jnp.float32) - pred.astype(jnp.float32))
    nb = mvec_bits(merange)
    k = 16
    n_micro = (h // 4) * (w // 4)
    n_macro = (h // 16) * (w // 16)
    n_rows = f * (n_macro + n_micro)
    n_words = packed_words_bound(n_rows, k + 2)
    start_bit = 50

    got_words, got_total = _encode_video_locals(
        x.reshape(f * h, w), mvec, jnp.asarray(is_i),
        jnp.asarray(quant.as_float(np.float32)), f, nb, 4, True,
        "reference", jnp.asarray(start_bit, jnp.int32), n_words,
        interpret=True)

    # Expected: same coefficients through the fields path.
    # kron_coeffs applies the shared -128 bias itself (blockify_columns),
    # so it takes x (pixels for I rows, residual for P rows) directly.
    cz = kron_coeffs(np.asarray(x).reshape(f * h, w),
                     quant.as_float(np.float32), 4, "reference")
    bvals, bnbits = fields_from_coeffs(cz, True)
    bvals = bvals.reshape(f, n_micro, k + 2)
    bnbits = bnbits.reshape(f, n_micro, k + 2)
    mask = (1 << nb) - 1
    mvals = np.zeros((f, n_macro, k + 2), np.int32)
    mnbits = np.zeros((f, n_macro, k + 2), np.int32)
    mvals[:, :, 0] = np.asarray(mvec)[:, :, 0] & mask
    mvals[:, :, 1] = np.asarray(mvec)[:, :, 1] & mask
    mnbits[:, :, :2] = nb
    mnbits[is_i] = 0
    vals = np.concatenate([mvals, np.asarray(bvals)], axis=1).reshape(-1, k + 2)
    nbits = np.concatenate([mnbits, np.asarray(bnbits)], axis=1).reshape(-1, k + 2)
    want_words, want_total = pack_blocks_device(
        jnp.asarray(vals), jnp.asarray(nbits),
        jnp.asarray(start_bit, jnp.int32), n_words)

    assert int(got_total) == int(want_total)
    nw = (int(want_total) + 31) // 32
    np.testing.assert_array_equal(np.asarray(got_words)[:nw],
                                  np.asarray(want_words)[:nw])
