"""GOP-granular checkpoint / resume for long video encodes.

The reference has no checkpointing (SURVEY §5): a crash loses the whole
job.  Here the natural persistence unit is the GOP — every GOP starts with
an I-frame (VideoBase.hpp:32) and P-frames only reference within-GOP
predecessors, so each GOP's payload is a self-contained bit string that can
be encoded, saved, and later spliced into the final stream.

Layout of a checkpoint directory:
    meta.json                 width/height/gop/merange/rle/total frames
    gop_{i:06d}.seg           raw segment bytes
    gop_{i:06d}.json          {"nbits": payload bit length}

`encode_video_checkpointed` skips GOPs that already have segments (resume
after crash), then assembles header + segments + optional Huffman — the
output is byte-identical to a straight `encode_video` call.
"""

from __future__ import annotations

import json
import pathlib
import zlib

import numpy as np

from ..models.headers import VideoParams, write_image_header, write_video_params
from ..models.video import BLOCK_SIZE, mvec_bits, split_yuv420
from ..ops import bitpack
from ..ops.bitpack import BitWriter
from ..utils.logger import Logger
from ..utils.quant import QuantMatrix


def _gop_slices(n_frames: int, gop: int):
    gop = max(1, gop)
    starts = list(range(0, n_frames, gop))
    return [(s, min(s + gop, n_frames)) for s in starts]


def _encode_gop_payload(frames, quant, use_rle, merange, norm, backend,
                        ref_mode, first_is_i=True):
    """Bit payload for one GOP (I-frame + following P-frames)."""
    if first_is_i and backend == "numpy":
        # One-pass native back end (runtime.cpp::encode_frame_pack), the
        # same engine encode_video uses: a GOP payload is the headerless
        # frame stream starting at bit 0 with gop == len(frames), so the
        # segment bits are identical to the field-tensor chain below
        # (pinned by test_checkpoint against a straight encode_video).
        try:
            from ..models.video import _encode_video_host_native

            fr = np.ascontiguousarray(np.stack(frames))
            buf, nbits_total = _encode_video_host_native(
                fr, quant, use_rle, len(frames), merange, norm,
                ref_mode, BLOCK_SIZE, BitWriter())
            return buf.tobytes(), nbits_total
        except Exception as e:
            from ..runtime.native import warn_fallback
            warn_fallback("encode_gop_payload", e)

    from ..models.video import _frame_fields, _residual_fields_and_recon
    from ..ops.motion import find_motion, predict_image

    h, w = frames[0].shape
    mb = mvec_bits(merange)
    field_vals: list[np.ndarray] = []
    field_nbits: list[np.ndarray] = []
    ref = None
    for i, cur in enumerate(frames):
        if i == 0 and first_is_i:
            vals, nbits = _frame_fields(cur, quant, use_rle, norm, backend)
            ref = cur
        else:
            mvec, _ = find_motion(cur, ref, merange)
            pred = predict_image(ref, mvec, h, w)
            residual = cur.astype(np.float64) - pred.astype(np.float64)
            vals, nbits, recon = _residual_fields_and_recon(
                residual, pred, quant, use_rle, norm, backend)
            mask = (1 << mb) - 1
            mv = np.empty(mvec.shape[0] * 2, dtype=np.int64)
            mv[0::2] = mvec[:, 0] & mask
            mv[1::2] = mvec[:, 1] & mask
            field_vals.append(mv)
            field_nbits.append(np.full(mv.shape[0], mb, dtype=np.int64))
            ref = cur if ref_mode == "raw" else recon
        field_vals.append(np.asarray(vals, dtype=np.int64).ravel())
        field_nbits.append(np.asarray(nbits, dtype=np.int64).ravel())
    all_vals = np.concatenate(field_vals)
    all_nbits = np.concatenate(field_nbits)
    data, nbits_total = bitpack.pack_fields(all_vals, all_nbits)
    return data, nbits_total


def encode_video_checkpointed(data: bytes, width: int, height: int,
                              quant: QuantMatrix, use_rle: bool, gop: int,
                              merange: int, ckpt_dir: str,
                              use_huffman: bool = True,
                              norm: str = "reference",
                              backend: str = "numpy",
                              ref_mode: str = "raw") -> bytes:
    """Like models.video.encode_video but resumable at GOP granularity."""
    d = pathlib.Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    frames = split_yuv420(data, width, height)
    n_frames = len(frames)
    # norm and backend both change payload bits (DCT scaling; f32 vs f64
    # rounding ties), so a resume under different numerics must be rejected
    # rather than silently splicing stale segments into the new stream.
    meta = {"width": width, "height": height, "gop": gop,
            "merange": merange, "rle": int(use_rle), "frames": n_frames,
            "ref_mode": ref_mode, "norm": norm, "backend": backend}
    meta_p = d / "meta.json"
    if meta_p.exists():
        old = json.loads(meta_p.read_text())
        if old != meta:
            raise ValueError(f"checkpoint dir {ckpt_dir} holds a different "
                             f"job: {old} != {meta}")
    else:
        meta_p.write_text(json.dumps(meta))

    segments = []
    for i, (s, e) in enumerate(_gop_slices(n_frames, gop)):
        seg_p = d / f"gop_{i:06d}.seg"
        info_p = d / f"gop_{i:06d}.json"
        seg = nbits = None
        # Failure DETECTION (SURVEY §5): a crash mid-write, bit rot, or a
        # deleted/truncated file must be caught and the GOP re-encoded, not
        # silently spliced into the stream.  Each segment carries its CRC32
        # and bit length; any inconsistency invalidates the segment.
        if seg_p.exists() and info_p.exists():
            raw = seg_p.read_bytes()
            try:
                info = json.loads(info_p.read_text())
                nbits = int(info["nbits"])
                ok = (info["crc32"] == zlib.crc32(raw)
                      and len(raw) == (nbits + 7) // 8)
            except (ValueError, KeyError, TypeError):
                ok = False
            if ok:
                seg = raw
            else:
                nbits = None
                Logger.write(f"[checkpoint] segment {i} failed validation; "
                             f"re-encoding GOP")
        if seg is None:
            seg, nbits = _encode_gop_payload(frames[s:e], quant, use_rle,
                                             merange, norm, backend, ref_mode)
            seg_p.write_bytes(seg)
            info_p.write_text(json.dumps({"nbits": nbits,
                                          "crc32": zlib.crc32(seg)}))
        segments.append((seg, nbits))

    # Assemble: header bits + segment bit strings, then optional Huffman.
    writer = BitWriter()
    if not use_huffman:
        writer.put_bit(0)
    write_image_header(writer, quant, use_rle, width, height)
    write_video_params(writer, VideoParams(n_frames, max(1, gop), merange))
    header, header_bits = bitpack.pack_fields(
        np.array(writer.values, dtype=np.int64),
        np.array(writer.nbits, dtype=np.int64))

    inner = bitpack.concat_bit_segments([(header, header_bits)] + segments)

    if use_huffman:
        from ..ops.huffman import huffman_encode

        return huffman_encode(inner)
    return inner
