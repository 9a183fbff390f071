"""Multi-host orchestration: GOP sharding across processes.

The reference is strictly single-process (SURVEY §2 #22).  The multi-host
design here follows the natural independence structure: GOPs never reference
each other (every GOP opens with an I-frame), so a video encode distributes
as

    host h encodes GOPs {i : i % n_hosts == h}        (DCN-parallel, no comms)
    -> per-GOP payload bit strings
    -> host 0 concatenates in GOP order + global Huffman

Within one host, frames/blocks shard over the local chips via the
(frame, block) mesh (parallel/sharding.py).  The only cross-host data is
the packed GOP payloads (tiny vs pixels) — an all-gather-to-root on DCN.

`initialize()` wraps jax.distributed for real multi-host runs;
`encode_gops` + `assemble` are pure functions usable with any transport
(tested in-process by running each rank's share serially).
"""

from __future__ import annotations

import numpy as np

from ..models.headers import VideoParams, write_image_header, write_video_params
from ..models.video import split_yuv420
from ..ops import bitpack
from ..ops.bitpack import BitWriter
from ..utils.checkpoint import _encode_gop_payload, _gop_slices


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bring-up for multi-host meshes (no-op if single)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def gop_assignment(n_gops: int, n_hosts: int, host: int) -> list[int]:
    """Round-robin GOP ownership (balanced to within one GOP)."""
    return list(range(host, n_gops, n_hosts))


def gather_segments(segments: dict, n_gops: int) -> dict:
    """All-gather every host's GOP segment map across the jax.distributed
    processes (the DCN hop of the multi-host design; single-process this is
    the identity).  Every process must call with its own `segments` and the
    same `n_gops`; every process returns the complete map.

    Payloads are variable-length, so the collective ships fixed-shape
    rows: a first tiny all-gather agrees on the padded row size, then one
    [rows, 24 + cap] u8 all-gather moves (gop_id, nbits, nbytes, payload).
    Segment bytes are tiny vs pixels (SURVEY §5: compressed stream ≈ 1-2
    bit/px), so padding waste is irrelevant on DCN.
    """
    import jax
    from jax.experimental import multihost_utils

    n_proc = jax.process_count()
    if n_proc <= 1:
        return dict(segments)

    rows = (n_gops + n_proc - 1) // n_proc
    local_cap = max((len(b) for b, _ in segments.values()), default=0)
    cap = int(np.max(multihost_utils.process_allgather(
        np.asarray([local_cap], np.int64))))

    buf = np.zeros((rows, 24 + cap), np.uint8)
    buf[:, :24] = np.array([-1, 0, 0], np.int64).view(np.uint8)  # unowned
    for r, (gid, (payload, nbits)) in enumerate(sorted(segments.items())):
        buf[r, :24] = np.array([gid, nbits, len(payload)],
                               np.int64).view(np.uint8)
        buf[r, 24:24 + len(payload)] = np.frombuffer(payload, np.uint8)

    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(-1, 24 + cap)
    out: dict = {}
    for row in gathered:
        gid, nbits, nbytes = row[:24].copy().view(np.int64)
        if gid < 0:
            continue
        out[int(gid)] = (row[24:24 + int(nbytes)].tobytes(), int(nbits))
    return out


def encode_gops(data: bytes, width: int, height: int, quant, use_rle: bool,
                gop: int, merange: int, gop_ids, norm: str = "reference",
                backend: str = "numpy", ref_mode: str = "raw"):
    """Encode this host's GOPs. Returns {gop_id: (bytes, nbits)}."""
    frames = split_yuv420(data, width, height)
    slices = _gop_slices(len(frames), gop)
    out = {}
    for i in gop_ids:
        s, e = slices[i]
        out[i] = _encode_gop_payload(frames[s:e], quant, use_rle, merange,
                                     norm, backend, ref_mode)
    return out


def missing_gops(segments: dict, n_frames: int, gop: int) -> list[int]:
    """Failure DETECTION for the distributed encode: which GOP ids are
    absent or malformed in the gathered segment map (a crashed or
    straggling host's share).  Recovery = re-encode them anywhere via
    encode_gops(..., gop_ids=missing) — GOPs are independent, so elastic
    reassignment needs no coordination beyond this list."""
    n_gops = len(_gop_slices(n_frames, gop))
    bad = []
    for i in range(n_gops):
        seg = segments.get(i)
        if (seg is None or len(seg) != 2 or not isinstance(seg[0], bytes)
                or int(seg[1]) > len(seg[0]) * 8
                or (int(seg[1]) == 0) != (len(seg[0]) == 0)):
            bad.append(i)
    return bad


def assemble(segments: dict, n_frames: int, width: int, height: int, quant,
             use_rle: bool, gop: int, merange: int,
             use_huffman: bool = True) -> bytes:
    """Root-side: header + GOP payloads in order + optional global Huffman.

    Refuses to splice an incomplete/inconsistent segment map (silent bad
    assembly was the round-1 gap): callers catch the ValueError, re-encode
    `missing_gops(...)` on any surviving host, and retry.
    """
    bad = missing_gops(segments, n_frames, gop)
    if bad:
        raise ValueError(f"missing or malformed GOP segments: {bad}; "
                         f"re-encode them via encode_gops(gop_ids={bad})")
    writer = BitWriter()
    if not use_huffman:
        writer.put_bit(0)
    write_image_header(writer, quant, use_rle, width, height)
    write_video_params(writer, VideoParams(n_frames, max(1, gop), merange))
    header, header_bits = bitpack.pack_fields(
        np.array(writer.values, dtype=np.int64),
        np.array(writer.nbits, dtype=np.int64))

    order = sorted(segments)
    inner = bitpack.concat_bit_segments(
        [(header, header_bits)] + [segments[i] for i in order])

    if use_huffman:
        from ..ops.huffman import huffman_encode

        return huffman_encode(inner)
    return inner
