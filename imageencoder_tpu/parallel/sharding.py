"""Sharded encode step over a ("frame", "block") mesh via shard_map.

This is the multi-chip replacement for the reference's OpenMP block loop
(ImageEncoder.cpp:121-146) and its sequential frame loop
(VideoEncoder.cpp:83-91):

  * a batch of frames [F, H, W] is sharded F over the "frame" axis (DP over
    frames/GOPs) and H over the "block" axis (spatial parallelism; each
    device owns a horizontal stripe of block rows),
  * each device computes its stripe's transform + quantize + RLE statistics
    entirely locally (the compute is embarrassingly parallel),
  * collectives assemble the global stream layout:
      - per-shard payload bit totals are all_gather'd so every shard knows
        its exclusive prefix (= its base bit offset in the final stream),
      - a psum'd histogram of coefficient widths feeds a global entropy
        stage (the reference builds its Huffman histogram serially,
        Huffman.cpp:236-243).

Height striping is chosen deliberately: the wire format orders blocks
row-major over the frame (ImageBase.cpp:175-206), so the concatenation of
horizontal stripes IS the wire order — the sharded encode assembles to a
stream bit-identical to the single-device encode, no reordering pass.
(For motion search the halo is then the top/bottom merange rows of the
neighbouring stripes — a ring ppermute; see models/video.py.)
"""

from __future__ import annotations

import numpy as np

from ..ops.dct import dct_matrix
from ..ops.pipeline import (fields_from_coeffs, _round_half_away,
                            transform_quantize)
from ..ops.zigzag import zigzag_order


def make_sharded_encode_step(mesh, block_size: int = 4, use_rle: bool = True,
                             norm: str = "reference"):
    """Build the jitted sharded encode step.

    Returns f(frames u8 [F, H, W], quant f32 [B, B]) ->
        vals   int32 [F, N, K+2]   sharded (frame, block); dim 1 is already
                                   global row-major block order
        nbits  int32 [F, N, K+2]   likewise
        base   int64 [F, S]        exclusive per-(frame, stripe) bit offsets
                                   within the frame's payload region
        hist   int32 [17]          global data_bits histogram (replicated)

    F must be divisible by the "frame" axis size and H/B by the "block"
    axis size.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    b = block_size
    dct_m = np.asarray(dct_matrix(b, norm), dtype=np.float32)
    zz = zigzag_order(b)

    def per_shard(frames, quant):
        f_loc, h_loc, w = frames.shape
        by, bx = h_loc // b, w // b
        n_loc = by * bx
        # One transform implementation everywhere: stacking the local
        # frames vertically preserves every block row, so the whole shard
        # is a single transform_quantize call (Pallas kernel on TPU).
        coeffs_zz = transform_quantize(
            frames.reshape(f_loc * h_loc, w), quant, jnp.asarray(dct_m), b)
        vals, nbits = fields_from_coeffs(coeffs_zz, use_rle)
        vals = vals.reshape(f_loc, n_loc, -1)
        nbits = nbits.reshape(f_loc, n_loc, -1)

        # --- collective ---
        # Exclusive prefix of per-(frame, stripe) bit totals along the
        # block axis: every stripe learns its base bit offset inside its
        # frame's payload region (stripes concatenate in wire order).
        total_local = jnp.sum(nbits, axis=(1, 2), dtype=jnp.int32)  # [f_loc]
        gathered = jax.lax.all_gather(total_local, "block")  # [S, f_loc]
        idx = jax.lax.axis_index("block")
        mask = (jnp.arange(gathered.shape[0]) < idx)[:, None]
        base = jnp.sum(gathered * mask, axis=0).astype(jnp.int64)  # [f_loc]
        return vals, nbits, base[:, None]

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("frame", "block", None), P()),
        out_specs=(P("frame", "block", None), P("frame", "block", None),
                   P("frame", "block")),
        check_rep=False)
    return jax.jit(fn)


def _segment_byte_histogram(xp, words, base, nbits_seg):
    """int32[257] histogram of the FULLY-COVERED bytes of one aligned
    segment: words hold global bytes starting at 4*(base>>5); byte b is
    counted iff  base <= 8b and 8b+8 <= base+nbits_seg.  Slot 256 is
    unused padding (kept so the shape matches meta conventions)."""
    lanes = ((words[:, None]
              >> xp.array([24, 16, 8, 0], xp.uint32)[None, :])
             & xp.uint32(0xFF)).astype(xp.uint8).reshape(-1)
    gbit = (base >> 5) * 32 + xp.arange(lanes.shape[0], dtype=xp.int32) * 8
    live = (gbit >= base) & (gbit + 8 <= base + nbits_seg)
    eq = (lanes[:, None] == xp.arange(256, dtype=xp.uint8)[None, :])
    hist = xp.sum(eq & live[:, None], axis=0, dtype=xp.int32)
    return xp.concatenate([hist, xp.zeros((1,), xp.int32)])


def make_sharded_encode_packed(mesh, block_size: int = 4, use_rle: bool = True,
                               norm: str = "reference",
                               mode: str = "concat"):
    """Sharded encode that ships PACKED BITS off every device — the round-2
    replacement for field-tensor assembly (reference seam: the parallel
    compute / sequential stream split, ImageEncoder.cpp:135-146).

    Each (frame, stripe) shard packs its records on device (the Pallas /
    scatter packer at bit offset 0), all_gathers the per-segment bit totals
    to learn its FINAL base offset in the stream, funnel-shifts its words
    to that bit phase, and psums a byte histogram of its fully-covered
    bytes — the distributed Huffman statistics stage (serial analogue:
    Huffman.cpp:236-243).  Host assembly is then a pure byte-OR splice of
    O(stream) bytes (assemble_packed_stream) and the Huffman code build
    consumes the psum'd histogram directly.

    mode: "concat"  — frames concatenate into one stream (video payload);
                      base offsets accumulate across frames.
          "separate" — every frame is its own stream whose payload starts
                      at start_bit (a batch of same-shape images).

    Returns jitted f(frames u8 [F, H, W], quant f32, start_bit i32) ->
        words  uint32 [F, S, WLOC]  per-segment words at final bit phase,
                                    word 0 = global word (base >> 5)
        bits   int32  [F, S]        per-segment payload bit counts
        hist   int32  [F, 257]      per-frame byte histogram of fully-
                                    covered payload bytes (psum over
                                    stripes; sum over F yourself in
                                    concat mode)
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from ..ops.device_pack import local_words, pack_blocks_device

    b = block_size
    dct_m = np.asarray(dct_matrix(b, norm), dtype=np.float32)
    zz = zigzag_order(b)
    f_ax = mesh.shape["frame"]
    s_ax = mesh.shape["block"]
    assert mode in ("concat", "separate")

    def per_shard(frames, quant, start_bit):
        f_loc, h_loc, w = frames.shape
        by, bx = h_loc // b, w // b
        n_loc = by * bx
        k2 = b * b + 2
        lw = local_words(k2)
        wloc = n_loc * lw + 2
        # One transform implementation everywhere: stacking the local
        # frames vertically preserves every block row, so the whole shard
        # is a single transform_quantize call (Pallas kernel on TPU).
        coeffs_zz = transform_quantize(
            frames.reshape(f_loc * h_loc, w), quant, jnp.asarray(dct_m), b)
        vals, nbits = fields_from_coeffs(coeffs_zz, use_rle)
        vals = vals.reshape(f_loc, n_loc, k2)
        nbits = nbits.reshape(f_loc, n_loc, k2)

        # Per-local-frame device pack at bit 0.
        packed = []
        for i in range(f_loc):
            wd, _ = pack_blocks_device(vals[i], nbits[i],
                                       jnp.int32(0), wloc)
            packed.append(wd)
        words = jnp.stack(packed)                      # [f_loc, wloc]
        bits_local = jnp.sum(nbits, axis=(1, 2), dtype=jnp.int32)  # [f_loc]

        # Full [F, S] bit matrix via two all_gathers (a few bytes each).
        g1 = jax.lax.all_gather(bits_local, "block")   # [S, f_loc]
        g2 = jax.lax.all_gather(g1, "frame")           # [f_ax, S, f_loc]
        full = g2.transpose(0, 2, 1).reshape(f_ax * f_loc, s_ax)  # [F, S]

        fid = jax.lax.axis_index("frame")
        sid = jax.lax.axis_index("block")
        sb = jnp.asarray(start_bit, jnp.int32)
        if mode == "concat":
            flat = full.reshape(-1)
            prefix = (jnp.cumsum(flat) - flat).reshape(full.shape)
            base_f = sb + prefix                       # [F, S]
        else:
            prefix = jnp.cumsum(full, axis=1) - full   # within-frame
            base_f = sb + prefix

        my_rows = fid * f_loc + jnp.arange(f_loc)
        base = base_f[my_rows, sid]                    # [f_loc]

        # Funnel-shift each segment to its final 32-bit phase.
        s_sh = (base & 31).astype(jnp.uint32)[:, None]
        ext = jnp.concatenate(
            [words, jnp.zeros((f_loc, 1), jnp.uint32)], axis=1)
        prev = jnp.concatenate(
            [jnp.zeros((f_loc, 1), jnp.uint32), words], axis=1)
        aligned = jnp.where(
            s_sh > 0, (ext >> s_sh) | (prev << ((32 - s_sh) % 32)), ext)

        # Per-frame byte histogram of fully-covered bytes (psum stripes).
        hists = []
        for i in range(f_loc):
            hists.append(_segment_byte_histogram(
                jnp, aligned[i], base[i], bits_local[i]))
        hist = jax.lax.psum(jnp.stack(hists), "block")  # [f_loc, 257]

        return aligned[:, None, :], bits_local[:, None], hist

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("frame", "block", None), P(), P()),
        out_specs=(P("frame", "block", None), P("frame", "block"),
                   P("frame", None)),
        check_rep=False)
    return jax.jit(fn)


def assemble_packed_stream(words, bits, start_bit: int, header: bytes,
                           mode: str = "concat"):
    """Splice aligned per-segment words into inner stream bytes (host side).

    words: [F, S, WLOC] uint32 (final bit phase); bits: [F, S] payload bit
    counts; header: the host-built stream header occupying [0, start_bit).

    Returns (inner bytes, total_bits) in concat mode, or a list of
    per-frame (inner, total_bits) in separate mode.  Cost is O(stream
    bytes) — the field tensors never reach the host.
    """
    words = np.asarray(words)
    bits = np.asarray(bits, dtype=np.int64)
    f, s, wloc = words.shape

    def splice(frames_idx):
        total = int(start_bit + bits[frames_idx].sum())
        out = np.zeros((total + 7) // 8 + 4, dtype=np.uint8)
        out[:len(header)] = np.frombuffer(header, dtype=np.uint8)
        base = start_bit
        for fi in frames_idx:
            for si in range(s):
                nb = int(bits[fi, si])
                if nb:
                    seg = words[fi, si].astype(">u4").view(np.uint8)
                    b0 = (base >> 5) * 4
                    n = ((base & 31) + nb + 7) // 8
                    out[b0:b0 + n] |= seg[:n]
                base += nb
        return out[:(total + 7) // 8].tobytes(), total

    if mode == "concat":
        return splice(range(f))
    return [splice([fi]) for fi in range(f)]


def boundary_byte_histogram(inner: bytes, bits, start_bit: int) -> np.ndarray:
    """Histogram of the bytes NOT covered by the device-side psum: the
    header region, each segment-boundary partial byte, and the tail.
    device_hist + this == np.bincount(inner) exactly."""
    bits = np.asarray(bits, dtype=np.int64).reshape(-1)
    data = np.frombuffer(inner, dtype=np.uint8)
    covered = np.zeros(len(data) + 1, dtype=bool)
    base = start_bit
    for nb in bits:
        lo = -(-base // 8)
        hi = (base + int(nb)) // 8
        if hi > lo:
            covered[lo:hi] = True
        base += int(nb)
    idx = np.nonzero(~covered[:len(data)])[0]
    return np.bincount(data[idx], minlength=256).astype(np.int64)


def encode_sharded_image_batch(frames, quant, mesh, use_rle: bool = True,
                               use_huffman: bool = True,
                               norm: str = "reference",
                               block_size: int = 4) -> list[bytes]:
    """Batch of same-shape images, sharded over the mesh, each returning
    its own wire stream — byte-identical to encode_image(backend="jax")
    up to documented f32 rounding-tie coefficients (identical to the
    sharded fields path bit-for-bit).
    """
    from ..models.headers import write_image_header
    from ..ops.bitpack import BitWriter
    from ..ops.huffman import huffman_encode_with_hist
    from ..utils.quant import QuantMatrix

    frames = np.asarray(frames)
    f, h, w = frames.shape
    qm = quant if isinstance(quant, QuantMatrix) else QuantMatrix(
        np.asarray(quant))
    writer = BitWriter()
    if not use_huffman:
        writer.put_bit(0)
    write_image_header(writer, qm, use_rle, w, h)
    header = writer.getvalue()

    step = make_sharded_encode_packed(mesh, block_size, use_rle, norm,
                                      mode="separate")
    import jax.numpy as jnp

    words, bits, hist = step(jnp.asarray(frames),
                             jnp.asarray(qm.as_float(np.float32)),
                             np.int32(writer.position))
    parts = assemble_packed_stream(words, bits, writer.position, header,
                                   mode="separate")
    out = []
    for fi, (inner, _) in enumerate(parts):
        if use_huffman:
            freqs = (np.asarray(hist)[fi][:256].astype(np.int64)
                     + boundary_byte_histogram(inner, bits[fi],
                                               writer.position))
            out.append(huffman_encode_with_hist(inner, freqs))
        else:
            out.append(inner)
    return out
