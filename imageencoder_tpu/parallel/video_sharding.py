"""Sharded video encode step: motion search + residual fields over a
("frame", "block") mesh with genuine ICI collectives.

Data layout: frames [F, H, W] with F sharded over "frame" (contiguous
chunks) and H sharded over "block" (height stripes, multiples of 16).

Collectives per step (raw-reference mode, the shipped binaries' semantics):

  1. reference-frame pass: ref[f] = frames[f-1].  Inside a chunk that's a
     local shift; the chunk's first frame needs the PREVIOUS device's last
     frame — one ppermute along "frame" (ring, one frame of pixels).
  2. halo exchange: a stripe's motion search probes reference rows up to
     merange-1 beyond its boundary (2D-log offsets sum to merange-1 <
     merange), so each device receives the merange boundary rows of its
     up/down neighbours — two ppermutes along "block".  This is the
     context/ring-parallel analogue SURVEY §5 calls for.
  3. psum/all_gather for the global width histogram and per-stripe payload
     bit totals (stream assembly offsets), as in sharding.py.

The motion arithmetic is identical to ops/motion.py (tie-breaks, clamping,
skip rule) — only indexing moves to stripe-local coordinates.  Outputs are
bit-identical to the single-device path (test_video_sharded.py).
"""

from __future__ import annotations

import numpy as np

from ..ops import bitpack
from ..ops.bitpack import BitWriter
from ..ops.dct import dct_matrix
from ..ops.motion import MACRO, MER_SIGNS, search_steps
from ..ops.pipeline import _round_half_away, fields_from_coeffs
from ..ops.zigzag import zigzag_order


def assemble_sharded_video(mvals, bnbits, bvals, width: int, height: int,
                           quant, use_rle: bool, gop: int, merange: int,
                           use_huffman: bool = True) -> bytes:
    """Wire stream from make_sharded_video_step outputs (host side).

    Height striping means the sharded tensors are already in global
    row-major block order, so assembly is the standard field flattening:
    header, then per frame [mvec fields (P only)][block fields].  Output is
    byte-identical to models.video.encode_video(backend="jax").
    """
    from ..models.headers import (VideoParams, write_image_header,
                                  write_video_params)
    from ..models.video import mvec_bits

    mvals = np.asarray(mvals)
    bvals = np.asarray(bvals)
    bnbits = np.asarray(bnbits)
    f = bvals.shape[0]
    mb = mvec_bits(merange)

    writer = BitWriter()
    if not use_huffman:
        writer.put_bit(0)
    write_image_header(writer, quant, use_rle, width, height)
    write_video_params(writer, VideoParams(f, max(1, gop), merange))

    field_vals = [np.asarray(writer.values, dtype=np.int64)]
    field_nbits = [np.asarray(writer.nbits, dtype=np.int64)]
    for fi in range(f):
        if fi % max(1, gop) != 0:
            mv = mvals[fi].astype(np.int64).reshape(-1)  # (x, y) interleaved
            field_vals.append(mv)
            field_nbits.append(np.full(mv.shape[0], mb, dtype=np.int64))
        field_vals.append(bvals[fi].astype(np.int64).reshape(-1))
        field_nbits.append(bnbits[fi].astype(np.int64).reshape(-1))

    inner, _ = bitpack.pack_fields(np.concatenate(field_vals),
                                   np.concatenate(field_nbits))
    if use_huffman:
        from ..ops.huffman import huffman_encode

        return huffman_encode(inner)
    return inner


def make_sharded_video_step(mesh, gop: int, merange: int, mvec_nbits: int,
                            block_size: int = 4, use_rle: bool = True,
                            norm: str = "reference"):
    """Build the jitted sharded step.

    f(frames u8 [F, H, W], quant f32) ->
        mvals  int32 [F, Nmb, 2]     motion-vector field values (I rows 0)
        bvals  int32 [F, Nmicro, K+2] block field values (wire order)
        bnbits int32 [F, Nmicro, K+2]
        base   int64 [F, S]          per-(frame, stripe) micro-payload bit
                                     totals, all_gather'd (exclusive prefix
                                     is host-side trivial)
        hist   int32 [17]            global width histogram (replicated)

    Constraints: F % frame_axis == 0, (H / 16) % block_axis == 0, and every
    device chunk must hold at least 1 frame.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    b = block_size
    k = b * b
    m = int(merange)
    dct_m = np.asarray(dct_matrix(b, norm), dtype=np.float32)
    zz = zigzag_order(b)
    f_ax = mesh.shape["frame"]
    s_ax = mesh.shape["block"]

    def per_shard(frames, quant):
        f_loc, h_loc, w = frames.shape
        assert h_loc >= m, (
            f"stripe height {h_loc} < merange {m}: motion offsets would "
            f"reach past the immediate neighbour's halo; use fewer stripes")
        sid = jax.lax.axis_index("block")
        fid = jax.lax.axis_index("frame")
        h_glob = h_loc * s_ax
        row0 = sid * h_loc  # global row of this stripe's first row
        f0 = fid * f_loc    # global index of this chunk's first frame

        # (1) reference frames: shift by one within the chunk; fetch the
        # previous chunk's last frame over the ring.
        last = frames[-1]
        prev_last = jax.lax.ppermute(
            last, "frame", [(i, (i + 1) % f_ax) for i in range(f_ax)])
        ref = jnp.concatenate([prev_last[None], frames[:-1]], axis=0)

        # (2) halo exchange along the stripe axis (on the reference frames).
        halo = min(m, h_loc)
        top = ref[:, :halo]      # my top rows -> neighbour below's up-halo
        bot = ref[:, -halo:]     # my bottom rows -> neighbour above's halo
        from_above = jax.lax.ppermute(
            bot, "block", [(i, i + 1) for i in range(s_ax - 1)])
        from_below = jax.lax.ppermute(
            top, "block", [(i, i - 1) for i in range(1, s_ax)])
        ref_h = jnp.concatenate([from_above, ref, from_below], axis=1)
        # ref_h rows cover global [row0 - halo, row0 + h_loc + halo)

        # (3) motion search, stripe-local macro grid with global clamping.
        nby, nbx = h_loc // MACRO, w // MACRO
        n_mb = nby * nbx
        by_l = (np.repeat(np.arange(nby), nbx) * MACRO).astype(np.int32)
        bx_l = (np.tile(np.arange(nbx), nby) * MACRO).astype(np.int32)
        by = jnp.asarray(by_l)[None, :] + row0  # global row coords [1,Nmb]
        bx = jnp.asarray(bx_l)[None, :]
        by = jnp.broadcast_to(by, (f_loc, n_mb))
        bx = jnp.broadcast_to(bx, (f_loc, n_mb))
        r = jnp.arange(MACRO)

        def ref_windows(py_g, px):
            # global row -> ref_h local row
            py_l = py_g - row0 + halo
            return ref_h[jnp.arange(f_loc)[:, None, None, None],
                         py_l[:, :, None, None] + r[None, None, :, None],
                         px[:, :, None, None] + r[None, None, None, :]]

        # Gather-free SAD-map search (see ops/video_pipeline.sad_motion_search):
        # the halo provides exactly the +-(m-1) reference rows the stripe's
        # translation maps need, so the per-stripe formulation is identical
        # to the single-device one with ref_h in place of a padded ref.
        off = jnp.zeros((f_loc, n_mb, 2), dtype=jnp.int32)
        if m >= 2:
            p_h = m - 1
            cur_i = frames.astype(jnp.int32)
            ref_pad = jnp.pad(ref_h.astype(jnp.int32),
                              ((0, 0), (0, 0), (p_h, p_h)))

            def pool(x):  # [f_loc, h_loc, w] -> [f_loc, nby, nbx]
                x = x.reshape(f_loc, nby, MACRO, w).sum(axis=2)
                return x.reshape(f_loc, nby, nbx, MACRO).sum(axis=3)

            def sad_at(carry, od):
                dy, dx = od[0], od[1]
                shifted = jax.lax.dynamic_slice(
                    ref_pad, (0, halo + dy, p_h + dx), (f_loc, h_loc, w))
                return carry, pool(jnp.abs(cur_i - shifted))

            d_span = 2 * p_h + 1
            offsets = jnp.stack(
                jnp.meshgrid(jnp.arange(-p_h, p_h + 1),
                             jnp.arange(-p_h, p_h + 1), indexing="ij"),
                axis=-1).reshape(-1, 2)
            _, s_maps = jax.lax.scan(sad_at, 0, offsets)
            s = s_maps.reshape(d_span, d_span, f_loc, n_mb)

            fidx = jnp.arange(f_loc, dtype=jnp.int32)[:, None]
            bidx = jnp.arange(n_mb, dtype=jnp.int32)[None, :]

            def lookup(cand):
                dx_eff = jnp.clip(bx + cand[:, :, 0], 0, w - MACRO) - bx
                dy_eff = jnp.clip(by + cand[:, :, 1], 0, h_glob - MACRO) - by
                sad = s[dy_eff + p_h, dx_eff + p_h, fidx, bidx]
                return sad, (dx_eff == 0) & (dy_eff == 0)

            best = jnp.full((f_loc, n_mb), jnp.iinfo(jnp.int32).max,
                            jnp.int32)
            for step in search_steps(m):
                running = best
                sel = off
                for p in range(len(MER_SIGNS)):
                    sx, sy = int(MER_SIGNS[p, 0]), int(MER_SIGNS[p, 1])
                    cand = off + jnp.array([sx * step, sy * step], jnp.int32)
                    diff, at_self = lookup(cand)
                    skip = at_self if p > 0 else jnp.zeros_like(at_self)
                    acc = (~skip) & (diff <= running)
                    running = jnp.where(acc, diff, running)
                    sel = jnp.where(acc[:, :, None], cand, sel)
                off = sel
                best = running

        px = jnp.clip(bx + off[:, :, 0], 0, w - MACRO)
        py = jnp.clip(by + off[:, :, 1], 0, h_glob - MACRO)
        win = ref_windows(py, px)
        pred = win.reshape(f_loc, nby, nbx, MACRO, MACRO) \
                  .swapaxes(2, 3).reshape(f_loc, h_loc, w)

        # (4) transform + fields for this stripe's 4x4 blocks.
        is_i_np = np.array([(f0_i % gop) == 0 for f0_i in range(f_ax * f_loc)])
        # per-chunk static slice of the I-frame mask
        is_i = jax.lax.dynamic_slice(jnp.asarray(is_i_np), (f0,), (f_loc,))
        x = jnp.where(is_i[:, None, None], frames.astype(jnp.float32),
                      frames.astype(jnp.float32) - pred.astype(jnp.float32))
        mby, mbx = h_loc // b, w // b
        n_micro = mby * mbx
        blocks = x.reshape(f_loc, mby, b, mbx, b).swapaxes(2, 3)
        blocks = blocks.reshape(f_loc * n_micro, b, b) - jnp.float32(128.0)
        d = jnp.asarray(dct_m)
        y = jnp.einsum("ui,nij,vj->nuv", d, blocks, d,
                       precision=jax.lax.Precision.HIGHEST)
        q = _round_half_away(jnp, y / quant.astype(jnp.float32)).astype(jnp.int32)
        coeffs_zz = q.reshape(-1, k)[:, jnp.asarray(zz)]
        bvals, bnbits = fields_from_coeffs(coeffs_zz, use_rle)
        bvals = bvals.reshape(f_loc, n_micro, k + 2)
        bnbits = bnbits.reshape(f_loc, n_micro, k + 2)

        mask = (1 << mvec_nbits) - 1
        mvals = jnp.where(is_i[:, None, None], 0, off & mask)

        # (5) stream-assembly collectives: per-(frame, stripe) micro bit
        # totals (all_gather over "block") and the global width histogram.
        total_local = jnp.sum(bnbits, axis=(1, 2), dtype=jnp.int32)
        gathered = jax.lax.all_gather(total_local, "block")  # [S, f_loc]
        base = gathered.T.astype(jnp.int64)  # [f_loc, S] totals per stripe

        widths = bvals[:, :, 0].reshape(-1)
        hist = jnp.sum(jnp.arange(17, dtype=jnp.int32)[None, :]
                       == widths[:, None], axis=0, dtype=jnp.int32)
        hist = jax.lax.psum(hist, ("frame", "block"))
        return mvals, bvals, bnbits, base, hist

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("frame", "block", None), P()),
        out_specs=(P("frame", "block", None),
                   P("frame", "block", None), P("frame", "block", None),
                   P("frame", None), P()),
        check_rep=False)
    import jax

    return jax.jit(fn)
