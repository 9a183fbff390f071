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
from ..ops.pipeline import fields_from_coeffs, _round_half_away
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
        blocks = frames.reshape(f_loc, by, b, bx, b).swapaxes(2, 3)
        blocks = blocks.reshape(f_loc * n_loc, b, b)
        x = blocks.astype(jnp.float32) - jnp.float32(128.0)
        d = jnp.asarray(dct_m)
        y = jnp.einsum("ui,nij,vj->nuv", d, x, d,
                       precision=jax.lax.Precision.HIGHEST)
        q = _round_half_away(jnp, y / quant.astype(jnp.float32)).astype(jnp.int32)
        coeffs_zz = q.reshape(-1, b * b)[:, jnp.asarray(zz)]
        vals, nbits = fields_from_coeffs(coeffs_zz, use_rle)
        vals = vals.reshape(f_loc, n_loc, -1)
        nbits = nbits.reshape(f_loc, n_loc, -1)

        # --- collectives ---
        # (1) Exclusive prefix of per-(frame, stripe) bit totals along the
        # block axis: every stripe learns its base bit offset inside its
        # frame's payload region (stripes concatenate in wire order).
        total_local = jnp.sum(nbits, axis=(1, 2), dtype=jnp.int32)  # [f_loc]
        gathered = jax.lax.all_gather(total_local, "block")  # [S, f_loc]
        idx = jax.lax.axis_index("block")
        mask = (jnp.arange(gathered.shape[0]) < idx)[:, None]
        base = jnp.sum(gathered * mask, axis=0).astype(jnp.int64)  # [f_loc]

        # (2) Global histogram of data_bits widths (psum over the full mesh)
        # — the cross-shard statistic a global entropy-coding stage needs.
        widths = vals[:, :, 0].reshape(-1)
        hist = jnp.sum(jnp.arange(17, dtype=jnp.int32)[None, :] == widths[:, None],
                       axis=0, dtype=jnp.int32)
        hist = jax.lax.psum(hist, ("frame", "block"))
        return vals, nbits, base[:, None], hist

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("frame", "block", None), P()),
        out_specs=(P("frame", "block", None), P("frame", "block", None),
                   P("frame", "block"), P()),
        check_rep=False)
    return jax.jit(fn)
