"""Pallas TPU kernels for the codec hot ops.

Kernels here are drop-in replacements for XLA graph segments where hand
control over VMEM residency and fusion wins over the compiler:

  * byte_histogram   — masked 256-bin histogram of a packed uint32 stream
                       (the Huffman statistics pass).  XLA's formulation
                       materializes an [M, 256] compare; the kernel keeps a
                       VMEM accumulator and streams the words through it.
  * dct_quantize     — fused (x-128) -> 2-D DCT -> /Q -> round for every
                       4x4 block of an image band, MXU matmuls with no
                       HBM round-trips between stages.

Both fall back to the XLA implementations on non-TPU backends (interpret
mode is used in tests).  See /opt/skills/guides/pallas_guide.md patterns.
"""

from __future__ import annotations

from functools import lru_cache

CHUNK_ROWS = 8
CHUNK_LANES = 4096  # words per row chunk; 8x4096 u32 = 128 KB per step


def _pad_words(words, lanes_total: int):
    import jax.numpy as jnp

    n = words.shape[0]
    pad = (-n) % lanes_total
    if pad:
        words = jnp.concatenate([words, jnp.zeros(pad, jnp.uint32)])
    return words.reshape(-1, CHUNK_ROWS, CHUNK_LANES)


@lru_cache(maxsize=None)
def _hist_call(n_chunks: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(nbytes_ref, w_ref, o_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        nbytes = nbytes_ref[0]

        # The word buffer is a worst-case BOUND (~7x the typical stream);
        # steps entirely past nbytes contribute nothing — skip them.
        @pl.when(step * (CHUNK_ROWS * CHUNK_LANES * 4) < nbytes)
        def _():
            w = w_ref[0]  # [CHUNK_ROWS, CHUNK_LANES] uint32
            # Nibble decomposition: byte b == 16*h + l, so
            # count[b] = sum_i [hi_i == h][lo_i == l] = (H @ L^T)[h, l] —
            # two 16-bin one-hots (32 compares/byte instead of 256) and a
            # [16, C] x [16, C]^T MXU contraction per byte row.
            nib = jax.lax.broadcasted_iota(jnp.int32, (16, CHUNK_LANES), 0)
            acc = jnp.zeros((16, 16), jnp.float32)
            for r in range(CHUNK_ROWS):
                row = w[r:r + 1]                       # [1, C] uint32
                base = ((step * CHUNK_ROWS + r) * CHUNK_LANES * 4
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (1, CHUNK_LANES), 1) * 4)
                for j, sh in enumerate((24, 16, 8, 0)):
                    b = ((row >> jnp.uint32(sh))
                         & jnp.uint32(0xFF)).astype(jnp.int32)
                    live = (base + j) < nbytes          # [1, C]
                    hi = jnp.where(live, b >> 4, -1)
                    lo = b & 15
                    hmat = (hi == nib).astype(jnp.float32)   # [16, C]
                    lmat = (lo == nib).astype(jnp.float32)   # [16, C]
                    acc = acc + jax.lax.dot_general(
                        hmat, lmat, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
            # f32 counts are exact below 2**24; the caller accumulates
            # per-grid-step int32 partials, so each step's count is bounded
            # by CHUNK_ROWS * CHUNK_LANES * 4 bytes << 2**24.
            o_ref[:] = o_ref[:] + acc.astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, CHUNK_ROWS, CHUNK_LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 16), jnp.int32),
        interpret=interpret,
    )


def byte_histogram(words, nbytes, interpret: bool = False):
    """Masked byte histogram of a packed uint32 word stream -> int32[256]."""
    import jax.numpy as jnp

    chunks = _pad_words(words, CHUNK_ROWS * CHUNK_LANES)
    call = _hist_call(chunks.shape[0], interpret)
    acc = call(jnp.asarray([nbytes], jnp.int32).reshape(1),
               chunks)
    return acc.reshape(256)  # [hi, lo] row-major == byte value order


TILE_H = 32   # rows per tile: 8 block-rows of 4
TILE_W = 128  # cols per tile: 32 blocks of 4 — the native lane width


@lru_cache(maxsize=None)
def _dctq_call(grid_h: int, grid_w: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, bdl_ref, bdr_ref, q_ref, o_ref):
        # x: [32,128] pixels-128 (f32).  The 2-D DCT of every 4x4 block in
        # the tile is two block-diagonal MXU matmuls — no transposes, no
        # sub-tile reshapes:  Y = (I_8 (x) D) X ((I_32 (x) D))^T.
        y = jnp.dot(bdl_ref[:], x_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        y = jnp.dot(y, bdr_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        z = y / q_ref[:]
        # round half away from zero (std::round parity, Block.cpp:152)
        t = jnp.trunc(z)
        inc = jnp.where(jnp.abs(z - t) >= 0.5,
                        jnp.where(z >= 0.0, 1.0, -1.0), 0.0)
        o_ref[:] = (t + inc).astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(grid_h, grid_w),
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_W, TILE_W), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_h * TILE_H, grid_w * TILE_W),
                                       jnp.int32),
        interpret=interpret,
    )


def dct_quantize(img, quant, dct_m, block_size: int = 4,
                 interpret: bool = False):
    """Fused (x-128) -> block DCT -> /Q -> round for a whole image.

    img: [H, W] uint8; quant/dct_m: [B, B] float32 (B must divide TILE_H
    and TILE_W).  Returns int32 [H, W] quantized coefficients in place
    (block (r,c) coefficient (u,v) at [B*r+u, B*c+v]).  Pads internally to
    tile multiples; callers slice back.
    """
    import jax.numpy as jnp

    b = block_size
    assert TILE_H % b == 0 and TILE_W % b == 0
    h, w = img.shape
    hp = -h % TILE_H
    wp = -w % TILE_W
    x = img.astype(jnp.float32) - jnp.float32(128.0)
    if hp or wp:
        x = jnp.pad(x, ((0, hp), (0, wp)))
    bdl = jnp.kron(jnp.eye(TILE_H // b, dtype=jnp.float32), dct_m)
    bdr = jnp.kron(jnp.eye(TILE_W // b, dtype=jnp.float32), dct_m).T
    qtile = jnp.tile(quant.astype(jnp.float32), (TILE_H // b, TILE_W // b))
    call = _dctq_call((h + hp) // TILE_H, (w + wp) // TILE_W, interpret)
    out = call(x, bdl, bdr, qtile)
    return out[:h, :w]
