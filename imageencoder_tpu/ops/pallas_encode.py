"""Fused Pallas encode front end: pixels -> per-record bit-register files.

Round-3 replacement for the XLA glue between the DCT kernel and the bit
packer.  Round-2 profiling (differenced in-jit timing, /tmp/tpuq job 010)
showed the device encode's cost was NOT the packer but the zigzag gather +
RLE statistics + field expansion running as ~2.8 ms of unfused XLA passes
(each a full HBM round trip over 15-17 MB tensors).  This kernel runs the
whole front half of the encoder in one pass through VMEM:

    [B*B, N] f32 blocked pixels (x-128, column layout: record = lane)
      -> 2-D DCT as TWO [B*B, B*B] MXU matmuls:
           Y = (I_B (x) D) @ ((D (x) I_B) @ X)
         the Kronecker factorization of D X D^T over vec(X); each output
         element is the same 4-term f32 dot the tile kernel computes, so
         coefficients are bit-identical to ops/pallas_kernels.dct_quantize
         (zero-padding invariance of f32 accumulation)
      -> zig-zag: FREE — the rows of (I (x) D) are permuted by the zig-zag
         order, so coefficients come out of the MXU already in scan order
      -> quant divide + round-half-away (Block.cpp:152 parity)
      -> RLE stats as column reductions (Block.cpp:186-232 semantics incl.
         the trailing-strip quirk and the ffs(0) clamp, see ops/rle.py)
      -> wire fields ((nbits << 16) | value, ops/pallas_pack.py encoding)
      -> level-1 register files: each record's fields packed MSB-first
         into its private lw-word column (the Hillis-Steele offset ladder
         + masked-sum deposit from the round-2 packer, now fused here)

    output: uint32 [ROWS_PAD, N]  — rows 0..lw-1 the register words,
            row lw the record bit length, rest zero padding.

The output feeds ops/pallas_pack.pack_locals_pallas (bit-reversal permute
+ sequential-grid merge kernel), replacing the old field-tensor interface.
Serial analogue being replaced end-to-end: the reference's per-block
DCT/RLE/stream loop, ImageEncoder.cpp:121-146.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .dct import dct_matrix
from .zigzag import zigzag_order

CHUNK = 4096  # base record-padding granule (must match ops/pallas_pack.CHUNK)

# Grid-chunk tiers (even powers of 4, so the bit-reversal factors into two
# square axis permutations).  Round-4 on-chip sweep: the sequential packer
# grid costs ~2-6 µs of fixed overhead PER STEP (and the front end similar),
# so big inputs want few big steps — 57 -> 15 steps took the ex4 device
# encode 1.31 -> 0.92 ms — while small inputs must not pay a 16k-record
# padding tax.  Both kernels pick the largest tier dividing their input.
CHUNK_TIERS = (16384, 4096)


def pad_chunk_for(n: int) -> int:
    """Padding granule for n records: the tier the grid will use."""
    return CHUNK_TIERS[0] if n >= CHUNK_TIERS[0] else CHUNK_TIERS[-1]


def grid_chunk_for(n_pad: int) -> int:
    """Largest tier dividing an (already padded) record count."""
    for t in CHUNK_TIERS:
        if n_pad % t == 0:
            return t
    raise ValueError(f"{n_pad} is not a multiple of {CHUNK_TIERS[-1]}")


def coeff_bound_bits(block_size: int, norm: str) -> int:
    """Sound bound on data_bits for u8 pixel input and integer quant >= 1.

    |Y(u,v)| <= 128 * (max_u sum_i |D[u,i]|)^2 exactly (pixels-128 are in
    [-128, 127]), so bits_needed of any quantized coefficient is bounded;
    data_bits additionally covers ffs(count) <= bit_length(B*B).  B=4: 11
    bits (vs the generic 16-bit field cap) -> 6-word register files."""
    d = np.abs(np.asarray(dct_matrix(block_size, norm), np.float64))
    r = d.sum(axis=1).max()
    mag = int(np.ceil(128.0 * r * r))
    return max(mag.bit_length() + 1, (block_size * block_size).bit_length(), 1)


def coeff_bound_bits_residual(block_size: int, norm: str) -> int:
    """Like :func:`coeff_bound_bits` but for P-frame RESIDUAL input: the
    DCT sees residual-128 in [-383, 127] (residual = cur - pred in
    [-255, 255], then the shared SUBTRACT_128 bias, Block.cpp:139-153), so
    the magnitude bound scales by 383/128."""
    d = np.abs(np.asarray(dct_matrix(block_size, norm), np.float64))
    r = d.sum(axis=1).max()
    mag = int(np.ceil(383.0 * r * r))
    return max(mag.bit_length() + 1, (block_size * block_size).bit_length(), 1)


def lw_for_bits(block_size: int, db: int) -> int:
    """Register words per record for a data_bits bound of db."""
    k2 = block_size * block_size
    return -(-(4 + db + k2 * db) // 32)


def rows_for_lw(lw: int) -> int:
    """Output sublane count: lw register words + 1 length row, padded to 8."""
    return -(-(lw + 1) // 8) * 8


def frontend_lw(block_size: int, norm: str) -> int:
    """Register words per record under the u8-pixel coefficient bound."""
    return lw_for_bits(block_size, coeff_bound_bits(block_size, norm))


def frontend_rows(block_size: int, norm: str) -> int:
    return rows_for_lw(frontend_lw(block_size, norm))


def video_lw(block_size: int, norm: str) -> int:
    """Register words per record under the residual-range bound (video)."""
    return lw_for_bits(block_size, coeff_bound_bits_residual(block_size, norm))


def frontend_matrices(block_size: int, norm: str):
    """(A, Bz, qperm): Y_zz = Bz @ (A @ X) with A = D (x) I, Bz = (I (x) D)
    rows permuted by zig-zag; qperm re-orders the quant matrix likewise."""
    b = block_size
    d = np.asarray(dct_matrix(b, norm), dtype=np.float32)
    a = np.kron(d, np.eye(b, dtype=np.float32))
    bz = np.kron(np.eye(b, dtype=np.float32), d)
    zz = zigzag_order(b)
    return a, bz[zz], zz


@lru_cache(maxsize=None)
def _frontend_call(n_chunks: int, n_records: int, block_size: int,
                   use_rle: bool, db_max: int, lw: int, rows_pad: int,
                   interpret: bool, chunk: int = CHUNK):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = chunk  # noqa: N806 — grid-step record count (tiered)
    b = block_size
    k2 = b * b
    f = k2 + 2
    u32 = jnp.uint32

    def kernel(x_ref, a_ref, bz_ref, q_ref, o_ref):
        g = pl.program_id(0)

        # ---- transform: blocked 2-D DCT + zig-zag via row-permuted Bz ----
        m = jnp.dot(a_ref[:], x_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        y = jnp.dot(bz_ref[:], m, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        z = y / q_ref[:]
        t = jnp.trunc(z)
        inc = jnp.where(jnp.abs(z - t) >= 0.5,
                        jnp.where(z >= 0.0, 1.0, -1.0), 0.0)
        cq = (t + inc).astype(jnp.int32)              # [k2, C] zig-zag order

        # ---- RLE stats (ops/rle.py block_stats parity) ----
        nz = cq != 0
        pos1 = jax.lax.broadcasted_iota(jnp.int32, (k2, CHUNK), 0) + 1
        posm = jnp.where(nz, pos1, 0)
        length_full = jnp.max(posm, axis=0, keepdims=True)    # [1, C]

        mag = jnp.where(cq >= 0, cq, -cq - 1)
        bl = jnp.zeros((k2, CHUNK), jnp.int32)
        for kk in range(max(1, db_max - 1)):  # bit_length(mag) <= db_max - 1
            bl = bl + (mag >= (1 << kk)).astype(jnp.int32)
        pcb = jnp.where(nz, bl + 1, 0)
        max_bits = jnp.max(pcb, axis=0, keepdims=True)

        ffs_len = jnp.zeros((1, CHUNK), jnp.int32)
        for kk in range(7):  # length_full <= k2 <= 64
            ffs_len = ffs_len + (length_full >= (1 << kk)).astype(jnp.int32)
        data_bits = jnp.maximum(jnp.maximum(max_bits, ffs_len), 1)

        if use_rle:
            posh = jnp.where(pos1 <= k2 - 1, posm, 0)
            length_head = jnp.max(posh, axis=0, keepdims=True)
            gap = (k2 - 1) - length_head
            full = length_full == k2
            count = jnp.where(full & (gap > 0), length_head, length_full)
            n_payload = count
        else:
            count = length_full
            n_payload = jnp.full((1, CHUNK), k2, jnp.int32)

        # Records past the true count emit nothing (the caller pads the
        # pixel columns; a real all-zero record would still cost 4(+w) bits).
        col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        live_rec = (g * CHUNK + col) < n_records       # [1, C]

        # ---- fields, combined (nb << 16) | (v & mask) ----
        def combine(nb, v):
            nb = jnp.where(live_rec, nb, 0)
            vmask = jnp.where(nb > 0,
                              (jnp.int32(1) << jnp.minimum(nb, 16)) - 1, 0)
            return (nb << 16) | (v & vmask)

        f0 = combine(jnp.full((1, CHUNK), 4, jnp.int32), data_bits)
        if use_rle:
            f1 = combine(data_bits, count)
        else:
            f1 = jnp.zeros((1, CHUNK), jnp.int32)
        live_c = pos1 <= n_payload                      # [k2, C]
        fpay = combine(jnp.where(live_c, data_bits, 0), cq)
        fields = jnp.concatenate([f0, f1, fpay], axis=0)  # [f, C] int32

        # ---- level 1: per-record register files (round-2 packer level 1,
        # pallas_pack.py history; deposit via masked sums, no scatter) ----
        nb = fields >> 16
        v = pltpu.bitcast(fields, u32) & jnp.uint32(0xFFFF)
        acc = nb
        sh_ = 1
        while sh_ < f:
            acc = acc + jnp.concatenate(
                [jnp.zeros((sh_, CHUNK), jnp.int32), acc[:-sh_]], axis=0)
            sh_ *= 2
        local_off = acc - nb
        lens = acc[f - 1:f]                            # [1, C] total bits
        wi = local_off >> 5
        bo = local_off & 31
        avail = 32 - bo
        fits = nb <= avail
        sh1 = jnp.clip(avail - nb, 0, 31).astype(u32)
        sh1r = jnp.clip(nb - avail, 0, 31).astype(u32)
        part1 = jnp.where(fits, v << sh1, v >> sh1r)
        spill = jnp.where(fits, 0, nb - avail).astype(u32)
        part2 = jnp.where(fits, jnp.uint32(0), v << ((32 - spill) % 32))
        part2 = jnp.where(spill > 0, part2, jnp.uint32(0))
        part1 = jnp.where(nb > 0, part1, jnp.uint32(0))
        p1i = pltpu.bitcast(part1, jnp.int32)
        p2i = pltpu.bitcast(part2, jnp.int32)
        rows = []
        for j in range(lw):
            rj = (jnp.sum(jnp.where(wi == j, p1i, 0), axis=0, keepdims=True)
                  | jnp.sum(jnp.where(wi == j - 1, p2i, 0), axis=0,
                            keepdims=True))
            rows.append(rj)
        rows.append(lens)
        if rows_pad > lw + 1:
            rows.append(jnp.zeros((rows_pad - lw - 1, CHUNK), jnp.int32))
        o_ref[:] = pltpu.bitcast(jnp.concatenate(rows, axis=0), u32)

    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((k2, CHUNK), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, k2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, k2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, CHUNK), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_pad, CHUNK), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_chunks * CHUNK), u32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def blockify_columns(img, block_size: int, n_pad: int):
    """[H, W] u8 -> f32 [B*B, n_pad] column-blocked (x - 128), records in
    global row-major block order; padded columns are zero (masked out by
    the kernel's live_rec).

    Two-step transpose: the direct 4-D (1,3,0,2) transpose lowers to a
    ~2.3 ms gather on ex4; splitting it into two pairwise transposes is
    ~0.24 ms (measured, /tmp/tpuq job 023)."""
    import jax.numpy as jnp

    b = block_size
    h, w = img.shape
    n = (h // b) * (w // b)
    x = img.reshape(h // b, b, w).transpose(1, 0, 2)
    x = x.reshape(b, h // b, w // b, b).transpose(0, 3, 1, 2)
    x = x.reshape(b * b, n).astype(jnp.float32) - jnp.float32(128.0)
    if n_pad > n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    return x


def encode_locals_cols(x, n_records: int, quant, block_size: int = 4,
                       use_rle: bool = True, norm: str = "reference",
                       db: int | None = None, interpret: bool = False):
    """Column-blocked front end: x f32 [B*B, n_pad] (biased DCT input,
    see blockify_columns) -> locals u32 [rows_for_lw(lw), n_pad].

    db overrides the data_bits bound (video residual input needs
    coeff_bound_bits_residual); lw = lw_for_bits(block_size, db) and the
    caller must pass the SAME lw to pack_locals_pallas.
    """
    import jax.numpy as jnp

    b = block_size
    if db is None:
        db = coeff_bound_bits(b, norm)
    n_pad = x.shape[1]
    chunk = grid_chunk_for(n_pad)
    lw = lw_for_bits(b, db)

    a, bz, zz = frontend_matrices(b, norm)
    q = jnp.asarray(quant, jnp.float32).reshape(-1)[jnp.asarray(zz)]
    qtile = jnp.broadcast_to(q[:, None], (b * b, chunk))

    call = _frontend_call(n_pad // chunk, n_records, b, use_rle, db, lw,
                          rows_for_lw(lw), interpret, chunk)
    return call(x, jnp.asarray(a), jnp.asarray(bz), qtile)


def encode_locals(img, quant, block_size: int = 4, use_rle: bool = True,
                  norm: str = "reference", interpret: bool = False):
    """[H, W] u8 image -> (locals u32 [ROWS_PAD, N_pad], n_records).

    locals rows 0..lw-1 (lw = frontend_lw(block_size, norm)): per-record
    packed words; row lw: record bit length.  Feed to
    ops/pallas_pack.pack_locals_pallas with the same lw.
    """
    b = block_size
    h, w = img.shape
    n = (h // b) * (w // b)
    pc = pad_chunk_for(n)
    n_pad = max(1, -(-n // pc)) * pc

    x = blockify_columns(img, b, n_pad)
    locals_ = encode_locals_cols(x, n, quant, b, use_rle, norm,
                                 interpret=interpret)
    return locals_, n


def mvec_locals(mvec, is_i, mvec_nbits: int, rows_pad: int, lw: int):
    """Motion-vector records as register files: u32 [rows_pad, F*Nmacro].

    Each P-frame MacroBlock record is two mvec_nbits-bit fields packed
    MSB-first into register word 0 (2*mvec_nbits <= 32 always: merange is
    15-bit); I-frame rows have zero length (emit nothing).  Layout matches
    encode_locals_cols output so the two interleave row-wise.
    """
    import jax.numpy as jnp

    nb = mvec_nbits
    f, n_macro, _ = mvec.shape
    mask = jnp.uint32((1 << nb) - 1)
    m0 = mvec[:, :, 0].astype(jnp.uint32) & mask
    m1 = mvec[:, :, 1].astype(jnp.uint32) & mask
    word0 = (m0 << (32 - nb)) | (m1 << (32 - 2 * nb))
    live = jnp.broadcast_to(~is_i[:, None], (f, n_macro))
    word0 = jnp.where(live, word0, jnp.uint32(0)).reshape(1, f * n_macro)
    lens = jnp.where(live, jnp.uint32(2 * nb),
                     jnp.uint32(0)).reshape(1, f * n_macro)
    zero_mid = jnp.zeros((lw - 1, f * n_macro), jnp.uint32)
    zero_tail = jnp.zeros((rows_pad - lw - 1, f * n_macro), jnp.uint32)
    return jnp.concatenate([word0, zero_mid, lens, zero_tail], axis=0)


def interleave_video_locals(block_locals, mv_locals, n_frames: int):
    """Stream-order record interleave: per frame, Nmacro mvec records then
    Nmicro block records (VideoEncoder.cpp:64-91 layout), padded to a
    CHUNK multiple with zero-length records (packer no-ops)."""
    import jax.numpy as jnp

    r = block_locals.shape[0]
    n_micro = block_locals.shape[1] // n_frames
    n_macro = mv_locals.shape[1] // n_frames
    merged = jnp.concatenate(
        [mv_locals.reshape(r, n_frames, n_macro),
         block_locals.reshape(r, n_frames, n_micro)], axis=2)
    n = n_frames * (n_macro + n_micro)
    merged = merged.reshape(r, n)
    pc = pad_chunk_for(n)
    n_pad = max(1, -(-n // pc)) * pc
    if n_pad > n:
        merged = jnp.pad(merged, ((0, 0), (0, n_pad - n)))
    return merged
