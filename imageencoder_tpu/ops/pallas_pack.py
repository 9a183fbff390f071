"""Pallas sequential-grid bitstream packer — the TPU-native replacement for
the reference's serial BitStreamWriter loop (BitStream.cpp:61-77).

The packing problem: N variable-length bit records (per-block wire fields,
lengths known after the RLE stats pass) must concatenate into one dense
bitstream.  The reference carries a bit cursor through a serial loop; the
XLA scatter formulation (ops/device_pack.py) costs ~17-25 ms of scatter-add
on a 3.7 Mpix image — the dominant device cost of round 1.

The kernel exploits that bit-string concatenation is ASSOCIATIVE: a chunk
of C consecutive records merges in a log2(C)-level tree, and only one
partial WORD of carry crosses chunk boundaries.  Structure:

  * XLA side: fields are combined into ONE int32 tensor per record
    ((nbits << 16) | (vals & 0xFFFF) — fields are at most 16 bits wide),
    permuted by intra-chunk bit reversal and transposed to column blocks.
    One tensor instead of two halves the cost of these relayout passes,
    which profiling showed dominate (a 16 MB gather costs ~6 ms here).
  * level 1 builds each record's register file IN VMEM in COLUMN layout
    [F, C] (records on lanes, full VPU width); the field-offset prefix sum
    is a Hillis-Steele ladder of static shifts (Mosaic has no cumsum).
  * the merge tree pairs buffer (i, i+M/2) — the bit-reversal pre-permute
    makes that order-preserving — shifting B right by len(A) bits: the
    word-granular part is a data-dependent barrel of STATIC shifts
    selected by per-buffer masks, the bit-granular part one funnel shift
    by a per-buffer vector amount.  Levels run in column layout [w, m]
    (shift axis on sublanes, buffers on lanes) while m >= 128 keeps lanes
    full, then transpose once to row layout [m, w]; the last 3 levels keep
    the array physically 8 rows and extract B-halves with rolls (sub-tile
    sublane slices break tpu.concatenate lowering).  Intermediate state
    never leaves VMEM.
  * the merged chunk is funnel-shifted by (chunk_start & 31) — starts come
    from an XLA cumsum, prefetched as scalars — and written to an aligned
    per-chunk slot.  The previous chunk's partial tail word rides SMEM
    scratch across the sequential grid (the single word of true serial
    dependency the wire format imposes).

A short XLA splice of in-place dynamic_update_slices then overlays the
slots at their word offsets (later rows overwrite earlier rows' zero
tails, so ORs are never needed outside the kernel).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .device_pack import _bit_reverse_perm, local_words

CHUNK = 4096  # records per grid step (power of two, >= 256)


@lru_cache(maxsize=None)
def _pack_call(n_chunks: int, n_fields: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u32 = jnp.uint32
    f = n_fields
    lw = local_words(f)
    wc = CHUNK * lw           # chunk content bound, words
    wspan = -(-(wc + 2) // 128) * 128  # slot width (funnel spill, aligned)

    def kernel(starts_ref, fields_ref, out_ref, carry_ref):
        g = pl.program_id(0)

        # ---- level 1, column layout [F, C]: register files in VMEM ----
        packed = pltpu.bitcast(fields_ref[0], u32)  # [F, C]
        nb = (packed >> 16).astype(jnp.int32)       # widths, <= 16
        v = packed & jnp.uint32(0xFFFF)             # field bits (pre-masked)
        acc = nb                                    # inclusive prefix over F
        sh_ = 1
        while sh_ < f:
            acc = acc + jnp.concatenate(
                [jnp.zeros((sh_, CHUNK), jnp.int32), acc[:-sh_]], axis=0)
            sh_ *= 2
        local_off = acc - nb                        # exclusive
        lens = jnp.sum(nb, axis=0, keepdims=True)   # [1, C]
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
        buf = pltpu.bitcast(jnp.concatenate(rows, axis=0), u32)  # [lw, C]

        # ---- merge tree, column phase: [w, m], shift axis on sublanes ----
        w = lw
        m = CHUNK

        def shift_col(x, cols, o, s):
            """Shift columns of x down by o words + s bits (per-col)."""
            for bit in range(int(w).bit_length()):
                k = 1 << bit
                sh = jnp.concatenate(
                    [jnp.zeros((k, cols), u32), x[:-k]], axis=0)
                x = jnp.where(((o >> bit) & 1) == 1, sh, x)
            prev = jnp.concatenate([jnp.zeros((1, cols), u32), x[:-1]],
                                   axis=0)
            return jnp.where(s > 0, (x >> s) | (prev << ((32 - s) % 32)), x)

        while m > 128:
            half = m // 2
            a, b = buf[:, :half], buf[:, half:]
            la, lb = lens[:, :half], lens[:, half:]
            x = jnp.concatenate([b, jnp.zeros((w, half), u32)], axis=0)
            x = shift_col(x, half, la >> 5, (la & 31).astype(u32))
            buf = jnp.concatenate([a, jnp.zeros((w, half), u32)], axis=0) | x
            lens = la + lb
            w *= 2
            m = half

        # ---- transpose once to row layout [m, w] ----
        buf = buf.T
        lens = lens.T                             # [m, 1]

        def shift_row(x, nrows, o, s):
            """Shift rows of x right by o words + s bits (per-row)."""
            for bit in range(int(w).bit_length()):
                k = 1 << bit
                sh = jnp.concatenate(
                    [jnp.zeros((nrows, k), u32), x[:, :-k]], axis=1)
                x = jnp.where(((o >> bit) & 1) == 1, sh, x)
            prev = jnp.concatenate(
                [jnp.zeros((nrows, 1), u32), x[:, :-1]], axis=1)
            return jnp.where(s > 0, (x >> s) | (prev << ((32 - s) % 32)), x)

        while m > 8:
            half = m // 2
            a, b = buf[:half], buf[half:]
            la, lb = lens[:half], lens[half:]
            x = jnp.concatenate([b, jnp.zeros((half, w), u32)], axis=1)
            x = shift_row(x, half, la >> 5, (la & 31).astype(u32))
            buf = jnp.concatenate([a, jnp.zeros((half, w), u32)], axis=1) | x
            lens = la + lb
            w *= 2
            m = half

        # Last levels: sub-tile sublane slices break tpu.concatenate, so
        # the array stays physically 8 rows (only the first m valid) and
        # B-halves are extracted with full-array rolls.
        while m > 1:
            half = m // 2
            bf = pltpu.roll(buf, 8 - half, 0)
            lbf = pltpu.roll(lens, 8 - half, 0)
            x = jnp.concatenate([bf, jnp.zeros((8, w), u32)], axis=1)
            x = shift_row(x, 8, lens >> 5, (lens & 31).astype(u32))
            buf = jnp.concatenate([buf, jnp.zeros((8, w), u32)], axis=1) | x
            lens = lens + lbf
            w *= 2
            m = half

        # buf row 0: the chunk's bits at offset 0; lens[0, 0] = bit length.
        start = starts_ref[g]
        s = (start & 31).astype(u32)
        row = jnp.concatenate(
            [buf[:1], jnp.zeros((1, wspan - wc), u32)], axis=1)
        prev = jnp.concatenate([jnp.zeros((1, 1), u32), row[:, :-1]], axis=1)
        row = jnp.where(s > 0, (row >> s) | (prev << ((32 - s) % 32)), row)

        # OR the previous chunk's partial tail word into our first word
        # (vector ops only — Mosaic rejects scalar VMEM stores — and int32
        # bookkeeping: unsigned reductions don't lower).
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wspan), 1)
        rowi = pltpu.bitcast(row, jnp.int32)
        carry = jnp.where(g > 0, carry_ref[0], jnp.int32(0))
        rowi = rowi | jnp.where(col == 0, carry, jnp.int32(0))
        out_ref[:] = pltpu.bitcast(rowi, jnp.uint32).reshape(1, 1, wspan)

        # Save OUR tail word for the next chunk: the word holding bit
        # (s + len) — partial if unaligned, zero if the chunk ended exactly
        # on a word boundary (content words are zero past the end).  Only
        # one mask element is live, so the sum extracts that word.
        end_rel = (s.astype(jnp.int32) + lens[0, 0]) >> 5
        carry_ref[0] = jnp.sum(jnp.where(col == end_rel, rowi, jnp.int32(0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, n_fields, CHUNK), lambda g, starts: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, wspan), lambda g, starts: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 1, wspan), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


# Merge-tree buffer caps, in words per record, applied from tree level
# _CAP_FROM up (buffers of >= 128 records).  The worst case is lw
# words/record, but real content tops out far lower — measured
# contiguous-run maxima over every fixture AND pure noise: <= 3.52
# words/record for 128-record runs, falling with depth.  Capping the deep
# (dominant-cost) tree arrays cuts the merge kernel's VPU work ~20%
# (on-chip: 1.03 -> 0.86 ms full encode on ex4); levels below _CAP_FROM
# stay worst-case so the eligibility check needs only 128-record run sums
# — one free-layout row reduction.  pack_locals_pallas verifies the actual
# sums in XLA and lax.cond's to the uncapped kernel when any would
# overflow (adversarial content — correctness never depends on the
# schedule).
_CAP_FROM = 7                       # first capped level (2^7 = 128 records)
_CAP_SCHED = (4.25, 4.0, 3.75)      # words/record at levels 7, 8, >= 9


def _level_caps(lw: int, chunk: int) -> tuple:
    """Buffer word capacities per merge level for a chunk of 2^n records.

    Monotone non-decreasing (the merge grows buffers in place, so a
    level's array can never be narrower than its inputs')."""
    caps = []
    prev = lw
    k = 1
    m = chunk
    while m > 1:
        if k < _CAP_FROM:
            c = lw << k
        else:
            per = _CAP_SCHED[min(k - _CAP_FROM, len(_CAP_SCHED) - 1)]
            c = min(lw << k, int(np.ceil(per * (1 << k))))
        caps.append(max(c, prev))
        prev = caps[-1]
        k += 1
        m //= 2
    return tuple(caps)


@lru_cache(maxsize=None)
def _pack_locals_call(n_chunks: int, lw: int, rows_pad: int, interpret: bool,
                      chunk: int = CHUNK, caps: tuple | None = None):
    """Merge-only variant of :func:`_pack_call`: consumes pre-built
    per-record register files (rows 0..lw-1) + bit lengths (row lw) from
    the fused front end (ops/pallas_encode.py) instead of running level 1
    on a field tensor.  The merge tree, chunk epilogue and carry word are
    identical to the round-2 kernel.  `chunk` is the tiered grid-step
    record count (pallas_encode.CHUNK_TIERS): the sequential grid costs
    µs-scale fixed overhead per step, so big inputs run few big chunks.
    `caps` (from :func:`_level_caps`) bounds each level's buffer arrays
    below the lw<<k worst case; the caller must have verified the actual
    subtree bit sums fit (pack_locals_pallas's XLA pre-check)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = chunk  # noqa: N806
    u32 = jnp.uint32
    n_levels = CHUNK.bit_length() - 1
    if caps is None:
        caps = tuple(min(lw << k, lw << k) for k in range(1, n_levels + 1))
    assert len(caps) == n_levels
    wc = caps[-1]                       # full-chunk content bound, words
    wspan = -(-(wc + 2) // 128) * 128

    def kernel(starts_ref, loc_ref, out_ref, carry_ref):
        g = pl.program_id(0)
        data = loc_ref[:]                               # [rows_pad, C] u32
        buf = data[:lw]                                 # [lw, C]
        # Row lw via masked sum (sub-8 sublane-offset slices break Mosaic).
        datai = pltpu.bitcast(data, jnp.int32)
        rowid = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, CHUNK), 0)
        lens = jnp.sum(jnp.where(rowid == lw, datai, 0), axis=0,
                       keepdims=True)                   # [1, C] int32

        # ---- merge tree, column phase: [w, m], shift axis on sublanes ----
        w = lw
        m = CHUNK
        level = 0

        def shift_col(x, cols, o, s, wprev):
            # o <= wprev - 1 (content words of the left buffer)
            for bit in range(int(wprev).bit_length()):
                k = 1 << bit
                sh = jnp.concatenate(
                    [jnp.zeros((k, cols), u32), x[:-k]], axis=0)
                x = jnp.where(((o >> bit) & 1) == 1, sh, x)
            prev = jnp.concatenate([jnp.zeros((1, cols), u32), x[:-1]],
                                   axis=0)
            return jnp.where(s > 0, (x >> s) | (prev << ((32 - s) % 32)), x)

        def vpad(arr, extra, cols):
            # Mosaic rejects zero-sized vectors, so skip no-growth concats
            # (large-lw configs plateau the cap schedule).
            if extra == 0:
                return arr
            return jnp.concatenate(
                [arr, jnp.zeros((extra, cols), u32)], axis=0)

        def hpad(arr, rows, extra):
            if extra == 0:
                return arr
            return jnp.concatenate(
                [arr, jnp.zeros((rows, extra), u32)], axis=1)

        while m > 128:
            half = m // 2
            wn = caps[level]
            a, b = buf[:, :half], buf[:, half:]
            la, lb = lens[:, :half], lens[:, half:]
            x = shift_col(vpad(b, wn - w, half), half, la >> 5,
                          (la & 31).astype(u32), w)
            buf = vpad(a, wn - w, half) | x
            lens = la + lb
            w = wn
            m = half
            level += 1

        # ---- transpose once to row layout [m, w] ----
        buf = buf.T
        lens = lens.T

        def shift_row(x, nrows, o, s, wprev):
            for bit in range(int(wprev).bit_length()):
                k = 1 << bit
                sh = jnp.concatenate(
                    [jnp.zeros((nrows, k), u32), x[:, :-k]], axis=1)
                x = jnp.where(((o >> bit) & 1) == 1, sh, x)
            prev = jnp.concatenate(
                [jnp.zeros((nrows, 1), u32), x[:, :-1]], axis=1)
            return jnp.where(s > 0, (x >> s) | (prev << ((32 - s) % 32)), x)

        while m > 8:
            half = m // 2
            wn = caps[level]
            a, b = buf[:half], buf[half:]
            la, lb = lens[:half], lens[half:]
            x = shift_row(hpad(b, half, wn - w), half, la >> 5,
                          (la & 31).astype(u32), w)
            buf = hpad(a, half, wn - w) | x
            lens = la + lb
            w = wn
            m = half
            level += 1

        while m > 1:
            half = m // 2
            wn = caps[level]
            bf = pltpu.roll(buf, 8 - half, 0)
            lbf = pltpu.roll(lens, 8 - half, 0)
            x = shift_row(hpad(bf, 8, wn - w), 8, lens >> 5,
                          (lens & 31).astype(u32), w)
            buf = hpad(buf, 8, wn - w) | x
            lens = lens + lbf
            w = wn
            m = half
            level += 1

        start = starts_ref[g]
        s = (start & 31).astype(u32)
        row = jnp.concatenate(
            [buf[:1], jnp.zeros((1, wspan - wc), u32)], axis=1)
        prev = jnp.concatenate([jnp.zeros((1, 1), u32), row[:, :-1]], axis=1)
        row = jnp.where(s > 0, (row >> s) | (prev << ((32 - s) % 32)), row)

        col = jax.lax.broadcasted_iota(jnp.int32, (1, wspan), 1)
        rowi = pltpu.bitcast(row, jnp.int32)
        carry = jnp.where(g > 0, carry_ref[0], jnp.int32(0))
        rowi = rowi | jnp.where(col == 0, carry, jnp.int32(0))
        out_ref[:] = pltpu.bitcast(rowi, jnp.uint32).reshape(1, 1, wspan)

        end_rel = (s.astype(jnp.int32) + lens[0, 0]) >> 5
        carry_ref[0] = jnp.sum(jnp.where(col == end_rel, rowi, jnp.int32(0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((rows_pad, CHUNK), lambda g, starts: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, wspan), lambda g, starts: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 1, wspan), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _splice_rows(rows, starts, n_words: int, wspan: int):
    """Overlay per-chunk aligned rows at their word offsets (in-place DUS
    chain; rows are bit-phase aligned and carry-merged, so later rows
    simply overwrite earlier rows' zero tails)."""
    import jax
    import jax.numpy as jnp

    n_chunks = rows.shape[0]
    n_alloc = max(n_words, 0) + wspan + 2
    w0 = (starts >> 5).astype(jnp.int32)
    out = jnp.zeros((n_alloc,), jnp.uint32)
    if n_chunks <= 128:
        for g in range(n_chunks):
            out = jax.lax.dynamic_update_slice(out, rows[g, 0], (w0[g],))
    else:
        def body(g, out):
            row = jax.lax.dynamic_slice(rows, (g, 0, 0), (1, 1, wspan))[0, 0]
            return jax.lax.dynamic_update_slice(out, row, (w0[g],))

        out = jax.lax.fori_loop(0, n_chunks, body, out)
    return out[:n_words]


def pack_locals_pallas(locals_, lw: int, start_bit, n_words: int,
                       interpret: bool = False):
    """Pack pre-built per-record register files into the dense stream.

    locals_: uint32 [ROWS_PAD, G*CHUNK] from ops/pallas_encode.encode_locals
    (rows 0..lw-1 = register words, row lw = record bit lengths; padded
    records have zero length).  Bit-identical to pack_records_pallas on the
    equivalent field tensor (test_pallas_encode.py).
    """
    import jax
    import jax.numpy as jnp

    from .pallas_encode import grid_chunk_for

    rows_pad, n_pad = locals_.shape
    chunk = grid_chunk_for(n_pad)
    n_chunks = n_pad // chunk

    # Intra-chunk bit reversal so the kernel's (i, i+M/2) pairing
    # concatenates records in wire order: rev(2k) factors into two
    # square axis reversals + a transpose (rev_hn x rev_hn + swap), ~6x
    # cheaper than a row gather on TPU.
    half_bits = chunk.bit_length() // 2
    hn = 1 << half_bits
    assert hn * hn == chunk, chunk  # tiers are even powers of 4
    r6 = jnp.asarray(_bit_reverse_perm(hn))

    lens_row = pltpu_bitcast_int32(locals_)[lw]
    chunk_bits = jnp.sum(lens_row.reshape(n_chunks, chunk), axis=1)
    sb = jnp.asarray(start_bit, jnp.int32)
    starts = sb + jnp.cumsum(chunk_bits) - chunk_bits
    total = sb + jnp.sum(chunk_bits)

    # Capped-tree eligibility: every capped merge-tree subtree (a
    # contiguous 2^k-record run in wire order — exactly what the
    # bit-reversed pairing reassembles) must fit its capped buffer.  Caps
    # start at 128-record runs (_CAP_FROM), so the check is one row-sum
    # over the native [*, 128] layout (free relayout) plus a tiny pair-sum
    # chain.  Real content always passes (_CAP_SCHED covers every fixture
    # and pure noise with margin); adversarial input falls back to the
    # worst-case-sized kernel.
    caps = _level_caps(lw, chunk)
    ok = jnp.bool_(True)
    s = lens_row.reshape(-1, 128).sum(axis=1)       # 2^7-record run sums
    for k in range(_CAP_FROM, len(caps) + 1):
        ok = ok & (jnp.max(s) <= 32 * caps[k - 1])
        if k <= len(caps) - 1:
            s = s.reshape(-1, 2).sum(axis=1)

    x4 = locals_.reshape(rows_pad, n_chunks, hn, hn)
    x4 = x4[:, :, r6][:, :, :, r6].swapaxes(2, 3)
    perm = x4.reshape(rows_pad, n_pad)

    def run(caps_arg):
        wc = caps_arg[-1] if caps_arg else chunk * lw
        wspan = -(-(wc + 2) // 128) * 128
        call = _pack_locals_call(n_chunks, lw, rows_pad, interpret, chunk,
                                 caps_arg)
        rows = call(starts, perm)
        return _splice_rows(rows, starts, n_words, wspan)

    words = jax.lax.cond(ok, lambda: run(caps), lambda: run(None))
    return words, total


def pltpu_bitcast_int32(x):
    import jax
    import jax.numpy as jnp

    return jax.lax.bitcast_convert_type(x, jnp.int32)


def pack_records_pallas(vals, nbits, start_bit, n_words: int,
                        interpret: bool = False):
    """Dense-layout pack via the sequential-grid Pallas kernel.

    Same contract as device_pack.pack_blocks_device(..., starts=None):
    vals/nbits int32 [N, F] with widths <= 16, start_bit < 32 * the
    caller's header-prefix capacity in words, n_words static output bound.
    Bit-identical to the scatter and merge paths (test_pallas_pack.py).
    """
    import jax
    import jax.numpy as jnp

    n, f = vals.shape
    lw = local_words(f)
    if n == 0:
        return (jnp.zeros((n_words,), jnp.uint32),
                jnp.asarray(start_bit, jnp.int32))

    n2 = -(-n // CHUNK) * CHUNK
    if n2 > n:
        vals = jnp.pad(vals, ((0, n2 - n), (0, 0)))
        nbits = jnp.pad(nbits, ((0, n2 - n), (0, 0)))
    n_chunks = n2 // CHUNK

    # One combined tensor: (nbits << 16) | (vals & width-mask).  Fields are
    # at most 16 bits, so the value half is pre-masked to its width here.
    nb32 = nbits.astype(jnp.int32)
    vmask = jnp.where(nb32 > 0,
                      (jnp.int32(1) << jnp.minimum(nb32, 16)) - 1, 0)
    fields = (nb32 << 16) | (vals.astype(jnp.int32) & vmask)

    # Intra-chunk bit-reversal so the kernel's (i, i+M/2) pairing yields
    # in-order concatenation, then transpose to [G, F, C] column blocks.
    # rev12 decomposes as rev6 x rev6 + half-swap: two 64-element axis
    # gathers and one transpose are ~6x cheaper on TPU than one full
    # [N, F] row gather.
    half_bits = CHUNK.bit_length() // 2  # CHUNK = 2^(2*half_bits)
    hn = 1 << half_bits
    assert hn * hn == CHUNK
    r6 = jnp.asarray(_bit_reverse_perm(hn))
    x4 = fields.reshape(n_chunks, hn, hn, f)
    x4 = x4[:, r6][:, :, r6]
    fields_t = jnp.swapaxes(
        jnp.swapaxes(x4, 1, 2).reshape(n_chunks, CHUNK, f), 1, 2)

    sb = jnp.asarray(start_bit, jnp.int32)
    chunk_bits = jnp.sum(nb32.reshape(n_chunks, CHUNK * f), axis=1)
    starts = sb + jnp.cumsum(chunk_bits) - chunk_bits  # [G]
    total = sb + jnp.sum(chunk_bits)

    wspan = -(-(CHUNK * lw + 2) // 128) * 128  # must match _pack_call
    call = _pack_call(n_chunks, f, interpret)
    rows = call(starts, fields_t)
    return _splice_rows(rows, starts, n_words, wspan), total
