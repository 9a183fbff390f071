"""Pallas translation-SAD map kernel: the motion-search hot loop.

The XLA formulation (ops/video_pipeline.sad_motion_search) computes the
D^2 = (2*merange-1)^2 translation SAD maps with a lax.scan whose every
step re-reads the current and reference frames from HBM: ~D^2 * 2 *
frame_bytes of traffic (177 GB for 25 frames of 720p at merange 16 —
measured 816 ms on v5e, the entire cost of device video encode).  This
kernel holds ONE frame pair in VMEM and emits all D^2 pooled maps from
it, so HBM traffic drops to one read of the frames plus one write of the
maps, and the 16x16 sum-pooling rides the MXU:

    pooled(dy,dx) = P @ |cur - ref_shift(dy,dx)| @ Q

with P [nby, H] row-pooling and Q [Wp, 128] column-pooling 0/1 matrices
(Q is shared by every dx — the shift lives in the |cur - ref| operand).
All values are exact: |a-b| <= 255 is exact in bf16, the P-contraction
accumulates <= 4080 in f32, the Q-contraction <= 65280 in f32 (integers
< 2^24).  Per-dx results are 128-lane blocks concatenated dx-major, so
stores are full out-block rows and the descent gathers index the result
directly with no relayout.

Semantics identical to the scan path (same zero-padded translation SAD;
bit-equal integer maps -> bit-equal motion vectors); validated in
interpret mode against the scan (test_video_device.py) whose descent is
the exact reference replica (Block.cpp:268-339 parity, ops/motion.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

LANE = 128


@lru_cache(maxsize=None)
def _sad_maps_call(f: int, h: int, wp: int, hp: int, d: int, nby: int,
                   interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d8 = -(-d // 8) * 8  # dy grid padded to 8 (pad rows compute garbage)

    def kernel(cur_ref, refp_ref, p_ref, q_ref, out_ref):
        # dy = 8*q + r: the super-band load start 8*q is PROVABLY 8-aligned
        # (Mosaic rejects general dynamic sublane starts); the sub-8
        # remainder is rotated into place by selecting among 8 static
        # rolls (sub-8 sublane slices don't lower, static rolls do).
        q = pl.program_id(1)
        r = pl.program_id(2)
        cur = cur_ref[0]                       # [h, wp] f32
        sband = refp_ref[0, pl.ds(q * 8, h + 8), :]
        band = sband
        for rr in range(1, 8):  # roll is non-negative: -rr == (h+8) - rr
            band = jnp.where(r == rr, pltpu.roll(sband, h + 8 - rr, 0), band)
        band = jax.lax.slice(band, (0, 0), (h, wp + d - 1))  # rows dy..dy+h-1
        pm = p_ref[:]                          # [nby, h] bf16
        qm = q_ref[:]                          # [wp, LANE] f32
        cols = []
        for dx in range(d):
            sh = jax.lax.slice(band, (0, dx), (h, dx + wp))
            # f32 band (32-bit rotate requirement); |a-b| <= 255 is exact
            # in bf16, so the MXU contraction runs at bf16 rate.
            diff = jnp.abs(cur - sh).astype(jnp.bfloat16)
            rowp = jnp.dot(pm, diff, preferred_element_type=jnp.float32)
            # rowp is f32 (sums <= 4080 need 12 mantissa bits): the second
            # contraction must NOT run at default precision — TPU default
            # truncates f32 operands to bf16 passes, which loses low bits
            # (measured: maps off by tens on real HW, exact in interpret).
            cols.append(jnp.dot(rowp, qm,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32))
        out_ref[0, 0] = jnp.concatenate(cols, axis=1)  # [nby, d*LANE]

    grid_spec = pl.GridSpec(
        grid=(f, d8 // 8, 8),
        in_specs=[
            pl.BlockSpec((1, h, wp), lambda fi, qi, ri: (fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp + d - 1), lambda fi, qi, ri: (fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nby, h), lambda fi, qi, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, LANE), lambda fi, qi, ri: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nby, d * LANE),
                               lambda fi, qi, ri: (fi, qi * 8 + ri, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, d8, nby, d * LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _pool_matrices(h: int, w: int, wp: int, macro: int):
    """0/1 pooling matrices: P [h//macro, h] row-pool; Q [wp, LANE] with
    column bx pooling input rows [bx*macro, (bx+1)*macro) — columns past
    w//macro, and input rows >= w, stay zero."""
    nby, nbx = h // macro, w // macro
    p = np.zeros((nby, h), np.float32)
    for i in range(nby):
        p[i, i * macro:(i + 1) * macro] = 1.0
    q = np.zeros((wp, LANE), np.float32)
    for bx in range(nbx):
        q[bx * macro:(bx + 1) * macro, bx] = 1.0
    return p, q


def sad_maps_pallas(cur_u8, ref_u8, merange: int, macro: int = 16,
                    interpret: bool = False):
    """All-offsets pooled SAD maps on TPU.

    cur/ref: [F, H, W] u8 (ref pre-roll done by the caller).  Returns
    s [F, D8, nby, D*128] f32 (D8 = D padded to a multiple of 8; rows
    >= D are garbage) where s[f, dy, by, dx*128 + bx] is the SAD of
    macroblock (by, bx) of cur[f] against ref[f] translated by
    (dy - pad, dx - pad), pad = merange - 1 — integer-exact, bit-equal to
    the lax.scan formulation's maps.
    """
    import jax.numpy as jnp

    f, h, w = cur_u8.shape
    m = int(merange)
    assert m >= 2
    d = 2 * (m - 1) + 1
    pad = m - 1
    wp = -(-w // LANE) * LANE
    # Rows must cover the kernel's 8-aligned super-band loads:
    # 8*q + h + 8 for q up to d8//8 - 1 (dy grid padded to a multiple of
    # 8; the pad rows compute garbage the descent never indexes).
    d8 = -(-d // 8) * 8
    hp = h + d8
    assert w // macro <= LANE, "frame wider than 128 macroblocks"

    cur = jnp.pad(cur_u8.astype(jnp.float32), ((0, 0), (0, 0), (0, wp - w)))
    # Reference padded by `pad` on every side (zero pixels), then lane-pad;
    # band width wp + d - 1 covers dx shifts 0..d-1 of a wp-wide window;
    # extra bottom rows (super-band slack) are sliced away in-kernel.
    # f32 (not bf16): the in-kernel sublane rotate is 32-bit only.
    refp = jnp.pad(ref_u8.astype(jnp.float32),
                   ((0, 0), (pad, hp - h - pad),
                    (pad, wp + d - 1 - w - pad)))
    p, q = _pool_matrices(h, w, wp, macro)
    call = _sad_maps_call(f, h, wp, hp, d, h // macro, interpret)
    return call(cur, refp, jnp.asarray(p, jnp.bfloat16),
                jnp.asarray(q, jnp.float32))


@lru_cache(maxsize=None)
def _predict_call(f: int, h: int, wp: int, hq: int, wband: int, d: int,
                  pad: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d8 = -(-d // 8) * 8

    def kernel(key_ref, ref8_ref, out_ref):
        # Translation (dy, dx) = (q*8 + r - pad, dx - pad).  Copy r of the
        # pre-shifted reference brings the sub-8 row phase; q*8 is a
        # provably aligned dynamic start.  Every pixel whose per-pixel key
        # (dy+pad)*KEYX + (dx+pad) matches takes its value from this
        # translation — a 16x16 window copy is exactly a block-constant
        # translation (Block.cpp:482-496 semantics via effective offsets).
        r = pl.program_id(1)
        q = pl.program_id(2)
        first = (r == 0) & (q == 0)
        key = key_ref[0]                        # [h, wp] i32
        band = ref8_ref[0, 0, pl.ds(q * 8, h), :]  # [h, wband] bf16
        acc = jnp.where(first, jnp.zeros_like(out_ref[0]), out_ref[0])
        kbase = (q * 8 + r) * KEYX
        for dx in range(d):
            sel = key == (kbase + dx)
            acc = jnp.where(sel, jax.lax.slice(band, (0, dx), (h, dx + wp))
                            .astype(jnp.float32), acc)
        out_ref[0] = acc

    grid_spec = pl.GridSpec(
        grid=(f, 8, d8 // 8),
        in_specs=[
            pl.BlockSpec((1, h, wp), lambda fi, ri, qi: (fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hq, wband), lambda fi, ri, qi: (fi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wp), lambda fi, ri, qi: (fi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, h, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


KEYX = 256  # key stride: key = (dy+pad)*KEYX + (dx+pad); d < KEYX always


def predict_translate_pallas(ref_u8, dy_eff, dx_eff, merange: int,
                             macro: int = 16, interpret: bool = False):
    """Motion-compensated prediction as masked translations (the gather-free
    mirror of the window fetch, Block.cpp:482-496).

    ref_u8 [F, H, W] u8; dy_eff/dx_eff [F, nby, nbx] i32 EFFECTIVE (clamped)
    per-macroblock offsets in [-(merange-1), merange-1].  Returns pred
    [F, H, W] u8, bit-equal to the per-window gather: every pixel of block
    (by, bx) reads ref[y + dy_eff, x + dx_eff], which is precisely the
    clamped window copy.
    """
    import jax.numpy as jnp

    f, h, w = ref_u8.shape
    m = int(merange)
    d = 2 * (m - 1) + 1
    pad = m - 1
    wp = -(-w // LANE) * LANE
    d8 = -(-d // 8) * 8
    hq = h + d8 - 8
    wband = wp + d - 1

    # Per-pixel translation key from the per-block maps (block-constant).
    key_blk = (dy_eff + pad) * KEYX + (dx_eff + pad)           # [F, nby, nbx]
    key = jnp.repeat(jnp.repeat(key_blk, macro, axis=1), macro, axis=2)
    key = jnp.pad(key, ((0, 0), (0, 0), (0, wp - w)),
                  constant_values=-1)                          # pad: no match

    # Pre-shifted reference copies: copy r holds padded rows [r, r + hq).
    refp = jnp.pad(ref_u8.astype(jnp.bfloat16),
                   ((0, 0), (pad, hq + 8 - h - pad), (pad, wband - w - pad)))
    ref8 = jnp.stack([refp[:, r:r + hq] for r in range(8)], axis=1)

    call = _predict_call(f, h, wp, hq, wband, d, pad, interpret)
    pred = call(key, ref8)
    return pred[:, :, :w].astype(jnp.uint8)
