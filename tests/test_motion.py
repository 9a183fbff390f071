"""Motion search semantics: the vectorized search (ops/motion.py) against an
independent straight-line transcription of the reference's serial descent
(Block.cpp:268-339, algo.cpp:119-139), plus the JAX variant."""

import numpy as np
import pytest

from imageencoder_tpu.ops.motion import (MACRO, MER_SIGNS, find_motion,
                                         find_motion_jax, macro_grid,
                                         predict_image, search_steps)


def scalar_reference_search(cur, ref, merange):
    """Serial per-block walk with the reference's exact control flow."""
    h, w = cur.shape
    out = []
    for by in range(0, h, MACRO):
        for bx in range(0, w, MACRO):
            block = cur[by:by + MACRO, bx:bx + MACRO].astype(np.int64)
            off = (0, 0)
            best = np.iinfo(np.int64).max
            for step in search_steps(merange):
                running = best
                sel = off
                for p, (sx, sy) in enumerate(MER_SIGNS):
                    cand = (off[0] + sx * step, off[1] + sy * step)
                    px = min(max(bx + cand[0], 0), w - MACRO)
                    py = min(max(by + cand[1], 0), h - MACRO)
                    if p > 0 and px == bx and py == by:
                        continue  # isDifferentBlock skip (Block.cpp:297-301)
                    win = ref[py:py + MACRO, px:px + MACRO].astype(np.int64)
                    diff = int(np.abs(block - win).sum())
                    if diff <= running:  # later candidates win ties
                        running = diff
                        sel = cand
                off = sel
                best = running
            out.append(off)
    return np.array(out, dtype=np.int32)


@pytest.mark.parametrize("seed,merange", [(0, 16), (1, 16), (2, 8), (3, 32),
                                          (4, 4), (5, 2)])
def test_vectorized_matches_scalar(seed, merange):
    rng = np.random.default_rng(seed)
    base = np.kron(rng.integers(0, 256, (12, 12)),
                   np.ones((4, 4))).astype(np.float64)
    ref = np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8)
    cur = np.roll(ref, (rng.integers(-6, 7), rng.integers(-6, 7)),
                  axis=(0, 1))
    mv_vec, _ = find_motion(cur, ref, merange)
    mv_ser = scalar_reference_search(cur, ref, merange)
    np.testing.assert_array_equal(mv_vec, mv_ser)


def test_jax_matches_numpy():
    rng = np.random.default_rng(9)
    ref = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    cur = np.roll(ref, (5, -3), axis=(0, 1))
    mv_np, pred_np = find_motion(cur, ref, 16)
    mv_jx, pred_jx = find_motion_jax(cur, ref, 16)
    np.testing.assert_array_equal(mv_np, np.asarray(mv_jx))
    np.testing.assert_array_equal(pred_np, np.asarray(pred_jx))


def test_merange_zero_or_one_yields_zero_vectors():
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    cur = np.roll(ref, (1, 1), axis=(0, 1))
    for m in (0, 1):
        mv, pred = find_motion(cur, ref, m)
        assert np.all(mv == 0)
        np.testing.assert_array_equal(predict_image(ref, mv, 32, 32), ref)


def test_clamped_candidates_at_border():
    """Vectors may point outside; fetches clamp (ImageBase.cpp:253-254)."""
    rng = np.random.default_rng(4)
    ref = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    cur = np.roll(ref, (-10, -10), axis=(0, 1))
    mv, _ = find_motion(cur, ref, 32)
    mv_ser = scalar_reference_search(cur, ref, 32)
    np.testing.assert_array_equal(mv, mv_ser)


def test_predict_image_assembles_windows():
    rng = np.random.default_rng(6)
    ref = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    bx, by = macro_grid(48, 64)
    mv = np.zeros((len(bx), 2), dtype=np.int32)
    np.testing.assert_array_equal(predict_image(ref, mv, 48, 64), ref)
