"""Zig-zag scan order for any square block size.

Replicates the ordering rule of the reference (algo.cpp:33-87): cells are
sorted by (group = x + y) and, within a group, by ``y`` when (x - y) is odd
else by ``x`` — the classic JPEG zig-zag for any N x N block.

The LUT is expressed as two permutations over flat row-major indices:

  * ``zigzag_order(n)[k]``   = flat index (y*n + x) of the k-th zig-zag element
  * ``zigzag_inverse(n)[i]`` = zig-zag rank of flat index i

so ``coeffs_zz = coeffs_flat[..., zigzag_order(n)]`` reorders a batch of
blocks into wire order with a single gather (XLA-friendly; no host loop).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def zigzag_order(n: int) -> np.ndarray:
    """Flat row-major indices in zig-zag emission order, shape [n*n], int32."""
    cells = []
    for i in range(n * n):
        x, y = i % n, i // n
        col = y if ((x - y) & 1) else x
        cells.append((x + y, col, i))
    cells.sort(key=lambda c: (c[0], c[1]))
    return np.array([c[2] for c in cells], dtype=np.int32)


@lru_cache(maxsize=None)
def zigzag_inverse(n: int) -> np.ndarray:
    """Inverse permutation: zig-zag rank of each flat row-major index."""
    order = zigzag_order(n)
    inv = np.empty_like(order)
    inv[order] = np.arange(n * n, dtype=np.int32)
    return inv
