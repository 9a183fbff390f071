"""Debug observability (the reference's LOG_LOCAL hooks, batched).

The reference compiles per-block dump helpers behind LOG_LOCAL —
printZigzag/printRLE/printExpanded/printMatrix (Block.cpp:521-612) and
Huffman printDict/printTree (Huffman.cpp:404-418).  These are their
tensor-era equivalents: they format any block of a batched tensor, or a
whole Huffman dictionary, for stream debugging.
"""

from __future__ import annotations

import numpy as np

from ..ops.zigzag import zigzag_order


def format_matrix(block, title: str = "matrix") -> str:
    """One block [B,B] as the reference's printMatrix layout."""
    block = np.asarray(block)
    lines = [f"{title} ({block.shape[0]}x{block.shape[1]}):"]
    for row in block:
        lines.append("  " + " ".join(f"{v:6g}" for v in row))
    return "\n".join(lines)


def format_zigzag(block) -> str:
    """Coefficients of one [B,B] block in zig-zag order (printZigzag)."""
    block = np.asarray(block)
    b = block.shape[-1]
    vals = block.reshape(-1)[zigzag_order(b)]
    return "zigzag: " + " ".join(f"{v:g}" for v in vals)


def format_rle(coeffs_zz) -> str:
    """One block's zig-zag coefficients as the reference's RLE dump
    (printRLE): (zeroes, bits)(data) tuples plus the info head."""
    from .bits import bits_needed, ffs

    coeffs_zz = np.asarray(coeffs_zz).ravel()
    entries = []
    zeroes = 0
    max_bits = 0
    count = 0
    for v in coeffs_zz:
        if v == 0:
            zeroes += 1
            continue
        nb = int(bits_needed(int(v)))
        entries.append((zeroes, nb, int(v)))
        max_bits = max(max_bits, nb)
        count += zeroes + 1
        zeroes = 0
    head_bits = max(max_bits, int(ffs(count)), 1)
    lines = [f"info: data_bits={head_bits} data={count}"]
    lines += [f"  ({z}, {nb})({d})" for z, nb, d in entries]
    return "\n".join(lines)


def format_huffman_dict(entries) -> str:
    """Huffman dictionary as printDict: 'symbol: codeword (len)'."""
    lines = ["huffman dict:"]
    for sym, word, length in sorted(entries):
        lines.append(f"  0x{sym:02X}: {word:0{length}b} ({length})")
    return "\n".join(lines)


def dump_block_pipeline(img_block, quant, norm: str = "reference") -> str:
    """Full per-block trace: pixels -> DCT -> quantized -> RLE (the
    reference's LOG_LOCAL flow for one block)."""
    from ..ops.dct import forward_transform

    img_block = np.asarray(img_block, dtype=np.uint8)
    b = img_block.shape[-1]
    coeffs = forward_transform(img_block[None], np.asarray(quant, np.float64),
                               norm)[0]
    czz = coeffs.reshape(-1)[zigzag_order(b)]
    return "\n".join([
        format_matrix(img_block, "pixels"),
        format_matrix(coeffs, "quantized coefficients"),
        format_rle(czz),
    ])
