"""Quantization matrix loading and wire serialization.

Parity with dc::MatrixReader (MatrixReader.cpp):
  * text file parse with strict row/col count validation (:66-134),
  * wire format: 5-bit max bit length then size*size unsigned values
    (:145-158, SIZE_LEN_BITS = 5, MatrixReader.hpp:36),
  * max bit length via ffs over all entries (:182-190).
"""

from __future__ import annotations

import numpy as np

from .bits import ffs
from ..ops.bitpack import BitReader, BitWriter

SIZE_LEN_BITS = 5


class QuantMatrix:
    """A [size, size] uint16 quantization matrix."""

    def __init__(self, matrix: np.ndarray):
        matrix = np.asarray(matrix, dtype=np.uint32)
        assert matrix.ndim == 2 and matrix.shape[0] == matrix.shape[1]
        self.matrix = matrix

    @property
    def size(self) -> int:
        return self.matrix.shape[0]

    @classmethod
    def from_file(cls, path: str, size: int = 4) -> "QuantMatrix":
        """Parse a whitespace text matrix file (MatrixReader.cpp:66-134)."""
        with open(path, "r") as f:
            text = f.read()
        rows = []
        for line in text.splitlines():
            line = line.strip()
            if not line and not rows:
                continue
            items = line.split()
            if len(items) != size:
                raise ValueError(
                    f"quant matrix row has {len(items)} cols, expected {size}: {line!r}")
            rows.append([int(i, 0) for i in items])
            if len(rows) == size:
                break
        if len(rows) != size:
            raise ValueError(f"quant matrix has {len(rows)} rows, expected {size}")
        m = np.array(rows, dtype=np.uint32)
        if not np.all(m <= np.iinfo(np.uint16).max):
            raise ValueError("quant matrix entries must fit uint16")
        return cls(m)

    def max_bit_length(self) -> int:
        """Minimal bits for every entry (MatrixReader.cpp:182-190)."""
        return int(np.max(ffs(self.matrix)))

    def write(self, writer: BitWriter) -> None:
        """Serialize: 5-bit width + size*size values (MatrixReader.cpp:145-158)."""
        w = self.max_bit_length()
        writer.put(SIZE_LEN_BITS, w)
        for v in self.matrix.ravel():
            writer.put(w, int(v))

    @classmethod
    def from_bitstream(cls, reader: BitReader, size: int = 4) -> "QuantMatrix":
        """Parse from a stream (MatrixReader.cpp:46-57)."""
        w = reader.get(SIZE_LEN_BITS)
        vals = [reader.get(w) for _ in range(size * size)]
        return cls(np.array(vals, dtype=np.uint32).reshape(size, size))

    def as_float(self, dtype=np.float64) -> np.ndarray:
        return self.matrix.astype(dtype)
