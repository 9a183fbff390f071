"""Stream header serialization shared by the image and video pipelines.

Image header (ImageEncoder.cpp:84-94, read back ImageBase.cpp:105-128):
    [huffman flag handled by the huffman layer]
    [5-bit quant width][size^2 quant values][1-bit rle][15-bit w][15-bit h]

Video header inserts after the dims (VideoEncoder.cpp:65-73):
    [15-bit frame_count][15-bit gop][15-bit merange]

RLE_BITS = 1, DIM_BITS = 15 (ImageBase.hpp:75-76).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..ops.bitpack import BitReader, BitWriter
from ..utils.quant import QuantMatrix

RLE_BITS = 1
DIM_BITS = 15


def write_image_header(writer: BitWriter, quant: QuantMatrix,
                       use_rle: bool, width: int, height: int) -> None:
    quant.write(writer)
    writer.put(RLE_BITS, int(use_rle))
    writer.put(DIM_BITS, width)
    writer.put(DIM_BITS, height)


def read_image_header(reader: BitReader, block_size: int = 4):
    quant = QuantMatrix.from_bitstream(reader, block_size)
    use_rle = bool(reader.get(RLE_BITS))
    width = reader.get(DIM_BITS)
    height = reader.get(DIM_BITS)
    return quant, use_rle, width, height


@dataclass
class VideoParams:
    frame_count: int
    gop: int
    merange: int


def write_video_params(writer: BitWriter, p: VideoParams) -> None:
    writer.put(DIM_BITS, p.frame_count)
    writer.put(DIM_BITS, p.gop)
    writer.put(DIM_BITS, p.merange)


def read_video_params(reader: BitReader) -> VideoParams:
    return VideoParams(frame_count=reader.get(DIM_BITS),
                       gop=reader.get(DIM_BITS),
                       merange=reader.get(DIM_BITS))
