"""imageencoder_tpu — a TPU-native JPEG-style image + motion-compensated video codec.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C++ reference
codec ThenTech/ImageEncoder (see SURVEY.md):

  * block DCT / quantization       -> batched MXU matmuls + fused Pallas kernels
  * zigzag + RLE + bit packing     -> vectorized "measure, prefix-sum, scatter"
  * whole-stream Huffman           -> device histogram + host canonical tree + LUT packer
  * motion estimation/compensation -> batched 2D-log search over all macroblocks
  * GOP video pipeline             -> lax.scan frame recursion, GOPs sharded over a mesh

Public API mirrors the reference's capabilities (reference files cited per module).
"""

__version__ = "0.1.0"

from .utils.config import ConfigReader  # noqa: F401
from .utils.quant import QuantMatrix  # noqa: F401
from .models.image import ImageEncoder, ImageDecoder  # noqa: F401
from .models.video import VideoEncoder, VideoDecoder  # noqa: F401
