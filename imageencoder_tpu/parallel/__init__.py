from .mesh import make_mesh  # noqa: F401
from .sharding import (assemble_packed_stream,  # noqa: F401
                       boundary_byte_histogram,
                       encode_sharded_huffman,
                       encode_sharded_image_batch,
                       make_sharded_encode_packed,
                       make_sharded_encode_step,
                       make_sharded_huffman_pack)
from .video_sharding import make_sharded_video_step  # noqa: F401
