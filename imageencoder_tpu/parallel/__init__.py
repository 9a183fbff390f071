from .mesh import make_mesh  # noqa: F401
from .sharding import (assemble_packed_stream,  # noqa: F401
                       boundary_byte_histogram,
                       decode_image_sharded,
                       encode_sharded_huffman,
                       encode_sharded_image_batch,
                       make_sharded_encode_packed,
                       make_sharded_encode_step,
                       make_sharded_huffman_pack,
                       make_sharded_image_decode)
from .video_sharding import (assemble_sharded_video_packed,  # noqa: F401
                             decode_video_sharded,
                             encode_sharded_video_huffman,
                             encode_video_sharded,
                             make_sharded_video_decode,
                             make_sharded_video_packed,
                             make_sharded_video_step)
