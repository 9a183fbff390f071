from .image import (ImageDecoder, ImageEncoder, decode_image,  # noqa: F401
                    encode_image)
from .video import (VideoDecoder, VideoEncoder, decode_video,  # noqa: F401
                    encode_video)
