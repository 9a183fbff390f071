from .mesh import make_mesh  # noqa: F401
from .sharding import make_sharded_encode_step  # noqa: F401
from .video_sharding import make_sharded_video_step  # noqa: F401
