from .mesh import make_mesh  # noqa: F401
from .sharding import make_sharded_encode_step  # noqa: F401
