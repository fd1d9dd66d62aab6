from .mesh import (data_sharding, make_mesh, replicate_state, replicated,
                   shard_batch)
from .spatial import make_spatial_forward

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "replicate_state", "make_spatial_forward"]
