from .mesh import (data_sharding, make_mesh, replicate_state, replicated,
                   shard_batch)

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "replicate_state"]
