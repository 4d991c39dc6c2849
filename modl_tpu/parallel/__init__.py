from .mesh import (config_for_mesh, make_mesh, replicate, shard_batch,
                   shard_batches, shard_indices, shard_state)
