from mod_extraction_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    put_replicated,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "put_replicated",
    "replicated_sharding",
    "shard_batch",
]
