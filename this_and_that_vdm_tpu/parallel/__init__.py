from .mesh import (
    make_mesh,
    host_replicated,
    make_serving_mesh,
    shard_params,
    shard_batch,
    global_batch,
    shard_leading,
    replicate,
    replicate_to_mesh,
    distributed_init,
    is_main_process,
)

__all__ = [
    "make_mesh",
    "host_replicated",
    "make_serving_mesh",
    "shard_params",
    "shard_batch",
    "global_batch",
    "shard_leading",
    "replicate",
    "replicate_to_mesh",
    "distributed_init",
    "is_main_process",
]
