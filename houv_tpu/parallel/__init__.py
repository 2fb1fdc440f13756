from houv_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_houv_solve,
    replicate,
    data_parallel_grads,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "sharded_houv_solve",
    "replicate",
    "data_parallel_grads",
]
