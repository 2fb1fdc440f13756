from houv_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    shard_batch,
    sharded_houv_solve,
    sharded_houv_solve_2d,
    replicate,
    data_parallel_grads,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_batch",
    "sharded_houv_solve",
    "sharded_houv_solve_2d",
    "replicate",
    "data_parallel_grads",
]
