from cet_pick_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    make_dp_train_step,
    spatial_sharding,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_dp_train_step",
    "spatial_sharding",
]
