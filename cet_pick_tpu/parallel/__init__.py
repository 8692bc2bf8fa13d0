from cet_pick_tpu.parallel.mesh import (
    auto_dp_step,
    init_distributed,
    make_dp_step,
    make_dp_train_step,
    make_mesh,
    make_multihost_dp_step,
    make_multihost_dp_train_step,
    make_spatial_infer,
    replicate,
    shard_batch,
    spatial_sharding,
)

__all__ = [
    "auto_dp_step",
    "init_distributed",
    "make_dp_step",
    "make_dp_train_step",
    "make_mesh",
    "make_multihost_dp_step",
    "make_multihost_dp_train_step",
    "make_spatial_infer",
    "replicate",
    "shard_batch",
    "spatial_sharding",
]
