from recbole_cdr_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    batch_sharding,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "param_sharding_rules",
    "shard_params",
    "batch_sharding",
    "make_sharded_train_step",
]
