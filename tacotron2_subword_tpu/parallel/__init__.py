from tacotron2_subword_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_parallel_train_step,
    replicate_sharding,
    shard_train_state,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_parallel_train_step",
    "replicate_sharding",
    "shard_train_state",
]
