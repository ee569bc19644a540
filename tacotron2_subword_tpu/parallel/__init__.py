from tacotron2_subword_tpu.parallel.mesh import (
    batch_sharding,
    hifigan_param_sharding,
    make_mesh,
    make_parallel_train_step,
    replicate_sharding,
    shard_train_state,
    tacotron_param_sharding,
    train_state_shardings,
)

__all__ = [
    "batch_sharding",
    "hifigan_param_sharding",
    "make_mesh",
    "make_parallel_train_step",
    "replicate_sharding",
    "shard_train_state",
    "tacotron_param_sharding",
    "train_state_shardings",
]
