from graphinvent_tpu.parallel.mesh import (
    make_mesh, place_training_state, shard_batch, shard_params,
    make_sharded_nll_step, make_sharded_train_step,
)

__all__ = ["make_mesh", "place_training_state", "shard_batch",
           "shard_params", "make_sharded_nll_step",
           "make_sharded_train_step"]
