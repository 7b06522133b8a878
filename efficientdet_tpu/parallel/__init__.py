"""Device-mesh sharding: data-parallel training and inference over ICI."""

from efficientdet_tpu.parallel.sharding import (
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
    make_sharded_predict_fn,
    make_spatial_predict_fn,
    make_sharded_train_step,
    make_spatial_train_step,
)
