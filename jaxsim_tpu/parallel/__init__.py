from .sharding import (
    make_env_mesh,
    shard_data_batch,
    sharded_fused_rollout,
    sharded_rollout,
)
