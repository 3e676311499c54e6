from .sharding import (
    make_env_mesh,
    shard_data_batch,
    sharded_rollout,
)
