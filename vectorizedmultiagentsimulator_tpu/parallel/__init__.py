from vectorizedmultiagentsimulator_tpu.parallel.sharding import (
    make_mesh,
    shard_environment,
    shard_state,
)

__all__ = ["make_mesh", "shard_environment", "shard_state"]
