from vectorizedmultiagentsimulator_tpu.parallel.rollout import rollout
from vectorizedmultiagentsimulator_tpu.parallel.sharding import (
    make_mesh,
    shard_environment,
    shard_state,
)

__all__ = ["make_mesh", "rollout", "shard_environment", "shard_state"]
