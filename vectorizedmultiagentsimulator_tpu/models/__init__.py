from vectorizedmultiagentsimulator_tpu.models.heuristic_policy import (
    BaseHeuristicPolicy,
    RandomPolicy,
)

__all__ = ["BaseHeuristicPolicy", "RandomPolicy"]
