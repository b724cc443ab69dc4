from vectorizedmultiagentsimulator_tpu.core.shapes import Box, Line, Shape, Sphere
from vectorizedmultiagentsimulator_tpu.core.state import WorldState
from vectorizedmultiagentsimulator_tpu.core.entities import (
    Action,
    Agent,
    Entity,
    Landmark,
)
from vectorizedmultiagentsimulator_tpu.core.world import World
from vectorizedmultiagentsimulator_tpu.core.joints import Joint, JointConstraint

__all__ = [
    "Shape",
    "Box",
    "Sphere",
    "Line",
    "WorldState",
    "Entity",
    "Agent",
    "Landmark",
    "Action",
    "World",
    "Joint",
    "JointConstraint",
]
