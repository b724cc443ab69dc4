from vectorizedmultiagentsimulator_tpu.controllers.velocity_controller import (
    VelocityController,
)

__all__ = ["VelocityController"]
