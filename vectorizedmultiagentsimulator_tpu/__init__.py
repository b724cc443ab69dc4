"""vectorizedmultiagentsimulator_tpu — a TPU-native vectorized,
differentiable multi-agent 2D physics simulator.

A ground-up JAX/XLA rebuild with the capabilities of VMAS
(proroklab/VectorizedMultiAgentSimulator v1.5.2): batched rigid-body
physics, the scenario API, the scenario library, Gym-style environments
and wrappers — redesigned as pure functions over one state pytree so the
whole step compiles to fused XLA, rollouts run on-device via ``lax.scan``,
gradients flow through the physics, and the env batch shards across chips
with ``jax.sharding``.
"""
from vectorizedmultiagentsimulator_tpu.make_env import make_env
from vectorizedmultiagentsimulator_tpu.environment import Wrapper

__version__ = "0.1.0"

__all__ = [
    "make_env",
    "render_interactively",
    "scenarios",
    "debug_scenarios",
    "mpe_scenarios",
    "Wrapper",
]

scenarios = sorted(
    [
        "dropout",
        "dispersion",
        "transport",
        "reverse_transport",
        "give_way",
        "wheel",
        "balance",
        "football",
        "discovery",
        "flocking",
        "passage",
        "joint_passage_size",
        "joint_passage",
        "ball_passage",
        "ball_trajectory",
        "buzz_wire",
        "multi_give_way",
        "navigation",
        "sampling",
        "wind_flocking",
        "road_traffic",
    ]
)
"""List of the main scenarios (excluding MPE and debug)."""

debug_scenarios = sorted(
    [
        "asym_joint",
        "circle_trajectory",
        "goal",
        "het_mass",
        "line_trajectory",
        "vel_control",
        "waterfall",
        "diff_drive",
        "kinematic_bicycle",
        "pollock",
        "drone",
    ]
)
"""List of the debug scenarios."""

mpe_scenarios = sorted(
    [
        "simple",
        "simple_adversary",
        "simple_crypto",
        "simple_push",
        "simple_reference",
        "simple_speaker_listener",
        "simple_spread",
        "simple_tag",
        "simple_world_comm",
    ]
)
"""List of the MPE scenarios."""


def render_interactively(*args, **kwargs):
    from vectorizedmultiagentsimulator_tpu.interactive import (
        render_interactively as _ri,
    )

    return _ri(*args, **kwargs)
