"""Debug pollock (reference ``vmas/scenarios/debug/pollock.py``).

Stress scene: 15 agents + 15 movable lines + 15 movable boxes, optionally
with per-agent LIDAR — the reference's LIDAR-consistency oracle scene.
"""
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import (
    Agent,
    Box,
    Landmark,
    Line,
    Sphere,
    World,
)
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.sensors import Lidar
from vectorizedmultiagentsimulator_tpu.utils import Color, ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_agents = kwargs.pop("n_agents", 15)
        self.n_lines = kwargs.pop("n_lines", 15)
        self.n_boxes = kwargs.pop("n_boxes", 15)
        self.lidar = kwargs.pop("lidar", False)
        self.vectorized_lidar = kwargs.pop("vectorized_lidar", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.agent_radius = 0.05
        self.line_length = 0.3
        self.box_length = 0.2
        self.box_width = 0.1
        self.world_semidim = 1
        self.min_dist_between_entities = 0.1

        world = World(
            batch_dim,
            dt=0.1,
            drag=0.25,
            substeps=5,
            collision_force=500,
            x_semidim=self.world_semidim,
            y_semidim=self.world_semidim,
        )
        for i in range(self.n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}",
                    shape=Sphere(radius=self.agent_radius),
                    u_multiplier=0.7,
                    rotatable=True,
                    sensors=(
                        [Lidar(world, n_rays=16, max_range=0.5)]
                        if self.lidar
                        else []
                    ),
                )
            )
        for i in range(self.n_lines):
            world.add_landmark(
                Landmark(
                    name=f"line {i}",
                    collide=True,
                    movable=True,
                    rotatable=True,
                    shape=Line(length=self.line_length),
                    color=Color.BLACK,
                )
            )
        for i in range(self.n_boxes):
            world.add_landmark(
                Landmark(
                    name=f"box {i}",
                    collide=True,
                    movable=True,
                    rotatable=True,
                    shape=Box(length=self.box_length, width=self.box_width),
                    color=Color.RED,
                )
            )
        return world

    def reset_world_at(self, env_index=None):
        ScenarioUtils.spawn_entities_randomly(
            self.world.agents + self.world.landmarks,
            self.world,
            env_index,
            self.min_dist_between_entities,
            (-self.world_semidim, self.world_semidim),
            (-self.world_semidim, self.world_semidim),
        )

    def reward(self, agent):
        return jnp.zeros((self.world.batch_dim,), jnp.float32)

    def observation(self, agent):
        if not self.lidar:
            return jnp.zeros((self.world.batch_dim, 1), jnp.float32)
        return agent.sensors[0].measure(vectorized=self.vectorized_lidar)
