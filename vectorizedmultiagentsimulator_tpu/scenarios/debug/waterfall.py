"""Debug waterfall (reference ``vmas/scenarios/debug/waterfall.py``).

A chain of agents linked by collidable joints falls through tilted boxes
onto a floor line — the joint-system stress scene (substeps=5,
collision_force=500).
"""
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import (
    Agent,
    Box,
    Joint,
    Landmark,
    Line,
    Sphere,
    World,
)
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import Color, ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_agents = kwargs.pop("n_agents", 5)
        self.with_joints = kwargs.pop("joints", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.agent_dist = 0.1
        self.agent_radius = 0.04

        world = World(
            batch_dim, dt=0.1, drag=0.25, substeps=5, collision_force=500
        )
        for i in range(self.n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}",
                    shape=Sphere(radius=self.agent_radius),
                    u_multiplier=0.7,
                    rotatable=True,
                )
            )
        if self.with_joints:
            for i in range(self.n_agents - 1):
                world.add_joint(
                    Joint(
                        world.agents[i],
                        world.agents[i + 1],
                        anchor_a=(1, 0),
                        anchor_b=(-1, 0),
                        dist=self.agent_dist,
                        rotate_a=True,
                        rotate_b=True,
                        collidable=True,
                        width=0,
                        mass=1,
                    )
                )
            landmark = Landmark(
                name="joined landmark",
                collide=True,
                movable=True,
                rotatable=True,
                shape=Box(length=self.agent_radius * 2, width=0.3),
                color=Color.GREEN,
            )
            world.add_landmark(landmark)
            world.add_joint(
                Joint(
                    world.agents[-1],
                    landmark,
                    anchor_a=(1, 0),
                    anchor_b=(-1, 0),
                    dist=self.agent_dist,
                    rotate_a=False,
                    rotate_b=False,
                    collidable=True,
                    width=0,
                    mass=1,
                )
            )
        for i in range(5):
            world.add_landmark(
                Landmark(
                    name=f"landmark {i}",
                    collide=True,
                    movable=True,
                    rotatable=True,
                    shape=Box(length=0.3, width=0.1),
                    color=Color.RED,
                )
            )
        floor = Landmark(
            name="floor",
            collide=True,
            movable=False,
            shape=Line(length=2),
            color=Color.BLACK,
        )
        world.add_landmark(floor)
        return world

    def reset_world_at(self, env_index=None):
        joined = (
            [
                l
                for l in self.world.landmarks
                if l.name == "joined landmark"
            ]
            if self.with_joints
            else []
        )
        for i, agent in enumerate(self.world.agents + joined):
            agent.set_pos(
                jnp.asarray(
                    [
                        -0.2 + (self.agent_dist + 2 * self.agent_radius) * i,
                        1.0,
                    ],
                    dtype=jnp.float32,
                ),
                batch_index=env_index,
            )
        boxes = [
            l
            for l in self.world.landmarks
            if l.name.startswith("landmark ")
        ]
        for i, landmark in enumerate(boxes):
            landmark.set_pos(
                jnp.asarray(
                    [0.2 if i % 2 else -0.2, 0.6 - 0.3 * i], dtype=jnp.float32
                ),
                batch_index=env_index,
            )
            landmark.set_rot(
                jnp.asarray(
                    [jnp.pi / 4 if i % 2 else -jnp.pi / 4], dtype=jnp.float32
                ),
                batch_index=env_index,
            )
        floor = self.world.landmarks[-1]
        floor.set_pos(
            jnp.asarray([0.0, -1.0], dtype=jnp.float32), batch_index=env_index
        )

    def reward(self, agent):
        return -jnp.linalg.norm(
            agent.state.pos - self.world.landmarks[-1].state.pos, axis=1
        )

    def observation(self, agent):
        return jnp.concatenate(
            [agent.state.pos, agent.state.vel]
            + [
                landmark.state.pos - agent.state.pos
                for landmark in self.world.landmarks
            ],
            axis=-1,
        )
