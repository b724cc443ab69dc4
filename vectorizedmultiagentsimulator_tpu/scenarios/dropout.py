"""Dropout scenario (reference ``vmas/scenarios/dropout.py``).

n agents share a +1 reward when any of them reaches the goal, minus a team
energy penalty — the optimal policy "drops out" all but the closest agent.
"""
import math

import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import Agent, Landmark, Sphere, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
)

DEFAULT_ENERGY_COEFF = 0.02


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.energy_coeff = kwargs.pop("energy_coeff", DEFAULT_ENERGY_COEFF)
        self.start_same_point = kwargs.pop("start_same_point", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        self.agent_radius = 0.05
        self.goal_radius = 0.03

        world = World(batch_dim)
        for i in range(n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}",
                    collide=False,
                    shape=Sphere(radius=self.agent_radius),
                )
            )
        world.add_landmark(
            Landmark(
                name="goal",
                collide=False,
                shape=Sphere(radius=self.goal_radius),
                color=Color.GREEN,
            )
        )
        return world

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        if self.start_same_point:
            for agent in self.world.agents:
                agent.set_pos(
                    jnp.zeros((B, 2), jnp.float32), batch_index=env_index
                )
            ScenarioUtils.spawn_entities_randomly(
                self.world.landmarks,
                self.world,
                env_index,
                self.goal_radius + self.agent_radius + 0.01,
                x_bounds=(-1, 1),
                y_bounds=(-1, 1),
                occupied_positions=jnp.zeros((B, 1, 2), jnp.float32),
            )
        else:
            ScenarioUtils.spawn_entities_randomly(
                self.world.policy_agents + self.world.landmarks,
                self.world,
                env_index,
                self.goal_radius + self.agent_radius + 0.01,
                x_bounds=(-1, 1),
                y_bounds=(-1, 1),
            )

        for landmark in self.world.landmarks:
            if env_index is None:
                landmark.eaten = jnp.zeros((B,), dtype=bool)
                landmark.reset_render()
                self.terminated = jnp.zeros((B,), dtype=bool)
                self.any_eaten = jnp.zeros((B,), dtype=bool)
                self.pos_rew = jnp.zeros((B,), jnp.float32)
                self.energy_rew = jnp.zeros((B,), jnp.float32)
            else:
                landmark.eaten = JaxUtils.where_from_index(
                    env_index, False, landmark.eaten
                )
                landmark.is_rendering = JaxUtils.where_from_index(
                    env_index, True, landmark.is_rendering
                )
                self.terminated = JaxUtils.where_from_index(
                    env_index, False, self.terminated
                )

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        is_last = agent is self.world.agents[-1]
        goal = self.world.landmarks[0]

        if is_first:
            any_eaten = jnp.any(
                jnp.stack(
                    [
                        jnp.linalg.norm(
                            a.state.pos - goal.state.pos, axis=1
                        )
                        < a.shape.radius + goal.shape.radius
                        for a in self.world.agents
                    ],
                    axis=1,
                ),
                axis=-1,
            )
            self.any_eaten = any_eaten
            self.terminated = any_eaten

        self.pos_rew = jnp.where(self.any_eaten & ~goal.eaten, 1.0, 0.0)

        if is_last:
            goal.eaten = goal.eaten | self.any_eaten
            goal.is_rendering = goal.is_rendering & ~self.any_eaten

        if is_first:
            self.energy_rew = self.energy_coeff * -jnp.sum(
                jnp.stack(
                    [
                        jnp.linalg.norm(a.action.u, axis=-1)
                        / math.sqrt(
                            self.world.dim_p
                            * ((a.u_range * a.u_multiplier) ** 2)
                        )
                        for a in self.world.agents
                    ],
                    axis=1,
                ),
                axis=-1,
            )
        return self.pos_rew + self.energy_rew

    def observation(self, agent):
        goal = self.world.landmarks[0]
        return jnp.concatenate(
            [
                agent.state.pos,
                agent.state.vel,
                goal.state.pos - agent.state.pos,
                goal.eaten.astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )

    def info(self, agent):
        return {"pos_rew": self.pos_rew, "energy_rew": self.energy_rew}

    def done(self):
        return self.terminated
