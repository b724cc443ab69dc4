"""Debug het_mass (reference ``vmas/scenarios/debug/het_mass.py``).

Two agents with heterogeneous masses move along X only; reward is max speed
minus energy expenditure.

Jit-native deviation: the reference resamples the mass noise with python
RNG at every reset (het_mass.py:49-54); entity masses here are static
physics-table entries, so the noise is sampled once at construction.
"""
import math

import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core import Agent, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import Color, ScenarioUtils, Y


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.green_mass = kwargs.pop("green_mass", 4)
        self.blue_mass = kwargs.pop("blue_mass", 2)
        self.mass_noise = kwargs.pop("mass_noise", 1)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        self.plot_grid = True

        world = World(batch_dim)
        self._green_agent = Agent(
            name="agent 0",
            collide=False,
            color=Color.GREEN,
            render_action=True,
            mass=self.green_mass
            + np.random.uniform(-self.mass_noise, self.mass_noise),
            f_range=1,
        )
        world.add_agent(self._green_agent)
        self._blue_agent = Agent(
            name="agent 1",
            collide=False,
            render_action=True,
            mass=self.blue_mass
            + np.random.uniform(-self.mass_noise, self.mass_noise),
            f_range=1,
        )
        world.add_agent(self._blue_agent)
        return world

    def reset_world_at(self, env_index=None):
        for agent in self.world.agents:
            agent.set_pos(
                ScenarioUtils.uniform_in_bounds(self.world, -1.0, 1.0),
                batch_index=env_index,
            )
        if env_index is None:
            B = self.world.batch_dim
            self.max_speed = jnp.zeros((B,), jnp.float32)
            self.energy_expenditure = jnp.zeros((B,), jnp.float32)

    def process_action(self, agent):
        agent.action.u = agent.action.u.at[:, Y].set(0.0)

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            self.max_speed = jnp.max(
                jnp.stack(
                    [
                        jnp.linalg.norm(a.state.vel, axis=1)
                        for a in self.world.agents
                    ],
                    axis=1,
                ),
                axis=1,
            )
            self.energy_expenditure = (
                -jnp.sum(
                    jnp.stack(
                        [
                            jnp.linalg.norm(a.action.u, axis=-1)
                            / math.sqrt(self.world.dim_p * (a.f_range**2))
                            for a in self.world.agents
                        ],
                        axis=1,
                    ),
                    axis=-1,
                )
                * 0.17
            )
        return self.max_speed + self.energy_expenditure

    def observation(self, agent):
        return jnp.concatenate([agent.state.pos, agent.state.vel], axis=-1)

    def info(self, agent):
        return {
            "max_speed": self.max_speed,
            "energy_expenditure": self.energy_expenditure,
        }
