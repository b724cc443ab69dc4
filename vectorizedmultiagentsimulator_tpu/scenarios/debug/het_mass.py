"""Debug het_mass (reference ``vmas/scenarios/debug/het_mass.py``).

Two agents with heterogeneous masses move along X only; reward is max speed
minus energy expenditure.

RNG deviation (documented like the other per-env re-expressions): the
reference draws ONE python-RNG mass noise shared by the whole batch at
every reset (het_mass.py:49-54); here each env draws its own noise from
the world PRNG chain — identical marginal distribution, independent across
envs, resampled at every reset via the dynamic per-env mass mechanism
(``entity.mass = [B,1] array`` -> ``state.extras["<name>.dyn_mass"]``).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core import Agent, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
    Y,
    env_index_to_mask,
)


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
            mass=self.green_mass,
            f_range=1,
        )
        world.add_agent(self._green_agent)
        self._blue_agent = Agent(
            name="agent 1",
            collide=False,
            render_action=True,
            mass=self.blue_mass,
            f_range=1,
        )
        world.add_agent(self._blue_agent)
        return world

    def reset_world_at(self, env_index=None):
        # Per-env mass resampling at every reset (het_mass.py:50-54; see
        # module docstring for the RNG deviation).
        B = self.world.batch_dim
        mask = env_index_to_mask(env_index, B)[:, None]
        for agent, base in (
            (self._green_agent, self.green_mass),
            (self._blue_agent, self.blue_mass),
        ):
            new_mass = base + jax.random.uniform(
                self.world.next_key(),
                (B, 1),
                minval=-self.mass_noise,
                maxval=self.mass_noise,
            )
            if self.world.is_finalized and self.world.has_extra(
                f"{agent.name}.dyn_mass"
            ):
                agent.mass = jnp.where(mask, new_mass, agent.mass)
            else:
                agent.mass = new_mass
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
