"""Reverse_transport scenario (reference
``vmas/scenarios/reverse_transport.py``).

Agents spawn *inside* a hollow heavy box package and must push it from
within onto the goal — exercises the hollow-box narrowphase.
"""
import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import (
    Agent,
    Box,
    Landmark,
    Sphere,
    World,
)
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.package_width = kwargs.pop("package_width", 0.6)
        self.package_length = kwargs.pop("package_length", 0.6)
        self.package_mass = kwargs.pop("package_mass", 50)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.shaping_factor = 100

        world = World(
            batch_dim, contact_margin=6e-3, substeps=5, collision_force=500
        )
        for i in range(n_agents):
            world.add_agent(
                Agent(name=f"agent_{i}", shape=Sphere(0.03), u_multiplier=0.5)
            )
        goal = Landmark(
            name="goal",
            collide=False,
            shape=Sphere(radius=0.09),
            color=Color.LIGHT_GREEN,
        )
        world.add_landmark(goal)
        self._package = Landmark(
            name=f"package {n_agents - 1}",
            collide=True,
            movable=True,
            mass=self.package_mass,
            shape=Box(
                length=self.package_length,
                width=self.package_width,
                hollow=True,
            ),
            color=Color.RED,
        )
        self._package.goal = goal
        world.add_landmark(self._package)
        return world

    @property
    def package(self):
        return self._package

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        package_pos = ScenarioUtils.uniform_in_bounds(self.world, -1.0, 1.0)
        self._package.set_pos(package_pos, batch_index=env_index)
        for agent in self.world.agents:
            kx, ky = jax.random.split(self.world.next_key())
            rel = jnp.concatenate(
                [
                    jax.random.uniform(
                        kx,
                        (B, 1),
                        minval=-self.package_length / 2 + agent.shape.radius,
                        maxval=self.package_length / 2 - agent.shape.radius,
                    ),
                    jax.random.uniform(
                        ky,
                        (B, 1),
                        minval=-self.package_width / 2 + agent.shape.radius,
                        maxval=self.package_width / 2 - agent.shape.radius,
                    ),
                ],
                axis=1,
            )
            agent.set_pos(rel + package_pos, batch_index=env_index)
        self._package.goal.set_pos(
            ScenarioUtils.uniform_in_bounds(self.world, -1.0, 1.0),
            batch_index=env_index,
        )
        global_shaping = (
            jnp.linalg.norm(
                self._package.state.pos - self._package.goal.state.pos, axis=1
            )
            * self.shaping_factor
        )
        if env_index is None:
            self._package.global_shaping = global_shaping
            self._package.on_goal = jnp.zeros((B,), dtype=bool)
            self._package.dist_to_goal = jnp.zeros((B,), jnp.float32)
            self.rew = jnp.zeros((B,), jnp.float32)
        else:
            self._package.global_shaping = JaxUtils.where_from_index(
                env_index, global_shaping, self._package.global_shaping
            )
            self._package.on_goal = JaxUtils.where_from_index(
                env_index, False, self._package.on_goal
            )

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            self._package.dist_to_goal = jnp.linalg.norm(
                self._package.state.pos - self._package.goal.state.pos, axis=1
            )
            self._package.on_goal = self.world.is_overlapping(
                self._package, self._package.goal
            )
            package_shaping = self._package.dist_to_goal * self.shaping_factor
            # The reference applies the shaping delta twice (the block is
            # duplicated, reverse_transport.py:171-183) — matched here.
            rew = jnp.where(
                self._package.on_goal,
                0.0,
                self._package.global_shaping - package_shaping,
            )
            self._package.global_shaping = package_shaping
            rew = rew + jnp.where(
                self._package.on_goal,
                0.0,
                self._package.global_shaping - package_shaping,
            )
            self.rew = rew
        return self.rew

    def observation(self, agent):
        return jnp.concatenate(
            [
                agent.state.pos,
                agent.state.vel,
                self._package.state.vel,
                self._package.state.pos - agent.state.pos,
                self._package.state.pos - self._package.goal.state.pos,
            ],
            axis=-1,
        )

    def done(self):
        return self._package.on_goal
