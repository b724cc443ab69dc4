"""Debug goal (reference ``vmas/scenarios/debug/goal.py``).

Single velocity-controlled agent reaching a goal in a lab-sized arena with
position shaping, time and energy rewards, and optional control delay.
"""
import math

import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.controllers import VelocityController
from vectorizedmultiagentsimulator_tpu.core import Agent, Landmark, Sphere, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.u_range = kwargs.pop("u_range", 1)
        self.a_range = kwargs.pop("a_range", 1)
        self.obs_noise = kwargs.pop("obs_noise", 0.0)
        self.dt_delay = kwargs.pop("dt_delay", 0)
        self.min_input_norm = kwargs.pop("min_input_norm", 0.08)
        self.linear_friction = kwargs.pop("linear_friction", 0.1)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1.0)
        self.time_rew_coeff = kwargs.pop("time_rew_coeff", -0.01)
        self.energy_reward_coeff = kwargs.pop("energy_rew_coeff", 0.0)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.viewer_size = (1600, 700)
        self.viewer_zoom = 2
        self.plot_grid = True
        self.agent_radius = 0.16
        self.lab_length = 6
        self.lab_width = 3
        controller_params = [2, 6, 0.002]
        self.f_range = self.a_range + self.linear_friction

        world = World(batch_dim, drag=0, dt=0.05, substeps=5)

        self._goal = Landmark(
            "goal", collide=False, movable=False, shape=Sphere(radius=0.06)
        )
        world.add_landmark(self._goal)
        agent = Agent(
            name="agent 0",
            collide=True,
            color=Color.GREEN,
            render_action=True,
            linear_friction=self.linear_friction,
            shape=Sphere(radius=self.agent_radius),
            f_range=self.f_range,
            u_range=self.u_range,
        )
        agent.controller = VelocityController(
            agent, world, controller_params, "standard"
        )
        agent.goal = self._goal
        world.add_agent(agent)
        return world

    @property
    def goal(self):
        return self._goal

    def _random_lab_pos(self):
        kx, ky = jax.random.split(self.world.next_key())
        B = self.world.batch_dim
        x = jax.random.uniform(
            kx, (B, 1), minval=-self.lab_length / 2, maxval=self.lab_length / 2
        )
        y = jax.random.uniform(
            ky, (B, 1), minval=-self.lab_width / 2, maxval=self.lab_width / 2
        )
        return jnp.concatenate([x, y], axis=1)

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        for agent in self.world.agents:
            agent.controller.reset(env_index)
            agent.set_pos(self._random_lab_pos(), batch_index=env_index)
        for landmark in self.world.landmarks:
            landmark.set_pos(self._random_lab_pos(), batch_index=env_index)
            pos_shaping = (
                jnp.min(
                    jnp.stack(
                        [
                            jnp.linalg.norm(
                                landmark.state.pos - a.state.pos, axis=1
                            )
                            for a in self.world.agents
                        ],
                        axis=1,
                    ),
                    axis=1,
                )
                * self.pos_shaping_factor
            )
            if env_index is None:
                landmark.pos_shaping = pos_shaping
            else:
                landmark.pos_shaping = JaxUtils.where_from_index(
                    env_index, pos_shaping, landmark.pos_shaping
                )
        if env_index is None:
            self.pos_rew = jnp.zeros((B,), jnp.float32)
            self.time_rew = jnp.zeros((B,), jnp.float32)
            self.goal_reached = jnp.zeros((B,), dtype=bool)
            # control-delay queue [D, B, 2] (goal.py:57-59)
            if self.dt_delay > 0:
                self.input_queue = jnp.zeros(
                    (self.dt_delay, B, self.world.dim_p), jnp.float32
                )
            for agent in self.world.agents:
                agent.energy_rew = jnp.zeros((B,), jnp.float32)
                agent.energy_expenditure = jnp.zeros((B,), jnp.float32)

    def process_action(self, agent):
        if self.dt_delay > 0:
            # Rolling delay buffer: pop the oldest action, push the new one.
            queue = self.input_queue
            delayed = queue[0]
            self.input_queue = jnp.concatenate(
                [queue[1:], agent.action.u[None]], axis=0
            )
            agent.action.u = delayed

        u = JaxUtils.clamp_with_norm(agent.action.u, self.u_range)
        action_norm = jnp.linalg.norm(u, axis=1)
        u = jnp.where((action_norm < self.min_input_norm)[:, None], 0.0, u)
        agent.action.u = u
        agent.controller.process_force()

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            goal_dist = jnp.min(
                jnp.stack(
                    [
                        jnp.linalg.norm(
                            self._goal.state.pos - a.state.pos, axis=1
                        )
                        for a in self.world.agents
                    ],
                    axis=1,
                ),
                axis=1,
            )
            self.goal_reached = goal_dist < self._goal.shape.radius
            pos_shaping = goal_dist * self.pos_shaping_factor
            self.pos_rew = jnp.where(
                self.goal_reached, 0.0, self._goal.pos_shaping - pos_shaping
            )
            self._goal.pos_shaping = pos_shaping
            self.time_rew = jnp.where(
                self.goal_reached, 0.0, self.time_rew_coeff
            )

        agent.energy_expenditure = jnp.sum(
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
        agent.energy_rew = -agent.energy_expenditure * self.energy_reward_coeff
        return self.pos_rew + agent.energy_rew + self.time_rew

    def observation(self, agent):
        observations = [
            agent.state.pos,
            agent.state.vel,
            agent.state.pos - self._goal.state.pos,
        ]
        if self.obs_noise > 0:
            observations = [
                obs
                + jax.random.uniform(
                    self.world.next_key(),
                    obs.shape,
                    minval=-self.obs_noise,
                    maxval=self.obs_noise,
                )
                for obs in observations
            ]
        return jnp.concatenate(observations, axis=-1)

    def info(self, agent):
        return {
            "pos_rew": self.pos_rew,
            "energy_rew": agent.energy_rew,
            "time_rew": self.time_rew,
        }
