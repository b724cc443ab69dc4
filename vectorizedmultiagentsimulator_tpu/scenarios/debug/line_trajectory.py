"""Debug line_trajectory (reference
``vmas/scenarios/debug/line_trajectory.py``).

One velocity-controlled agent rewarded for tracking the vertical line x=0
upward: negative sqrt-distance to the line, tangential-velocity dot product
and a steadiness bonus aligning velocity with the commanded velocity.
"""
import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.controllers import VelocityController
from vectorizedmultiagentsimulator_tpu.core import Agent, Sphere, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import Color, ScenarioUtils, X, Y


def _safe_normalize(v):
    norm = jnp.linalg.norm(v, axis=1, keepdims=True)
    return jnp.where(norm > 0, v / jnp.maximum(norm, 1e-12), 0.0)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.obs_noise = kwargs.pop("obs_noise", 0)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.agent_radius = 0.03
        self.line_length = 3

        world = World(batch_dim, drag=0.1)
        self._agent = Agent(
            name="agent_0",
            shape=Sphere(self.agent_radius),
            mass=2,
            f_range=0.5,
            u_range=1,
            render_action=True,
        )
        self._agent.controller = VelocityController(
            self._agent, world, [4, 1.25, 0.001], "standard"
        )
        world.add_agent(self._agent)
        return world

    def process_action(self, agent):
        self.vel_action = agent.action.u
        agent.controller.process_force()

    def reset_world_at(self, env_index=None):
        self._agent.controller.reset(env_index)
        kx, ky = jax.random.split(self.world.next_key())
        B = self.world.batch_dim
        pos = jnp.concatenate(
            [
                jax.random.uniform(kx, (B, 1), minval=-1, maxval=1),
                jax.random.uniform(ky, (B, 1), minval=-1, maxval=0),
            ],
            axis=1,
        )
        self._agent.set_pos(pos, batch_index=env_index)
        if env_index is None:
            self.pos_rew = jnp.zeros((B,), jnp.float32)
            self.dot_product = jnp.zeros((B,), jnp.float32)
            self.steady_rew = jnp.zeros((B,), jnp.float32)
            self.vel_action = jnp.zeros((B, self.world.dim_p), jnp.float32)

    def reward(self, agent):
        closest_point = agent.state.pos.at[:, X].set(0.0)
        self.pos_rew = (
            -(jnp.linalg.norm(agent.state.pos - closest_point, axis=1) ** 0.5)
            * 1
        )
        tangent = jnp.zeros_like(agent.state.vel).at[:, Y].set(1.0)
        self.dot_product = (
            jnp.sum(tangent * agent.state.vel, axis=-1) * 0.5
        )
        normalized_vel = _safe_normalize(agent.state.vel)
        normalized_vel_action = _safe_normalize(self.vel_action)
        self.steady_rew = (
            jnp.sum(normalized_vel * normalized_vel_action, axis=-1) * 0.2
        )
        return self.pos_rew + self.dot_product + self.steady_rew

    def observation(self, agent):
        observations = [agent.state.pos, agent.state.vel, agent.state.pos]
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

    def done(self):
        return self.world.agents[0].state.pos[:, Y] > self.line_length - 1

    def info(self, agent):
        return {
            "pos_rew": self.pos_rew,
            "dot_product": self.dot_product,
            "steady_rew": self.steady_rew,
        }

    def extra_render(self, env_index: int = 0):
        from vectorizedmultiagentsimulator_tpu import render as rendering

        line = rendering.Line((0, -1), (0, -1 + self.line_length), width=0.01)
        line.set_color(*Color.BLACK.value)
        return [line]
