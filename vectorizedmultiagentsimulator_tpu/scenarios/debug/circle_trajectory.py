"""Debug circle_trajectory (reference
``vmas/scenarios/debug/circle_trajectory.py``).

One velocity-controlled agent rewarded for tracking a circle of radius 1.5:
negative sqrt-distance to the circle plus tangential-velocity dot product.
"""
import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.controllers import VelocityController
from vectorizedmultiagentsimulator_tpu.core import Agent, Sphere, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
    X,
    Y,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.u_range = kwargs.pop("u_range", 1)
        self.a_range = kwargs.pop("a_range", 1)
        self.obs_noise = kwargs.pop("obs_noise", 0.0)
        self.dt_delay = kwargs.pop("dt_delay", 0)
        self.min_input_norm = kwargs.pop("min_input_norm", 0.08)
        self.linear_friction = kwargs.pop("linear_friction", 0.1)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.agent_radius = 0.16
        self.desired_radius = 1.5
        self.viewer_zoom = 2

        world = World(
            batch_dim, linear_friction=self.linear_friction, dt=0.05, drag=0
        )
        controller_params = [2, 6, 0.002]
        self.f_range = self.a_range + self.linear_friction

        self._agent = Agent(
            name="agent_0",
            shape=Sphere(self.agent_radius),
            f_range=self.f_range,
            u_range=self.u_range,
            render_action=True,
        )
        self._agent.controller = VelocityController(
            self._agent, world, controller_params, "standard"
        )
        world.add_agent(self._agent)
        return world

    @property
    def agent(self):
        return self._agent

    def process_action(self, agent):
        if self.dt_delay > 0:
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

    def reset_world_at(self, env_index=None):
        self._agent.controller.reset(env_index)
        self._agent.set_pos(
            ScenarioUtils.uniform_in_bounds(
                self.world, -self.desired_radius, self.desired_radius
            ),
            batch_index=env_index,
        )
        if env_index is None:
            B = self.world.batch_dim
            self.pos_rew = jnp.zeros((B,), jnp.float32)
            self.dot_product = jnp.zeros((B,), jnp.float32)
            if self.dt_delay > 0:
                self.input_queue = jnp.zeros(
                    (self.dt_delay, B, self.world.dim_p), jnp.float32
                )

    def get_closest_point_circle(self, agent):
        pos_norm = jnp.linalg.norm(agent.state.pos, axis=1)
        normalized = (
            agent.state.pos
            / jnp.maximum(pos_norm, 1e-12)[:, None]
            * self.desired_radius
        )
        return jnp.where(pos_norm[:, None] > 0, normalized, 0.0)

    def get_next_closest_point_circle(self, agent):
        closest_point = self.get_closest_point_circle(agent)
        angle = (
            jnp.arctan2(closest_point[:, Y], closest_point[:, X]) + jnp.pi / 24
        )
        return (
            jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=1)
            * self.desired_radius
        )

    def get_tangent_to_circle(self, agent, closest_point=None):
        if closest_point is None:
            closest_point = self.get_closest_point_circle(agent)
        distance_to_circle = agent.state.pos - closest_point
        inside_circle = (
            jnp.linalg.norm(agent.state.pos, axis=1) < self.desired_radius
        )
        angle_90 = jnp.full((self.world.batch_dim,), jnp.pi / 2)
        rot_90 = JaxUtils.rotate_vector(distance_to_circle, angle_90)
        rot_neg_90 = JaxUtils.rotate_vector(distance_to_circle, -angle_90)
        rotated = jnp.where(inside_circle[:, None], rot_neg_90, rot_90)
        norm = jnp.linalg.norm(rotated, axis=1)
        tangent = rotated / jnp.maximum(norm, 1e-12)[:, None]
        return jnp.where(norm[:, None] > 0, tangent, 0.0)

    def reward(self, agent):
        closest_point = self.get_closest_point_circle(agent)
        self.pos_rew = (
            -(jnp.linalg.norm(agent.state.pos - closest_point, axis=1) ** 0.5)
            * 1
        )
        tangent = self.get_tangent_to_circle(agent, closest_point)
        self.dot_product = (
            jnp.sum(tangent * agent.state.vel, axis=-1) * 0.5
        )
        return self.pos_rew + self.dot_product

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

    def info(self, agent):
        return {"pos_rew": self.pos_rew, "dot_product": self.dot_product}

    def extra_render(self, env_index: int = 0):
        import numpy as np

        from vectorizedmultiagentsimulator_tpu import render as rendering

        geoms = []
        color = Color.BLACK.value
        circle = rendering.make_circle(self.desired_radius, filled=False)
        xform = rendering.Transform()
        circle.add_attr(xform)
        xform.set_translation(0, 0)
        circle.set_color(*color)
        geoms.append(circle)

        tangent = np.asarray(self.get_tangent_to_circle(self._agent))
        line = rendering.Line((0, 0), tuple(tangent[env_index]), width=0.01)
        line.set_color(*color)
        geoms.append(line)
        return geoms
