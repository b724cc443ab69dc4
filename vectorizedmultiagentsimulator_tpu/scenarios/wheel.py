"""Wheel scenario (reference ``vmas/scenarios/wheel.py``).

Agents spin a heavy line anchored at the origin to a desired angular
velocity.
"""
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import (
    Agent,
    Landmark,
    Line,
    Sphere,
    World,
)
from vectorizedmultiagentsimulator_tpu.models import BaseHeuristicPolicy
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.line_length = kwargs.pop("line_length", 2)
        line_mass = kwargs.pop("line_mass", 30)
        self.desired_velocity = kwargs.pop("desired_velocity", 0.05)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim)
        for i in range(n_agents):
            world.add_agent(
                Agent(name=f"agent_{i}", u_multiplier=0.6, shape=Sphere(0.03))
            )
        self._line = Landmark(
            name="line",
            collide=True,
            rotatable=True,
            shape=Line(length=self.line_length),
            mass=line_mass,
            color=Color.BLACK,
        )
        world.add_landmark(self._line)
        world.add_landmark(
            Landmark(
                name="center",
                shape=Sphere(radius=0.02),
                collide=False,
                color=Color.BLACK,
            )
        )
        return world

    @property
    def line(self):
        return self._line

    def reset_world_at(self, env_index=None):
        import jax

        B = self.world.batch_dim
        for agent in self.world.agents:
            agent.set_pos(
                ScenarioUtils.uniform_in_bounds(self.world, -1.0, 1.0),
                batch_index=env_index,
            )
        self._line.set_rot(
            jax.random.uniform(
                self.world.next_key(),
                (B, 1),
                minval=-jnp.pi / 2,
                maxval=jnp.pi / 2,
            ),
            batch_index=env_index,
        )
        if env_index is None:
            self.rew = jnp.zeros((B,), jnp.float32)

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            self.rew = jnp.abs(
                jnp.abs(self._line.state.ang_vel[:, 0]) - self.desired_velocity
            )
        return -self.rew

    def observation(self, agent):
        line_end_1 = jnp.concatenate(
            [
                (self.line_length / 2) * jnp.cos(self._line.state.rot),
                (self.line_length / 2) * jnp.sin(self._line.state.rot),
            ],
            axis=1,
        )
        line_end_2 = -line_end_1
        return jnp.concatenate(
            [
                agent.state.pos,
                agent.state.vel,
                self._line.state.pos - agent.state.pos,
                line_end_1 - agent.state.pos,
                line_end_2 - agent.state.pos,
                self._line.state.rot % jnp.pi,
                jnp.abs(self._line.state.ang_vel),
                jnp.abs(
                    jnp.abs(self._line.state.ang_vel) - self.desired_velocity
                ),
            ],
            axis=-1,
        )


class HeuristicPolicy(BaseHeuristicPolicy):
    """Chase a rotated line endpoint to keep torquing it (wheel.py:118-143)."""

    def compute_action(self, observation, u_range):
        assert (
            self.continuous_actions is True
        ), "Heuristic for continuous actions only"
        index_line_extrema = 6
        pos_agent = observation[:, :2]
        pos_end2_agent = observation[
            :, index_line_extrema + 2 : index_line_extrema + 4
        ]
        pos_end2 = pos_end2_agent + pos_agent
        pos_end2_shifted = JaxUtils.rotate_vector(
            pos_end2,
            jnp.full((pos_end2.shape[0],), jnp.pi / 4),
        )
        pos_end2_shifted_agent = pos_end2_shifted - pos_agent
        return jnp.clip(pos_end2_shifted_agent, -u_range, u_range)
