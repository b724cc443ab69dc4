"""Debug vel_control (reference ``vmas/scenarios/debug/vel_control.py``).

Three velocity-controlled agents with different force limits; reward is the
(negative) total energy expenditure — a VelocityController showcase.
"""
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.controllers import VelocityController
from vectorizedmultiagentsimulator_tpu.core import Agent, Landmark, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
    X,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.green_mass = kwargs.pop("green_mass", 1)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        self.plot_grid = True
        self.agent_radius = 0.16

        controller_params = [2, 6, 0.002]
        linear_friction = 0.1
        v_range = 1
        a_range = 1
        f_range = linear_friction + a_range
        u_range = v_range  # actions are velocity goals under the controller

        world = World(
            batch_dim,
            linear_friction=linear_friction,
            drag=0,
            dt=0.05,
            substeps=4,
        )

        agent = Agent(
            name="agent 0",
            collide=False,
            color=Color.GREEN,
            render_action=True,
            mass=self.green_mass,
            f_range=f_range,
            u_range=u_range,
        )
        agent.controller = VelocityController(
            agent, world, controller_params, "standard"
        )
        world.add_agent(agent)
        agent = Agent(
            name="agent 1", collide=False, render_action=True, u_range=u_range
        )
        agent.controller = VelocityController(
            agent, world, controller_params, "standard"
        )
        world.add_agent(agent)
        agent = Agent(
            name="agent 2",
            collide=False,
            render_action=True,
            f_range=30,
            u_range=u_range,
        )
        agent.controller = VelocityController(
            agent, world, controller_params, "standard"
        )
        world.add_agent(agent)

        self._landmark = Landmark("landmark 0", collide=False, movable=True)
        world.add_landmark(self._landmark)
        return world

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        for agent in self.world.agents:
            agent.controller.reset(env_index)
            agent.set_pos(
                jnp.broadcast_to(jnp.asarray([-1.0, 0.0]), (B, 2)),
                batch_index=env_index,
            )
        if env_index is None:
            self.energy_expenditure = jnp.zeros((B,), jnp.float32)

    def process_action(self, agent):
        u = JaxUtils.clamp_with_norm(agent.action.u, agent.u_range)
        action_norm = jnp.linalg.norm(u, axis=1)
        u = jnp.where((action_norm < 0.08)[:, None], 0.0, u)

        if agent is self.world.agents[1]:
            # Acceleration-feasibility clamp on the X velocity goal
            # (vel_control.py:143-152).
            max_a = 1
            vel_goal = u[:, X]
            requested_a = (vel_goal - agent.state.vel[:, X]) / self.world.dt
            achievable_a = jnp.clip(requested_a, -max_a, max_a)
            u = u.at[:, X].set(
                achievable_a * self.world.dt + agent.state.vel[:, X]
            )
        agent.action.u = u
        agent.controller.process_force()

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            self.energy_expenditure = (
                -jnp.sum(
                    jnp.stack(
                        [
                            jnp.linalg.norm(a.action.u, axis=-1)
                            for a in self.world.agents
                        ],
                        axis=1,
                    ),
                    axis=-1,
                )
                * 3
            )
        return self.energy_expenditure

    def observation(self, agent):
        return jnp.concatenate([agent.state.pos, agent.state.vel], axis=-1)

    def info(self, agent):
        return {"energy_expenditure": self.energy_expenditure}
