"""Debug drone (reference ``vmas/scenarios/debug/drone.py``).

Agents with 12-state quadrotor dynamics; the 3 torque actions are exposed
and a fixed hover thrust is prepended in ``process_action``; done when any
drone exceeds the roll/pitch limit.
"""
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import Agent, World
from vectorizedmultiagentsimulator_tpu.dynamics import Drone
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.plot_grid = True
        self.n_agents = kwargs.pop("n_agents", 2)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim, substeps=10)
        for i in range(self.n_agents):
            agent = Agent(
                name=f"drone_{i}",
                collide=True,
                render_action=True,
                u_range=[0.00001, 0.00001, 0.00001],  # torque_x/y/z
                u_multiplier=[1, 1, 1],
                action_size=3,  # thrust is injected in process_action
                dynamics=Drone(world, integration="rk4"),
            )
            world.add_agent(agent)
        return world

    def reset_world_at(self, env_index=None):
        ScenarioUtils.spawn_entities_randomly(
            self.world.agents,
            self.world,
            env_index,
            min_dist_between_entities=0.1,
            x_bounds=(-1, 1),
            y_bounds=(-1, 1),
        )

    def reward(self, agent):
        return jnp.zeros((self.world.batch_dim,), jnp.float32)

    def process_action(self, agent):
        torque = agent.action.u
        thrust = jnp.full(
            (self.world.batch_dim, 1), agent.mass * agent.dynamics.g
        )
        agent.action.u = jnp.concatenate([thrust, torque], axis=-1)

    def observation(self, agent):
        return jnp.concatenate([agent.state.pos, agent.state.vel], axis=-1)

    def done(self):
        return jnp.any(
            jnp.stack(
                [agent.dynamics.needs_reset() for agent in self.world.agents],
                axis=-1,
            ),
            axis=-1,
        )

    def extra_render(self, env_index: int = 0):
        return [
            ScenarioUtils.plot_entity_rotation(agent, env_index, length=0.1)
            for agent in self.world.agents
        ]
