"""Flocking scenario (reference ``vmas/scenarios/flocking.py``).

Agents with obstacle-detecting LIDAR flock around a scripted target agent
that circles; cohesion (desired-distance) shaping + collision penalties.
"""
from typing import Callable

import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import (
    Agent,
    Entity,
    Landmark,
    Sphere,
    World,
)
from vectorizedmultiagentsimulator_tpu.models import BaseHeuristicPolicy
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.sensors import Lidar
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
    X,
    Y,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        n_obstacles = kwargs.pop("n_obstacles", 5)
        self._min_dist_between_entities = kwargs.pop(
            "min_dist_between_entities", 0.15
        )
        self.n_lidar_rays = kwargs.pop("n_lidar_rays", 12)
        self.collision_reward = kwargs.pop("collision_reward", -0.1)
        self.dist_shaping_factor = kwargs.pop("dist_shaping_factor", 1)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.plot_grid = True
        self.desired_distance = 0.1
        self.min_collision_distance = 0.005
        self.x_dim = 1
        self.y_dim = 1

        world = World(batch_dim, collision_force=400, substeps=5)
        self._target = Agent(
            name="target",
            collide=True,
            color=Color.GREEN,
            render_action=True,
            action_script=self.action_script_creator(),
        )
        world.add_agent(self._target)
        goal_entity_filter: Callable[[Entity], bool] = lambda e: not isinstance(
            e, Agent
        )
        for i in range(n_agents):
            agent = Agent(
                name=f"agent_{i}",
                collide=True,
                sensors=[
                    Lidar(
                        world,
                        n_rays=self.n_lidar_rays,
                        max_range=0.2,
                        entity_filter=goal_entity_filter,
                    )
                ],
                render_action=True,
            )
            world.add_agent(agent)

        self._obstacles = []
        for i in range(n_obstacles):
            obstacle = Landmark(
                name=f"obstacle_{i}",
                collide=True,
                movable=False,
                shape=Sphere(radius=0.1),
                color=Color.RED,
            )
            world.add_landmark(obstacle)
            self._obstacles.append(obstacle)
        return world

    @property
    def obstacles(self):
        return self._obstacles

    def action_script_creator(self):
        def action_script(agent, world):
            t = self.t / 30
            agent.action.u = jnp.stack([jnp.cos(t), jnp.sin(t)], axis=1)

        return action_script

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        target_pos = jnp.zeros((B, self.world.dim_p)).at[:, Y].set(-self.y_dim)
        self._target.set_pos(target_pos, batch_index=env_index)
        ScenarioUtils.spawn_entities_randomly(
            self._obstacles + self.world.policy_agents,
            self.world,
            env_index,
            self._min_dist_between_entities,
            x_bounds=(-self.x_dim, self.x_dim),
            y_bounds=(-self.y_dim, self.y_dim),
            occupied_positions=target_pos[:, None],
        )

        for agent in self.world.policy_agents:
            distance_shaping = (
                jnp.mean(
                    (
                        jnp.stack(
                            [
                                jnp.linalg.norm(
                                    agent.state.pos - a.state.pos, axis=-1
                                )
                                for a in self.world.agents
                                if a is not agent
                            ],
                            axis=1,
                        )
                        - self.desired_distance
                    )
                    ** 2,
                    axis=-1,
                )
                * self.dist_shaping_factor
            )
            if env_index is None:
                agent.distance_shaping = distance_shaping
                agent.collision_rew = jnp.zeros((B,), jnp.float32)
                agent.dist_rew = jnp.zeros((B,), jnp.float32)
            else:
                agent.distance_shaping = JaxUtils.where_from_index(
                    env_index, distance_shaping, agent.distance_shaping
                )
        if env_index is None:
            self.t = jnp.zeros((B,), jnp.float32)
        else:
            self.t = JaxUtils.where_from_index(env_index, 0.0, self.t)

    def reward(self, agent):
        is_first = self.world.policy_agents.index(agent) == 0
        if is_first:
            self.t = self.t + 1
            if self.collision_reward != 0:
                for a in self.world.policy_agents:
                    a.collision_rew = jnp.zeros_like(a.collision_rew)
                for i, a in enumerate(self.world.agents):
                    for j, b in enumerate(self.world.agents):
                        if j <= i:
                            continue
                        collision = (
                            self.world.get_distance(a, b)
                            <= self.min_collision_distance
                        )
                        if a.action_script is None:
                            a.collision_rew = a.collision_rew + jnp.where(
                                collision, self.collision_reward, 0.0
                            )
                        if b.action_script is None:
                            b.collision_rew = b.collision_rew + jnp.where(
                                collision, self.collision_reward, 0.0
                            )

        agents_dist_shaping = (
            jnp.mean(
                (
                    jnp.stack(
                        [
                            jnp.linalg.norm(
                                agent.state.pos - a.state.pos, axis=-1
                            )
                            for a in self.world.agents
                            if a is not agent
                        ],
                        axis=1,
                    )
                    - self.desired_distance
                )
                ** 2,
                axis=-1,
            )
            * self.dist_shaping_factor
        )
        agent.dist_rew = agent.distance_shaping - agents_dist_shaping
        agent.distance_shaping = agents_dist_shaping
        return agent.collision_rew + agent.dist_rew

    def observation(self, agent):
        return jnp.concatenate(
            [
                agent.state.pos,
                agent.state.vel,
                agent.state.pos - self._target.state.pos,
                agent.sensors[0].measure(),
            ],
            axis=-1,
        )

    def info(self, agent):
        return {
            "agent_collision_rew": agent.collision_rew,
            "agent_distance_rew": agent.dist_rew,
        }


class HeuristicPolicy(BaseHeuristicPolicy):
    """Circle-following with LIDAR-based avoidance (flocking.py:213-252)."""

    def compute_action(self, observation, u_range):
        assert self.continuous_actions
        circle_origin = jnp.zeros((1, 2))
        circle_radius = 0.3
        current_pos = observation[:, :2]
        v = current_pos - circle_origin
        closest_point_on_circ = (
            circle_origin
            + v
            / jnp.maximum(jnp.linalg.norm(v, axis=1), 1e-12)[:, None]
            * circle_radius
        )
        normal = jnp.stack(
            [closest_point_on_circ[:, Y], -closest_point_on_circ[:, X]], axis=1
        )
        normal = (
            normal
            / jnp.maximum(jnp.linalg.norm(normal, axis=1), 1e-12)[:, None]
            * 0.1
        )
        des_pos = closest_point_on_circ + normal

        lidar = observation[:, 6:18]
        object_visible = jnp.any(lidar < 0.1, axis=1)
        object_dir_index = jnp.argmin(lidar, axis=1)
        object_dir = object_dir_index / lidar.shape[1] * 2 * jnp.pi
        object_vec = jnp.stack(
            [jnp.cos(object_dir), jnp.sin(object_dir)], axis=1
        )
        des_pos_object = current_pos - object_vec * 0.1
        des_pos = jnp.where(object_visible[:, None], des_pos_object, des_pos)
        return jnp.clip((des_pos - current_pos) * 10, -u_range, u_range)
