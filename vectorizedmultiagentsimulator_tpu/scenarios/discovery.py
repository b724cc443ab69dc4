"""Discovery scenario (reference ``vmas/scenarios/discovery.py``).

Agents with target-detecting LIDAR must jointly cover targets
(``agents_per_target`` simultaneously within ``covering_range``); covered
targets respawn (or retire) — a coverage/search task.
"""
from typing import Callable

import jax.numpy as jnp
import numpy as np

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
        self.n_agents = kwargs.pop("n_agents", 5)
        self.n_targets = kwargs.pop("n_targets", 7)
        self.x_semidim = kwargs.pop("x_semidim", 1)
        self.y_semidim = kwargs.pop("y_semidim", 1)
        self._min_dist_between_entities = kwargs.pop(
            "min_dist_between_entities", 0.2
        )
        self._lidar_range = kwargs.pop("lidar_range", 0.35)
        self._covering_range = kwargs.pop("covering_range", 0.25)
        self.use_agent_lidar = kwargs.pop("use_agent_lidar", False)
        self.n_lidar_rays_entities = kwargs.pop("n_lidar_rays_entities", 15)
        self.n_lidar_rays_agents = kwargs.pop("n_lidar_rays_agents", 12)
        self._agents_per_target = kwargs.pop("agents_per_target", 2)
        self.targets_respawn = kwargs.pop("targets_respawn", True)
        self.shared_reward = kwargs.pop("shared_reward", False)
        self.agent_collision_penalty = kwargs.pop(
            "agent_collision_penalty", 0
        )
        self.covering_rew_coeff = kwargs.pop("covering_rew_coeff", 1.0)
        self.time_penalty = kwargs.pop("time_penalty", 0)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self._comms_range = self._lidar_range
        self.min_collision_distance = 0.005
        self.agent_radius = 0.05
        self.target_radius = self.agent_radius
        self.viewer_zoom = 1
        self.target_color = Color.GREEN

        world = World(
            batch_dim,
            x_semidim=self.x_semidim,
            y_semidim=self.y_semidim,
            collision_force=500,
            substeps=2,
            drag=0.25,
        )

        entity_filter_agents: Callable[[Entity], bool] = (
            lambda e: e.name.startswith("agent")
        )
        entity_filter_targets: Callable[[Entity], bool] = (
            lambda e: e.name.startswith("target")
        )
        for i in range(self.n_agents):
            agent = Agent(
                name=f"agent_{i}",
                collide=True,
                shape=Sphere(radius=self.agent_radius),
                sensors=(
                    [
                        Lidar(
                            world,
                            n_rays=self.n_lidar_rays_entities,
                            max_range=self._lidar_range,
                            entity_filter=entity_filter_targets,
                            render_color=Color.GREEN,
                        )
                    ]
                    + (
                        [
                            Lidar(
                                world,
                                angle_start=0.05,
                                angle_end=2 * np.pi + 0.05,
                                n_rays=self.n_lidar_rays_agents,
                                max_range=self._lidar_range,
                                entity_filter=entity_filter_agents,
                                render_color=Color.BLUE,
                            )
                        ]
                        if self.use_agent_lidar
                        else []
                    )
                ),
            )
            world.add_agent(agent)

        self._targets = []
        for i in range(self.n_targets):
            target = Landmark(
                name=f"target_{i}",
                collide=True,
                movable=False,
                shape=Sphere(radius=self.target_radius),
                color=self.target_color,
            )
            world.add_landmark(target)
            self._targets.append(target)
        return world

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        if env_index is None:
            self.all_time_covered_targets = jnp.zeros(
                (B, self.n_targets), dtype=bool
            )
            self.covered_targets = jnp.zeros((B, self.n_targets), dtype=bool)
            self.shared_covering_rew = jnp.zeros((B,), jnp.float32)
            self.time_rew = jnp.zeros((B,), jnp.float32)
            for a in self.world.agents:
                a.collision_rew = jnp.zeros((B,), jnp.float32)
                a.covering_reward = jnp.zeros((B,), jnp.float32)
        else:
            self.all_time_covered_targets = JaxUtils.where_from_index(
                env_index, False, self.all_time_covered_targets
            )
        placable_entities = self._targets[: self.n_targets] + self.world.agents
        ScenarioUtils.spawn_entities_randomly(
            entities=placable_entities,
            world=self.world,
            env_index=env_index,
            min_dist_between_entities=self._min_dist_between_entities,
            x_bounds=(-self.world.x_semidim, self.world.x_semidim),
            y_bounds=(-self.world.y_semidim, self.world.y_semidim),
        )

    def get_outside_pos(self, env_index):
        import jax

        return jax.random.uniform(
            self.world.next_key(),
            (self.world.batch_dim, self.world.dim_p),
            minval=-1000 * self.world.x_semidim,
            maxval=-10 * self.world.x_semidim,
        )

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        is_last = agent is self.world.agents[-1]

        if is_first:
            self.time_rew = jnp.full(
                (self.world.batch_dim,), self.time_penalty, jnp.float32
            )
            self._agents_pos = jnp.stack(
                [a.state.pos for a in self.world.agents], axis=1
            )
            self._targets_pos = jnp.stack(
                [t.state.pos for t in self._targets], axis=1
            )
            self._agents_targets_dists = jnp.linalg.norm(
                self._agents_pos[:, :, None] - self._targets_pos[:, None],
                axis=-1,
            )
            agents_per_target = jnp.sum(
                (self._agents_targets_dists < self._covering_range).astype(
                    jnp.int32
                ),
                axis=1,
            )
            self.covered_targets = (
                agents_per_target >= self._agents_per_target
            )

            shared = jnp.zeros((self.world.batch_dim,), jnp.float32)
            for a in self.world.agents:
                shared = shared + self.agent_reward(a)
            self.shared_covering_rew = jnp.where(
                shared != 0, shared / 2, shared
            )

        agent.collision_rew = jnp.zeros((self.world.batch_dim,), jnp.float32)
        for a in self.world.agents:
            if a is not agent:
                agent.collision_rew = agent.collision_rew + jnp.where(
                    self.world.get_distance(a, agent)
                    < self.min_collision_distance,
                    self.agent_collision_penalty,
                    0.0,
                )

        if is_last:
            if self.targets_respawn:
                # All covered targets replaced in ONE batched spawner call
                # (single while_loop; uncovered targets keep their position
                # and still block the new placements) — the reference's
                # per-target rejection loops serialized 7 while_loops per
                # step and dominated the whole scenario's step time.
                new_pos = ScenarioUtils.find_random_positions_for_entities(
                    self._agents_pos,
                    len(self._targets),
                    self.world,
                    self._min_dist_between_entities,
                    (-self.world.x_semidim, self.world.x_semidim),
                    (-self.world.y_semidim, self.world.y_semidim),
                    current_positions=self._targets_pos,
                    replace_mask=self.covered_targets,
                    # Per-step path: usually <=1 target per env respawns, so
                    # keep the per-round proposal block small (the accepted
                    # distribution is K-independent; see the spawner doc).
                    proposals_per_round=4,
                )
                for i, target in enumerate(self._targets):
                    target.set_pos(new_pos[:, i])
            else:
                self.all_time_covered_targets = (
                    self.all_time_covered_targets | self.covered_targets
                )
                outside = self.get_outside_pos(None)
                for i, target in enumerate(self._targets):
                    target.set_pos(
                        jnp.where(
                            self.covered_targets[:, i][:, None],
                            outside,
                            target.state.pos,
                        )
                    )
        covering_rew = (
            agent.covering_reward
            if not self.shared_reward
            else self.shared_covering_rew
        )
        return agent.collision_rew + covering_rew + self.time_rew

    def agent_reward(self, agent):
        agent_index = self.world.agents.index(agent)
        targets_covered_by_agent = (
            self._agents_targets_dists[:, agent_index] < self._covering_range
        )
        num_covered = jnp.sum(
            targets_covered_by_agent & self.covered_targets, axis=-1
        )
        agent.covering_reward = (
            num_covered.astype(jnp.float32) * self.covering_rew_coeff
        )
        return agent.covering_reward

    def observation(self, agent):
        lidar_1_measures = agent.sensors[0].measure()
        return jnp.concatenate(
            [agent.state.pos, agent.state.vel, lidar_1_measures]
            + ([agent.sensors[1].measure()] if self.use_agent_lidar else []),
            axis=-1,
        )

    def info(self, agent):
        return {
            "covering_reward": (
                agent.covering_reward
                if not self.shared_reward
                else self.shared_covering_rew
            ),
            "collision_rew": agent.collision_rew,
            "targets_covered": jnp.sum(self.covered_targets, axis=-1),
        }

    def done(self):
        return jnp.all(self.all_time_covered_targets, axis=-1)

    def extra_render(self, env_index: int = 0):
        from vectorizedmultiagentsimulator_tpu import render as rendering

        geoms = []
        for target in self._targets:
            range_circle = rendering.make_circle(
                self._covering_range, filled=False
            )
            xform = rendering.Transform()
            xform.set_translation(
                *np.asarray(target.state.pos)[env_index]
            )
            range_circle.add_attr(xform)
            range_circle.set_color(*self.target_color.value)
            geoms.append(range_circle)
        for i, agent1 in enumerate(self.world.agents):
            for j, agent2 in enumerate(self.world.agents):
                if j <= i:
                    continue
                agent_dist = jnp.linalg.norm(
                    agent1.state.pos - agent2.state.pos, axis=-1
                )
                if float(agent_dist[env_index]) <= self._comms_range:
                    line = rendering.Line(
                        tuple(np.asarray(agent1.state.pos)[env_index]),
                        tuple(np.asarray(agent2.state.pos)[env_index]),
                        width=0.005,
                    )
                    line.set_color(*Color.BLACK.value)
                    geoms.append(line)
        return geoms


class HeuristicPolicy(BaseHeuristicPolicy):
    """Circle-sweep with target attraction / agent repulsion
    (discovery.py:303-356)."""

    def compute_action(self, observation, u_range):
        assert self.continuous_actions
        circle_origin = jnp.zeros((1, 2))
        circle_radius = 0.75
        current_pos = observation[:, :2]
        v = current_pos - circle_origin
        closest_point_on_circ = (
            circle_origin
            + v
            / jnp.maximum(jnp.linalg.norm(v, axis=1), 1e-12)[:, None]
            * circle_radius
        )
        normal = jnp.stack(
            [closest_point_on_circ[:, Y], -closest_point_on_circ[:, X]],
            axis=1,
        )
        normal = (
            normal
            / jnp.maximum(jnp.linalg.norm(normal, axis=1), 1e-12)[:, None]
            * 0.1
        )
        des_pos = closest_point_on_circ + normal

        lidar_targets = observation[:, 4:19]
        target_visible = jnp.any(lidar_targets < 0.3, axis=1)
        target_dir_index = jnp.argmin(lidar_targets, axis=1)
        target_dir = target_dir_index / lidar_targets.shape[1] * 2 * jnp.pi
        target_vec = jnp.stack(
            [jnp.cos(target_dir), jnp.sin(target_dir)], axis=1
        )
        des_pos_target = current_pos + target_vec * 0.1
        des_pos = jnp.where(target_visible[:, None], des_pos_target, des_pos)

        if observation.shape[-1] > 19:
            lidar_agents = observation[:, 19:31]
            agent_visible = jnp.any(lidar_agents < 0.15, axis=1)
            agent_dir_index = jnp.argmin(lidar_agents, axis=1)
            agent_dir = agent_dir_index / lidar_agents.shape[1] * 2 * jnp.pi
            agent_vec = jnp.stack(
                [jnp.cos(agent_dir), jnp.sin(agent_dir)], axis=1
            )
            des_pos_agent = current_pos - agent_vec * 0.1
            des_pos = jnp.where(
                agent_visible[:, None], des_pos_agent, des_pos
            )
        return jnp.clip((des_pos - current_pos) * 10, -u_range, u_range)
