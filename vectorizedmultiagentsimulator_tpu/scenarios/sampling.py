"""Sampling scenario (reference ``vmas/scenarios/sampling.py``).

Agents collect reward by visiting unvisited cells of a discretized
Gaussian-mixture density field; each cell pays its (normalized) pdf value
once.
"""
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core import Agent, Entity, Sphere, World
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
        self.n_agents = kwargs.pop("n_agents", 3)
        self.shared_rew = kwargs.pop("shared_rew", True)
        self.comms_range = kwargs.pop("comms_range", 0.0)
        self.lidar_range = kwargs.pop("lidar_range", 0.2)
        self.agent_radius = kwargs.pop("agent_radius", 0.025)
        self.xdim = kwargs.pop("xdim", 1)
        self.ydim = kwargs.pop("ydim", 1)
        self.grid_spacing = kwargs.pop("grid_spacing", 0.05)
        self.n_gaussians = kwargs.pop("n_gaussians", 3)
        self.cov = kwargs.pop("cov", 0.05)
        self.collisions = kwargs.pop("collisions", True)
        self.spawn_same_pos = kwargs.pop("spawn_same_pos", False)
        self.norm = kwargs.pop("norm", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        assert not (self.spawn_same_pos and self.collisions)
        assert (self.xdim / self.grid_spacing) % 1 == 0 and (
            self.ydim / self.grid_spacing
        ) % 1 == 0
        self.covs = (
            [self.cov] * self.n_gaussians
            if isinstance(self.cov, float)
            else self.cov
        )
        assert len(self.covs) == self.n_gaussians

        self.plot_grid = False
        self.visualize_semidims = False
        self.n_x_cells = int((2 * self.xdim) / self.grid_spacing)
        self.n_y_cells = int((2 * self.ydim) / self.grid_spacing)
        self.alpha_plot = 0.5

        self.agent_xspawn_range = 0 if self.spawn_same_pos else self.xdim
        self.agent_yspawn_range = 0 if self.spawn_same_pos else self.ydim
        self.x_semidim = self.xdim - self.agent_radius
        self.y_semidim = self.ydim - self.agent_radius

        world = World(
            batch_dim, x_semidim=self.x_semidim, y_semidim=self.y_semidim
        )
        entity_filter_agents: Callable[[Entity], bool] = lambda e: isinstance(
            e, Agent
        )
        for i in range(self.n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}",
                    render_action=True,
                    collide=self.collisions,
                    shape=Sphere(radius=self.agent_radius),
                    sensors=(
                        [
                            Lidar(
                                world,
                                angle_start=0.05,
                                angle_end=2 * np.pi + 0.05,
                                n_rays=12,
                                max_range=self.lidar_range,
                                entity_filter=entity_filter_agents,
                            )
                        ]
                        if self.collisions
                        else None
                    ),
                )
            )
        return world

    # ------------------------------------------------------------------ #
    # Gaussian mixture field
    # ------------------------------------------------------------------ #
    def _pdf(self, pos):
        """Unnormalized mixture pdf at ``pos`` [..., 2] given per-env means
        in ``self.locs`` [B, n_gaussians, 2] (diagonal covariances)."""
        locs = self.locs  # [B, G, 2]
        covs = jnp.asarray(self.covs, jnp.float32)  # [G]
        # pos [B, 2] -> [B, 1, 2]
        diff = pos[:, None, :] - locs  # [B, G, 2]
        exponent = -0.5 * jnp.sum(diff**2, axis=-1) / covs[None]
        dens = jnp.exp(exponent) / (2 * jnp.pi * covs[None])
        return jnp.sum(dens, axis=-1)  # [B]

    def sample(self, pos, update_sampled_flag: bool = False, norm: bool = True):
        out_of_bounds = (
            (pos[:, X] < -self.xdim)
            | (pos[:, X] > self.xdim)
            | (pos[:, Y] < -self.ydim)
            | (pos[:, Y] > self.ydim)
        )
        pos = jnp.stack(
            [
                jnp.clip(pos[:, X], -self.world.x_semidim, self.world.x_semidim),
                jnp.clip(pos[:, Y], -self.world.y_semidim, self.world.y_semidim),
            ],
            axis=-1,
        )
        index = pos / self.grid_spacing
        index = index.at[:, X].add(self.n_x_cells / 2)
        index = index.at[:, Y].add(self.n_y_cells / 2)
        index = index.astype(jnp.int32)

        v = self._pdf(pos)
        if norm:
            v = v / self.max_pdf

        B = self.world.batch_dim
        sampled = self.sampled[jnp.arange(B), index[:, 0], index[:, 1]]
        v = jnp.where(sampled | out_of_bounds, 0.0, v)
        if update_sampled_flag:
            self.sampled = self.sampled.at[
                jnp.arange(B), index[:, 0], index[:, 1]
            ].set(True)
        return v

    def _grid_pos(self):
        xpoints = np.arange(-self.xdim, self.xdim, self.grid_spacing)
        ypoints = np.arange(-self.ydim, self.ydim, self.grid_spacing)
        xg, yg = np.meshgrid(xpoints, ypoints)
        return jnp.asarray(
            np.stack([xg.ravel(), yg.ravel()], axis=-1), jnp.float32
        )  # [P, 2]

    def normalize_pdf(self):
        grid = self._grid_pos()  # [P, 2]
        locs = self.locs  # [B, G, 2]
        covs = jnp.asarray(self.covs, jnp.float32)
        diff = grid[None, :, None, :] - locs[:, None, :, :]  # [B, P, G, 2]
        exponent = -0.5 * jnp.sum(diff**2, axis=-1) / covs[None, None]
        dens = jnp.exp(exponent) / (2 * jnp.pi * covs[None, None])
        pdf = jnp.sum(dens, axis=-1)  # [B, P]
        return jnp.max(pdf, axis=-1)  # [B]

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        new_locs = jax.random.uniform(
            self.world.next_key(),
            (B, self.n_gaussians, 2),
            minval=jnp.asarray([-self.xdim, -self.ydim], jnp.float32),
            maxval=jnp.asarray([self.xdim, self.ydim], jnp.float32),
        )
        if env_index is None:
            self.locs = new_locs
            self.sampled = jnp.zeros(
                (B, self.n_x_cells, self.n_y_cells), dtype=bool
            )
        else:
            self.locs = JaxUtils.where_from_index(
                env_index, new_locs, self.locs
            )
            self.sampled = JaxUtils.where_from_index(
                env_index, False, self.sampled
            )
        max_pdf = self.normalize_pdf()
        if env_index is None:
            self.max_pdf = max_pdf
        else:
            self.max_pdf = JaxUtils.where_from_index(
                env_index, max_pdf, self.max_pdf
            )

        kx, ky = jax.random.split(self.world.next_key())
        for agent in self.world.agents:
            kx, k1 = jax.random.split(kx)
            ky, k2 = jax.random.split(ky)
            pos = jnp.concatenate(
                [
                    jax.random.uniform(
                        k1,
                        (B, 1),
                        minval=-self.agent_xspawn_range,
                        maxval=self.agent_xspawn_range,
                    )
                    if self.agent_xspawn_range
                    else jnp.zeros((B, 1)),
                    jax.random.uniform(
                        k2,
                        (B, 1),
                        minval=-self.agent_yspawn_range,
                        maxval=self.agent_yspawn_range,
                    )
                    if self.agent_yspawn_range
                    else jnp.zeros((B, 1)),
                ],
                axis=-1,
            )
            agent.set_pos(pos, batch_index=env_index)
            agent.sample = self.sample(agent.state.pos, norm=self.norm)
        if env_index is None:
            self.sampling_rew = jnp.zeros((B,), jnp.float32)

    def reward(self, agent):
        is_first = self.world.agents.index(agent) == 0
        if is_first:
            for a in self.world.agents:
                a.sample = self.sample(
                    a.state.pos, update_sampled_flag=True, norm=self.norm
                )
            self.sampling_rew = jnp.sum(
                jnp.stack([a.sample for a in self.world.agents], axis=-1),
                axis=-1,
            )
        return self.sampling_rew if self.shared_rew else agent.sample

    def observation(self, agent):
        observations = [
            agent.state.pos,
            agent.state.vel,
            agent.sensors[0].measure(),
        ]
        for delta in [
            [self.grid_spacing, 0],
            [-self.grid_spacing, 0],
            [0, self.grid_spacing],
            [0, -self.grid_spacing],
            [-self.grid_spacing, -self.grid_spacing],
            [self.grid_spacing, -self.grid_spacing],
            [-self.grid_spacing, self.grid_spacing],
            [self.grid_spacing, self.grid_spacing],
        ]:
            pos = agent.state.pos + jnp.asarray(delta, jnp.float32)
            observations.append(
                self.sample(pos, update_sampled_flag=False)[:, None]
            )
        return jnp.concatenate(observations, axis=-1)

    def info(self, agent):
        return {"agent_sample": agent.sample}

    def density_for_plot(self, env_index):
        def f(x):
            pos = jnp.asarray(x, jnp.float32)  # [P, 2]
            locs = self.locs[env_index]  # [G, 2]
            covs = jnp.asarray(self.covs, jnp.float32)
            diff = pos[:, None, :] - locs[None]
            exponent = -0.5 * jnp.sum(diff**2, axis=-1) / covs[None]
            dens = jnp.exp(exponent) / (2 * jnp.pi * covs[None])
            v = jnp.sum(dens, axis=-1) / self.max_pdf[env_index]
            return np.asarray(v)

        return f

    def extra_render(self, env_index: int = 0):
        from vectorizedmultiagentsimulator_tpu import render as rendering
        from vectorizedmultiagentsimulator_tpu.render import (
            render_function_util,
        )

        geoms = [
            render_function_util(
                f=self.density_for_plot(env_index=env_index),
                precision=self.grid_spacing,
                plot_range=((-self.xdim, self.xdim), (-self.ydim, self.ydim)),
                cmap_alpha=self.alpha_plot,
            )
        ]
        for i, agent1 in enumerate(self.world.agents):
            for j, agent2 in enumerate(self.world.agents):
                if j <= i:
                    continue
                agent_dist = jnp.linalg.norm(
                    agent1.state.pos - agent2.state.pos, axis=-1
                )
                if float(agent_dist[env_index]) <= self.comms_range:
                    line = rendering.Line(
                        tuple(np.asarray(agent1.state.pos)[env_index]),
                        tuple(np.asarray(agent2.state.pos)[env_index]),
                        width=0.005,
                    )
                    line.set_color(*Color.BLACK.value)
                    geoms.append(line)
        for i in range(4):
            length = (
                2 * ((self.ydim if i % 2 == 0 else self.xdim) - self.agent_radius)
                + self.agent_radius * 2
            )
            geom = rendering.make_line(length)
            xform = rendering.Transform()
            geom.add_attr(xform)
            xform.set_translation(
                0.0
                if i % 2
                else (
                    self.x_semidim + self.agent_radius
                    if i == 0
                    else -self.x_semidim - self.agent_radius
                ),
                0.0
                if not i % 2
                else (
                    self.y_semidim + self.agent_radius
                    if i == 1
                    else -self.y_semidim - self.agent_radius
                ),
            )
            xform.set_rotation(np.pi / 2 if not i % 2 else 0.0)
            geom.set_color(*Color.BLACK.value)
            geoms.append(geom)
        return geoms
