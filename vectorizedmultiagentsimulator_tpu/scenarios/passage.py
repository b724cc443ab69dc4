"""Passage scenario (reference ``vmas/scenarios/passage.py``).

A 5-agent cross formation must traverse a wall of box segments with
``n_passages`` random openings and reassemble on the other side.

Jit-native deviation: the reference shuffles agent/goal slot assignment and
passage placement with python ``randperm`` shared across the batch
(passage.py:112-115,180-182); here both permutations are drawn per env with
``jax.random.permutation`` — same distribution, fully vectorized.
"""
import jax
import jax.numpy as jnp
import numpy as np

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
        self.n_passages = kwargs.pop("n_passages", 1)
        self.shared_reward = kwargs.pop("shared_reward", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert 1 <= self.n_passages <= 20

        self.shaping_factor = 100
        self.n_agents = 5
        self.agent_radius = 0.03333
        self.agent_spacing = 0.1
        self.passage_width = 0.2
        self.passage_length = 0.103
        self.visualize_semidims = False

        world = World(batch_dim, x_semidim=1, y_semidim=1)
        for i in range(self.n_agents):
            agent = Agent(
                name=f"agent_{i}",
                shape=Sphere(self.agent_radius),
                u_multiplier=0.7,
            )
            world.add_agent(agent)
            goal = Landmark(
                name=f"goal {i}",
                collide=False,
                shape=Sphere(radius=self.agent_radius),
                color=Color.LIGHT_GREEN,
            )
            agent.goal = goal
            world.add_landmark(goal)
        self.n_boxes = int(
            (2 * world.x_semidim + 2 * self.agent_radius) // self.passage_length
        )
        for i in range(self.n_boxes):
            removed = i < self.n_passages
            world.add_landmark(
                Landmark(
                    name=f"passage {i}",
                    collide=not removed,
                    movable=False,
                    shape=Box(
                        length=self.passage_length, width=self.passage_width
                    ),
                    color=Color.RED,
                    collision_filter=lambda e: not isinstance(e.shape, Box),
                )
            )
        return world

    # Formation slot offsets (passage.py:125-175): cross around the center.
    def _slot_offsets(self):
        s = self.agent_spacing
        return jnp.asarray(
            [[s, 0.0], [0.0, s], [-s, 0.0], [0.0, -s], [0.0, 0.0]],
            dtype=jnp.float32,
        )

    def _passages(self):
        return self.world.landmarks[self.n_agents :]

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        keys = jax.random.split(self.world.next_key(), 6)
        m = 3 * self.agent_radius + self.agent_spacing
        central_agent_pos = jnp.concatenate(
            [
                jax.random.uniform(keys[0], (B, 1), minval=-1 + m, maxval=1 - m),
                jax.random.uniform(
                    keys[1],
                    (B, 1),
                    minval=-1 + m,
                    maxval=-m - self.passage_width / 2,
                ),
            ],
            axis=1,
        )
        central_goal_pos = jnp.concatenate(
            [
                jax.random.uniform(keys[2], (B, 1), minval=-1 + m, maxval=1 - m),
                jax.random.uniform(
                    keys[3],
                    (B, 1),
                    minval=m + self.passage_width / 2,
                    maxval=1 - m,
                ),
            ],
            axis=1,
        )

        # Per-env slot permutation for agents+goals (same perm for both).
        perm = jax.vmap(lambda k: jax.random.permutation(k, self.n_agents))(
            jax.random.split(keys[4], B)
        )  # [B, n_agents]
        offsets = self._slot_offsets()  # [n_agents, 2]
        for j, (agent, goal) in enumerate(
            zip(self.world.agents, [a.goal for a in self.world.agents])
        ):
            slot = offsets[perm[:, j]]  # [B, 2]
            agent.set_pos(central_agent_pos + slot, batch_index=env_index)
            goal.set_pos(central_goal_pos + slot, batch_index=env_index)

        for agent in self.world.agents:
            global_shaping = (
                jnp.linalg.norm(
                    agent.state.pos - agent.goal.state.pos, axis=1
                )
                * self.shaping_factor
            )
            if env_index is None:
                agent.global_shaping = global_shaping
            else:
                agent.global_shaping = JaxUtils.where_from_index(
                    env_index, global_shaping, agent.global_shaping
                )

        # Per-env passage placement permutation.
        perm_p = jax.vmap(lambda k: jax.random.permutation(k, self.n_boxes))(
            jax.random.split(keys[5], B)
        )  # [B, n_boxes]
        slot_x = jnp.asarray(
            [
                -1
                - self.agent_radius
                + self.passage_length / 2
                + self.passage_length * i
                for i in range(self.n_boxes)
            ],
            dtype=jnp.float32,
        )
        for i, passage in enumerate(self._passages()):
            if not passage.collide:
                passage.is_rendering = jnp.zeros((B,), dtype=bool)
            x = slot_x[perm_p[:, i]]
            passage.set_pos(
                jnp.stack([x, jnp.zeros_like(x)], axis=1),
                batch_index=env_index,
            )
        if env_index is None:
            self.rew = jnp.zeros((B,), jnp.float32)

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if self.shared_reward:
            if is_first:
                rew = jnp.zeros((self.world.batch_dim,), jnp.float32)
                for a in self.world.agents:
                    dist_to_goal = jnp.linalg.norm(
                        a.state.pos - a.goal.state.pos, axis=1
                    )
                    agent_shaping = dist_to_goal * self.shaping_factor
                    rew = rew + (a.global_shaping - agent_shaping)
                    a.global_shaping = agent_shaping
                self.rew = rew
            rew = self.rew
        else:
            dist_to_goal = jnp.linalg.norm(
                agent.state.pos - agent.goal.state.pos, axis=1
            )
            agent_shaping = dist_to_goal * self.shaping_factor
            rew = agent.global_shaping - agent_shaping
            agent.global_shaping = agent_shaping

        if agent.collide:
            for a in self.world.agents:
                if a is not agent:
                    rew = rew - jnp.where(
                        self.world.is_overlapping(a, agent), 10.0, 0.0
                    )
            for landmark in self._passages():
                if landmark.collide:
                    rew = rew - jnp.where(
                        self.world.is_overlapping(agent, landmark), 10.0, 0.0
                    )
        if self.shared_reward:
            # Penalties accumulate into the shared buffer across agent calls,
            # matching the reference's in-place writes (passage.py:231-239).
            self.rew = rew
        return rew

    def observation(self, agent):
        passage_obs = [
            passage.state.pos - agent.state.pos
            for passage in self._passages()
            if not passage.collide
        ]
        return jnp.concatenate(
            [
                agent.state.pos,
                agent.state.vel,
                agent.goal.state.pos - agent.state.pos,
                *passage_obs,
            ],
            axis=-1,
        )

    def done(self):
        return jnp.all(
            jnp.stack(
                [
                    jnp.linalg.norm(a.state.pos - a.goal.state.pos, axis=1)
                    <= a.shape.radius / 2
                    for a in self.world.agents
                ],
                axis=1,
            ),
            axis=1,
        )

    def extra_render(self, env_index: int = 0):
        from vectorizedmultiagentsimulator_tpu import render as rendering

        geoms = []
        length = 2 + self.agent_radius * 2
        offset = self.world.x_semidim + self.agent_radius
        for i in range(4):
            geom = rendering.make_line(length)
            xform = rendering.Transform()
            geom.add_attr(xform)
            xform.set_translation(
                0.0 if i % 2 else (offset if i == 0 else -offset),
                0.0 if not i % 2 else (offset if i == 1 else -offset),
            )
            xform.set_rotation(np.pi / 2 if not i % 2 else 0.0)
            geom.set_color(*Color.BLACK.value)
            geoms.append(geom)
        return geoms
