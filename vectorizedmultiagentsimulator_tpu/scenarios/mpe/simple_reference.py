"""MPE simple_reference (reference ``vmas/scenarios/mpe/simple_reference.py``).

Two communicating agents (dim_c=10), three landmarks.  Each agent's target
landmark is known only to the *other* agent, so they must communicate.
Shared reward: negative sum of distances of each agent to its (secret)
goal landmark.

Jit-native deviation: per-env ``goal_index_{0,1}`` arrays replace the
reference's whole-batch python randint goal assignment
(simple_reference.py:41-48); goal colors in the obs are gathered from the
static landmark color table.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core import Agent, Landmark, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import JaxUtils, ScenarioUtils

_LANDMARK_COLORS = np.asarray(
    [[0.75, 0.25, 0.25], [0.25, 0.75, 0.25], [0.25, 0.25, 0.75]], np.float32
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        ScenarioUtils.check_kwargs_consumed(kwargs)
        world = World(batch_dim, dim_c=10)
        for i in range(2):
            world.add_agent(
                Agent(name=f"agent_{i}", collide=False, silent=False)
            )
        for i in range(3):
            world.add_landmark(
                Landmark(
                    name=f"landmark {i}",
                    collide=False,
                    color=tuple(_LANDMARK_COLORS[i]),
                )
            )
        return world

    def _landmark_pos(self):
        return jnp.stack([l.state.pos for l in self.world.landmarks], axis=1)

    def _goal_pos(self, agent_idx: int):
        idx = self.goal_index_0 if agent_idx == 0 else self.goal_index_1
        return JaxUtils.select_by_index(self._landmark_pos(), idx)

    def reset_world_at(self, env_index=None):
        if env_index is None:
            k0, k1 = jax.random.split(self.world.next_key())
            B = self.world.batch_dim
            L = len(self.world.landmarks)
            # goal_index_i is the landmark agent (1-i) must reach (agent i
            # observes it and communicates it).
            self.goal_index_0 = jax.random.randint(k0, (B,), 0, L)
            self.goal_index_1 = jax.random.randint(k1, (B,), 0, L)
            self.rew = jnp.zeros((B,), jnp.float32)
        for entity in self.world.agents + self.world.landmarks:
            entity.set_pos(
                ScenarioUtils.uniform_in_bounds(self.world, -1.0, 1.0),
                batch_index=env_index,
            )

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            # agent_0's goal_a is agent_1 (reaches goal_index_0), and vice
            # versa (simple_reference.py:41-48).
            rew = -jnp.linalg.norm(
                self.world.agents[1].state.pos - self._goal_pos(0), axis=-1
            ) - jnp.linalg.norm(
                self.world.agents[0].state.pos - self._goal_pos(1), axis=-1
            )
            self.rew = rew
        return self.rew

    def observation(self, agent):
        agent_idx = self.world.agents.index(agent)
        idx = self.goal_index_0 if agent_idx == 0 else self.goal_index_1
        goal_color = jnp.asarray(_LANDMARK_COLORS)[idx]  # [B, 3]
        entity_pos = [
            entity.state.pos - agent.state.pos
            for entity in self.world.landmarks
        ]
        comm = [
            other.state.c
            for other in self.world.agents
            if other is not agent
        ]
        return jnp.concatenate(
            [agent.state.vel, *entity_pos, goal_color, *comm], axis=-1
        )
