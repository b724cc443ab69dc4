"""MPE simple_push (reference ``vmas/scenarios/mpe/simple_push.py``).

One good agent, one adversary, two landmarks.  The good agent seeks its
(secret) goal landmark; the adversary is rewarded for keeping the good
agent away from it while staying near it.

Jit-native deviation: per-env ``goal_index`` array replaces the reference's
whole-batch python randint goal choice (simple_push.py:57-60); landmark
and goal colors enter the observation from a static color table gathered
per env.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core import Agent, Landmark, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import JaxUtils, ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        ScenarioUtils.check_kwargs_consumed(kwargs)
        world = World(batch_dim)
        num_agents = 2
        num_adversaries = 1
        num_landmarks = 2
        for i in range(num_agents):
            adversary = i < num_adversaries
            name = (
                f"adversary_{i}" if adversary else f"agent_{i - num_adversaries}"
            )
            world.add_agent(
                Agent(name=name, collide=True, adversary=adversary)
            )
        # landmark i gets color [0.1,0.1,0.1] + 0.8 on channel i+1
        self._landmark_colors = np.full((num_landmarks, 3), 0.1, np.float32)
        for i in range(num_landmarks):
            self._landmark_colors[i, (i + 1) % 3] += 0.8
            world.add_landmark(
                Landmark(
                    name=f"landmark {i}",
                    collide=False,
                    color=tuple(self._landmark_colors[i]),
                )
            )
        return world

    def _goal_pos(self):
        landmark_pos = jnp.stack(
            [l.state.pos for l in self.world.landmarks], axis=1
        )
        return JaxUtils.select_by_index(landmark_pos, self.goal_index)

    def reset_world_at(self, env_index=None):
        if env_index is None:
            self.goal_index = jax.random.randint(
                self.world.next_key(),
                (self.world.batch_dim,),
                0,
                len(self.world.landmarks),
            )
        for entity in self.world.agents + self.world.landmarks:
            entity.set_pos(
                ScenarioUtils.uniform_in_bounds(self.world, -1.0, 1.0),
                batch_index=env_index,
            )

    def reward(self, agent):
        return (
            self.adversary_reward(agent)
            if agent.adversary
            else self.agent_reward(agent)
        )

    def agent_reward(self, agent):
        return -jnp.linalg.norm(agent.state.pos - self._goal_pos(), axis=-1)

    def adversary_reward(self, agent):
        goal_pos = self._goal_pos()
        pos_rew = jnp.min(
            jnp.stack(
                [
                    jnp.linalg.norm(a.state.pos - goal_pos, axis=-1)
                    for a in self.world.agents
                    if not a.adversary
                ],
                axis=1,
            ),
            axis=-1,
        )
        neg_rew = -jnp.linalg.norm(goal_pos - agent.state.pos, axis=-1)
        return pos_rew + neg_rew

    def observation(self, agent):
        B = self.world.batch_dim
        entity_pos = [
            entity.state.pos - agent.state.pos
            for entity in self.world.landmarks
        ]
        color_table = jnp.asarray(self._landmark_colors)  # [L, 3]
        entity_color = [
            jnp.broadcast_to(color_table[i][None], (B, 3))
            for i in range(len(self.world.landmarks))
        ]
        other_pos = [
            other.state.pos - agent.state.pos
            for other in self.world.agents
            if other is not agent
        ]
        if not agent.adversary:
            # agent color tinted toward its goal's color (per-env gather)
            agent_color = (
                jnp.full((B, 3), 0.25)
                .at[jnp.arange(B), (self.goal_index + 1) % 3]
                .add(0.5)
            )
            return jnp.concatenate(
                [
                    agent.state.vel,
                    self._goal_pos() - agent.state.pos,
                    agent_color,
                    *entity_pos,
                    *entity_color,
                    *other_pos,
                ],
                axis=-1,
            )
        return jnp.concatenate(
            [agent.state.vel, *entity_pos, *other_pos], axis=-1
        )
