"""MPE simple_adversary (reference ``vmas/scenarios/mpe/simple_adversary.py``).

n_agents total (first n_adversaries adversarial); n_agents-1 landmarks, one
of which is the secret goal.  Good agents are rewarded for the closest good
agent's proximity to the goal and the adversaries' distance from it;
adversaries for their own proximity.

Jit-native deviation: the reference picks ONE goal landmark per full reset
with python RNG shared across the whole batch
(simple_adversary.py:54-60); here the goal index is a per-env int array in
the state pytree, sampled at full reset and persisted across partial
resets — the same episode semantics, vectorized.
"""
import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import Agent, Landmark, Sphere, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import JaxUtils, Color, ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 3)
        n_adversaries = kwargs.pop("n_adversaries", 1)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert n_agents > n_adversaries

        world = World(batch_dim)
        num_landmarks = n_agents - 1
        for i in range(n_agents):
            adversary = i < n_adversaries
            name = (
                f"adversary_{i}" if adversary else f"agent_{i - n_adversaries}"
            )
            world.add_agent(
                Agent(
                    name=name,
                    collide=False,
                    shape=Sphere(radius=0.15),
                    color=Color.RED if adversary else Color.BLUE,
                    adversary=adversary,
                )
            )
        for i in range(num_landmarks):
            world.add_landmark(
                Landmark(
                    name=f"landmark {i}",
                    collide=False,
                    shape=Sphere(radius=0.08),
                    color=Color.BLACK,
                )
            )
        return world

    def _goal_pos(self):
        """Per-env goal landmark position [B, 2]."""
        landmark_pos = jnp.stack(
            [l.state.pos for l in self.world.landmarks], axis=1
        )  # [B, L, 2]
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

    def good_agents(self):
        return [agent for agent in self.world.agents if not agent.adversary]

    def adversaries(self):
        return [agent for agent in self.world.agents if agent.adversary]

    def reward(self, agent):
        return (
            self.adversary_reward(agent)
            if agent.adversary
            else self.agent_reward(agent)
        )

    def agent_reward(self, agent):
        goal_pos = self._goal_pos()
        adv_rew = jnp.sum(
            jnp.stack(
                [
                    jnp.linalg.norm(a.state.pos - goal_pos, axis=-1)
                    for a in self.adversaries()
                ],
                axis=1,
            ),
            axis=-1,
        )
        pos_rew = -jnp.min(
            jnp.stack(
                [
                    jnp.linalg.norm(a.state.pos - goal_pos, axis=-1)
                    for a in self.good_agents()
                ],
                axis=1,
            ),
            axis=-1,
        )
        return pos_rew + adv_rew

    def adversary_reward(self, agent):
        return -jnp.linalg.norm(agent.state.pos - self._goal_pos(), axis=-1)

    def observation(self, agent):
        entity_pos = [
            entity.state.pos - agent.state.pos
            for entity in self.world.landmarks
        ]
        other_pos = [
            other.state.pos - agent.state.pos
            for other in self.world.agents
            if other is not agent
        ]
        if not agent.adversary:
            return jnp.concatenate(
                [self._goal_pos() - agent.state.pos, *entity_pos, *other_pos],
                axis=-1,
            )
        return jnp.concatenate([*entity_pos, *other_pos], axis=-1)
