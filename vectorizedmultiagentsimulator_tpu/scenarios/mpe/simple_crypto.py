"""MPE simple_crypto (reference ``vmas/scenarios/mpe/simple_crypto.py``).

Alice (speaker) must communicate a binary secret to Bob using a shared
binary key, while Eve (adversary) eavesdrops.  All agents are immovable and
non-colliding; the task is purely communicative (dim_c=4 by default).
"""
import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import Agent, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        dim_c = kwargs.pop("dim_c", 4)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert dim_c > 0
        self._dim_c = dim_c

        world = World(batch_dim, dim_c=dim_c)
        num_agents = 3
        num_adversaries = 1
        for i in range(num_agents):
            adversary = i < num_adversaries
            speaker = i == 2
            agent = Agent(
                name=(
                    "eve_0" if adversary else ("alice_0" if speaker else "bob_0")
                ),
                collide=False,
                movable=False,
                color=(
                    Color.RED
                    if adversary
                    else (Color.GREEN if speaker else Color.BLUE)
                ),
                adversary=adversary,
                silent=False,
            )
            agent.speaker = speaker
            world.add_agent(agent)
        return world

    def reset_world_at(self, env_index=None):
        k1, k2 = jax.random.split(self.world.next_key())
        B = self.world.batch_dim
        key = jax.random.randint(
            k1, (B, self._dim_c), 0, 2
        ).astype(jnp.float32)
        secret = jax.random.randint(
            k2, (B, self._dim_c), 0, 2
        ).astype(jnp.float32)
        if env_index is None:
            self.key = key
            self.secret = secret
            for agent in self.world.agents:
                agent.set_pos(
                    ScenarioUtils.uniform_in_bounds(self.world, -1.0, 1.0),
                    batch_index=env_index,
                )
        else:
            self.key = JaxUtils.where_from_index(env_index, key, self.key)
            self.secret = JaxUtils.where_from_index(
                env_index, secret, self.secret
            )

    def good_listeners(self):
        return [
            a for a in self.world.agents if not a.adversary and not a.speaker
        ]

    def good_agents(self):
        return [a for a in self.world.agents if not a.adversary]

    def adversaries(self):
        return [a for a in self.world.agents if a.adversary]

    def reward(self, agent):
        return (
            self.adversary_reward(agent)
            if agent.adversary
            else self.agent_reward(agent)
        )

    def _comm_error(self, a):
        """-(c - secret)^2 summed, gated to zero while comms are all-zero
        (simple_crypto.py:119-146)."""
        zero_comms = jnp.all(a.state.c == 0.0, axis=-1)
        err = jnp.sum(jnp.square(a.state.c - self.secret), axis=-1)
        return jnp.where(zero_comms, 0.0, err)

    def agent_reward(self, agent):
        good_rew = -sum(self._comm_error(a) for a in self.good_listeners())
        adv_rew = sum(self._comm_error(a) for a in self.adversaries())
        return adv_rew + good_rew

    def adversary_reward(self, agent):
        return -self._comm_error(agent)

    def observation(self, agent):
        comm = [
            other.state.c
            for other in self.world.agents
            if other is not agent and other.speaker
        ]
        if agent.speaker:
            return jnp.concatenate([self.secret, self.key], axis=-1)
        if not agent.adversary:
            return jnp.concatenate([self.key, *comm], axis=-1)
        return jnp.concatenate([*comm], axis=-1)
