"""MPE simple_speaker_listener (reference
``vmas/scenarios/mpe/simple_speaker_listener.py``).

An immovable speaker (dim_c=3, silent=False) observes the listener's goal
landmark color and must communicate it; the movable, silent listener is
rewarded for reaching the goal.

Jit-native deviation: per-env ``goal_index`` array replaces the reference's
whole-batch python randint (simple_speaker_listener.py:49-52).
"""
import jax
import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core import Agent, Landmark, Sphere, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import JaxUtils, ScenarioUtils

_LANDMARK_COLORS = np.asarray(
    [[0.65, 0.15, 0.15], [0.15, 0.65, 0.15], [0.15, 0.15, 0.65]], np.float32
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        ScenarioUtils.check_kwargs_consumed(kwargs)
        world = World(batch_dim, dim_c=3)
        for i in range(2):
            speaker = i == 0
            world.add_agent(
                Agent(
                    name="speaker_0" if speaker else "listener_0",
                    collide=False,
                    movable=not speaker,
                    silent=not speaker,
                    shape=Sphere(radius=0.075),
                )
            )
        for i in range(3):
            world.add_landmark(
                Landmark(
                    name=f"landmark {i}",
                    collide=False,
                    shape=Sphere(radius=0.04),
                    color=tuple(_LANDMARK_COLORS[i]),
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
            self.rew = jnp.zeros((self.world.batch_dim,), jnp.float32)
        for entity in self.world.agents + self.world.landmarks:
            entity.set_pos(
                ScenarioUtils.uniform_in_bounds(self.world, -1.0, 1.0),
                batch_index=env_index,
            )

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            listener = self.world.agents[1]
            dist = jnp.linalg.norm(
                listener.state.pos - self._goal_pos(), axis=-1
            )
            # Reference sums the same term once per agent
            # (simple_speaker_listener.py:121-129).
            self.rew = -dist * len(self.world.agents)
        return self.rew

    def observation(self, agent):
        goal_color = jnp.asarray(_LANDMARK_COLORS)[self.goal_index]  # [B,3]
        entity_pos = [
            entity.state.pos - agent.state.pos
            for entity in self.world.landmarks
        ]
        comm = [
            other.state.c
            for other in self.world.agents
            if other is not agent and other.state.c is not None
        ]
        if not agent.movable:  # speaker
            return goal_color
        return jnp.concatenate([agent.state.vel, *entity_pos, *comm], axis=-1)
