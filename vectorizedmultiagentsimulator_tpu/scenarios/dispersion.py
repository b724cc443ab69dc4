"""Dispersion scenario (reference ``vmas/scenarios/dispersion.py``).

n agents spawn at the origin and must spread out to eat n food landmarks.
Persistent per-landmark buffers (``eaten``/``just_eaten``/counters) are jax
arrays stored on the entities (routed into ``state.extras``); all per-env
branching from the reference is re-expressed with ``where`` masks.
"""
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import Agent, Landmark, Sphere, World
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.share_reward = kwargs.pop("share_reward", False)
        self.penalise_by_time = kwargs.pop("penalise_by_time", False)
        self.food_radius = kwargs.pop("food_radius", 0.05)
        self.pos_range = kwargs.pop("pos_range", 1.0)
        n_food = kwargs.pop("n_food", n_agents)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(
            batch_dim,
            x_semidim=self.pos_range,
            y_semidim=self.pos_range,
        )
        for i in range(n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}",
                    collide=False,
                    shape=Sphere(radius=0.035),
                )
            )
        for i in range(n_food):
            world.add_landmark(
                Landmark(
                    name=f"food_{i}",
                    collide=False,
                    shape=Sphere(radius=self.food_radius),
                    color=Color.GREEN,
                )
            )
        return world

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        for agent in self.world.agents:
            agent.set_pos(
                jnp.zeros((self.world.dim_p,), dtype=jnp.float32),
                batch_index=env_index,
            )
        for landmark in self.world.landmarks:
            key = self.world.next_key()
            import jax

            pos = jax.random.uniform(
                key,
                (B, self.world.dim_p),
                minval=-self.pos_range,
                maxval=self.pos_range,
            )
            landmark.set_pos(pos, batch_index=env_index)
            if env_index is None:
                landmark.eaten = jnp.zeros((B,), dtype=bool)
                landmark.just_eaten = jnp.zeros((B,), dtype=bool)
                # Buffers written by reward() — initialized here so the
                # state pytree structure is complete before the first step.
                landmark.how_many_on_food = jnp.zeros((B,), dtype=jnp.int32)
                landmark.reset_render()
            else:
                landmark.eaten = JaxUtils.where_from_index(
                    env_index, False, landmark.eaten
                )
                landmark.just_eaten = JaxUtils.where_from_index(
                    env_index, False, landmark.just_eaten
                )
                landmark.is_rendering = JaxUtils.where_from_index(
                    env_index, True, landmark.is_rendering
                )

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        is_last = agent is self.world.agents[-1]
        B = self.world.batch_dim
        rews = jnp.zeros((B,), dtype=jnp.float32)

        for landmark in self.world.landmarks:
            if is_first:
                on_food_count = jnp.stack(
                    [
                        jnp.linalg.norm(
                            a.state.pos - landmark.state.pos, axis=1
                        )
                        < a.shape.radius + landmark.shape.radius
                        for a in self.world.agents
                    ],
                    axis=1,
                ).sum(axis=-1)
                landmark.how_many_on_food = on_food_count.astype(jnp.int32)
                anyone_on_food = on_food_count > 0
                landmark.just_eaten = landmark.just_eaten | anyone_on_food

            if self.share_reward:
                rews = rews + jnp.where(
                    landmark.just_eaten & ~landmark.eaten, 1.0, 0.0
                )
            else:
                on_food = (
                    jnp.linalg.norm(agent.state.pos - landmark.state.pos, axis=1)
                    < agent.shape.radius + landmark.shape.radius
                )
                count = landmark.how_many_on_food.astype(jnp.float32)
                eating_rew = jnp.where(count > 0, 1.0 / jnp.maximum(count, 1), 0.0)
                rews = rews + jnp.where(
                    on_food & ~landmark.eaten, eating_rew, 0.0
                )

            if is_last:
                landmark.eaten = landmark.eaten | landmark.just_eaten
                landmark.just_eaten = jnp.zeros_like(landmark.just_eaten)
                landmark.is_rendering = landmark.is_rendering & ~landmark.eaten

        if self.penalise_by_time:
            rews = jnp.where(rews == 0, -0.01, rews)
        return rews

    def observation(self, agent):
        obs = []
        for landmark in self.world.landmarks:
            obs.append(
                jnp.concatenate(
                    [
                        landmark.state.pos - agent.state.pos,
                        landmark.eaten.astype(jnp.int32)[:, None].astype(
                            jnp.float32
                        ),
                    ],
                    axis=-1,
                )
            )
        return jnp.concatenate(
            [agent.state.pos, agent.state.vel, *obs], axis=-1
        )

    def done(self):
        return jnp.all(
            jnp.stack(
                [landmark.eaten for landmark in self.world.landmarks], axis=1
            ),
            axis=-1,
        )
