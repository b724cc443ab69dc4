"""Balance scenario (reference ``vmas/scenarios/balance.py``).

Agents under gravity (0, -0.05) balance a spherical package on a movable
line and carry it up to a goal; falling to the floor is penalized.
"""
import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.core import (
    Agent,
    Box,
    Landmark,
    Line,
    Sphere,
    World,
)
from vectorizedmultiagentsimulator_tpu.models import BaseHeuristicPolicy
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
    Y,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_agents = kwargs.pop("n_agents", 3)
        self.package_mass = kwargs.pop("package_mass", 5)
        self.random_package_pos_on_line = kwargs.pop(
            "random_package_pos_on_line", True
        )
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert self.n_agents > 1

        self.line_length = 0.8
        self.agent_radius = 0.03
        self.shaping_factor = 100
        self.fall_reward = -10
        self.visualize_semidims = False

        world = World(batch_dim, gravity=(0.0, -0.05), y_semidim=1)
        for i in range(self.n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}",
                    shape=Sphere(self.agent_radius),
                    u_multiplier=0.7,
                )
            )
        goal = Landmark(
            name="goal",
            collide=False,
            shape=Sphere(),
            color=Color.LIGHT_GREEN,
        )
        world.add_landmark(goal)
        self._package = Landmark(
            name="package",
            collide=True,
            movable=True,
            shape=Sphere(),
            mass=self.package_mass,
            color=Color.RED,
        )
        self._package.goal = goal
        world.add_landmark(self._package)
        self._line = Landmark(
            name="line",
            shape=Line(length=self.line_length),
            collide=True,
            movable=True,
            rotatable=True,
            mass=5,
            color=Color.BLACK,
        )
        world.add_landmark(self._line)
        self._floor = Landmark(
            name="floor",
            collide=True,
            shape=Box(length=10, width=1),
            color=Color.WHITE,
        )
        world.add_landmark(self._floor)
        return world

    @property
    def package(self):
        return self._package

    @property
    def line(self):
        return self._line

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        kgx, kgy, kl, kp = jax.random.split(self.world.next_key(), 4)
        goal_pos = jnp.concatenate(
            [
                jax.random.uniform(kgx, (B, 1), minval=-1.0, maxval=1.0),
                jax.random.uniform(
                    kgy, (B, 1), minval=0.0, maxval=self.world.y_semidim
                ),
            ],
            axis=1,
        )
        line_pos = jnp.concatenate(
            [
                jax.random.uniform(
                    kl,
                    (B, 1),
                    minval=-1.0 + self.line_length / 2,
                    maxval=1.0 - self.line_length / 2,
                ),
                jnp.full(
                    (B, 1), -self.world.y_semidim + self.agent_radius * 2
                ),
            ],
            axis=1,
        )
        package_rel_pos = jnp.concatenate(
            [
                (
                    jax.random.uniform(
                        kp,
                        (B, 1),
                        minval=-self.line_length / 2
                        + self._package.shape.radius,
                        maxval=self.line_length / 2
                        - self._package.shape.radius,
                    )
                    if self.random_package_pos_on_line
                    else jnp.zeros((B, 1))
                ),
                jnp.full((B, 1), self._package.shape.radius),
            ],
            axis=1,
        )

        for i, agent in enumerate(self.world.agents):
            agent.set_pos(
                line_pos
                + jnp.asarray(
                    [
                        -(self.line_length - agent.shape.radius) / 2
                        + i
                        * (self.line_length - agent.shape.radius)
                        / (self.n_agents - 1),
                        -self.agent_radius * 2,
                    ],
                    dtype=jnp.float32,
                ),
                batch_index=env_index,
            )
        self._line.set_pos(line_pos, batch_index=env_index)
        self._package.goal.set_pos(goal_pos, batch_index=env_index)
        self._line.set_rot(
            jnp.zeros((1,), jnp.float32), batch_index=env_index
        )
        self._package.set_pos(
            line_pos + package_rel_pos, batch_index=env_index
        )
        self._floor.set_pos(
            jnp.asarray(
                [
                    0,
                    -self.world.y_semidim
                    - self._floor.shape.width / 2
                    - self.agent_radius,
                ],
                dtype=jnp.float32,
            ),
            batch_index=env_index,
        )
        self.compute_on_the_ground()
        global_shaping = (
            jnp.linalg.norm(
                self._package.state.pos - self._package.goal.state.pos, axis=1
            )
            * self.shaping_factor
        )
        if env_index is None:
            self.global_shaping = global_shaping
            self.pos_rew = jnp.zeros((B,), jnp.float32)
            self.ground_rew = jnp.zeros((B,), jnp.float32)
            self.package_dist = jnp.zeros((B,), jnp.float32)
        else:
            self.global_shaping = JaxUtils.where_from_index(
                env_index, global_shaping, self.global_shaping
            )

    def compute_on_the_ground(self):
        self.on_the_ground = self.world.is_overlapping(
            self._line, self._floor
        ) | self.world.is_overlapping(self._package, self._floor)

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            self.compute_on_the_ground()
            self.package_dist = jnp.linalg.norm(
                self._package.state.pos - self._package.goal.state.pos, axis=1
            )
            self.ground_rew = jnp.where(
                self.on_the_ground, self.fall_reward, 0.0
            )
            global_shaping = self.package_dist * self.shaping_factor
            self.pos_rew = self.global_shaping - global_shaping
            self.global_shaping = global_shaping
        return self.ground_rew + self.pos_rew

    def observation(self, agent):
        return jnp.concatenate(
            [
                agent.state.pos,
                agent.state.vel,
                agent.state.pos - self._package.state.pos,
                agent.state.pos - self._line.state.pos,
                self._package.state.pos - self._package.goal.state.pos,
                self._package.state.vel,
                self._line.state.vel,
                self._line.state.ang_vel,
                self._line.state.rot % jnp.pi,
            ],
            axis=-1,
        )

    def done(self):
        return self.on_the_ground | self.world.is_overlapping(
            self._package, self._package.goal
        )

    def info(self, agent):
        return {"pos_rew": self.pos_rew, "ground_rew": self.ground_rew}


class HeuristicPolicy(BaseHeuristicPolicy):
    """Push the package up while it is below the goal (balance.py:262-289)."""

    def compute_action(self, observation, u_range):
        batch_dim = observation.shape[0]
        index_package_goal_pos = 8
        dist_package_goal = observation[
            :, index_package_goal_pos : index_package_goal_pos + 2
        ]
        y_distance_ge_0 = dist_package_goal[:, Y] >= 0

        if self.continuous_actions:
            action_agent = jnp.clip(
                jnp.stack(
                    [
                        jnp.zeros((batch_dim,)),
                        -dist_package_goal[:, Y],
                    ],
                    axis=1,
                ),
                -u_range,
                u_range,
            )
            action_agent = action_agent.at[:, Y].set(
                jnp.where(y_distance_ge_0, 0.0, action_agent[:, Y])
            )
        else:
            action_agent = jnp.where(y_distance_ge_0, 0, 4)
        return action_agent
