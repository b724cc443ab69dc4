"""Give_way scenario (reference ``vmas/scenarios/give_way.py``).

Two velocity-controlled agents start at opposite ends of a narrow corridor
with a single asymmetric passage bump; each must reach the other's start —
one has to give way.

Jit-native deviation: spawn-position noise is drawn per env instead of a
single shared sample (give_way.py:150-158).
"""
import math

import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.controllers import VelocityController
from vectorizedmultiagentsimulator_tpu.core import (
    Agent,
    Box,
    Landmark,
    Line,
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
        self.v_range = kwargs.pop("v_range", 0.5)
        self.a_range = kwargs.pop("a_range", 1)
        self.obs_noise = kwargs.pop("obs_noise", 0)
        self.box_agents = kwargs.pop("box_agents", False)
        self.linear_friction = kwargs.pop("linear_friction", 0.1)
        self.mirror_passage = kwargs.pop("mirror_passage", False)
        self.done_on_completion = kwargs.pop("done_on_completion", False)
        self.observe_rel_pos = kwargs.pop("observe_rel_pos", False)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1.0)
        self.final_reward = kwargs.pop("final_reward", 0.01)
        self.energy_reward_coeff = kwargs.pop("energy_rew_coeff", 0)
        self.agent_collision_penalty = kwargs.pop("agent_collision_penalty", 0)
        self.passage_collision_penalty = kwargs.pop(
            "passage_collision_penalty", 0
        )
        self.obstacle_collision_penalty = kwargs.pop(
            "obstacle_collision_penalty", 0
        )
        self.use_velocity_controller = kwargs.pop(
            "use_velocity_controller", True
        )
        self.min_input_norm = kwargs.pop("min_input_norm", 0.08)
        self.dt_delay = kwargs.pop("dt_delay", 0)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.viewer_size = (1600, 700)
        controller_params = [2, 6, 0.002]
        self.f_range = self.a_range + self.linear_friction
        self.u_range = (
            self.v_range if self.use_velocity_controller else self.f_range
        )

        world = World(
            batch_dim,
            drag=0,
            dt=0.05,
            linear_friction=self.linear_friction,
            substeps=16 if self.box_agents else 5,
            collision_force=10000 if self.box_agents else 500,
        )

        self.agent_radius = 0.16
        self.agent_box_length = 0.32
        self.agent_box_width = 0.24
        self.spawn_pos_noise = 0.02
        self.min_collision_distance = 0.005

        def agent_shape():
            return (
                Sphere(radius=self.agent_radius)
                if not self.box_agents
                else Box(
                    length=self.agent_box_length, width=self.agent_box_width
                )
            )

        blue_agent = Agent(
            name="agent_0",
            rotatable=False,
            linear_friction=self.linear_friction,
            shape=agent_shape(),
            u_range=self.u_range,
            f_range=self.f_range,
            v_range=self.v_range,
            render_action=True,
        )
        if self.use_velocity_controller:
            blue_agent.controller = VelocityController(
                blue_agent, world, controller_params, "standard"
            )
        blue_goal = Landmark(
            name="goal_0",
            collide=False,
            shape=Sphere(radius=self.agent_radius / 2),
            color=Color.BLUE,
        )
        blue_agent.goal = blue_goal
        world.add_agent(blue_agent)
        world.add_landmark(blue_goal)

        green_agent = Agent(
            name="agent_1",
            color=Color.GREEN,
            linear_friction=self.linear_friction,
            shape=agent_shape(),
            rotatable=False,
            u_range=self.u_range,
            f_range=self.f_range,
            v_range=self.v_range,
            render_action=True,
        )
        if self.use_velocity_controller:
            green_agent.controller = VelocityController(
                green_agent, world, controller_params, "standard"
            )
        green_goal = Landmark(
            name="goal_1",
            collide=False,
            shape=Sphere(radius=self.agent_radius / 2),
            color=Color.GREEN,
        )
        green_agent.goal = green_goal
        world.add_agent(green_agent)
        world.add_landmark(green_goal)

        self.spawn_map(world)
        return world

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        k0, k1 = jax.random.split(self.world.next_key())
        self.world.agents[0].set_pos(
            jnp.asarray(
                [
                    -(self.scenario_length / 2 - self.agent_dist_from_wall),
                    0.0,
                ],
                dtype=jnp.float32,
            )
            + jax.random.uniform(
                k0,
                (B, self.world.dim_p),
                minval=-self.spawn_pos_noise,
                maxval=self.spawn_pos_noise,
            ),
            batch_index=env_index,
        )
        self.world.landmarks[0].set_pos(
            jnp.asarray(
                [self.scenario_length / 2 - self.goal_dist_from_wall, 0.0],
                dtype=jnp.float32,
            ),
            batch_index=env_index,
        )
        self.world.agents[1].set_pos(
            jnp.asarray(
                [self.scenario_length / 2 - self.agent_dist_from_wall, 0.0],
                dtype=jnp.float32,
            )
            + jax.random.uniform(
                k1,
                (B, self.world.dim_p),
                minval=-self.spawn_pos_noise,
                maxval=self.spawn_pos_noise,
            ),
            batch_index=env_index,
        )
        self.world.landmarks[1].set_pos(
            jnp.asarray(
                [-(self.scenario_length / 2 - self.goal_dist_from_wall), 0.0],
                dtype=jnp.float32,
            ),
            batch_index=env_index,
        )
        if self.use_velocity_controller:
            for agent in self.world.agents:
                agent.controller.reset(env_index)

        self.reset_map(env_index)
        for agent in self.world.agents:
            shaping = (
                jnp.linalg.norm(
                    agent.state.pos - agent.goal.state.pos, axis=1
                )
                * self.pos_shaping_factor
            )
            if env_index is None:
                agent.shaping = shaping
                agent.energy_rew = jnp.zeros((B,), jnp.float32)
                agent.energy_expenditure = jnp.zeros((B,), jnp.float32)
                agent.agent_collision_rew = jnp.zeros((B,), jnp.float32)
                agent.obstacle_collision_rew = jnp.zeros((B,), jnp.float32)
                if self.dt_delay > 0:
                    agent.input_queue = jnp.zeros(
                        (self.dt_delay, B, self.world.dim_p), jnp.float32
                    )
            else:
                agent.shaping = JaxUtils.where_from_index(
                    env_index, shaping, agent.shaping
                )
        if env_index is None:
            self.goal_reached = jnp.zeros((B,), dtype=bool)
            self.pos_rew = jnp.zeros((B,), jnp.float32)
            self.final_rew = jnp.zeros((B,), jnp.float32)
        else:
            self.goal_reached = JaxUtils.where_from_index(
                env_index, False, self.goal_reached
            )

    def process_action(self, agent):
        if self.use_velocity_controller:
            if self.dt_delay > 0:
                queue = agent.input_queue
                delayed = queue[0]
                agent.input_queue = jnp.concatenate(
                    [queue[1:], agent.action.u[None]], axis=0
                )
                agent.action.u = delayed
            u = JaxUtils.clamp_with_norm(agent.action.u, self.u_range)
            action_norm = jnp.linalg.norm(u, axis=1)
            u = jnp.where((action_norm < self.min_input_norm)[:, None], 0.0, u)
            agent.action.u = u
            vel_is_zero = jnp.linalg.norm(u, axis=1) < 1e-3
            agent.controller.reset(vel_is_zero)
            agent.controller.process_force()

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        blue_agent = self.world.agents[0]
        green_agent = self.world.agents[-1]

        if is_first:
            blue_distance = jnp.linalg.norm(
                blue_agent.state.pos - blue_agent.goal.state.pos, axis=1
            )
            green_distance = jnp.linalg.norm(
                green_agent.state.pos - green_agent.goal.state.pos, axis=1
            )
            blue_on_goal = blue_distance < blue_agent.goal.shape.radius
            green_on_goal = green_distance < green_agent.goal.shape.radius
            self.goal_reached = green_on_goal & blue_on_goal

            green_shaping = green_distance * self.pos_shaping_factor
            green_rew = green_agent.shaping - green_shaping
            green_agent.shaping = green_shaping

            blue_shaping = blue_distance * self.pos_shaping_factor
            blue_rew = blue_agent.shaping - blue_shaping
            blue_agent.shaping = blue_shaping

            self.pos_rew = blue_rew + green_rew
            self.final_rew = jnp.where(
                self.goal_reached, self.final_reward, 0.0
            )

        agent_collision_rew = jnp.zeros(
            (self.world.batch_dim,), jnp.float32
        )
        obstacle_collision_rew = jnp.zeros_like(agent_collision_rew)
        for a in self.world.agents:
            if a is not agent:
                agent_collision_rew = agent_collision_rew + jnp.where(
                    self.world.get_distance(agent, a)
                    <= self.min_collision_distance,
                    self.agent_collision_penalty,
                    0.0,
                )
        passages = (
            [*self._passage_1, *self._passage_2]
            if self.mirror_passage
            else [*self._passage_1]
        )
        for landmark in self.world.landmarks:
            if self.world.collides(agent, landmark):
                penalty = (
                    self.passage_collision_penalty
                    if landmark in passages
                    else self.obstacle_collision_penalty
                )
                obstacle_collision_rew = obstacle_collision_rew + jnp.where(
                    self.world.get_distance(agent, landmark)
                    <= self.min_collision_distance,
                    penalty,
                    0.0,
                )
        agent.agent_collision_rew = agent_collision_rew
        agent.obstacle_collision_rew = obstacle_collision_rew

        agent.energy_expenditure = jnp.linalg.norm(
            agent.action.u, axis=-1
        ) / math.sqrt(self.world.dim_p * (agent.f_range**2))
        agent.energy_rew = -agent.energy_expenditure * self.energy_reward_coeff

        return (
            self.pos_rew
            + agent.obstacle_collision_rew
            + agent.agent_collision_rew
            + agent.energy_rew
            + self.final_rew
        )

    def observation(self, agent):
        rel = [
            agent.state.pos - a.state.pos
            for a in self.world.agents
            if a is not agent
        ]
        observations = [agent.state.pos, agent.state.vel]
        if self.observe_rel_pos:
            observations += rel
        if self.obs_noise > 0:
            observations = [
                obs
                + jax.random.uniform(
                    self.world.next_key(),
                    obs.shape,
                    minval=-self.obs_noise,
                    maxval=self.obs_noise,
                )
                for obs in observations
            ]
        return jnp.concatenate(observations, axis=-1)

    def info(self, agent):
        return {
            "pos_rew": self.pos_rew,
            "final_rew": self.final_rew,
            "energy_rew": agent.energy_rew,
            "agent_collision_rew": agent.agent_collision_rew,
            "obstacle_collision_rew": agent.obstacle_collision_rew,
        }

    def spawn_map(self, world: World):
        self.scenario_length = 5
        self.passage_length = 0.4
        self.passage_width = 0.48
        self.corridor_width = self.passage_length
        self.small_ceiling_length = (self.scenario_length / 2) - (
            self.passage_length / 2
        )
        self.goal_dist_from_wall = self.agent_radius + 0.05
        self.agent_dist_from_wall = 0.5

        self._walls = []
        for i in range(2):
            landmark = Landmark(
                name=f"wall {i}",
                collide=True,
                shape=Line(length=self.corridor_width),
                color=Color.BLACK,
            )
            self._walls.append(landmark)
            world.add_landmark(landmark)
        self._small_ceilings_1 = []
        for i in range(2):
            landmark = Landmark(
                name=f"ceil 1 {i}",
                collide=True,
                shape=Line(length=self.small_ceiling_length),
                color=Color.BLACK,
            )
            self._small_ceilings_1.append(landmark)
            world.add_landmark(landmark)
        self._passage_1 = []
        for i in range(3):
            landmark = Landmark(
                name=f"ceil 2 {i}",
                collide=True,
                shape=Line(
                    length=self.passage_length
                    if i == 2
                    else self.passage_width
                ),
                color=Color.BLACK,
            )
            self._passage_1.append(landmark)
            world.add_landmark(landmark)
        self._passage_2 = []
        if self.mirror_passage:
            self._small_ceilings_2 = []
            for i in range(2):
                landmark = Landmark(
                    name=f"ceil 12 {i}",
                    collide=True,
                    shape=Line(length=self.small_ceiling_length),
                    color=Color.BLACK,
                )
                self._small_ceilings_2.append(landmark)
                world.add_landmark(landmark)
            for i in range(3):
                landmark = Landmark(
                    name=f"ceil 22 {i}",
                    collide=True,
                    shape=Line(
                        length=self.passage_length
                        if i == 2
                        else self.passage_width
                    ),
                    color=Color.BLACK,
                )
                self._passage_2.append(landmark)
                world.add_landmark(landmark)
        else:
            self._floor = Landmark(
                name="floor",
                collide=True,
                shape=Line(length=self.scenario_length),
                color=Color.BLACK,
            )
            world.add_landmark(self._floor)

    def reset_map(self, env_index):
        for i, landmark in enumerate(self._walls):
            landmark.set_pos(
                jnp.asarray(
                    [
                        -self.scenario_length / 2
                        if i == 0
                        else self.scenario_length / 2,
                        0.0,
                    ],
                    dtype=jnp.float32,
                ),
                batch_index=env_index,
            )
            landmark.set_rot(
                jnp.asarray([jnp.pi / 2], dtype=jnp.float32),
                batch_index=env_index,
            )
        small_ceiling_pos = (
            self.small_ceiling_length / 2 - self.scenario_length / 2
        )
        for i, landmark in enumerate(self._small_ceilings_1):
            landmark.set_pos(
                jnp.asarray(
                    [
                        -small_ceiling_pos if i == 0 else small_ceiling_pos,
                        self.passage_length / 2,
                    ],
                    dtype=jnp.float32,
                ),
                batch_index=env_index,
            )
        for i, landmark in enumerate(self._passage_1[:-1]):
            landmark.set_pos(
                jnp.asarray(
                    [
                        -self.passage_length / 2
                        if i == 0
                        else self.passage_length / 2,
                        self.passage_length / 2 + self.passage_width / 2,
                    ],
                    dtype=jnp.float32,
                ),
                batch_index=env_index,
            )
            landmark.set_rot(
                jnp.asarray([jnp.pi / 2], dtype=jnp.float32),
                batch_index=env_index,
            )
        self._passage_1[-1].set_pos(
            jnp.asarray(
                [0, self.passage_length / 2 + self.passage_width],
                dtype=jnp.float32,
            ),
            batch_index=env_index,
        )
        if self.mirror_passage:
            for i, landmark in enumerate(self._small_ceilings_2):
                landmark.set_pos(
                    jnp.asarray(
                        [
                            -small_ceiling_pos
                            if i == 0
                            else small_ceiling_pos,
                            -self.passage_length / 2,
                        ],
                        dtype=jnp.float32,
                    ),
                    batch_index=env_index,
                )
            for i, landmark in enumerate(self._passage_2[:-1]):
                landmark.set_pos(
                    jnp.asarray(
                        [
                            -self.passage_length / 2
                            if i == 0
                            else self.passage_length / 2,
                            -self.passage_length / 2 - self.passage_width / 2,
                        ],
                        dtype=jnp.float32,
                    ),
                    batch_index=env_index,
                )
                landmark.set_rot(
                    jnp.asarray([jnp.pi / 2], dtype=jnp.float32),
                    batch_index=env_index,
                )
            self._passage_2[-1].set_pos(
                jnp.asarray(
                    [0, -self.passage_length / 2 - self.passage_width],
                    dtype=jnp.float32,
                ),
                batch_index=env_index,
            )
        else:
            self._floor.set_pos(
                jnp.asarray(
                    [0, -self.passage_length / 2], dtype=jnp.float32
                ),
                batch_index=env_index,
            )

    def done(self):
        if self.done_on_completion:
            return self.goal_reached
        return jnp.zeros_like(self.goal_reached)
