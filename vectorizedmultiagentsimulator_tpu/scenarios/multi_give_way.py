"""Multi_give_way scenario (reference ``vmas/scenarios/multi_give_way.py``).

Four velocity-controlled agents cross a 4-way corridor intersection, each
heading to the opposite arm — they must take turns in the central square.
"""
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
        self.u_range = kwargs.pop("u_range", 0.5)
        self.a_range = kwargs.pop("a_range", 1)
        self.obs_noise = kwargs.pop("obs_noise", 0)
        self.box_agents = kwargs.pop("box_agents", False)
        self.linear_friction = kwargs.pop("linear_friction", 0.1)
        self.min_input_norm = kwargs.pop("min_input_norm", 0.08)
        self.comms_range = kwargs.pop("comms_range", 5)
        self.shared_rew = kwargs.pop("shared_rew", True)
        self.n_agents = kwargs.pop("n_agents", 4)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1)
        self.final_reward = kwargs.pop("final_reward", 0.01)
        self.agent_collision_penalty = kwargs.pop(
            "agent_collision_penalty", -0.1
        )
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.viewer_zoom = 1.7
        controller_params = [2, 6, 0.002]
        self.n_agents = 4
        self.f_range = self.a_range + self.linear_friction

        world = World(
            batch_dim,
            drag=0,
            dt=0.1,
            linear_friction=self.linear_friction,
            substeps=16 if self.box_agents else 5,
            collision_force=10000 if self.box_agents else 500,
        )

        self.agent_radius = 0.16
        self.agent_box_length = 0.32
        self.agent_box_width = 0.24
        self.min_collision_distance = 0.005
        self.colors = [Color.GREEN, Color.BLUE, Color.RED, Color.GRAY]

        for i in range(self.n_agents):
            agent = Agent(
                name=f"agent_{i}",
                rotatable=False,
                linear_friction=self.linear_friction,
                shape=(
                    Sphere(radius=self.agent_radius)
                    if not self.box_agents
                    else Box(
                        length=self.agent_box_length,
                        width=self.agent_box_width,
                    )
                ),
                u_range=self.u_range,
                f_range=self.f_range,
                render_action=True,
                color=self.colors[i],
            )
            agent.controller = VelocityController(
                agent, world, controller_params, "standard"
            )
            goal = Landmark(
                name=f"goal {i}",
                collide=False,
                shape=Sphere(radius=self.agent_radius / 2),
                color=self.colors[i],
            )
            agent.goal = goal
            world.add_agent(agent)
            world.add_landmark(goal)
        self.spawn_map(world)
        return world

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        for i, agent in enumerate(self.world.agents):
            agent.controller.reset(env_index)
            next_i = (i + 1) % self.n_agents
            if i in [0, 2]:
                agent.set_pos(
                    jnp.asarray(
                        [
                            (
                                self.scenario_length / 2
                                - self.agent_dist_from_wall
                            )
                            * (-1 if i == 0 else 1),
                            0.0,
                        ],
                        dtype=jnp.float32,
                    ),
                    batch_index=env_index,
                )
                self.world.agents[next_i].goal.set_pos(
                    jnp.asarray(
                        [
                            (
                                self.scenario_length / 2
                                - self.goal_dist_from_wall
                            )
                            * (-1 if i == 0 else 1),
                            0.0,
                        ],
                        dtype=jnp.float32,
                    ),
                    batch_index=env_index,
                )
            else:
                agent.set_pos(
                    jnp.asarray(
                        [
                            0.0,
                            (
                                self.scenario_length / 2
                                - self.agent_dist_from_wall
                            )
                            * (1 if i == 1 else -1),
                        ],
                        dtype=jnp.float32,
                    ),
                    batch_index=env_index,
                )
                self.world.agents[next_i].goal.set_pos(
                    jnp.asarray(
                        [
                            0.0,
                            (
                                self.scenario_length / 2
                                - self.goal_dist_from_wall
                            )
                            * (1 if i == 1 else -1),
                        ],
                        dtype=jnp.float32,
                    ),
                    batch_index=env_index,
                )

        for agent in self.world.agents:
            shaping = (
                jnp.linalg.norm(
                    agent.state.pos - agent.goal.state.pos, axis=1
                )
                * self.pos_shaping_factor
            )
            if env_index is None:
                agent.shaping = shaping
                agent.pos_rew = jnp.zeros((B,), jnp.float32)
                agent.agent_collision_rew = jnp.zeros((B,), jnp.float32)
                agent.distance_to_goal = jnp.zeros((B,), jnp.float32)
                agent.on_goal = jnp.zeros((B,), dtype=bool)
            else:
                agent.shaping = JaxUtils.where_from_index(
                    env_index, shaping, agent.shaping
                )
        self.reset_map(env_index)
        if env_index is None:
            self.reached_goal = jnp.zeros((B,), dtype=bool)
            self.pos_rew = jnp.zeros((B,), jnp.float32)
            self.final_rew = jnp.zeros((B,), jnp.float32)
            self.all_goal_reached = jnp.zeros((B,), dtype=bool)
        else:
            self.reached_goal = JaxUtils.where_from_index(
                env_index, False, self.reached_goal
            )

    def process_action(self, agent):
        u = JaxUtils.clamp_with_norm(agent.action.u, self.u_range)
        action_norm = jnp.linalg.norm(u, axis=1)
        u = jnp.where((action_norm < self.min_input_norm)[:, None], 0.0, u)
        agent.action.u = u
        vel_is_zero = jnp.linalg.norm(u, axis=1) < 1e-3
        agent.controller.reset(vel_is_zero)
        agent.controller.process_force()

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            pos_rew = jnp.zeros((self.world.batch_dim,), jnp.float32)
            for a in self.world.agents:
                a.distance_to_goal = jnp.linalg.norm(
                    a.state.pos - a.goal.state.pos, axis=-1
                )
                a.on_goal = a.distance_to_goal < a.goal.shape.radius
                pos_shaping = a.distance_to_goal * self.pos_shaping_factor
                a.pos_rew = (
                    (a.shaping - pos_shaping)
                    if self.pos_shaping_factor != 0
                    else -a.distance_to_goal * 0.0001
                )
                a.shaping = pos_shaping
                pos_rew = pos_rew + a.pos_rew
            self.pos_rew = pos_rew
            self.all_goal_reached = jnp.all(
                jnp.stack([a.on_goal for a in self.world.agents], axis=-1),
                axis=-1,
            )
            self.final_rew = jnp.where(
                self.all_goal_reached, self.final_reward, 0.0
            )
            self.reached_goal = self.reached_goal | self.all_goal_reached

        agent_collision_rew = jnp.zeros(
            (self.world.batch_dim,), jnp.float32
        )
        for a in self.world.agents:
            if a is not agent:
                agent_collision_rew = agent_collision_rew + jnp.where(
                    self.world.get_distance(agent, a)
                    <= self.min_collision_distance,
                    self.agent_collision_penalty,
                    0.0,
                )
        agent.agent_collision_rew = agent_collision_rew
        return (
            (self.pos_rew if self.shared_rew else agent.pos_rew)
            + agent.agent_collision_rew
            + self.final_rew
        )

    def observation(self, agent):
        observations = [
            agent.state.pos,
            agent.state.vel,
            agent.state.pos - agent.goal.state.pos,
            jnp.linalg.norm(
                agent.state.pos - agent.goal.state.pos, axis=-1
            )[:, None],
        ]
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
            "pos_rew": self.pos_rew if self.shared_rew else agent.pos_rew,
            "final_rew": self.final_rew,
            "agent_collision_rew": agent.agent_collision_rew,
        }

    def extra_render(self, env_index: int = 0):
        import numpy as np

        from vectorizedmultiagentsimulator_tpu import render as rendering

        geoms = []
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
        return geoms

    def spawn_map(self, world: World):
        self.scenario_length = 5
        self.scenario_width = 0.4
        self.long_wall_length = (self.scenario_length / 2) - (
            self.scenario_width / 2
        )
        self.short_wall_length = self.scenario_width
        self.goal_dist_from_wall = self.agent_radius + 0.05
        self.agent_dist_from_wall = 0.5

        self._long_walls = []
        for i in range(8):
            landmark = Landmark(
                name=f"wall {i}",
                collide=True,
                shape=Line(length=self.long_wall_length),
                color=Color.BLACK,
            )
            self._long_walls.append(landmark)
            world.add_landmark(landmark)
        self._short_walls = []
        for i in range(4):
            landmark = Landmark(
                name=f"short wall {i}",
                collide=True,
                shape=Line(length=self.short_wall_length),
                color=Color.BLACK,
            )
            self._short_walls.append(landmark)
            world.add_landmark(landmark)

    def reset_map(self, env_index):
        for i, landmark in enumerate(self._short_walls):
            if i < 2:
                landmark.set_pos(
                    jnp.asarray(
                        [
                            -self.scenario_length / 2
                            if i % 2 == 0
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
            else:
                landmark.set_pos(
                    jnp.asarray(
                        [
                            0.0,
                            -self.scenario_length / 2
                            if i % 2 == 0
                            else self.scenario_length / 2,
                        ],
                        dtype=jnp.float32,
                    ),
                    batch_index=env_index,
                )

        long_wall_pos = self.long_wall_length / 2 - self.scenario_length / 2
        for i, landmark in enumerate(self._long_walls):
            if i < 4:
                landmark.set_pos(
                    jnp.asarray(
                        [
                            long_wall_pos * (1 if i < 2 else -1),
                            self.scenario_width
                            / 2
                            * (-1 if i % 2 == 0 else 1),
                        ],
                        dtype=jnp.float32,
                    ),
                    batch_index=env_index,
                )
            else:
                landmark.set_pos(
                    jnp.asarray(
                        [
                            self.scenario_width
                            / 2
                            * (-1 if i % 2 == 0 else 1),
                            long_wall_pos * (1 if i < 6 else -1),
                        ],
                        dtype=jnp.float32,
                    ),
                    batch_index=env_index,
                )
                landmark.set_rot(
                    jnp.asarray([jnp.pi / 2], dtype=jnp.float32),
                    batch_index=env_index,
                )
