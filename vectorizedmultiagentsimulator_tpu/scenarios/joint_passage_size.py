"""Joint_passage_size scenario (reference
``vmas/scenarios/joint_passage_size.py``).

Like joint_passage but with differently-sized agents: a 2-slot "big"
passage and a 1-slot "small" passage offset ±3 slots; the joint must be
oriented so each agent fits through its matching hole.

Jit-native deviation: the data-dependent collide-passage placement loop is
re-expressed as a vectorized k-th-free-slot computation (see
joint_passage.py notes); start angle ±pi/2 is drawn per env.
"""
import math

import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.controllers import VelocityController
from vectorizedmultiagentsimulator_tpu.core import (
    Agent,
    Box,
    Joint,
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
    X,
    Y,
)


def angle_to_vector(angle):
    return jnp.concatenate([jnp.cos(angle), jnp.sin(angle)], axis=1)


def get_line_angle_0_180(rot):
    return rot % jnp.pi


def get_line_angle_dist_0_360(angle, goal):
    angle = angle_to_vector(angle)
    goal = angle_to_vector(goal)
    return -jnp.sum(angle * goal, axis=-1)


def get_line_angle_dist_0_180(angle, goal):
    angle = get_line_angle_0_180(angle)
    goal = get_line_angle_0_180(jnp.asarray(goal, jnp.float32))
    return jnp.minimum(
        jnp.abs(angle - goal),
        jnp.minimum(
            jnp.abs(angle - (goal - jnp.pi)), jnp.abs((angle - jnp.pi) - goal)
        ),
    ).squeeze(-1)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.fixed_passage = kwargs.pop("fixed_passage", False)
        self.joint_length = kwargs.pop("joint_length", 0.52)
        self.random_start_angle = kwargs.pop("random_start_angle", False)
        self.random_goal_angle = kwargs.pop("random_goal_angle", False)
        self.observe_joint_angle = kwargs.pop("observe_joint_angle", False)
        self.joint_angle_obs_noise = kwargs.pop("joint_angle_obs_noise", 0.0)
        self.asym_package = kwargs.pop("asym_package", False)
        self.mass_ratio = kwargs.pop("mass_ratio", 1)
        self.mass_position = kwargs.pop("mass_position", 0.75)
        self.max_speed_1 = kwargs.pop("max_speed_1", None)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1)
        self.rot_shaping_factor = kwargs.pop("rot_shaping_factor", 1)
        self.collision_reward = kwargs.pop("collision_reward", 0)
        self.energy_reward_coeff = kwargs.pop("energy_reward_coeff", 0)
        self.obs_noise = kwargs.pop("obs_noise", 0.0)
        self.n_passages = kwargs.pop("n_passages", 3)
        self.middle_angle_180 = kwargs.pop("middle_angle_180", False)
        self.use_vel_controller = kwargs.pop("use_vel_controller", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        assert self.n_passages in (3, 4)
        self.plot_grid = False
        self.visualize_semidims = False

        world = World(
            batch_dim,
            x_semidim=1,
            y_semidim=1,
            substeps=5 if not self.asym_package else 10,
            joint_force=700 if self.asym_package else 400,
            collision_force=2500 if self.asym_package else 1500,
            drag=0.25 if not self.asym_package else 0.15,
        )
        if not self.observe_joint_angle:
            assert self.joint_angle_obs_noise == 0

        self.n_agents = 2
        self.agent_radius = 0.03333
        self.agent_radius_2 = 3 * self.agent_radius
        self.mass_radius = self.agent_radius * (2 / 3)
        self.passage_width = 0.2
        self.passage_length = 0.1476
        self.scenario_length = 2 + 2 * self.agent_radius
        self.n_boxes = int(self.scenario_length // self.passage_length)
        self.min_collision_distance = 0.005

        controller_params = [2.0, 10, 0.00001]

        agent = Agent(
            name="agent_0",
            shape=Sphere(self.agent_radius),
            u_range=1,
            obs_noise=self.obs_noise,
            render_action=True,
            f_range=10,
        )
        agent.controller = VelocityController(
            agent, world, controller_params, "standard"
        )
        world.add_agent(agent)
        agent = Agent(
            name="agent_1",
            shape=Sphere(self.agent_radius_2),
            u_range=1,
            mass=1 if self.asym_package else self.mass_ratio,
            max_speed=self.max_speed_1,
            obs_noise=self.obs_noise,
            render_action=True,
            f_range=10,
        )
        agent.controller = VelocityController(
            agent, world, controller_params, "standard"
        )
        world.add_agent(agent)

        self._joint = Joint(
            world.agents[0],
            world.agents[1],
            anchor_a=(0, 0),
            anchor_b=(0, 0),
            dist=self.joint_length,
            rotate_a=True,
            rotate_b=True,
            collidable=False,
            width=0,
            mass=1,
        )
        world.add_joint(self._joint)

        if self.asym_package:

            def mass_collision_filter(e):
                return not isinstance(e.shape, Sphere)

            self._mass = Landmark(
                name="mass",
                shape=Sphere(radius=self.mass_radius),
                collide=True,
                movable=True,
                color=Color.BLACK,
                mass=self.mass_ratio,
                collision_filter=mass_collision_filter,
            )
            world.add_landmark(self._mass)
            world.add_joint(
                Joint(
                    self._mass,
                    self._joint.landmark,
                    anchor_a=(0, 0),
                    anchor_b=(self.mass_position, 0),
                    dist=0,
                    rotate_a=True,
                    rotate_b=True,
                )
            )

        self._goal = Landmark(
            name="joint_goal",
            shape=Line(length=self.joint_length),
            collide=False,
            color=Color.GREEN,
        )
        world.add_landmark(self._goal)

        self._walls = []
        for i in range(4):
            wall = Landmark(
                name=f"wall {i}",
                collide=True,
                shape=Line(length=2 + self.agent_radius * 2),
                color=Color.BLACK,
            )
            world.add_landmark(wall)
            self._walls.append(wall)

        self.create_passage_map(world)
        return world

    @property
    def joint(self):
        return self._joint

    @property
    def goal(self):
        return self._goal

    def create_passage_map(self, world: World):
        self._passages = []
        self._collide_passages = []
        self._non_collide_passages = []
        for i in range(self.n_boxes):
            passage = Landmark(
                name=f"passage {i}",
                collide=not (i < self.n_passages),
                movable=False,
                shape=Box(
                    length=self.passage_length, width=self.passage_width
                ),
                color=Color.RED,
                collision_filter=lambda e: not isinstance(e.shape, Box),
            )
            if not passage.collide:
                self._non_collide_passages.append(passage)
            else:
                self._collide_passages.append(passage)
            self._passages.append(passage)
            world.add_landmark(passage)

    def _slot_pos(self, i):
        i = jnp.asarray(i, jnp.float32)
        x = (
            -1
            - self.agent_radius
            + self.passage_length / 2
            + self.passage_length * i
        )
        return jnp.stack([x, jnp.zeros_like(x)], axis=-1)

    def spawn_passage_map(self, env_index):
        B = self.world.batch_dim
        k1, k2 = jax.random.split(self.world.next_key())
        if self.fixed_passage:
            big_start = jnp.full((B,), 5, jnp.int32)
            small_lr = jnp.full((B,), 1, jnp.int32)
        else:
            big_start = jax.random.randint(k1, (B,), 0, self.n_boxes - 1)
            small_lr = jax.random.randint(k2, (B,), 0, 2)
        small_lr = jnp.where(
            big_start > self.n_boxes - 1 - (self.n_passages + 1), 0, small_lr
        )
        small_lr = jnp.where(big_start < self.n_passages, 1, small_lr)
        small_lr = jnp.where(small_lr == 0, -3, small_lr)
        small_lr = jnp.where(small_lr == 1, 4, small_lr)
        # (reference: 0 -> -3, 1 -> +4 via "+= 3"; joint_passage_size.py:616-619)

        open_indexes = [big_start, big_start + 1, big_start + small_lr]
        if self.n_passages == 4:
            open_indexes.append(big_start + small_lr + jnp.sign(small_lr))
        open_idx = jnp.stack(open_indexes, axis=1)  # [B, n_passages]

        n_ext = self.n_boxes + self.n_passages + 8
        slots = jnp.arange(n_ext)
        is_open = jnp.any(
            slots[None, :, None] == open_idx[:, None, :], axis=-1
        )
        free_rank = jnp.cumsum(~is_open, axis=1)
        collide_slots = jnp.stack(
            [
                jnp.argmax(free_rank == (k + 1), axis=1)
                for k in range(len(self._collide_passages))
            ],
            axis=1,
        )

        for k, passage in enumerate(self._non_collide_passages):
            passage.is_rendering = jnp.zeros((B,), dtype=bool)
            passage.set_pos(
                self._slot_pos(open_idx[:, k]), batch_index=env_index
            )
        for k, passage in enumerate(self._collide_passages):
            passage.set_pos(
                self._slot_pos(collide_slots[:, k]), batch_index=env_index
            )

        big_passage_pos = (
            self._slot_pos(big_start) + self._slot_pos(big_start + 1)
        ) / 2
        small_passage_pos = self._slot_pos(big_start + small_lr)
        pass_center = (big_passage_pos + small_passage_pos) / 2
        middle_angle = jnp.where(
            (small_lr > 0)[:, None], jnp.pi, 0.0
        )  # [B, 1]

        if env_index is None:
            self.small_left_or_right = small_lr
            self.pass_center = pass_center
            self.big_passage_pos = big_passage_pos
            self.small_passage_pos = small_passage_pos
            self.middle_angle = middle_angle
        else:
            self.small_left_or_right = JaxUtils.where_from_index(
                env_index, small_lr, self.small_left_or_right
            )
            self.pass_center = JaxUtils.where_from_index(
                env_index, pass_center, self.pass_center
            )
            self.big_passage_pos = JaxUtils.where_from_index(
                env_index, big_passage_pos, self.big_passage_pos
            )
            self.small_passage_pos = JaxUtils.where_from_index(
                env_index, small_passage_pos, self.small_passage_pos
            )
            self.middle_angle = JaxUtils.where_from_index(
                env_index, middle_angle, self.middle_angle
            )

    def spawn_walls(self, env_index):
        for i, wall in enumerate(self._walls):
            wall.set_pos(
                jnp.asarray(
                    [
                        0.0
                        if i % 2
                        else (
                            self.world.x_semidim + self.agent_radius
                            if i == 0
                            else -self.world.x_semidim - self.agent_radius
                        ),
                        0.0
                        if not i % 2
                        else (
                            self.world.y_semidim + self.agent_radius
                            if i == 1
                            else -self.world.y_semidim - self.agent_radius
                        ),
                    ],
                    dtype=jnp.float32,
                ),
                batch_index=env_index,
            )
            wall.set_rot(
                jnp.asarray(
                    [jnp.pi / 2 if not i % 2 else 0.0], dtype=jnp.float32
                ),
                batch_index=env_index,
            )

    def _rot_dist(self, rot, goal):
        if self.middle_angle_180:
            return get_line_angle_dist_0_180(rot, goal)
        return get_line_angle_dist_0_360(rot, goal)

    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        keys = jax.random.split(self.world.next_key(), 4)
        # Start angle is ±pi/2 per env (joint_passage_size.py:221-226).
        start_angle = jnp.where(
            jax.random.uniform(keys[0], (B, 1)) >= 0.5,
            jnp.pi / 2,
            -jnp.pi / 2,
        )
        if self.random_goal_angle:
            goal_angle = jax.random.uniform(
                keys[1], (B, 1), minval=-jnp.pi / 2, maxval=jnp.pi / 2
            )
        else:
            goal_angle = jnp.full((B, 1), jnp.pi)

        bigger_radius = max(self.agent_radius, self.agent_radius_2)
        start_delta = (self.joint_length / 2) * jnp.concatenate(
            [jnp.cos(start_angle), jnp.sin(start_angle)], axis=1
        )
        sdx_abs = jnp.abs(start_delta[:, :1])
        sdy_abs = jnp.abs(start_delta[:, 1:])
        min_x_start = -self.world.x_semidim + bigger_radius + sdx_abs
        max_x_start = self.world.x_semidim - (bigger_radius + sdx_abs)
        min_y_start = -self.world.y_semidim + bigger_radius + sdy_abs
        max_y_start = -2 * bigger_radius - self.passage_width / 2 - sdy_abs

        goal_delta = (self.joint_length / 2) * jnp.concatenate(
            [jnp.cos(goal_angle), jnp.sin(goal_angle)], axis=1
        )
        gdx_abs = jnp.abs(goal_delta[:, :1])
        gdy_abs = jnp.abs(goal_delta[:, 1:])
        min_x_goal = -self.world.x_semidim + bigger_radius + gdx_abs
        max_x_goal = self.world.x_semidim - (bigger_radius + gdx_abs)
        min_y_goal = 2 * bigger_radius + self.passage_width / 2 + gdy_abs
        max_y_goal = self.world.y_semidim - (bigger_radius + gdy_abs)

        u1 = jax.random.uniform(keys[2], (B, 2))
        joint_pos = jnp.concatenate(
            [
                (min_x_start - max_x_start) * u1[:, :1] + max_x_start,
                (min_y_start - max_y_start) * u1[:, 1:] + max_y_start,
            ],
            axis=1,
        )
        u2 = jax.random.uniform(keys[3], (B, 2))
        goal_pos = jnp.concatenate(
            [
                (min_x_goal - max_x_goal) * u2[:, :1] + max_x_goal,
                (min_y_goal - max_y_goal) * u2[:, 1:] + max_y_goal,
            ],
            axis=1,
        )

        self._goal.set_pos(goal_pos, batch_index=env_index)
        self._goal.set_rot(goal_angle, batch_index=env_index)

        for i, agent in enumerate(self.world.agents):
            agent.controller.reset(env_index)
            agent.set_pos(
                joint_pos + start_delta * (-1 if i == 0 else 1),
                batch_index=env_index,
            )
        if self.asym_package:
            self._mass.set_pos(
                joint_pos + self.mass_position * start_delta,
                batch_index=env_index,
            )

        self.spawn_passage_map(env_index)
        self.spawn_walls(env_index)

        pos_shaping_pre = (
            jnp.linalg.norm(
                self._joint.landmark.state.pos - self.pass_center, axis=1
            )
            * self.pos_shaping_factor
        )
        pos_shaping_post = (
            jnp.linalg.norm(
                self._joint.landmark.state.pos - self._goal.state.pos, axis=1
            )
            * self.pos_shaping_factor
        )
        rot_shaping_pre = (
            self._rot_dist(self._joint.landmark.state.rot, self.middle_angle)
            * self.rot_shaping_factor
        )
        if env_index is None:
            self.t = jnp.zeros((B,), jnp.float32)
            self.passed = jnp.zeros((B,), jnp.float32)
            self.pos_shaping_pre = pos_shaping_pre
            self.pos_shaping_post = pos_shaping_post
            self.rot_shaping_pre = rot_shaping_pre
            self.pos_rew = jnp.zeros((B,), jnp.float32)
            self.rot_rew = jnp.zeros((B,), jnp.float32)
            self.collision_rew = jnp.zeros((B,), jnp.float32)
            self.energy_rew = jnp.zeros((B,), jnp.float32)
            self.all_passed = jnp.zeros((B,), dtype=bool)
            self.rew = jnp.zeros((B,), jnp.float32)
        else:
            self.t = JaxUtils.where_from_index(env_index, 0.0, self.t)
            self.passed = JaxUtils.where_from_index(
                env_index, 0.0, self.passed
            )
            self.pos_shaping_pre = JaxUtils.where_from_index(
                env_index, pos_shaping_pre, self.pos_shaping_pre
            )
            self.pos_shaping_post = JaxUtils.where_from_index(
                env_index, pos_shaping_post, self.pos_shaping_post
            )
            self.rot_shaping_pre = JaxUtils.where_from_index(
                env_index, rot_shaping_pre, self.rot_shaping_pre
            )

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            B = self.world.batch_dim
            self.t = self.t + 1
            joint_passed = self._joint.landmark.state.pos[:, Y] > 0
            self.all_passed = jnp.all(
                jnp.stack(
                    [a.state.pos[:, Y] for a in self.world.agents], axis=1
                )
                > self.passage_width / 2,
                axis=1,
            )

            joint_dist_to_closest_pass = jnp.linalg.norm(
                self._joint.landmark.state.pos - self.pass_center, axis=1
            )
            joint_shaping = (
                joint_dist_to_closest_pass * self.pos_shaping_factor
            )
            pos_rew = jnp.where(
                joint_passed, 0.0, self.pos_shaping_pre - joint_shaping
            )
            self.pos_shaping_pre = joint_shaping

            joint_dist_to_goal = jnp.linalg.norm(
                self._joint.landmark.state.pos - self._goal.state.pos, axis=1
            )
            joint_shaping = joint_dist_to_goal * self.pos_shaping_factor
            pos_rew = pos_rew + jnp.where(
                joint_passed, self.pos_shaping_post - joint_shaping, 0.0
            )
            self.pos_shaping_post = joint_shaping
            self.pos_rew = pos_rew

            joint_dist_to_90_rot = self._rot_dist(
                self._joint.landmark.state.rot, self.middle_angle
            )
            joint_shaping = joint_dist_to_90_rot * self.rot_shaping_factor
            self.rot_rew = self.rot_shaping_pre - joint_shaping
            self.rot_shaping_pre = joint_shaping

            collision_rew = jnp.zeros((B,), jnp.float32)
            if self.collision_reward != 0:
                movers = self.world.agents + (
                    [self._mass] if self.asym_package else []
                )
                for a in movers:
                    for passage in self._collide_passages:
                        collision_rew = collision_rew + jnp.where(
                            self.world.get_distance(a, passage)
                            <= self.min_collision_distance,
                            self.collision_reward,
                            0.0,
                        )
                    for wall in self._walls:
                        collision_rew = collision_rew + jnp.where(
                            self.world.get_distance(a, wall)
                            <= self.min_collision_distance,
                            self.collision_reward,
                            0.0,
                        )
            self.collision_rew = collision_rew

            if self.energy_reward_coeff != 0:
                energy_expenditure = jnp.sum(
                    jnp.stack(
                        [
                            jnp.linalg.norm(a.action.u, axis=-1)
                            / math.sqrt(
                                self.world.dim_p
                                * ((a.u_range * a.u_multiplier) ** 2)
                            )
                            for a in self.world.agents
                        ],
                        axis=1,
                    ),
                    axis=-1,
                )
                self.energy_rew = -energy_expenditure * self.energy_reward_coeff
            else:
                self.energy_rew = jnp.zeros((B,), jnp.float32)

            self.rew = (
                self.pos_rew
                + self.rot_rew
                + self.collision_rew
                + self.energy_rew
            )
        return self.rew

    def process_action(self, agent):
        if self.use_vel_controller:
            vel_is_zero = jnp.linalg.norm(agent.action.u, axis=1) < 1e-3
            agent.controller.reset(vel_is_zero)
            agent.controller.process_force()

    def observation(self, agent):
        if self.observe_joint_angle:
            joint_angle = self._joint.landmark.state.rot
            if self.joint_angle_obs_noise:
                joint_angle = (
                    joint_angle
                    + jax.random.normal(
                        self.world.next_key(), joint_angle.shape
                    )
                    * self.joint_angle_obs_noise
                )
        observations = [
            agent.state.pos,
            agent.state.vel,
            agent.state.pos - self._goal.state.pos,
            agent.state.pos - self.big_passage_pos,
            agent.state.pos - self.small_passage_pos,
            angle_to_vector(self._goal.state.rot),
        ] + (
            [angle_to_vector(joint_angle)] if self.observe_joint_angle else []
        )
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

    def done(self):
        return jnp.all(
            (
                jnp.linalg.norm(
                    self._joint.landmark.state.pos - self._goal.state.pos,
                    axis=1,
                )
                <= 0.01
            )[:, None]
            & (
                get_line_angle_dist_0_180(
                    self._joint.landmark.state.rot, self._goal.state.rot
                )[:, None]
                <= 0.01
            ),
            axis=1,
        )

    def info(self, agent):
        is_first = self.world.agents[0] is agent
        if is_first:
            just_passed = self.all_passed & (self.passed == 0)
            self.passed = jnp.where(just_passed, 100.0, self.passed)
            self._info_stored = {
                "pos_rew": self.pos_rew,
                "rot_rew": self.rot_rew,
                "collision_rew": self.collision_rew,
                "energy_rew": self.energy_rew,
                "passed": just_passed.astype(jnp.int32),
            }
        return self._info_stored

    def extra_render(self, env_index: int = 0):
        import numpy as np

        from vectorizedmultiagentsimulator_tpu import render as rendering

        geoms = []
        color = self._goal.color
        goal_pos = np.asarray(self._goal.state.pos)[env_index]
        goal_rot = float(np.asarray(self._goal.state.rot)[env_index, 0])
        for sgn, radius in ((-1, self.agent_radius), (1, self.agent_radius_2)):
            circ = rendering.make_circle(radius)
            xform = rendering.Transform()
            circ.add_attr(xform)
            xform.set_translation(
                goal_pos[X] + sgn * self.joint_length / 2 * math.cos(goal_rot),
                goal_pos[Y] + sgn * self.joint_length / 2 * math.sin(goal_rot),
            )
            circ.set_color(*color[:3])
            geoms.append(circ)
        return geoms
