"""Joint_passage scenario (reference ``vmas/scenarios/joint_passage.py``).

Two agents rigidly joined (optionally with an asymmetric mass on the link)
must carry the joint through a passage opening in a wall and pose it on a
goal line — position + rotation shaping with collision penalties.

Jit-native deviations:
 * the per-reset python ``randperm`` endpoint swap (joint_passage.py:286-288)
   becomes a per-env random sign;
 * in ``fixed_passage=False`` mode the data-dependent passage placement loop
   (joint_passage.py:666-681) is re-expressed as a vectorized k-th-free-slot
   computation, and the joint-vs-passage collision filter matches the
   reference's "collide with all" semantics for that mode.
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


def get_line_angle_0_180(rot):
    return rot % jnp.pi


def get_line_angle_dist_0_180(angle, goal):
    angle = get_line_angle_0_180(angle)
    goal = get_line_angle_0_180(jnp.asarray(goal, jnp.float32))
    return jnp.minimum(
        jnp.abs(angle - goal),
        jnp.minimum(
            jnp.abs(angle - (goal - jnp.pi)), jnp.abs((angle - jnp.pi) - goal)
        ),
    ).squeeze(-1)


def angle_to_vector(angle):
    return jnp.concatenate([jnp.cos(angle), jnp.sin(angle)], axis=1)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_passages = kwargs.pop("n_passages", 1)
        self.fixed_passage = kwargs.pop("fixed_passage", True)
        self.joint_length = kwargs.pop("joint_length", 0.5)
        self.random_start_angle = kwargs.pop("random_start_angle", True)
        self.random_goal_angle = kwargs.pop("random_goal_angle", True)
        self.observe_joint_angle = kwargs.pop("observe_joint_angle", False)
        self.joint_angle_obs_noise = kwargs.pop("joint_angle_obs_noise", 0.0)
        self.asym_package = kwargs.pop("asym_package", True)
        self.mass_ratio = kwargs.pop("mass_ratio", 5)
        self.mass_position = kwargs.pop("mass_position", 0.75)
        self.max_speed_1 = kwargs.pop("max_speed_1", None)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1)
        self.rot_shaping_factor = kwargs.pop("rot_shaping_factor", 1)
        self.collision_reward = kwargs.pop("collision_reward", 0)
        self.energy_reward_coeff = kwargs.pop("energy_reward_coeff", 0)
        self.all_passed_rot = kwargs.pop("all_passed_rot", True)
        self.obs_noise = kwargs.pop("obs_noise", 0.0)
        self.use_controller = kwargs.pop("use_controller", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.plot_grid = True
        self.visualize_semidims = False

        world = World(
            batch_dim,
            x_semidim=1,
            y_semidim=1,
            substeps=7 if not self.asym_package else 10,
            joint_force=900 if self.asym_package else 400,
            collision_force=2500 if self.asym_package else 1500,
            drag=0.25 if not self.asym_package else 0.15,
        )
        if not self.observe_joint_angle:
            assert self.joint_angle_obs_noise == 0

        self.middle_angle = jnp.pi / 2
        self.n_agents = 2
        self.agent_radius = 0.03333
        self.mass_radius = self.agent_radius * (2 / 3)
        self.passage_width = 0.2
        self.passage_length = 0.1476
        self.scenario_length = 2 * world.x_semidim + 2 * self.agent_radius
        self.n_boxes = int(self.scenario_length // self.passage_length)
        self.min_collision_distance = 0.005
        assert 1 <= self.n_passages <= self.n_boxes

        controller_params = [2.0, 10, 0.00001]

        agent = Agent(
            name="agent_0",
            shape=Sphere(self.agent_radius),
            obs_noise=self.obs_noise,
            render_action=True,
            u_multiplier=0.8,
            f_range=0.8,
        )
        agent.controller = VelocityController(
            agent, world, controller_params, "standard"
        )
        world.add_agent(agent)
        agent = Agent(
            name="agent_1",
            shape=Sphere(self.agent_radius),
            mass=1 if self.asym_package else self.mass_ratio,
            color=Color.BLUE,
            max_speed=self.max_speed_1,
            obs_noise=self.obs_noise,
            render_action=True,
            u_multiplier=0.8,
            f_range=0.8,
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
            collidable=True,
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

    # -------------------------------------------------------------- #
    # Passage map
    # -------------------------------------------------------------- #
    def _fixed_passage_indexes(self):
        """Deterministic open-slot indexes (joint_passage.py:649-655)."""
        indexes = []
        j = self.n_boxes // 2
        for i in range(self.n_passages):
            j += i * (-1 if i % 2 == 0 else 1)
            indexes.append(j)
        return indexes

    def create_passage_map(self, world: World):
        self._passages = []
        self._collide_passages = []
        self._non_collide_passages = []

        def removed(i):
            return (
                (self.n_boxes // 2) - self.n_passages / 2
                <= i
                < (self.n_boxes // 2) + self.n_passages / 2
            )

        for i in range(self.n_boxes):
            passage = Landmark(
                name=f"passage {i}",
                collide=not removed(i),
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

        if self.fixed_passage:
            # Static neighbour flags: a collide passage adjacent to an open
            # slot collides with the joint line (joint_passage.py:615-621).
            indexes = set(self._fixed_passage_indexes())
            slots = []
            i = 0
            for _ in self._collide_passages:
                while i in indexes:
                    i += 1
                slots.append(i)
                i += 1
            neighbour_set = set()
            for p, slot in zip(self._collide_passages, slots):
                if (slot - 1) in indexes or (slot + 1) in indexes:
                    neighbour_set.add(p.name)
            self._fixed_collide_slots = slots

            def joint_collides(e):
                return e.name in neighbour_set

        else:

            def joint_collides(e):
                return e in self._collide_passages

        self._joint.landmark.collision_filter = joint_collides

    def _slot_pos(self, i):
        """Slot index (int or [B] array) -> position [., 2]."""
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
        if self.fixed_passage:
            open_idx = jnp.asarray(
                [
                    jnp.full((B,), j)
                    for j in self._fixed_passage_indexes()
                ]
            ).T  # [B, n_passages]
            collide_slots = jnp.asarray(self._fixed_collide_slots)[
                None
            ].repeat(B, axis=0)
        else:
            open_idx = jax.random.randint(
                self.world.next_key(),
                (B, self.n_passages),
                0,
                self.n_boxes - 1,
            )
            # k-th free slot per env, over an extended range so all collide
            # passages fit even when open slots cluster at the end.
            n_ext = self.n_boxes + self.n_passages + 1
            slots = jnp.arange(n_ext)  # [S]
            is_open = jnp.any(
                slots[None, :, None] == open_idx[:, None, :], axis=-1
            )  # [B, S]
            free_rank = jnp.cumsum(~is_open, axis=1)  # [B, S] 1-indexed
            collide_slots = jnp.stack(
                [
                    jnp.argmax(free_rank == (k + 1), axis=1)
                    for k in range(len(self._collide_passages))
                ],
                axis=1,
            )  # [B, n_collide]

        for k, passage in enumerate(self._non_collide_passages):
            passage.is_rendering = jnp.zeros((B,), dtype=bool)
            passage.set_pos(
                self._slot_pos(open_idx[:, k]), batch_index=env_index
            )
        for k, passage in enumerate(self._collide_passages):
            passage.set_pos(
                self._slot_pos(collide_slots[:, k]), batch_index=env_index
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

    # -------------------------------------------------------------- #
    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        keys = jax.random.split(self.world.next_key(), 5)
        if self.random_start_angle:
            start_angle = jax.random.uniform(
                keys[0], (B, 1), minval=-jnp.pi / 2, maxval=jnp.pi / 2
            )
        else:
            start_angle = jnp.zeros((B, 1))
        if self.random_goal_angle:
            goal_angle = jax.random.uniform(
                keys[1], (B, 1), minval=-jnp.pi / 2, maxval=jnp.pi / 2
            )
        else:
            goal_angle = jnp.zeros((B, 1))

        start_delta = (self.joint_length / 2) * jnp.concatenate(
            [jnp.cos(start_angle), jnp.sin(start_angle)], axis=1
        )
        sdx_abs = jnp.abs(start_delta[:, :1])
        sdy_abs = jnp.abs(start_delta[:, 1:])
        min_x_start = -self.world.x_semidim + self.agent_radius + sdx_abs
        max_x_start = self.world.x_semidim - (self.agent_radius + sdx_abs)
        min_y_start = -self.world.y_semidim + self.agent_radius + sdy_abs
        max_y_start = (
            -2 * self.agent_radius - self.passage_width / 2 - sdy_abs
        )

        goal_delta = (self.joint_length / 2) * jnp.concatenate(
            [jnp.cos(goal_angle), jnp.sin(goal_angle)], axis=1
        )
        gdx_abs = jnp.abs(goal_delta[:, :1])
        gdy_abs = jnp.abs(goal_delta[:, 1:])
        min_x_goal = -self.world.x_semidim + self.agent_radius + gdx_abs
        max_x_goal = self.world.x_semidim - (self.agent_radius + gdx_abs)
        min_y_goal = (
            2 * self.agent_radius + self.passage_width / 2 + gdy_abs
        )
        max_y_goal = self.world.y_semidim - (self.agent_radius + gdy_abs)

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

        sign = jnp.where(
            jax.random.bernoulli(keys[4], shape=(B, 1)), 1.0, -1.0
        )
        for i, agent in enumerate(self.world.agents):
            agent.controller.reset(env_index)
            agent.set_pos(
                joint_pos + sign * start_delta * (-1 if i == 0 else 1),
                batch_index=env_index,
            )
        if self.asym_package:
            self._mass.set_pos(
                joint_pos + self.mass_position * start_delta * sign,
                batch_index=env_index,
            )

        self.spawn_passage_map(env_index)
        self.spawn_walls(env_index)

        pos_shaping_pre = (
            jnp.min(
                jnp.stack(
                    [
                        jnp.linalg.norm(
                            self._joint.landmark.state.pos - p.state.pos,
                            axis=1,
                        )
                        for p in self._non_collide_passages
                    ],
                    axis=1,
                ),
                axis=1,
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
            get_line_angle_dist_0_180(
                self._joint.landmark.state.rot, self.middle_angle
            )
            * self.rot_shaping_factor
        )
        rot_shaping_post = (
            get_line_angle_dist_0_180(
                self._joint.landmark.state.rot, self._goal.state.rot
            )
            * self.rot_shaping_factor
        )
        if env_index is None:
            self.passed = jnp.zeros((B,), jnp.float32)
            self.pos_shaping_pre = pos_shaping_pre
            self.pos_shaping_post = pos_shaping_post
            self.rot_shaping_pre = rot_shaping_pre
            self.rot_shaping_post = rot_shaping_post
            self.pos_rew = jnp.zeros((B,), jnp.float32)
            self.rot_rew = jnp.zeros((B,), jnp.float32)
            self.collision_rew = jnp.zeros((B,), jnp.float32)
            self.energy_rew = jnp.zeros((B,), jnp.float32)
            self.energy_expenditure = jnp.zeros((B,), jnp.float32)
            self.all_passed = jnp.zeros((B,), dtype=bool)
            self.rew = jnp.zeros((B,), jnp.float32)
        else:
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
            self.rot_shaping_post = JaxUtils.where_from_index(
                env_index, rot_shaping_post, self.rot_shaping_post
            )

    def reward(self, agent):
        is_first = agent is self.world.agents[0]
        if is_first:
            B = self.world.batch_dim
            joint_passed = self._joint.landmark.state.pos[:, Y] > 0
            self.all_passed = jnp.all(
                jnp.stack(
                    [a.state.pos[:, Y] for a in self.world.agents], axis=1
                )
                > self.passage_width / 2,
                axis=1,
            )

            joint_dist_to_closest_pass = jnp.min(
                jnp.stack(
                    [
                        jnp.linalg.norm(
                            self._joint.landmark.state.pos - p.state.pos,
                            axis=1,
                        )
                        for p in self._non_collide_passages
                    ],
                    axis=1,
                ),
                axis=1,
            )
            joint_shaping = joint_dist_to_closest_pass * self.pos_shaping_factor
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

            rot_passed = (
                self.all_passed if self.all_passed_rot else joint_passed
            )
            joint_dist_to_90_rot = get_line_angle_dist_0_180(
                self._joint.landmark.state.rot, self.middle_angle
            )
            joint_shaping = joint_dist_to_90_rot * self.rot_shaping_factor
            rot_rew = jnp.where(
                rot_passed, 0.0, self.rot_shaping_pre - joint_shaping
            )
            self.rot_shaping_pre = joint_shaping

            joint_dist_to_goal_rot = get_line_angle_dist_0_180(
                self._joint.landmark.state.rot, self._goal.state.rot
            )
            joint_shaping = joint_dist_to_goal_rot * self.rot_shaping_factor
            rot_rew = rot_rew + jnp.where(
                rot_passed, self.rot_shaping_post - joint_shaping, 0.0
            )
            self.rot_shaping_post = joint_shaping
            self.rot_rew = rot_rew

            collision_rew = jnp.zeros((B,), jnp.float32)
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
            for p in self._collide_passages:
                collision_rew = collision_rew + jnp.where(
                    self.world.get_distance(p, self._joint.landmark)
                    <= self.min_collision_distance,
                    self.collision_reward,
                    0.0,
                )
            self.collision_rew = collision_rew

            self.energy_expenditure = jnp.sum(
                jnp.stack(
                    [
                        jnp.linalg.norm(a.action.u, axis=-1)
                        / math.sqrt(self.world.dim_p * (a.f_range**2))
                        for a in self.world.agents
                    ],
                    axis=1,
                ),
                axis=-1,
            )
            self.energy_rew = -self.energy_expenditure * self.energy_reward_coeff

            self.rew = (
                self.pos_rew
                + self.rot_rew
                + self.collision_rew
                + self.energy_rew
            )
        return self.rew

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
        passage_obs = [
            agent.state.pos - passage.state.pos
            for passage in self._non_collide_passages
        ]
        observations = [
            agent.state.pos,
            agent.state.vel,
            agent.state.pos - self._goal.state.pos,
            *passage_obs,
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

    def process_action(self, agent):
        if self.use_controller:
            vel_is_zero = jnp.linalg.norm(agent.action.u, axis=1) < 1e-3
            agent.controller.reset(vel_is_zero)
            agent.controller.process_force()

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
        for sgn in (-1, 1):
            circ = rendering.make_circle(self.agent_radius)
            xform = rendering.Transform()
            circ.add_attr(xform)
            xform.set_translation(
                goal_pos[X] + sgn * self.joint_length / 2 * math.cos(goal_rot),
                goal_pos[Y] + sgn * self.joint_length / 2 * math.sin(goal_rot),
            )
            circ.set_color(*color[:3])
            geoms.append(circ)
        return geoms
