"""Road_traffic scenario (reference ``vmas/scenarios/road_traffic.py``).

CAV benchmark on the CPM-Lab HD map: up to 20 kinematic-bicycle vehicles
follow 40 long-term reference-path loops with ego-view partial
observations, progress/velocity rewards and boundary/agent collision
penalties.

TPU-native redesign (the reference resets with per-env python loops and
updates per-agent slices in place, road_traffic.py:917-1423):
 * all 40 reference paths and their shared boundaries are padded to one
   static length at trace time (:mod:`road_traffic_map.PaddedPaths`); the
   only per-agent path state is an integer ``path_id`` in the state pytree
   — every path/boundary read is a gather;
 * the rejection-sampled initial placement becomes bounded masked
   resampling per agent (``lax.while_loop``);
 * perpendicular distances, rectangle-vs-polyline intersection tests
   (``interX``) and ego-frame transforms are computed densely over
   ``[B, n_agents, ...]``;
 * supported config: ``map_type='1'`` (the default — train on the whole
   map) with ``n_observed_steps=1``; the initial-state-buffer map types
   ('2'/'3') and ``is_testing_mode`` per-agent resets are data-dependent
   python control flow in the reference and are not supported under jit.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core import Agent, Box, World
from vectorizedmultiagentsimulator_tpu.dynamics import KinematicBicycle
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.scenarios import road_traffic_map as rtm
from vectorizedmultiagentsimulator_tpu.utils import (
    Color,
    JaxUtils,
    ScenarioUtils,
    X,
    Y,
)


# ---------------------------------------------------------------------- #
# Vectorized geometry helpers (road_traffic.py:3281-3711)
# ---------------------------------------------------------------------- #
def get_rectangle_vertices(center, yaw, width, length, is_close_shape=True):
    """center [..., 2], yaw [...] -> vertices [..., 5 or 4, 2]."""
    w, l = width / 2, length / 2
    base = [[l, w], [l, -w], [-l, -w], [-l, w]]
    if is_close_shape:
        base = base + [[l, w]]
    base = jnp.asarray(base, jnp.float32)  # [V, 2]
    cos = jnp.cos(yaw)[..., None]
    sin = jnp.sin(yaw)[..., None]
    vx = base[..., 0] * cos - base[..., 1] * sin
    vy = base[..., 0] * sin + base[..., 1] * cos
    return jnp.stack([vx, vy], axis=-1) + center[..., None, :]


def get_perpendicular_distances(point, polyline, n_points):
    """point [..., 2], polyline [..., P, 2], n_points [...] ->
    (min distance [...], index of closest point + 1 [...])."""
    line_starts = polyline[..., :-1, :]
    line_vecs = polyline[..., 1:, :] - line_starts
    point_vecs = point[..., None, :] - line_starts
    line_lens_sq = jnp.sum(line_vecs**2, axis=-1) + 1e-8
    t = jnp.clip(
        jnp.sum(point_vecs * line_vecs, axis=-1) / line_lens_sq, 0.0, 1.0
    )
    closest = line_starts + line_vecs * t[..., None]
    d = jnp.linalg.norm(closest - point[..., None, :], axis=-1)  # [..., P-1]
    # Segments at/after the true end take the distance of segment n-2
    # (road_traffic.py:3440-3445).
    seg_idx = jnp.arange(d.shape[-1])
    end_idx = jnp.maximum(n_points - 2, 0)
    d_end = jnp.take_along_axis(d, end_idx[..., None], axis=-1)
    d = jnp.where(seg_idx >= (n_points - 1)[..., None], d_end, d)
    dist = jnp.min(d, axis=-1)
    idx = jnp.argmin(d, axis=-1) + 1
    return dist, idx


def get_short_term_reference_path(
    polyline,
    index_closest_point,
    n_points_to_return,
    is_loop,
    n_points,
    sample_interval=2,
    n_points_shift=1,
):
    """polyline [..., P, 2]; returns [..., n_points_to_return, 2]."""
    future = (
        jnp.arange(n_points_to_return) * sample_interval
        + index_closest_point[..., None]
        + n_points_shift
    )  # [..., n_ret]
    n = n_points[..., None]
    future = jnp.where(
        is_loop[..., None] & (future >= n - 1), (future + 1) % n, future
    )
    future = jnp.clip(future, 0, polyline.shape[-2] - 1)
    return jnp.take_along_axis(
        polyline, future[..., None].repeat(2, axis=-1), axis=-2
    ), future


def segments_intersect(L1, L2):
    """Strict segment-intersection test between two polylines
    (the reference's ``interX``, road_traffic.py:3564-3647).

    L1 [..., N1, 2], L2 [..., N2, 2] -> bool [...]: any segment of L1
    strictly crosses any segment of L2.
    """
    p1 = L1[..., :-1, :]
    p2 = L1[..., 1:, :]
    q1 = L2[..., :-1, :]
    q2 = L2[..., 1:, :]

    def cross(a, b):
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    # Broadcast: [..., N1-1, 1, 2] vs [..., 1, N2-1, 2]
    p1e, p2e = p1[..., :, None, :], p2[..., :, None, :]
    q1e, q2e = q1[..., None, :, :], q2[..., None, :, :]
    d1 = cross(q2e - q1e, p1e - q1e)
    d2 = cross(q2e - q1e, p2e - q1e)
    d3 = cross(p2e - p1e, q1e - p1e)
    d4 = cross(p2e - p1e, q2e - p1e)
    hit = (d1 * d2 < 0) & (d3 * d4 < 0)
    return jnp.any(hit, axis=(-2, -1))


def exponential_decreasing_fcn(x, x0, x1):
    x_clamped = jnp.clip(x, x0, x1)
    e_inv = 1 / jnp.e
    return (jnp.exp(-(x_clamped - x0) / (x1 - x0)) - e_inv) / (1 - e_inv)


def angle_eliminate_two_pi(angle):
    two_pi = 2 * jnp.pi
    angle = angle % two_pi
    return jnp.where(angle > jnp.pi, angle - two_pi, angle)


def _to_local(vec, rot_i):
    """Rotate global displacement(s) ``vec`` [..., 2] into the ego frame of
    heading ``rot_i`` [...] (road_traffic.py:3650-3683)."""
    return JaxUtils.rotate_vector(vec, -rot_i)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.init_params(batch_dim, **kwargs)
        self.visualize_semidims = False
        world = World(
            batch_dim,
            x_semidim=self.world_x_dim,
            y_semidim=self.world_y_dim,
            dt=self.dt,
        )
        for i in range(self.n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}",
                    shape=Box(
                        length=self.l_f + self.l_r, width=self.agent_width
                    ),
                    color=tuple(np.random.rand(3).tolist()),
                    collide=False,
                    u_range=[self.max_speed, self.max_steering_angle],
                    u_multiplier=[1, 1],
                    max_speed=self.max_speed,
                    dynamics=KinematicBicycle(
                        world,
                        width=self.agent_width,
                        l_f=self.l_f,
                        l_r=self.l_r,
                        max_steering_angle=self.max_steering_angle,
                        integration="rk4",
                    ),
                )
            )
        return world

    def init_params(self, batch_dim, **kwargs):
        self.world_x_dim = kwargs.pop("world_x_dim", 4.5)
        self.world_y_dim = kwargs.pop("world_y_dim", 4.0)
        self.agent_width = kwargs.pop("agent_width", 0.08)
        self.agent_length = kwargs.pop("agent_length", 0.16)
        self.l_f = kwargs.pop("l_f", self.agent_length / 2)
        self.l_r = kwargs.pop("l_r", self.agent_length - self.l_f)
        lane_width = kwargs.pop("lane_width", 0.15)

        r_p_normalizer = 100
        self.reward_progress = kwargs.pop("reward_progress", 10) / r_p_normalizer
        self.reward_vel = kwargs.pop("reward_vel", 5) / r_p_normalizer
        self.reward_reach_goal = (
            kwargs.pop("reward_reach_goal", 0) / r_p_normalizer
        )

        self.threshold_deviate_from_ref_path = kwargs.pop(
            "threshold_deviate_from_ref_path",
            (lane_width - self.agent_width) / 2,
        )
        self.threshold_reach_goal = kwargs.pop(
            "threshold_reach_goal", self.agent_width / 2
        )
        self.threshold_change_steering = kwargs.pop(
            "threshold_change_steering", 10
        )
        self.threshold_near_boundary_high = kwargs.pop(
            "threshold_near_boundary_high",
            (lane_width - self.agent_width) / 2 * 0.9,
        )
        self.threshold_near_boundary_low = kwargs.pop(
            "threshold_near_boundary_low", 0
        )
        self.threshold_near_other_agents_c2c_high = kwargs.pop(
            "threshold_near_other_agents_c2c_high",
            self.agent_length + self.agent_width,
        )
        self.threshold_near_other_agents_c2c_low = kwargs.pop(
            "threshold_near_other_agents_c2c_low",
            (self.agent_length + self.agent_width) / 2,
        )
        kwargs.pop("threshold_no_reward_if_too_close_to_boundaries", None)
        kwargs.pop("threshold_no_reward_if_too_close_to_other_agents", None)

        self.resolution_factor = kwargs.pop("resolution_factor", 200)
        self.sample_interval_ref_path = kwargs.pop(
            "sample_interval_ref_path", 2
        )
        kwargs.pop("max_ref_path_points", None)
        self.noise_level = kwargs.pop("noise_level", 0.2 * self.agent_width)
        kwargs.pop("n_stored_steps", None)
        n_observed_steps = kwargs.pop("n_observed_steps", 1)
        assert n_observed_steps == 1, (
            "The jit-native road_traffic supports n_observed_steps=1 (the"
            " default)."
        )
        self.render_origin = kwargs.pop(
            "render_origin", [self.world_x_dim / 2, self.world_y_dim / 2]
        )
        self.viewer_size = kwargs.pop(
            "viewer_size",
            (
                int(self.world_x_dim * self.resolution_factor),
                int(self.world_y_dim * self.resolution_factor),
            ),
        )
        self.max_steering_angle = float(
            kwargs.pop("max_steering_angle", math.radians(35))
        )
        self.max_speed = kwargs.pop("max_speed", 1.0)
        self.viewer_zoom = kwargs.pop("viewer_zoom", 1.44)

        # Parameters subset (reference Parameters class defaults)
        self.n_agents = kwargs.pop("n_agents", 20)
        self.is_partial_observation = kwargs.pop(
            "is_partial_observation", True
        )
        is_testing_mode = kwargs.pop("is_testing_mode", False)
        assert not is_testing_mode, (
            "is_testing_mode uses data-dependent per-agent resets and is not"
            " supported under jit."
        )
        self.is_visualize_short_term_path = kwargs.pop(
            "is_visualize_short_term_path", True
        )
        map_type = kwargs.pop("map_type", "1")
        assert map_type == "1", (
            "The jit-native road_traffic supports map_type='1' (the"
            " default); map types 2/3 rely on python-side state buffers."
        )
        self.n_nearing_agents_observed = kwargs.pop(
            "n_nearing_agents_observed", 2
        )
        kwargs.pop("is_real_time_rendering", None)
        self.n_points_short_term = kwargs.pop("n_points_short_term", 3)
        self.dt = kwargs.pop("dt", 0.05)
        self.is_ego_view = kwargs.pop("is_ego_view", True)
        self.is_apply_mask = kwargs.pop("is_apply_mask", True)
        self.is_observe_vertices = kwargs.pop("is_observe_vertices", True)
        self.is_observe_distance_to_agents = kwargs.pop(
            "is_observe_distance_to_agents", True
        )
        self.is_observe_distance_to_boundaries = kwargs.pop(
            "is_observe_distance_to_boundaries", True
        )
        self.is_observe_distance_to_center_line = kwargs.pop(
            "is_observe_distance_to_center_line", True
        )
        kwargs.pop("scenario_probabilities", None)
        self.is_add_noise = kwargs.pop("is_add_noise", True)
        self.is_observe_ref_path_other_agents = kwargs.pop(
            "is_observe_ref_path_other_agents", False
        )
        kwargs.pop("is_visualize_extra_info", None)
        kwargs.pop("render_title", None)
        kwargs.pop("n_steps_stored", None)
        kwargs.pop("n_steps_before_recording", None)
        self.n_points_nearing_boundary = kwargs.pop(
            "n_points_nearing_boundary", 5
        )
        kwargs.pop("parameters", None)
        kwargs.pop("is_prb", None)
        kwargs.pop("probability_record", None)
        kwargs.pop("probability_use_recording", None)

        if self.n_nearing_agents_observed >= self.n_agents:
            raise ValueError(
                "n_nearing_agents_observed must be less than n_agents"
            )

        # Map + reference paths (trace-time numpy)
        map_file_path = kwargs.pop("map_file_path", None)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        self.map_data = rtm.get_map_data(map_file_path)
        paths_all, _, _, _ = rtm.get_reference_paths(self.map_data)
        n_extend = self.n_points_short_term * self.sample_interval_ref_path
        max_points = (
            max(p["center_line"].shape[0] for p in paths_all) + n_extend + 2
        )
        self.paths = rtm.PaddedPaths(paths_all, n_extend, max_points)
        self.n_paths = len(paths_all)
        self.max_ref_points = max_points

        # Normalizers (road_traffic.py:723-745)
        self.normalizer_pos = self.agent_length * 10
        self.normalizer_pos_world = np.asarray(
            [self.world_x_dim, self.world_y_dim], np.float32
        )
        self.normalizer_v = self.max_speed
        self.normalizer_rot = 2 * np.pi
        self.normalizer_action_steering = self.max_steering_angle
        self.normalizer_action_vel = self.max_speed
        self.normalizer_distance_lanelet = lane_width * 3
        self.normalizer_distance_ref = lane_width * 3

        # Penalties (road_traffic.py:491-509)
        self.penalty_deviate_from_ref_path = -2 / 100
        self.penalty_weighting_deviate_from_ref_path = (
            self.map_data["mean_lane_width"] / 2
        )
        self.penalty_near_boundary = -20 / 100
        self.penalty_near_other_agents = -20 / 100
        self.penalty_collide_with_agents = -100 / 100
        self.penalty_collide_with_boundaries = -100 / 100
        self.penalty_change_steering = -2 / 100
        self.penalty_time = 5 / 100

        w = np.linspace(1, 0.2, self.n_points_short_term, dtype=np.float32)
        self.weighting_ref_directions = w / w.sum()

        self.distance_mask_agents = self.normalizer_pos
        self.reset_agent_min_distance = (
            math.sqrt((self.l_f + self.l_r) ** 2 + self.agent_width**2) * 1.2
        )

    # ------------------------------------------------------------------ #
    # Gathered per-agent path data
    # ------------------------------------------------------------------ #
    def _gather(self, table):
        """table [n_paths, ...] indexed by path_id [B, A] -> [B, A, ...]."""
        return jnp.asarray(table)[self.path_id]

    # ------------------------------------------------------------------ #
    def reset_world_at(self, env_index=None):
        B = self.world.batch_dim
        A = self.n_agents
        centers = jnp.asarray(self.paths.center)  # [n_paths, P, 2]
        n_points = jnp.asarray(self.paths.n_points)  # [n_paths]
        yaw_vec = jnp.asarray(self.paths.vec_norm)  # [n_paths, P, 2]

        if env_index is None and not self.world.has_extra("scenario.path_id"):
            self.path_id = jnp.zeros((B, A), jnp.int32)

        placed = jnp.full((B, A, 2), 1e6, jnp.float32)
        new_path_id = (
            self.path_id
            if self.world.has_extra("scenario.path_id")
            else jnp.zeros((B, A), jnp.int32)
        )
        min_d2 = self.reset_agent_min_distance**2

        for i, agent in enumerate(self.world.agents):
            key = self.world.next_key()

            def propose(k):
                k1, k2 = jax.random.split(k)
                pid = jax.random.randint(k1, (B,), 0, self.n_paths)
                n = n_points[pid]
                # point_id in [6, n/2) (road_traffic.py:1146-1152)
                hi = jnp.maximum((n / 2).astype(jnp.int32), 7)
                u = jax.random.uniform(k2, (B,))
                point = 6 + (u * (hi - 6)).astype(jnp.int32)
                pos = centers[pid, point]
                return pid, point, pos

            def too_close(pos):
                d2 = jnp.sum((placed - pos[:, None]) ** 2, axis=-1)
                return jnp.any(d2 < min_d2, axis=-1)

            key, sub = jax.random.split(key)
            pid, point, pos = propose(sub)

            def cond(carry):
                k, pid, point, pos, tries = carry
                return jnp.any(too_close(pos)) & (tries < 100)

            def body(carry):
                k, pid, point, pos, tries = carry
                k, sub = jax.random.split(k)
                pid2, point2, pos2 = propose(sub)
                bad = too_close(pos)
                pid = jnp.where(bad, pid2, pid)
                point = jnp.where(bad, point2, point)
                pos = jnp.where(bad[:, None], pos2, pos)
                return k, pid, point, pos, tries + 1

            key, pid, point, pos, _ = jax.lax.while_loop(
                cond, body, (key, pid, point, pos, jnp.int32(0))
            )
            placed = placed.at[:, i].set(pos)
            new_path_id = new_path_id.at[:, i].set(pid)

            rot = jnp.arctan2(
                yaw_vec[pid, point - 1, 1], yaw_vec[pid, point - 1, 0]
            )
            key, kv = jax.random.split(key)
            vel_abs = jax.random.uniform(kv, (B,)) * self.max_speed
            vel = jnp.stack(
                [vel_abs * jnp.cos(rot), vel_abs * jnp.sin(rot)], axis=-1
            )
            agent.set_pos(pos, batch_index=env_index)
            agent.set_rot(rot[:, None], batch_index=env_index)
            agent.set_vel(vel, batch_index=env_index)

        if env_index is None:
            self.path_id = new_path_id
        else:
            self.path_id = JaxUtils.where_from_index(
                env_index, new_path_id, self.path_id
            )

        # Initialize derived state
        positions = jnp.stack(
            [a.state.pos for a in self.world.agents], axis=1
        )
        rotations = jnp.stack(
            [a.state.rot[:, 0] for a in self.world.agents], axis=1
        )
        short_term, dists = self._compute_geometry(positions, rotations)

        def init_or_mask(name, value):
            if env_index is None:
                setattr(self, name, value)
            else:
                setattr(
                    self,
                    name,
                    JaxUtils.where_from_index(
                        env_index, value, getattr(self, name)
                    ),
                )

        init_or_mask("short_term", short_term)
        init_or_mask("prev_pos", positions)
        init_or_mask("distances_agents", self._mutual_distances(positions))
        init_or_mask("distances_ref", dists["ref"])
        init_or_mask("distances_left_b", dists["left_all"])
        init_or_mask("distances_right_b", dists["right_all"])
        init_or_mask("distances_boundaries", dists["boundaries"])
        init_or_mask(
            "collide_agents", jnp.zeros((B, A, A), dtype=bool)
        )
        init_or_mask("collide_lanelets", jnp.zeros((B, A), dtype=bool))
        init_or_mask(
            "steering_hist", jnp.zeros((B, A, 2), jnp.float32)
        )
        if env_index is None:
            self.rew_buf = jnp.zeros((B,), jnp.float32)

    def _mutual_distances(self, positions):
        """Center-to-center distances with high diagonal
        (road_traffic.py:3686-3711)."""
        d = jnp.linalg.norm(
            positions[:, :, None] - positions[:, None], axis=-1
        )
        big = jnp.max(d, axis=(-2, -1), keepdims=True) + 1
        eye = jnp.eye(self.n_agents, dtype=bool)[None]
        return jnp.where(eye, big, d)

    def _compute_geometry(self, positions, rotations):
        """All per-agent path geometry for the current poses.

        positions [B, A, 2], rotations [B, A] ->
        (short_term [B, A, n_short, 2], dists dict)
        """
        long_term = self._gather(self.paths.center)  # [B, A, P, 2]
        left_b = self._gather(self.paths.left)
        right_b = self._gather(self.paths.right)
        n_pts = self._gather(self.paths.n_points)
        n_left = self._gather(self.paths.n_left)
        n_right = self._gather(self.paths.n_right)
        is_loop = self._gather(self.paths.is_loop)

        dist_ref, idx_ref = get_perpendicular_distances(
            positions, long_term, n_pts
        )
        c2l, _ = get_perpendicular_distances(positions, left_b, n_left)
        c2r, _ = get_perpendicular_distances(positions, right_b, n_right)

        vertices = get_rectangle_vertices(
            positions, rotations, self.agent_width, self.l_f + self.l_r
        )  # [B, A, 5, 2]
        # Distances from the 4 vertices to the boundaries
        v4 = vertices[..., :4, :]  # [B, A, 4, 2]
        vl, _ = get_perpendicular_distances(
            v4, left_b[:, :, None], n_left[:, :, None]
        )  # [B, A, 4]
        vr, _ = get_perpendicular_distances(
            v4, right_b[:, :, None], n_right[:, :, None]
        )
        left_all = jnp.concatenate(
            [(c2l - self.agent_width / 2)[..., None], vl], axis=-1
        )  # [B, A, 5]
        right_all = jnp.concatenate(
            [(c2r - self.agent_width / 2)[..., None], vr], axis=-1
        )
        boundaries = jnp.min(
            jnp.concatenate([left_all, right_all], axis=-1), axis=-1
        )

        short_term, _ = get_short_term_reference_path(
            long_term,
            idx_ref,
            self.n_points_short_term,
            is_loop,
            n_pts,
            sample_interval=self.sample_interval_ref_path,
            n_points_shift=1,
        )
        return short_term, {
            "ref": dist_ref,
            "left_all": left_all,
            "right_all": right_all,
            "boundaries": boundaries,
            "vertices": vertices,
            "long_term": long_term,
            "left_b": left_b,
            "right_b": right_b,
        }

    # ------------------------------------------------------------------ #
    def reward(self, agent):
        agent_index = self.world.agents.index(agent)
        is_first = agent_index == 0
        A = self.n_agents
        B = self.world.batch_dim

        if is_first:
            positions = jnp.stack(
                [a.state.pos for a in self.world.agents], axis=1
            )
            rotations = jnp.stack(
                [a.state.rot[:, 0] for a in self.world.agents], axis=1
            )
            self.distances_agents = self._mutual_distances(positions)
            new_short, dists = self._compute_geometry(positions, rotations)
            self._new_short_term = new_short  # applied after rewarding
            self.distances_ref = dists["ref"]
            self.distances_left_b = dists["left_all"]
            self.distances_right_b = dists["right_all"]
            self.distances_boundaries = dists["boundaries"]
            vertices = dists["vertices"]

            # Agent-agent collisions (interX over all pairs)
            collide = jnp.zeros((B, A, A), dtype=bool)
            for i in range(A):
                for j in range(i + 1, A):
                    hit = segments_intersect(
                        vertices[:, i], vertices[:, j]
                    )
                    collide = collide.at[:, i, j].set(hit)
                    collide = collide.at[:, j, i].set(hit)
            self.collide_agents = collide

            # Agent-boundary collisions
            lane_hits = []
            for i in range(A):
                hit_l = segments_intersect(
                    vertices[:, i], dists["left_b"][:, i]
                )
                hit_r = segments_intersect(
                    vertices[:, i], dists["right_b"][:, i]
                )
                lane_hits.append(hit_l | hit_r)
            self.collide_lanelets = jnp.stack(lane_hits, axis=1)

        rew = jnp.zeros((B,), jnp.float32)

        # [reward] forward movement along the (previous) short-term path
        prev = self.prev_pos[:, agent_index]
        move_vec = (agent.state.pos - prev)[:, None]
        ref_points_vecs = self.short_term[:, agent_index] - prev[:, None]
        move_projected = jnp.sum(move_vec * ref_points_vecs, axis=-1)
        move_projected_weighted = move_projected @ jnp.asarray(
            self.weighting_ref_directions
        )
        rew = rew + (
            move_projected_weighted
            / (agent.max_speed * self.world.dt)
            * self.reward_progress
        )

        # [reward] high velocity
        v_proj = jnp.mean(
            jnp.sum(agent.state.vel[:, None] * ref_points_vecs, axis=-1),
            axis=-1,
        )
        factor_moving_direction = jnp.where(v_proj > 0, 1.0, 2.0)
        rew = rew + (
            factor_moving_direction * v_proj / agent.max_speed * self.reward_vel
        )

        # [penalty] close to lanelet boundaries
        rew = rew + (
            exponential_decreasing_fcn(
                self.distances_boundaries[:, agent_index],
                self.threshold_near_boundary_low,
                self.threshold_near_boundary_high,
            )
            * self.penalty_near_boundary
        )

        # [penalty] close to other agents
        rew = rew + (
            jnp.sum(
                exponential_decreasing_fcn(
                    self.distances_agents[:, agent_index],
                    self.threshold_near_other_agents_c2c_low,
                    self.threshold_near_other_agents_c2c_high,
                ),
                axis=1,
            )
            * self.penalty_near_other_agents
        )

        # [penalty] deviating from reference path
        rew = rew + (
            self.distances_ref[:, agent_index]
            / self.penalty_weighting_deviate_from_ref_path
            * self.penalty_deviate_from_ref_path
        )

        # [penalty] changing steering too quickly (uses the two most
        # recently recorded normalized steering actions)
        steering_current = self.steering_hist[:, agent_index, 0]
        steering_past = self.steering_hist[:, agent_index, 1]
        steering_change = jnp.maximum(
            jnp.abs(steering_current - steering_past)
            * self.normalizer_action_steering
            - math.radians(self.threshold_change_steering),
            0.0,
        )
        steering_change_reward_factor = steering_change / (
            2 * self.max_steering_angle
            - 2 * math.radians(self.threshold_change_steering)
        )
        rew = rew + steering_change_reward_factor * self.penalty_change_steering

        # [penalty] collisions
        rew = rew + (
            jnp.any(self.collide_agents[:, agent_index], axis=-1)
            * self.penalty_collide_with_agents
        )
        rew = rew + (
            self.collide_lanelets[:, agent_index]
            * self.penalty_collide_with_boundaries
        )

        # [reward/penalty] time
        rew = rew + (
            jnp.where(v_proj > 0, 1.0, -1.0)
            * jnp.linalg.norm(agent.state.vel, axis=-1)
            / agent.max_speed
            * self.penalty_time
        )

        if agent_index == self.n_agents - 1:
            # Post-reward updates (road_traffic.py:1716-1734)
            self.prev_pos = jnp.stack(
                [a.state.pos for a in self.world.agents], axis=1
            )
            self.short_term = self._new_short_term
        return rew

    _new_short_term = None

    # ------------------------------------------------------------------ #
    def observation(self, agent):
        agent_index = self.world.agents.index(agent)
        B = self.world.batch_dim
        A = self.n_agents

        if agent_index == 0:
            positions = jnp.stack(
                [a.state.pos for a in self.world.agents], axis=1
            )
            rotations = jnp.stack(
                [a.state.rot[:, 0] for a in self.world.agents], axis=1
            )
            vels = jnp.stack(
                [a.state.vel for a in self.world.agents], axis=1
            )
            vertices = get_rectangle_vertices(
                positions, rotations, self.agent_width, self.l_f + self.l_r
            )
            # Ego-frame transforms [B, A_i, A_j, ...]
            rel = positions[:, None, :, :] - positions[:, :, None, :]
            self._obs_pos = (
                _to_local(rel, rotations[:, :, None]) / self.normalizer_pos
                if self.is_ego_view
                else jnp.broadcast_to(
                    positions[:, None] / self.normalizer_pos_world,
                    (B, A, A, 2),
                )
            )
            rot_rel = rotations[:, None, :] - rotations[:, :, None]
            self._obs_rot = rot_rel / self.normalizer_rot
            vel_abs = jnp.linalg.norm(vels, axis=-1)  # [B, A]
            self._obs_vel = (
                jnp.stack(
                    [
                        vel_abs[:, None] * jnp.cos(rot_rel),
                        vel_abs[:, None] * jnp.sin(rot_rel),
                    ],
                    axis=-1,
                )
                / self.normalizer_v
            )  # [B, A_i, A_j, 2]
            vert_rel = vertices[:, None, :, :4, :] - positions[
                :, :, None, None, :
            ]
            self._obs_vertices = (
                _to_local(vert_rel, rotations[:, :, None, None])
                / self.normalizer_pos
            )  # [B, A_i, A_j, 4, 2]
            # Own short-term ref path in ego frame
            ref_rel = self.short_term - positions[:, :, None, :]
            self._obs_ref_self = (
                _to_local(ref_rel, rotations[:, :, None]) / self.normalizer_pos
            )  # [B, A, n_short, 2]
            self._obs_dist_agents = (
                self.distances_agents / self.normalizer_distance_lanelet
            )
            # Record the latest normalized steering actions for the
            # steering-change penalty of the next step.
            steering_now = jnp.stack(
                [
                    a.action.u[:, 1] / self.normalizer_action_steering
                    for a in self.world.agents
                ],
                axis=1,
            )
            self.steering_hist = jnp.stack(
                [steering_now, self.steering_hist[:, :, 0]], axis=-1
            )

        # --- other agents (partial observation, top-k nearest) --- #
        dists_i = self._obs_dist_agents[:, agent_index]  # [B, A]
        k = self.n_nearing_agents_observed
        if self.is_partial_observation:
            neg, idx = jax.lax.top_k(-dists_i, k)
            nearing_dist = -neg  # [B, k]
            if self.is_apply_mask:
                mask_far = (
                    nearing_dist * self.normalizer_distance_lanelet
                    >= self.distance_mask_agents
                )
            else:
                mask_far = jnp.zeros((B, k), dtype=bool)

            obs_pos_other = jnp.take_along_axis(
                self._obs_pos[:, agent_index], idx[..., None], axis=1
            )
            obs_pos_other = jnp.where(mask_far[..., None], 1.0, obs_pos_other)
            obs_rot_other = jnp.take_along_axis(
                self._obs_rot[:, agent_index], idx, axis=1
            )
            obs_rot_other = jnp.where(mask_far, 0.0, obs_rot_other)
            obs_vel_other = jnp.take_along_axis(
                self._obs_vel[:, agent_index], idx[..., None], axis=1
            )
            obs_vel_other = jnp.where(mask_far[..., None], 0.0, obs_vel_other)
            obs_vert_other = jnp.take_along_axis(
                self._obs_vertices[:, agent_index],
                idx[..., None, None],
                axis=1,
            )
            obs_vert_other = jnp.where(
                mask_far[..., None, None], 1.0, obs_vert_other
            )
            obs_dist_other = jnp.take_along_axis(dists_i, idx, axis=1)
            obs_dist_other = jnp.where(mask_far, 1.0, obs_dist_other)
        else:
            k = A
            obs_pos_other = self._obs_pos[:, agent_index]
            obs_rot_other = self._obs_rot[:, agent_index]
            obs_vel_other = self._obs_vel[:, agent_index]
            obs_vert_other = self._obs_vertices[:, agent_index]
            obs_dist_other = dists_i.at[:, agent_index].set(0.0)

        others = [
            obs_vert_other.reshape(B, k, -1)
            if self.is_observe_vertices
            else jnp.concatenate(
                [
                    obs_pos_other.reshape(B, k, -1),
                    obs_rot_other.reshape(B, k, -1),
                ],
                axis=-1,
            ),
            obs_vel_other.reshape(B, k, -1),
        ]
        if self.is_observe_distance_to_agents:
            others.append(obs_dist_other.reshape(B, k, -1))
        obs_other_agents = jnp.concatenate(others, axis=-1).reshape(B, -1)

        # --- self observation --- #
        obs_self = []
        if not self.is_ego_view:
            obs_self.append(
                self._obs_pos[:, agent_index, agent_index].reshape(B, -1)
            )
            obs_self.append(
                self._obs_rot[:, agent_index, agent_index].reshape(B, -1)
            )
            obs_self.append(
                self._obs_vel[:, agent_index, agent_index].reshape(B, -1)
            )
        else:
            # In the ego frame only the longitudinal velocity is informative
            obs_self.append(
                self._obs_vel[:, agent_index, agent_index, 0].reshape(B, -1)
            )
        obs_self.append(self._obs_ref_self[:, agent_index].reshape(B, -1))
        if self.is_observe_distance_to_center_line:
            obs_self.append(
                (
                    self.distances_ref[:, agent_index]
                    / self.normalizer_distance_lanelet
                ).reshape(B, -1)
            )
        if self.is_observe_distance_to_boundaries:
            obs_self.append(
                (
                    jnp.min(self.distances_left_b[:, agent_index], axis=-1)
                    / self.normalizer_distance_lanelet
                ).reshape(B, -1)
            )
            obs_self.append(
                (
                    jnp.min(self.distances_right_b[:, agent_index], axis=-1)
                    / self.normalizer_distance_lanelet
                ).reshape(B, -1)
            )

        obs = jnp.concatenate(obs_self + [obs_other_agents], axis=-1)
        if self.is_add_noise:
            obs = obs + self.noise_level * jax.random.uniform(
                self.world.next_key(), obs.shape
            )
        return obs

    def done(self):
        is_collision_with_agents = jnp.any(
            self.collide_agents.reshape(self.world.batch_dim, -1), axis=-1
        )
        is_collision_with_lanelets = jnp.any(self.collide_lanelets, axis=-1)
        return is_collision_with_agents | is_collision_with_lanelets

    def info(self, agent):
        agent_index = self.world.agents.index(agent)
        pos_world = jnp.asarray(self.normalizer_pos_world)
        return {
            "pos": agent.state.pos / pos_world,
            "rot": angle_eliminate_two_pi(agent.state.rot)
            / self.normalizer_rot,
            "vel": agent.state.vel / self.normalizer_v,
            "act_vel": agent.action.u[:, 0] / self.normalizer_action_vel,
            "act_steer": agent.action.u[:, 1]
            / self.normalizer_action_steering,
            "ref": (
                self.short_term[:, agent_index] / pos_world
            ).reshape(self.world.batch_dim, -1),
            "distance_ref": self.distances_ref[:, agent_index]
            / self.normalizer_distance_ref,
            "distance_left_b": jnp.min(
                self.distances_left_b[:, agent_index], axis=-1
            )
            / self.normalizer_distance_lanelet,
            "distance_right_b": jnp.min(
                self.distances_right_b[:, agent_index], axis=-1
            )
            / self.normalizer_distance_lanelet,
            "is_collision_with_agents": jnp.any(
                self.collide_agents[:, agent_index], axis=-1
            ),
            "is_collision_with_lanelets": jnp.any(
                self.collide_lanelets, axis=-1
            ),
        }

    def extra_render(self, env_index: int = 0):
        from vectorizedmultiagentsimulator_tpu import render as rendering

        geoms = []
        for lanelet in self.map_data["lanelets"]:
            for bound in ("left_boundary", "right_boundary"):
                pts = np.asarray(lanelet[bound])
                for p0, p1 in zip(pts[:-1], pts[1:]):
                    seg = rendering.Line(tuple(p0), tuple(p1), width=0.005)
                    seg.set_color(*Color.BLACK.value)
                    geoms.append(seg)
        if self.is_visualize_short_term_path:
            st = np.asarray(self.short_term)[env_index]
            for i_agent in range(self.n_agents):
                color = self.world.agents[i_agent].color
                pts = st[i_agent]
                for p0, p1 in zip(pts[:-1], pts[1:]):
                    seg = rendering.Line(tuple(p0), tuple(p1), width=0.004)
                    seg.set_color(*color[:3])
                    geoms.append(seg)
        return geoms
