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
 * all three map types are supported.  ``map_type='2'`` records
   challenging pre-collision states into an initial-state buffer
   (road_traffic.py:2302-2310) and replays them at reset with
   ``probability_use_recording``; ``map_type='3'`` trains on the
   intersection / merge-in / merge-out sub-maps with per-env
   ``scenario_probabilities`` and resets agents that leave through their
   entry/exit segments (road_traffic.py:2332-2345); ``is_testing_mode``
   resets only colliding agents instead of terminating
   (road_traffic.py:2313-2330).

Documented deviations (same distributions, jit-native form):
 * the reference keeps ONE global 100-slot initial-state buffer shared by
   every env and appends colliding envs sequentially
   (road_traffic.py:852-866); here each env carries its own
   ``initial_state_buffer_size``-slot circular buffer (batch-leading state
   — shards over the env mesh axis with zero collectives) and its own
   state-history ring;
 * the reference draws ONE ``torch.rand(1)`` per reset/record decision
   shared across envs; here the bernoulli draws are per-env;
 * ``n_observed_steps`` is validated (1 ≤ n ≤ ``n_stored_steps``) and
   accepted for parity: the reference stores it in ``Observations``
   (road_traffic.py:3119) but never reads it — observations always use
   the latest stored step (``get_latest()``), which is exactly what this
   implementation computes;
 * per-agent resets triggered inside ``done()`` re-sample placements with
   bounded masked rejection (``lax.while_loop``) instead of unbounded
   python ``while`` loops.
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
    env_index_to_mask,
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
    # Component-split internally: the [..., P, 2] polylines carry a
    # 2-element minor dim that tiles T(2,128) (1/4 vreg utilization);
    # computing on X/Y [..., P-1] arrays keeps the long P axis minor
    # (T(8,128)) through the whole pipeline.  Same float ops per
    # element, bitwise-identical results.
    X, Y = polyline[..., 0], polyline[..., 1]  # [..., P]
    px, py = point[..., 0, None], point[..., 1, None]  # [..., 1]
    x0, y0 = X[..., :-1], Y[..., :-1]
    dx, dy = X[..., 1:] - x0, Y[..., 1:] - y0
    pvx, pvy = px - x0, py - y0
    line_lens_sq = dx * dx + dy * dy + 1e-8
    t = jnp.clip((pvx * dx + pvy * dy) / line_lens_sq, 0.0, 1.0)
    cx = x0 + dx * t - px
    cy = y0 + dy * t - py
    # Safe norm (forward-identical): agents spawn exactly ON the path, so
    # the closest-segment distance is exactly 0 and a bare sqrt would put
    # an inf subgradient into every reward/obs vjp (torch-style 0
    # subgradient instead, cf. JaxUtils.safe_norm).
    sq = cx * cx + cy * cy
    d = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
    # Segments at/after the true end take the distance of segment n-2
    # (road_traffic.py:3440-3445).  One-hot reduce instead of
    # take_along_axis: the gather forces a T(8,128) relayout of d while
    # the multiply-sum fuses (profiled 0.2ms/step per call at B=1000).
    seg_idx = jnp.arange(d.shape[-1])
    end_idx = jnp.maximum(n_points - 2, 0)
    one_hot_end = (seg_idx == end_idx[..., None]).astype(d.dtype)
    d_end = jnp.sum(d * one_hot_end, axis=-1, keepdims=True)
    d = jnp.where(seg_idx >= (n_points - 1)[..., None], d_end, d)
    dist = jnp.min(d, axis=-1)
    # First index within EPS of the min instead of a plain argmin: agents
    # spawn exactly on polyline vertices, where the two adjacent segments
    # tie at ulp level and the winner would be decided by compiler FMA/
    # fusion choices (jnp vs the fused Pallas kernel flipped on ~2% of
    # reset poses).  EPS=1e-5 is sub-micrometre in world units.
    idx = (
        jnp.argmax(d <= (dist + 1e-5)[..., None], axis=-1) + 1
    )
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
    # One-hot matmul instead of take_along_axis: gathering 6 points out
    # of the [B, A, 185, 2] polylines relayouted the whole operand
    # (profiled 2.9ms copy + 1.7ms gather per step at B=1000, 28% of the
    # road_traffic step); the [n_ret, P] x [P, 2] einsum rides the MXU
    # with exact selection semantics (rows are exact 0/1).
    P = polyline.shape[-2]
    one_hot = (
        future[..., None] == jnp.arange(P)
    ).astype(polyline.dtype)  # [..., n_ret, P]
    return jnp.einsum(
        "...kp,...pd->...kd",
        one_hot,
        polyline,
        precision=jax.lax.Precision.HIGHEST,
    ), future


def segments_intersect(L1, L2):
    """Strict segment-intersection test between two polylines
    (the reference's ``interX``, road_traffic.py:3564-3647).

    L1 [..., N1, 2], L2 [..., N2, 2] -> bool [...]: any segment of L1
    strictly crosses any segment of L2.
    """
    # Component-split internally: broadcasting stacked [..., N1, 1, 2] vs
    # [..., 1, N2, 2] diffs made XLA materialize [B, A, 4, P, 2] tuples
    # (24% of the road_traffic step at 10k envs) before the compare+any
    # reduce; on X/Y [..., N1-1, 1] x [..., 1, N2-1] components the whole
    # chain fuses into the reduce.  Scalar expressions are identical to
    # cross(q2-q1, p1-q1) etc. — bitwise-same results.
    X1, Y1 = L1[..., 0], L1[..., 1]
    X2, Y2 = L2[..., 0], L2[..., 1]
    p1x, p1y = X1[..., :-1, None], Y1[..., :-1, None]
    p2x, p2y = X1[..., 1:, None], Y1[..., 1:, None]
    q1x, q1y = X2[..., None, :-1], Y2[..., None, :-1]
    q2x, q2y = X2[..., None, 1:], Y2[..., None, 1:]
    sx, sy = q2x - q1x, q2y - q1y
    rx, ry = p2x - p1x, p2y - p1y
    d1 = sx * (p1y - q1y) - sy * (p1x - q1x)
    d2 = sx * (p2y - q1y) - sy * (p2x - q1x)
    d3 = rx * (q1y - p1y) - ry * (q1x - p1x)
    d4 = rx * (q2y - p1y) - ry * (q2x - p1x)
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
        n_stored_steps = kwargs.pop("n_stored_steps", 5)
        n_observed_steps = kwargs.pop("n_observed_steps", 1)
        assert 1 <= n_observed_steps <= n_stored_steps, (
            "n_observed_steps must be in [1, n_stored_steps]"
        )
        # Parity note: the reference stores n_observed_steps in its
        # Observations container (road_traffic.py:3119) but the observation
        # assembly only ever reads the latest stored step, so any accepted
        # value produces the same observations.
        self.n_observed_steps = n_observed_steps
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
        self.is_testing_mode = kwargs.pop("is_testing_mode", False)
        self.is_visualize_short_term_path = kwargs.pop(
            "is_visualize_short_term_path", True
        )
        self.map_type = kwargs.pop("map_type", "1")
        assert self.map_type in ("1", "2", "3"), (
            f"map_type must be one of '1'/'2'/'3', got {self.map_type!r}"
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
        self.scenario_probabilities = [
            float(p)
            for p in kwargs.pop("scenario_probabilities", [1.0, 0.0, 0.0])
        ]
        self.is_add_noise = kwargs.pop("is_add_noise", True)
        self.is_observe_ref_path_other_agents = kwargs.pop(
            "is_observe_ref_path_other_agents", False
        )
        kwargs.pop("is_visualize_extra_info", None)
        kwargs.pop("render_title", None)
        self.n_steps_stored = kwargs.pop("n_steps_stored", 10)
        self.n_steps_before_recording = kwargs.pop(
            "n_steps_before_recording", 10
        )
        self.n_points_nearing_boundary = kwargs.pop(
            "n_points_nearing_boundary", 5
        )
        kwargs.pop("parameters", None)
        kwargs.pop("is_prb", None)
        self.probability_record = float(
            kwargs.pop("probability_record", 1.0)
        )
        self.probability_use_recording = float(
            kwargs.pop("probability_use_recording", 0.2)
        )
        # TPU-native deviation: per-env circular buffer (the reference
        # shares one global 100-slot buffer across all envs,
        # road_traffic.py:852-866).
        self.initial_state_buffer_size = int(
            kwargs.pop("initial_state_buffer_size", 8)
        )

        if self.map_type == "3":
            if (
                self.scenario_probabilities[1] != 0
                or self.scenario_probabilities[2] != 0
            ):
                if self.n_agents > 5:
                    raise ValueError(
                        "For map_type '3', if the second or third value of"
                        " scenario_probabilities is not zero, a maximum of 5"
                        " agents are allowed, as only a merge-in or a"
                        " merge-out will be used."
                    )
            else:
                if self.n_agents > 10:
                    raise ValueError(
                        "For map_type '3', if only the first value of"
                        " scenario_probabilities is not zero, a maximum of"
                        " 10 agents are allowed, as only an intersection"
                        " will be used."
                    )

        if self.n_nearing_agents_observed >= self.n_agents:
            raise ValueError(
                "n_nearing_agents_observed must be less than n_agents"
            )

        # Map + reference paths (trace-time numpy)
        map_file_path = kwargs.pop("map_file_path", None)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        self.map_data = rtm.get_map_data(map_file_path)
        (
            paths_all,
            paths_intersection,
            paths_merge_in,
            paths_merge_out,
        ) = rtm.get_reference_paths(self.map_data)
        if self.map_type in ("1", "2"):
            # scenario_id 0 = the whole map (road_traffic.py:279-292)
            path_groups = [paths_all]
        else:
            # scenario_id 1/2/3 = intersection / merge-in / merge-out
            path_groups = [
                paths_intersection,
                paths_merge_in,
                paths_merge_out,
            ]
        paths_concat = [p for group in path_groups for p in group]
        n_extend = self.n_points_short_term * self.sample_interval_ref_path
        max_points = (
            max(p["center_line"].shape[0] for p in paths_concat)
            + n_extend
            + 2
        )
        self.paths = rtm.PaddedPaths(paths_concat, n_extend, max_points)
        self.n_paths = len(paths_concat)
        self.max_ref_points = max_points
        sizes = [len(g) for g in path_groups]
        self.group_offsets = np.cumsum([0] + sizes)[:-1].astype(np.int32)
        self.group_sizes = np.asarray(sizes, np.int32)
        # Initial point_id range along the chosen path
        # (road_traffic.py:1126-1134): [6, n/2) when only the whole map /
        # intersection is in play, else [3, n-5).  The reference gates
        # this purely on scenario_probabilities (not map_type).
        self.point_range_open = (
            self.scenario_probabilities[1] != 0
            or self.scenario_probabilities[2] != 0
        )

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
    def _gather(self, table, path_id=None):
        """table [n_paths, ...] indexed by path_id [B, A] -> [B, A, ...].

        Float tables ride a one-hot MXU matmul (the row gather from the
        40-path polyline tables was memory-layout-bound at ~126us/step
        each for B=1000, A=20); integer/bool tables use a plain gather.
        """
        if path_id is None:
            path_id = self.path_id
        t = jnp.asarray(table)
        if jnp.issubdtype(t.dtype, jnp.floating) and t.ndim >= 2:
            n = t.shape[0]
            one_hot = (path_id[..., None] == jnp.arange(n)).astype(
                t.dtype
            )  # [B, A, n_paths]
            flat = t.reshape(n, -1)
            out = jnp.einsum(
                "ban,nf->baf",
                one_hot,
                flat,
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.reshape(path_id.shape + t.shape[1:])
        return t[path_id]

    # ------------------------------------------------------------------ #
    # State snapshots + circular buffers (map_type '2'; the reference's
    # StateBuffer / InitialStateBuffer, road_traffic.py:3003-3086, made
    # per-env and batch-leading)
    # ------------------------------------------------------------------ #
    def _current_snapshot(self):
        """[B, A, 8] rows of [pos_x, pos_y, rot, vel_x, vel_y, scenario_id,
        path_id, point_id] (the reference's buffer row format,
        road_traffic.py:862-869)."""
        pos = jnp.stack([a.state.pos for a in self.world.agents], axis=1)
        rot = jnp.stack(
            [a.state.rot[:, 0] for a in self.world.agents], axis=1
        )
        vel = jnp.stack([a.state.vel for a in self.world.agents], axis=1)
        A = self.n_agents
        sid = jnp.broadcast_to(
            self.scenario_id[:, None].astype(jnp.float32), rot.shape
        )
        return jnp.concatenate(
            [
                pos,
                rot[..., None],
                vel,
                sid[..., None],
                self.path_id.astype(jnp.float32)[..., None],
                self.point_id.astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )

    def _hist_push(self, snap):
        H = self.n_steps_before_recording
        hit = jnp.arange(H)[None] == self.hist_ptr[:, None]  # [B, H]
        self.state_hist = jnp.where(
            hit[:, :, None, None], snap[:, None], self.state_hist
        )
        self.hist_ptr = (self.hist_ptr + 1) % H
        self.hist_len = jnp.minimum(self.hist_len + 1, H)

    def _hist_latest(self, n):
        """Per-env CircularBuffer.get_latest(n) (road_traffic.py:3028-3042):
        the state from n pushes ago, or the oldest entry when fewer than n
        pushes happened."""
        H = self.n_steps_before_recording
        idx = jnp.where(n > self.hist_len, 0, (self.hist_ptr - n) % H)
        return jnp.take_along_axis(
            self.state_hist, idx[:, None, None, None], axis=1
        )[:, 0]

    def _hist_reset(self, env_mask):
        """Reference state_buffer.reset() + add(current)
        (road_traffic.py:1023-1035), masked per env."""
        H = self.n_steps_before_recording
        snap = self._current_snapshot()
        B = self.world.batch_dim
        fresh = (
            jnp.zeros((B, H) + snap.shape[1:], jnp.float32)
            .at[:, 0]
            .set(snap)
        )
        m = env_mask
        self.state_hist = jnp.where(
            m[:, None, None, None], fresh, self.state_hist
        )
        self.hist_ptr = jnp.where(m, 1, self.hist_ptr)
        self.hist_len = jnp.where(m, 1, self.hist_len)

    def _isb_append(self, mask, snap):
        """Append snap rows into each masked env's initial-state buffer."""
        S = self.initial_state_buffer_size
        hit = (jnp.arange(S)[None] == self.isb_ptr[:, None]) & mask[:, None]
        self.isb_buf = jnp.where(
            hit[:, :, None, None], snap[:, None], self.isb_buf
        )
        self.isb_ptr = jnp.where(mask, (self.isb_ptr + 1) % S, self.isb_ptr)
        self.isb_len = jnp.where(
            mask, jnp.minimum(self.isb_len + 1, S), self.isb_len
        )

    # ------------------------------------------------------------------ #
    def _group_bounds(self):
        """Per-env [lo, size) of the path-table slice the env draws its
        paths from (map_type '3' restricts each env to one sub-map)."""
        B = self.world.batch_dim
        if self.map_type == "3":
            lo = jnp.asarray(self.group_offsets)[self.scenario_id - 1]
            size = jnp.asarray(self.group_sizes)[self.scenario_id - 1]
            return lo, size
        return (
            jnp.zeros((B,), jnp.int32),
            jnp.full((B,), self.n_paths, jnp.int32),
        )

    def inject_reference_ids(self, scenario_id, path_id, point_id):
        """Test hook: overwrite the path-selection state with ids recorded
        from the reference implementation (parity replay).

        The reference keeps per-(env, agent) ``scenario_id/path_id/point_id``
        with path ids local to the env's sub-map
        (road_traffic.py:455-463, 1060-1093); ours are global into the
        concatenated path table, offset by the sub-map's group start.
        """
        sid = jnp.asarray(np.asarray(scenario_id)[:, 0], jnp.int32)  # [B]
        pid = jnp.asarray(path_id, jnp.int32)  # [B, A]
        if self.map_type == "3":
            lo = jnp.asarray(self.group_offsets)[sid - 1]  # [B]
            pid = pid + lo[:, None]
        self.scenario_id = sid
        self.path_id = pid
        self.point_id = jnp.asarray(point_id, jnp.int32)

    def _propose_placement(self, k, group_lo, group_size):
        """Random (path_id, point_id, pos) per env within the env's path
        group; point range per road_traffic.py:1126-1134."""
        B = self.world.batch_dim
        centers = jnp.asarray(self.paths.center)
        n_points = jnp.asarray(self.paths.n_points)
        k1, k2 = jax.random.split(k)
        u_pid = jax.random.uniform(k1, (B,))
        pid = group_lo + jnp.minimum(
            (u_pid * group_size.astype(jnp.float32)).astype(jnp.int32),
            group_size - 1,
        )
        n = n_points[pid]
        if self.point_range_open:
            lo = 3
            hi = jnp.maximum(n - 5, lo + 1)
        else:
            lo = 6
            hi = jnp.maximum((n / 2).astype(jnp.int32), lo + 1)
        u = jax.random.uniform(k2, (B,))
        point = lo + (u * (hi - lo)).astype(jnp.int32)
        pos = centers[pid, point]
        return pid, point, pos

    def reset_world_at(self, env_index=None, agent_index=None):
        if agent_index is not None:
            # Reference-parity per-agent reset signature
            # (road_traffic.py:917-922): reset one agent, keeping the
            # other agents' states.
            B = self.world.batch_dim
            A = self.n_agents
            env_mask = env_index_to_mask(env_index, B)
            mask = jnp.zeros((B, A), bool).at[:, agent_index].set(env_mask)
            self._reset_agents(mask)
            return

        B = self.world.batch_dim
        A = self.n_agents
        yaw_vec = jnp.asarray(self.paths.vec_norm)  # [n_paths, P, 2]

        first = env_index is None and not self.world.has_extra(
            "scenario.path_id"
        )
        if first:
            self.path_id = jnp.zeros((B, A), jnp.int32)
            self.point_id = jnp.zeros((B, A), jnp.int32)
            self.scenario_id = jnp.zeros((B,), jnp.int32)
            if self.map_type == "3" or self.is_testing_mode:
                self.collide_entry = jnp.zeros((B, A), dtype=bool)
                self.collide_exit = jnp.zeros((B, A), dtype=bool)
            if self.map_type == "2":
                H = self.n_steps_before_recording
                S = self.initial_state_buffer_size
                self.state_hist = jnp.zeros((B, H, A, 8), jnp.float32)
                self.hist_ptr = jnp.zeros((B,), jnp.int32)
                self.hist_len = jnp.zeros((B,), jnp.int32)
                self.isb_buf = jnp.zeros((B, S, A, 8), jnp.float32)
                self.isb_ptr = jnp.zeros((B,), jnp.int32)
                self.isb_len = jnp.zeros((B,), jnp.int32)

        # Per-env sub-map choice (map_type '3', road_traffic.py:1057-1093;
        # per-env draw instead of the reference's one draw per env loop
        # iteration — identical distribution).
        if self.map_type == "3":
            probs = np.asarray(self.scenario_probabilities, np.float32)
            sid = (
                jax.random.categorical(
                    self.world.next_key(),
                    jnp.log(jnp.asarray(probs / probs.sum())),
                    shape=(B,),
                ).astype(jnp.int32)
                + 1
            )
            if env_index is None:
                self.scenario_id = sid
            else:
                self.scenario_id = JaxUtils.where_from_index(
                    env_index, sid, self.scenario_id
                )
        group_lo, group_size = self._group_bounds()

        # map_type '2': with probability_use_recording, replay a recorded
        # challenging state instead of sampling fresh placements
        # (road_traffic.py:947-967).
        use_buffer = None
        if self.map_type == "2" and not first:
            k1, k2 = jax.random.split(self.world.next_key())
            use_buffer = (
                jax.random.uniform(k1, (B,)) < self.probability_use_recording
            ) & (self.isb_len >= 1)
            rec_idx = jax.random.randint(
                k2, (B,), 0, jnp.maximum(self.isb_len, 1)
            )
            record = jnp.take_along_axis(
                self.isb_buf, rec_idx[:, None, None, None], axis=1
            )[:, 0]  # [B, A, 8]

        placed = jnp.full((B, A, 2), 1e6, jnp.float32)
        new_path_id = (
            jnp.zeros((B, A), jnp.int32) if first else self.path_id
        )
        new_point_id = (
            jnp.zeros((B, A), jnp.int32) if first else self.point_id
        )
        min_d2 = self.reset_agent_min_distance**2

        for i, agent in enumerate(self.world.agents):
            key = self.world.next_key()

            def too_close(pos):
                d2 = jnp.sum((placed - pos[:, None]) ** 2, axis=-1)
                return jnp.any(d2 < min_d2, axis=-1)

            live = (
                jnp.ones((B,), bool) if use_buffer is None else ~use_buffer
            )

            key, sub = jax.random.split(key)
            pid, point, pos = self._propose_placement(
                sub, group_lo, group_size
            )

            def cond(carry):
                k, pid, point, pos, tries = carry
                return jnp.any(too_close(pos) & live) & (tries < 100)

            def body(carry):
                k, pid, point, pos, tries = carry
                k, sub = jax.random.split(k)
                pid2, point2, pos2 = self._propose_placement(
                    sub, group_lo, group_size
                )
                bad = too_close(pos) & live
                pid = jnp.where(bad, pid2, pid)
                point = jnp.where(bad, point2, point)
                pos = jnp.where(bad[:, None], pos2, pos)
                return k, pid, point, pos, tries + 1

            key, pid, point, pos, _ = jax.lax.while_loop(
                cond, body, (key, pid, point, pos, jnp.int32(0))
            )

            rot = jnp.arctan2(yaw_vec[pid, point, 1], yaw_vec[pid, point, 0])
            key, kv = jax.random.split(key)
            vel_abs = jax.random.uniform(kv, (B,)) * self.max_speed
            vel = jnp.stack(
                [vel_abs * jnp.cos(rot), vel_abs * jnp.sin(rot)], axis=-1
            )

            if use_buffer is not None:
                pid = jnp.where(
                    use_buffer, record[:, i, 6].astype(jnp.int32), pid
                )
                point = jnp.where(
                    use_buffer, record[:, i, 7].astype(jnp.int32), point
                )
                pos = jnp.where(use_buffer[:, None], record[:, i, 0:2], pos)
                rot = jnp.where(use_buffer, record[:, i, 2], rot)
                vel = jnp.where(use_buffer[:, None], record[:, i, 3:5], vel)

            placed = placed.at[:, i].set(pos)
            new_path_id = new_path_id.at[:, i].set(pid)
            new_point_id = new_point_id.at[:, i].set(point)

            agent.set_pos(pos, batch_index=env_index)
            agent.set_rot(rot[:, None], batch_index=env_index)
            agent.set_vel(vel, batch_index=env_index)

        if env_index is None:
            self.path_id = new_path_id
            self.point_id = new_point_id
        else:
            self.path_id = JaxUtils.where_from_index(
                env_index, new_path_id, self.path_id
            )
            self.point_id = JaxUtils.where_from_index(
                env_index, new_point_id, self.point_id
            )

        if self.map_type == "2":
            self._hist_reset(env_index_to_mask(env_index, B))

        # Initialize derived state
        positions = jnp.stack(
            [a.state.pos for a in self.world.agents], axis=1
        )
        rotations = jnp.stack(
            [a.state.rot[:, 0] for a in self.world.agents], axis=1
        )
        dist_ref, left_all, right_all, boundaries, short_term = (
            self._geometry_bundle(positions, rotations, False)
        )

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
        init_or_mask("distances_ref", dist_ref)
        init_or_mask("distances_left_b", left_all)
        init_or_mask("distances_right_b", right_all)
        init_or_mask("distances_boundaries", boundaries)
        init_or_mask(
            "collide_agents", jnp.zeros((B, A, A), dtype=bool)
        )
        init_or_mask("collide_lanelets", jnp.zeros((B, A), dtype=bool))
        if self.map_type == "3" or self.is_testing_mode:
            init_or_mask("collide_entry", jnp.zeros((B, A), dtype=bool))
            init_or_mask("collide_exit", jnp.zeros((B, A), dtype=bool))
        init_or_mask(
            "steering_hist", jnp.zeros((B, A, 2), jnp.float32)
        )
        if env_index is None:
            self.rew_buf = jnp.zeros((B,), jnp.float32)

    def _mutual_distances(self, positions):
        """Center-to-center distances with high diagonal
        (road_traffic.py:3686-3711)."""
        # safe_norm: the i==i diagonal is exactly zero; the `where` below
        # masks it in the forward but not in the vjp (0 * NaN = NaN).
        d = JaxUtils.safe_norm(
            positions[:, :, None] - positions[:, None], axis=-1
        )
        big = jnp.max(d, axis=(-2, -1), keepdims=True) + 1
        eye = jnp.eye(self.n_agents, dtype=bool)[None]
        return jnp.where(eye, big, d)

    def _compute_geometry(self, positions, rotations, path_id=None):
        """All per-agent path geometry for the current poses (jnp path).

        positions [B, A, 2], rotations [B, A] ->
        (short_term [B, A, n_short, 2], dists dict)
        """
        long_term = self._gather(self.paths.center, path_id)  # [B,A,P,2]
        left_b = self._gather(self.paths.left, path_id)
        right_b = self._gather(self.paths.right, path_id)
        n_pts = self._gather(self.paths.n_points, path_id)
        n_left = self._gather(self.paths.n_left, path_id)
        n_right = self._gather(self.paths.n_right, path_id)
        is_loop = self._gather(self.paths.is_loop, path_id)

        dist_ref, idx_ref = get_perpendicular_distances(
            positions, long_term, n_pts
        )

        vertices = get_rectangle_vertices(
            positions, rotations, self.agent_width, self.l_f + self.l_r
        )  # [B, A, 5, 2]
        # Distances from the center AND the 4 vertices to each boundary
        # in one call (same polyline broadcast either way; one [B, A, 5,
        # P-1] pipeline instead of a center pass plus a vertex pass).
        v4 = vertices[..., :4, :]  # [B, A, 4, 2]
        pts5 = jnp.concatenate([positions[:, :, None, :], v4], axis=2)
        dl, _ = get_perpendicular_distances(
            pts5, left_b[:, :, None], n_left[:, :, None]
        )  # [B, A, 5]
        dr, _ = get_perpendicular_distances(
            pts5, right_b[:, :, None], n_right[:, :, None]
        )
        c2l, vl = dl[..., 0], dl[..., 1:]
        c2r, vr = dr[..., 0], dr[..., 1:]
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
    # Geometry bundle: everything reward()/reset need in one call, either
    # via the fused Pallas kernel (ops/road_geometry_pallas.py) or the
    # jnp path above.  Outputs are f32 (collision flags 0/1).
    # ------------------------------------------------------------------ #
    def _bundle_jnp_pure(
        self, positions, rotations, path_id, with_collisions
    ):
        """(ref, left_all, right_all, boundaries, short_term[, vertices,
        collide_lanelets, collide_entry, collide_exit, collide_agents])
        as pure f32 arrays — the jnp reference for the fused kernel and
        its custom-VJP backward."""
        A = self.n_agents
        short_term, dists = self._compute_geometry(
            positions, rotations, path_id
        )
        base = (
            dists["ref"],
            dists["left_all"],
            dists["right_all"],
            dists["boundaries"],
            short_term,
        )
        if not with_collisions:
            return base
        vertices = dists["vertices"]
        # Agent-agent collisions: ONE batched interX over all ordered
        # pairs (see the profiling note in the r1 reward body); hit(j, i)
        # swaps (p, q) which swaps (d1, d2) with (d3, d4) — symmetric.
        pair_hits = segments_intersect(
            vertices[:, :, None], vertices[:, None, :]
        )  # [B, A, A]
        eye = jnp.eye(A, dtype=bool)[None]
        collide_agents = (pair_hits & ~eye).astype(jnp.float32)
        hit_l = segments_intersect(vertices, dists["left_b"])
        hit_r = segments_intersect(vertices, dists["right_b"])
        collide_lanelets = (hit_l | hit_r).astype(jnp.float32)
        B = positions.shape[0]
        if (self.map_type == "3" or self.is_testing_mode) and not all(
            self.paths.is_loop
        ):
            # Entry/exit-segment crossings for non-loop paths
            # (road_traffic.py:1631-1641; loops never have them).
            entry = self._gather(self.paths.entry, path_id)  # [B,A,2,2]
            exit_ = self._gather(self.paths.exit, path_id)
            is_loop = self._gather(self.paths.is_loop, path_id)
            collide_entry = (
                segments_intersect(vertices, entry) & ~is_loop
            ).astype(jnp.float32)
            collide_exit = (
                segments_intersect(vertices, exit_) & ~is_loop
            ).astype(jnp.float32)
        else:
            collide_entry = jnp.zeros((B, A), jnp.float32)
            collide_exit = jnp.zeros((B, A), jnp.float32)
        return base + (
            vertices,
            collide_lanelets,
            collide_entry,
            collide_exit,
            collide_agents,
        )

    def _geometry_bundle(self, positions, rotations, with_collisions):
        from vectorizedmultiagentsimulator_tpu.ops import (
            road_geometry_pallas as rgp,
        )

        if self.world._pallas_choice("road_geom", rgp.geometry_enabled):
            return rgp.fused_geometry(
                self,
                with_collisions,
                positions,
                rotations,
                self.path_id.astype(jnp.float32),
            )
        return self._bundle_jnp_pure(
            positions, rotations, self.path_id, with_collisions
        )

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
            (
                dist_ref,
                left_all,
                right_all,
                boundaries,
                new_short,
                _vertices,
                coll_lane,
                coll_entry,
                coll_exit,
                coll_agents,
            ) = self._geometry_bundle(positions, rotations, True)
            self._new_short_term = new_short  # applied after rewarding
            self.distances_ref = dist_ref
            self.distances_left_b = left_all
            self.distances_right_b = right_all
            self.distances_boundaries = boundaries
            self.collide_agents = coll_agents > 0.5
            self.collide_lanelets = coll_lane > 0.5
            if (self.map_type == "3" or self.is_testing_mode) and not all(
                self.paths.is_loop
            ):
                self.collide_entry = coll_entry > 0.5
                self.collide_exit = coll_exit > 0.5

        if is_first:
            # Batched reward for ALL agents at once ([B, A] elementwise,
            # identical per-element arithmetic to the per-agent [B]
            # slices): the sliced form issued ~10 small T(1,128)-tiled
            # ops per agent per step (profiled ~16% of the step at 10k
            # envs across move projections + exponential penalties).
            vels = jnp.stack(
                [a.state.vel for a in self.world.agents], axis=1
            )  # [B, A, 2]
            max_speed = jnp.asarray(
                [a.max_speed for a in self.world.agents], jnp.float32
            )  # [A]

            rew = jnp.zeros((B, A), jnp.float32)

            # [reward] forward movement along the (previous) short-term
            # path.  The weights are normalized (sum 1), so the weighted
            # sum of projections collapses affinely:
            #   sum_k w_k * (m . (st_k - prev)) = m . (sum_k w_k st_k - prev)
            # — one [B, A, 2] dot instead of a [B, A, K, 2] broadcast +
            # double reduce (which XLA executed at 1.6 GiB/s on the tiny
            # (K, 2) minor tiles — 8% of the step at 10k envs).  Same for
            # the mean in v_proj.  Within parity tolerance (reassociation
            # only).
            prev = self.prev_pos  # [B, A, 2]
            w = jnp.asarray(self.weighting_ref_directions)
            st_w = jnp.einsum(
                "bakd,k->bad",
                self.short_term,
                w,
                precision=jax.lax.Precision.HIGHEST,
            )  # [B, A, 2]
            st_mean = jnp.mean(self.short_term, axis=2)  # [B, A, 2]
            move = positions - prev
            move_projected_weighted = jnp.sum(
                move * (st_w - prev), axis=-1
            )  # [B, A]
            rew = rew + (
                move_projected_weighted
                / (max_speed * self.world.dt)
                * self.reward_progress
            )

            # [reward] high velocity
            v_proj = jnp.sum(vels * (st_mean - prev), axis=-1)  # [B, A]
            factor_moving_direction = jnp.where(v_proj > 0, 1.0, 2.0)
            rew = rew + (
                factor_moving_direction
                * v_proj
                / max_speed
                * self.reward_vel
            )

            # [penalty] close to lanelet boundaries
            rew = rew + (
                exponential_decreasing_fcn(
                    self.distances_boundaries,
                    self.threshold_near_boundary_low,
                    self.threshold_near_boundary_high,
                )
                * self.penalty_near_boundary
            )

            # [penalty] close to other agents
            rew = rew + (
                jnp.sum(
                    exponential_decreasing_fcn(
                        self.distances_agents,
                        self.threshold_near_other_agents_c2c_low,
                        self.threshold_near_other_agents_c2c_high,
                    ),
                    axis=-1,
                )
                * self.penalty_near_other_agents
            )

            # [penalty] deviating from reference path
            rew = rew + (
                self.distances_ref
                / self.penalty_weighting_deviate_from_ref_path
                * self.penalty_deviate_from_ref_path
            )

            # [penalty] changing steering too quickly (uses the two most
            # recently recorded normalized steering actions)
            steering_change = jnp.maximum(
                jnp.abs(
                    self.steering_hist[:, :, 0] - self.steering_hist[:, :, 1]
                )
                * self.normalizer_action_steering
                - math.radians(self.threshold_change_steering),
                0.0,
            )
            steering_change_reward_factor = steering_change / (
                2 * self.max_steering_angle
                - 2 * math.radians(self.threshold_change_steering)
            )
            rew = rew + (
                steering_change_reward_factor * self.penalty_change_steering
            )

            # [penalty] collisions
            rew = rew + (
                jnp.any(self.collide_agents, axis=-1)
                * self.penalty_collide_with_agents
            )
            rew = rew + (
                self.collide_lanelets * self.penalty_collide_with_boundaries
            )

            # [reward] reaching the goal (exit segment of a non-loop path,
            # road_traffic.py:1488-1493)
            if self.map_type == "3" or self.is_testing_mode:
                rew = rew + self.collide_exit * self.reward_reach_goal

            # [reward/penalty] time
            rew = rew + (
                jnp.where(v_proj > 0, 1.0, -1.0)
                * JaxUtils.safe_norm(vels, axis=-1)
                / max_speed
                * self.penalty_time
            )
            self._rewards_all = rew  # trace-scratch, read below this step

        rew = self._rewards_all[:, agent_index]

        if agent_index == self.n_agents - 1:
            # Post-reward updates (road_traffic.py:1716-1734)
            self.prev_pos = jnp.stack(
                [a.state.pos for a in self.world.agents], axis=1
            )
            self.short_term = self._new_short_term
            if self.map_type == "2":
                # Per-step state history push (road_traffic.py:1718-1730)
                self._hist_push(self._current_snapshot())
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
            vel_abs = JaxUtils.safe_norm(vels, axis=-1)  # [B, A]
            # Self components (== the [i, i] diagonal of the pair
            # matrices below: rot_rel is 0, so ego velocity reduces to
            # (|v|, 0) and world pos/rot to own pos / 0).
            self._obs_self_pos = positions / self.normalizer_pos_world
            self._obs_self_rot = jnp.zeros_like(rotations)
            self._obs_self_vel = (
                jnp.stack([vel_abs, jnp.zeros_like(vel_abs)], axis=-1)
                / self.normalizer_v
            )
            from vectorizedmultiagentsimulator_tpu.ops import (
                road_geometry_pallas as rgp,
            )

            if (
                self.is_partial_observation
                and self.is_ego_view
                and self.world._pallas_choice("road_geom", rgp.geometry_enabled)
            ):
                # Fused top-k neighbor observations: selection fold,
                # one-hot gathers and ego transforms in one VMEM-resident
                # kernel (see ops/road_geometry_pallas.py
                # fused_neighbor_obs) — the jnp chain below tiles its
                # (4, 2) minor dims at ~3% vreg utilization and was ~11%
                # of the step at B=10k.  Outputs are raw; normalizers
                # applied here in the same order as the jnp path.
                dists_norm = (
                    self.distances_agents / self.normalizer_distance_lanelet
                )
                nd, pe, re_, ve, vt = rgp.fused_neighbor_obs(
                    self, positions, rotations, vels, dists_norm
                )
                self._nearing_dist_sel = nd
                self._obs_pos_sel = pe / self.normalizer_pos
                self._obs_rot_sel = re_ / self.normalizer_rot
                self._obs_vel_sel = ve / self.normalizer_v
                self._obs_vertices_sel = vt / self.normalizer_pos
            elif self.is_partial_observation:
                # SELECT the k nearest agents FIRST, transform after:
                # the full [B, A, A, 4, 2] ego transforms cost A/k times
                # the math and their tiny (4, 2) minor dims tile at
                # T(2,128) (~3% vreg utilization — profiled 3ms/step at
                # B=1000, A=20, k=2).  One-hot einsum selection avoids
                # gathers; ordering matches the reference's per-agent
                # top_k over distances.
                k = self.n_nearing_agents_observed
                dists_norm = (
                    self.distances_agents / self.normalizer_distance_lanelet
                )
                # k-round argmin fold instead of top_k: top_k sorts the
                # whole [B, A, A] axis (378us/step at B=1000) to pick
                # k=2 rows; k argmin reduces with masking are ~free and
                # produce the one-hot selectors directly.  Same
                # ascending order and first-index tie behaviour.
                cur = dists_norm
                vals, ohs = [], []
                for _ in range(k):
                    vals.append(jnp.min(cur, axis=-1))  # [B, A]
                    oh = (
                        jnp.argmin(cur, axis=-1)[..., None]
                        == jnp.arange(A)
                    )  # [B, A, A] bool
                    ohs.append(oh)
                    cur = jnp.where(oh, jnp.inf, cur)
                self._nearing_dist_sel = jnp.stack(vals, axis=-1)  # [B, A, k]
                one_hot = jnp.stack(ohs, axis=-2).astype(
                    positions.dtype
                )  # [B, A_i, k, A_j]

                def sel(x):
                    return jnp.einsum(
                        "bika,ba...->bik...",
                        one_hot,
                        x,
                        precision=jax.lax.Precision.HIGHEST,
                    )

                pos_j = sel(positions)  # [B, A, k, 2]
                rot_j = sel(rotations)  # [B, A, k]
                vel_abs_j = sel(vel_abs)  # [B, A, k]
                vert_j = sel(vertices[:, :, :4, :])  # [B, A, k, 4, 2]
                rel = pos_j - positions[:, :, None, :]
                self._obs_pos_sel = (
                    _to_local(rel, rotations[:, :, None])
                    / self.normalizer_pos
                    if self.is_ego_view
                    else pos_j / self.normalizer_pos_world
                )
                rot_rel = rot_j - rotations[:, :, None]  # [B, A, k]
                self._obs_rot_sel = rot_rel / self.normalizer_rot
                self._obs_vel_sel = (
                    jnp.stack(
                        [
                            vel_abs_j * jnp.cos(rot_rel),
                            vel_abs_j * jnp.sin(rot_rel),
                        ],
                        axis=-1,
                    )
                    / self.normalizer_v
                )  # [B, A, k, 2]
                vert_rel = vert_j - positions[:, :, None, None, :]
                self._obs_vertices_sel = (
                    _to_local(vert_rel, rotations[:, :, None, None])
                    / self.normalizer_pos
                )  # [B, A, k, 4, 2]
            else:
                # Full pair matrices [B, A_i, A_j, ...]
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
        k = self.n_nearing_agents_observed
        if self.is_partial_observation:
            nearing_dist = self._nearing_dist_sel[:, agent_index]  # [B, k]
            if self.is_apply_mask:
                mask_far = (
                    nearing_dist * self.normalizer_distance_lanelet
                    >= self.distance_mask_agents
                )
            else:
                mask_far = jnp.zeros((B, k), dtype=bool)

            obs_pos_other = jnp.where(
                mask_far[..., None], 1.0, self._obs_pos_sel[:, agent_index]
            )
            obs_rot_other = jnp.where(
                mask_far, 0.0, self._obs_rot_sel[:, agent_index]
            )
            obs_vel_other = jnp.where(
                mask_far[..., None], 0.0, self._obs_vel_sel[:, agent_index]
            )
            obs_vert_other = jnp.where(
                mask_far[..., None, None],
                1.0,
                self._obs_vertices_sel[:, agent_index],
            )
            obs_dist_other = jnp.where(mask_far, 1.0, nearing_dist)
        else:
            k = A
            dists_i = self._obs_dist_agents[:, agent_index]  # [B, A]
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

        # --- self observation (the [i, i] diagonal of the pair matrices,
        # computed directly: rot_rel is 0 there) --- #
        obs_self = []
        if not self.is_ego_view:
            obs_self.append(self._obs_self_pos[:, agent_index].reshape(B, -1))
            obs_self.append(self._obs_self_rot[:, agent_index].reshape(B, -1))
            obs_self.append(self._obs_self_vel[:, agent_index].reshape(B, -1))
        else:
            # In the ego frame only the longitudinal velocity is informative
            obs_self.append(
                self._obs_self_vel[:, agent_index, 0].reshape(B, -1)
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
        return self._done(in_reset=False)

    def done_query(self, *, in_reset: bool = False):
        return self._done(in_reset=in_reset)

    def _done(self, in_reset: bool):
        B = self.world.batch_dim
        is_collision_with_agents = jnp.any(
            self.collide_agents.reshape(B, -1), axis=-1
        )
        is_collision_with_lanelets = jnp.any(self.collide_lanelets, axis=-1)

        if in_reset:
            # Reset-path query: report the flags only.  The recording /
            # re-placement side effects below are per-STEP semantics
            # (reference runs them in done() after world.step,
            # road_traffic.py:2302-2345); re-running them here would
            # append duplicate initial-state-buffer rows and re-place
            # agents from stale pre-reset collision flags.
            if self.is_testing_mode:
                return jnp.zeros((B,), dtype=bool)
            return is_collision_with_agents | is_collision_with_lanelets

        if self.map_type == "2":
            # Record the state from n_steps_stored steps before an
            # agent-agent collision into the initial-state buffer
            # (road_traffic.py:2302-2310); per-env bernoulli draw instead
            # of the reference's single shared draw.
            do_record = (
                jax.random.uniform(self.world.next_key(), (B,))
                < self.probability_record
            ) & is_collision_with_agents
            self._isb_append(
                do_record, self._hist_latest(self.n_steps_stored)
            )

        if self.is_testing_mode:
            # Testing mode: collisions never terminate; only the colliding
            # agents are re-placed (road_traffic.py:2313-2330).
            agents_reset = (
                jnp.any(self.collide_agents, axis=-1) | self.collide_lanelets
            )
            if not all(self.paths.is_loop):
                agents_reset = (
                    agents_reset | self.collide_entry | self.collide_exit
                )
            self._reset_agents(agents_reset)
            return jnp.zeros((B,), dtype=bool)

        # NOTE: when map_type '3' / testing mode re-place agents below,
        # the refresh runs every step even if no agent crossed a segment
        # (masked dense update; a data-dependent skip would need the
        # whole _reset_agents pipeline functionalized under lax.cond).
        done = is_collision_with_agents | is_collision_with_lanelets
        if self.map_type == "3":
            # Agents leaving through their entry/exit segments are
            # re-placed unless the whole env terminates
            # (road_traffic.py:2332-2345).
            agents_reset = (
                self.collide_entry | self.collide_exit
            ) & ~done[:, None]
            self._reset_agents(agents_reset)
        return done

    def _reset_agents(self, mask):
        """Masked per-(env, agent) re-placement — the jit-native form of the
        reference's ``reset_world_at(env_index, agent_index)`` python loop
        (road_traffic.py:917-1035 with ``is_reset_single_agent=True``).

        ``mask [B, A]``: True where agent a of env b is re-placed.  New
        placements keep the env's current sub-map (scenario_id), re-sample
        a path/point, and rejection-test against ALL agents' current
        positions (bounded ``lax.while_loop``).
        """
        B = self.world.batch_dim
        A = self.n_agents
        yaw_vec = jnp.asarray(self.paths.vec_norm)
        min_d2 = self.reset_agent_min_distance**2
        group_lo, group_size = self._group_bounds()

        positions = jnp.stack(
            [a.state.pos for a in self.world.agents], axis=1
        )
        new_path_id = self.path_id
        new_point_id = self.point_id

        for i, agent in enumerate(self.world.agents):
            m = mask[:, i]
            key = self.world.next_key()

            def too_close(pos):
                d2 = jnp.sum((positions - pos[:, None]) ** 2, axis=-1)
                d2 = d2.at[:, i].set(jnp.inf)
                return jnp.any(d2 < min_d2, axis=-1)

            key, sub = jax.random.split(key)
            pid, point, pos = self._propose_placement(
                sub, group_lo, group_size
            )

            def cond(carry):
                k, pid, point, pos, tries = carry
                return jnp.any(too_close(pos) & m) & (tries < 100)

            def body(carry):
                k, pid, point, pos, tries = carry
                k, sub = jax.random.split(k)
                pid2, point2, pos2 = self._propose_placement(
                    sub, group_lo, group_size
                )
                bad = too_close(pos) & m
                pid = jnp.where(bad, pid2, pid)
                point = jnp.where(bad, point2, point)
                pos = jnp.where(bad[:, None], pos2, pos)
                return k, pid, point, pos, tries + 1

            key, pid, point, pos, _ = jax.lax.while_loop(
                cond, body, (key, pid, point, pos, jnp.int32(0))
            )

            rot = jnp.arctan2(yaw_vec[pid, point, 1], yaw_vec[pid, point, 0])
            key, kv = jax.random.split(key)
            vel_abs = jax.random.uniform(kv, (B,)) * self.max_speed
            vel = jnp.stack(
                [vel_abs * jnp.cos(rot), vel_abs * jnp.sin(rot)], axis=-1
            )

            new_pos = jnp.where(m[:, None], pos, agent.state.pos)
            new_rot = jnp.where(m[:, None], rot[:, None], agent.state.rot)
            new_vel = jnp.where(m[:, None], vel, agent.state.vel)
            agent.set_pos(new_pos)
            agent.set_rot(new_rot)
            agent.set_vel(new_vel)
            positions = positions.at[:, i].set(new_pos)
            new_path_id = new_path_id.at[:, i].set(
                jnp.where(m, pid, new_path_id[:, i])
            )
            new_point_id = new_point_id.at[:, i].set(
                jnp.where(m, point, new_point_id[:, i])
            )

        self.path_id = new_path_id
        self.point_id = new_point_id

        # Refresh derived per-env buffers for envs with any re-placed agent
        # (the reference's reset_init_distances_and_short_term_ref_path +
        # mutual-distance/collision-flag refresh, road_traffic.py:1002-1020).
        env_m = jnp.any(mask, axis=-1)
        rotations = jnp.stack(
            [a.state.rot[:, 0] for a in self.world.agents], axis=1
        )
        dist_ref, left_all, right_all, boundaries, short_term = (
            self._geometry_bundle(positions, rotations, False)
        )

        def mask_update(name, value):
            old = getattr(self, name)
            mexp = env_m.reshape((B,) + (1,) * (value.ndim - 1))
            setattr(self, name, jnp.where(mexp, value, old))

        mask_update("short_term", short_term)
        mask_update("distances_agents", self._mutual_distances(positions))
        mask_update("distances_ref", dist_ref)
        mask_update("distances_left_b", left_all)
        mask_update("distances_right_b", right_all)
        mask_update("distances_boundaries", boundaries)
        # The reference's state_buffer reset also refreshes the "previous"
        # positions used by the progress reward, so a teleport never counts
        # as progress.
        mask_update("prev_pos", positions)
        self.collide_agents = jnp.where(
            env_m[:, None, None], False, self.collide_agents
        )
        self.collide_lanelets = jnp.where(
            env_m[:, None], False, self.collide_lanelets
        )
        if self.map_type == "3" or self.is_testing_mode:
            self.collide_entry = jnp.where(
                env_m[:, None], False, self.collide_entry
            )
            self.collide_exit = jnp.where(
                env_m[:, None], False, self.collide_exit
            )
        if self.map_type == "2":
            self._hist_reset(env_m)

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
