"""Batched closest-point geometry kernels.

TPU-first re-implementation of the narrowphase geometry in the reference
(``vmas/simulator/physics.py``).  Every function here is a pure
``jax.numpy`` map that broadcasts over *arbitrary* leading batch dims, so
one kernel serves ``[B,2]`` (scenario distance queries), ``[B,P,2]``
(collision pair tables) and ``[B,E,R,2]`` (ray casts).  Fixed-size
sub-structure (the 4 sides of a box, the 4 endpoint projections of a
segment pair) is expressed as an extra stacked axis instead of python
loops so XLA sees a single fused elementwise program.

Reference parity notes (file:line cite into /root/reference):
 - closest_point_line      -> physics.py:400-429
 - line_extrema            -> physics.py:132-141
 - intersection_line_line  -> physics.py:222-260
 - closest_points_line_line-> physics.py:144-219
 - all_lines_box           -> physics.py:298-325
 - closest_point_box       -> physics.py:263-295
 - closest_line_box        -> physics.py:328-382
 - closest_box_box         -> physics.py:26-129
 - inner_point_box         -> physics.py:13-23
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.utils import Array, JaxUtils, X, Y

_INF = jnp.inf


def _norm(v: Array) -> Array:
    return JaxUtils.safe_norm(v, axis=-1)


def safe_norm_xy(dx: Array, dy: Array) -> Array:
    """``safe_norm`` of a vector given as separate x/y components.

    Component-form queries keep every intermediate batch-shaped 1D (full
    8-sublane VPU tiles); stacking to ``[..., 2]`` first would pull the
    producer fusion into 1-sublane ``T(1,128)`` tiles (8x VPU waste —
    profiled on the transport@30k reward path).  Same 0-subgradient-at-0
    semantics as :meth:`JaxUtils.safe_norm`.
    """
    d2 = dx * dx + dy * dy
    is_zero = d2 == 0
    return jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, d2)))


# Two candidate-selection implementations with identical semantics but
# different XLA codegen:
#  - gather (argmin + take_along_axis): bit-stable across program contexts,
#    used by the physics narrowphase so recorded reference trajectories
#    replay exactly (deep-penetration scenes flip contact sides on last-ulp
#    distance differences, so codegen stability matters there);
#  - fused (unrolled where-chain): pure elementwise code XLA fuses into one
#    kernel — no gathers — measured 4.7x on balance's step (scenario
#    distance/overlap queries dominate its obs/reward path).
# ``fused_select()`` switches at trace time; ``World.get_distance`` /
# ``is_overlapping`` / ``get_distance_from_point`` opt in.
_FUSED_SELECT = False


class fused_select:
    """Context manager: use the fusion-friendly (gather-free) candidate
    selection inside scenario-facing distance queries."""

    def __enter__(self):
        global _FUSED_SELECT
        self._prev = _FUSED_SELECT
        _FUSED_SELECT = True

    def __exit__(self, *exc):
        global _FUSED_SELECT
        _FUSED_SELECT = self._prev
        return False


def _min_select(points_a: Array, points_b: Array) -> Tuple[Array, Array]:
    """Pick, along a leading candidate axis 0, the (a, b) point pair with the
    smallest pairwise distance.  Sequential ``d < best`` semantics of the
    reference keep the *first* minimum; ``argmin`` does the same."""
    if _FUSED_SELECT:
        K = points_a.shape[0]
        best_a, best_b = points_a[0], points_b[0]
        best_d = _norm(points_a[0] - points_b[0])
        for k in range(1, K):
            d = _norm(points_a[k] - points_b[k])
            better = (d < best_d)[..., None]
            best_a = jnp.where(better, points_a[k], best_a)
            best_b = jnp.where(better, points_b[k], best_b)
            best_d = jnp.minimum(best_d, d)
        return best_a, best_b
    d = _norm(points_a - points_b)  # [K, ...]
    idx = jnp.argmin(d, axis=0)  # [...]
    pa = jnp.take_along_axis(points_a, idx[None, ..., None], axis=0)[0]
    pb = jnp.take_along_axis(points_b, idx[None, ..., None], axis=0)[0]
    return pa, pb


def closest_point_line(
    line_pos: Array,
    line_rot: Array,
    line_length,
    test_point_pos: Array,
    limit_to_line_length: bool = True,
    direction: Optional[Array] = None,
) -> Array:
    """Closest point on a segment (or infinite line) to a test point.

    ``line_rot`` / ``line_length`` have shape ``[...]`` (no trailing 1).
    ``direction`` optionally supplies the precomputed unit direction
    ``[..., 2]`` (box queries derive all four side directions from one
    cos/sin pair — transcendentals are the costly part of this kernel).
    """
    # Stacked [..., 2] form: measured faster than a per-component scalar
    # rewrite on real TPU (transport@30k A/B: 309M vs 218-240M eps — the
    # scalar form fragments XLA's fusions at the final stack).
    line_length = jnp.asarray(line_length, dtype=line_pos.dtype)
    if direction is None:
        direction = jnp.stack([jnp.cos(line_rot), jnp.sin(line_rot)], axis=-1)
    delta_pos = line_pos - test_point_pos
    dot_p = jnp.sum(delta_pos * direction, axis=-1)
    sign = jnp.sign(dot_p)
    dist_from_center = jnp.abs(dot_p)
    if limit_to_line_length:
        dist_from_center = jnp.minimum(dist_from_center, line_length / 2)
    return line_pos - (sign * dist_from_center)[..., None] * direction


def line_extrema(
    line_pos: Array,
    line_rot: Array,
    line_length,
    direction: Optional[Array] = None,
) -> Tuple[Array, Array]:
    line_length = jnp.asarray(line_length, dtype=line_pos.dtype)
    half = line_length / 2
    if direction is None:
        direction = jnp.stack([jnp.cos(line_rot), jnp.sin(line_rot)], axis=-1)
    xy = half[..., None] * direction
    return line_pos + xy, line_pos - xy


def intersection_line_line(
    point_a1: Array, point_a2: Array, point_b1: Array, point_b2: Array
) -> Tuple[Array, Array]:
    """Segment-segment intersection point; returns (point, distance) where
    distance is 0 on intersection and +inf otherwise (points +inf too)."""
    r = point_a2 - point_a1
    s = point_b2 - point_b1
    p = point_a1
    q = point_b1
    cross_qp_r = JaxUtils.cross(q - p, r)
    cross_qp_s = JaxUtils.cross(q - p, s)
    cross_r_s = JaxUtils.cross(r, s)
    # Guarded division: parallel segments (cross_r_s == 0) would give
    # inf/nan here — masked out of the forward result below, but the div
    # VJP then produces 0 * inf = nan cotangents (reference semantics,
    # core.py:2831-style where-guard).  Substitute a safe denominator and
    # an out-of-[0,1] parameter so `in_range` rejects parallel pairs.
    parallel = cross_r_s == 0
    safe_den = jnp.where(parallel, 1.0, cross_r_s)
    u = jnp.where(parallel, -1.0, cross_qp_r / safe_den)
    t = jnp.where(parallel, -1.0, cross_qp_s / safe_den)
    in_range = (0 <= t) & (t <= 1) & (0 <= u) & (u <= 1)
    condition = (~parallel) & in_range  # [..., 1]
    point = jnp.where(condition, p + t * r, _INF)
    distance = jnp.where(condition[..., 0], 0.0, _INF)
    return point, distance


def closest_points_line_line(
    line_pos: Array,
    line_rot: Array,
    line_length,
    line2_pos: Array,
    line2_rot: Array,
    line2_length,
    direction: Optional[Array] = None,
    direction2: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Closest point pair between two segments.

    ``direction``/``direction2`` optionally supply precomputed unit
    directions for the two segments (see :func:`closest_point_line`).
    """
    # Broadcast both segments to a common batch shape so the fixed 4-way
    # candidate stacking below is well-formed.
    batch_shape = jnp.broadcast_shapes(line_rot.shape, line2_rot.shape)
    line_pos = jnp.broadcast_to(line_pos, batch_shape + (2,))
    line2_pos = jnp.broadcast_to(line2_pos, batch_shape + (2,))
    line_rot = jnp.broadcast_to(line_rot, batch_shape)
    line2_rot = jnp.broadcast_to(line2_rot, batch_shape)
    line_length = jnp.broadcast_to(
        jnp.asarray(line_length, dtype=line_pos.dtype), batch_shape
    )
    line2_length = jnp.broadcast_to(
        jnp.asarray(line2_length, dtype=line_pos.dtype), batch_shape
    )
    if direction is not None:
        direction = jnp.broadcast_to(direction, batch_shape + (2,))
    if direction2 is not None:
        direction2 = jnp.broadcast_to(direction2, batch_shape + (2,))
    point_a1, point_a2 = line_extrema(
        line_pos, line_rot, line_length, direction=direction
    )
    point_b1, point_b2 = line_extrema(
        line2_pos, line2_rot, line2_length, direction=direction2
    )

    point_i, d_i = intersection_line_line(point_a1, point_a2, point_b1, point_b2)

    if _FUSED_SELECT:
        # Unstacked: project the four endpoints individually and fold the
        # first-minimum — same order/semantics as the stacked _min_select
        # below, but every intermediate keeps the batch shape.
        a1_on_b = closest_point_line(
            line2_pos, line2_rot, line2_length, point_a1, direction=direction2
        )
        a2_on_b = closest_point_line(
            line2_pos, line2_rot, line2_length, point_a2, direction=direction2
        )
        b1_on_a = closest_point_line(
            line_pos, line_rot, line_length, point_b1, direction=direction
        )
        b2_on_a = closest_point_line(
            line_pos, line_rot, line_length, point_b2, direction=direction
        )
        pairs = [
            (point_a1, a1_on_b),
            (point_a2, a2_on_b),
            (b1_on_a, point_b1),
            (b2_on_a, point_b2),
        ]
        closest_1, closest_2 = pairs[0]
        best_d = _norm(closest_1 - closest_2)
        for pa, pb in pairs[1:]:
            d = _norm(pa - pb)
            better = (d < best_d)[..., None]
            closest_1 = jnp.where(better, pa, closest_1)
            closest_2 = jnp.where(better, pb, closest_2)
            best_d = jnp.minimum(best_d, d)
    else:
        # Project each endpoint of one segment onto the other segment:
        # stack the four independent sub-problems on a fresh leading axis.
        proj_pos = jnp.stack([line2_pos, line2_pos, line_pos, line_pos], axis=0)
        proj_rot = jnp.stack([line2_rot, line2_rot, line_rot, line_rot], axis=0)
        proj_len = jnp.stack(
            [line2_length, line2_length, line_length, line_length], axis=0
        )
        proj_pts = jnp.stack([point_a1, point_a2, point_b1, point_b2], axis=0)
        projected = closest_point_line(proj_pos, proj_rot, proj_len, proj_pts)
        a1_on_b, a2_on_b, b1_on_a, b2_on_a = (
            projected[0],
            projected[1],
            projected[2],
            projected[3],
        )

        candidates_1 = jnp.stack([point_a1, point_a2, b1_on_a, b2_on_a], axis=0)
        candidates_2 = jnp.stack([a1_on_b, a2_on_b, point_b1, point_b2], axis=0)
        closest_1, closest_2 = _min_select(candidates_1, candidates_2)

    crossing = (d_i == 0)[..., None]
    closest_1 = jnp.where(crossing, point_i, closest_1)
    closest_2 = jnp.where(crossing, point_i, closest_2)
    return closest_1, closest_2


def all_lines_box(
    box_pos: Array, box_rot: Array, box_width, box_length
) -> Tuple[Array, Array, Array]:
    """The 4 sides of a box as segments, stacked on a fresh leading axis.

    Returns (pos [4,...,2], rot [4,...], length [4,...]).
    Side order matches the reference: +length, -length, +width, -width
    (first two perpendicular to the box heading).
    """
    box_width = jnp.broadcast_to(jnp.asarray(box_width, box_pos.dtype), box_rot.shape)
    box_length = jnp.broadcast_to(
        jnp.asarray(box_length, box_pos.dtype), box_rot.shape
    )
    heading = jnp.stack([jnp.cos(box_rot), jnp.sin(box_rot)], axis=-1)
    perp_rot = box_rot + jnp.pi / 2
    perp = jnp.stack([jnp.cos(perp_rot), jnp.sin(perp_rot)], axis=-1)

    half_l = (box_length / 2)[..., None]
    half_w = (box_width / 2)[..., None]
    p1 = box_pos + heading * half_l
    p2 = box_pos - heading * half_l
    p3 = box_pos + perp * half_w
    p4 = box_pos - perp * half_w

    pos = jnp.stack([p1, p2, p3, p4], axis=0)
    rot = jnp.stack([perp_rot, perp_rot, box_rot, box_rot], axis=0)
    length = jnp.stack([box_width, box_width, box_length, box_length], axis=0)
    return pos, rot, length


def box_side_list(
    box_pos: Array, box_rot: Array, box_width, box_length
):
    """The 4 sides of a box as a python list of (pos, rot, length, dir).

    Same order/math as :func:`all_lines_box` but WITHOUT the stacked
    leading axis: every array keeps the caller's batch shape, which XLA
    tiles with the batch on the 128-lane dimension and fuses into one
    kernel.  The ``[4, B, ...]`` stack instead forces 1-sublane
    ``T(1,128)`` tiles (measured 46 us/step of the transport@30k reward
    path before this form existed).
    """
    # Keep scalar sizes scalar: broadcasting them to box_rot.shape turns
    # the shared cos/sin values into [B,1]-consumed intermediates that
    # XLA materializes with 1-sublane T(1,128) tiles — 7/8 of the VPU
    # idle (profiled 12.5 us/step = 19% of the whole transport@30k step
    # in two such trig fusions).  Batched sizes ([P]/[B]-shaped pair
    # tables) still broadcast correctly against heading/perp below.
    box_width = jnp.asarray(box_width, box_pos.dtype)
    box_length = jnp.asarray(box_length, box_pos.dtype)
    c = jnp.cos(box_rot)
    s = jnp.sin(box_rot)
    heading = jnp.stack([c, s], axis=-1)
    perp_rot = box_rot + jnp.pi / 2
    # cos(r + pi/2) = -sin(r), sin(r + pi/2) = cos(r): the box costs ONE
    # cos/sin pair instead of two (transcendentals dominate; profiled
    # 12.5us/step of transport@30k in a 1-sublane trig fusion).
    perp = jnp.stack([-s, c], axis=-1)
    half_l = (box_length / 2)[..., None]
    half_w = (box_width / 2)[..., None]
    # (pos, rot, length, unit direction) per side — the direction is
    # threaded into the line kernels so no side recomputes trig.
    return [
        (box_pos + heading * half_l, perp_rot, box_width, perp),
        (box_pos - heading * half_l, perp_rot, box_width, perp),
        (box_pos + perp * half_w, box_rot, box_length, heading),
        (box_pos - perp * half_w, box_rot, box_length, heading),
    ]


def closest_point_box_xy(
    box_pos: Array, box_rot: Array, box_width, box_length, test_point_pos: Array
) -> Tuple[Array, Array]:
    """Closest point on a box's perimeter, returned as (x, y) components.

    Local-frame clamp form: rotate the test point into the box frame,
    clamp to the half-extents (outside points), and snap interior points
    to their nearest edge.  Geometrically identical to the reference's
    4-side first-minimum fold (physics.py:263-295) — including tie
    behavior: the fold's side order (+heading, -heading, +perp, -perp)
    makes the length-direction edges win exact ties, which ``margin_x <=
    margin_y`` reproduces — but ~2.7x faster on TPU (micro-bench @30k
    envs: 3.3 vs 8.9 us/query).  Component outputs let distance/overlap
    queries stay fully 1D-batch-shaped; stacking to ``[..., 2]`` drags
    the whole producer fusion into 1-sublane ``T(1,128)`` tiles.
    """
    c = jnp.cos(box_rot)
    s = jnp.sin(box_rot)
    half_l = jnp.asarray(box_length, box_pos.dtype) / 2
    half_w = jnp.asarray(box_width, box_pos.dtype) / 2
    d = test_point_pos - box_pos
    dx, dy = d[..., 0], d[..., 1]
    local_x = dx * c + dy * s  # along heading (length direction)
    local_y = -dx * s + dy * c  # along perp (width direction)
    clip_x = jnp.clip(local_x, -half_l, half_l)
    clip_y = jnp.clip(local_y, -half_w, half_w)
    inside = (jnp.abs(local_x) < half_l) & (jnp.abs(local_y) < half_w)
    margin_x = half_l - jnp.abs(local_x)
    margin_y = half_w - jnp.abs(local_y)
    edge_x = jnp.where(local_x >= 0, half_l, -half_l)
    edge_y = jnp.where(local_y >= 0, half_w, -half_w)
    qx = jnp.where(inside & (margin_x <= margin_y), edge_x, clip_x)
    qy = jnp.where(inside & (margin_x > margin_y), edge_y, clip_y)
    gx = qx * c - qy * s + box_pos[..., 0]
    gy = qx * s + qy * c + box_pos[..., 1]
    return gx, gy


def closest_point_box(
    box_pos: Array, box_rot: Array, box_width, box_length, test_point_pos: Array
) -> Array:
    """Closest point on a box's perimeter to a test point."""
    if _FUSED_SELECT:
        gx, gy = closest_point_box_xy(
            box_pos, box_rot, box_width, box_length, test_point_pos
        )
        return jnp.stack([gx, gy], axis=-1)
    lines_pos, lines_rot, lines_length = all_lines_box(
        box_pos, box_rot, box_width, box_length
    )
    pts = closest_point_line(
        lines_pos, lines_rot, lines_length, test_point_pos[None]
    )  # [4, ..., 2]
    d = _norm(test_point_pos[None] - pts)
    idx = jnp.argmin(d, axis=0)
    return jnp.take_along_axis(pts, idx[None, ..., None], axis=0)[0]


def closest_line_box(
    box_pos: Array,
    box_rot: Array,
    box_width,
    box_length,
    line_pos: Array,
    line_rot: Array,
    line_length,
    line_direction: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Closest (box point, line point) pair between a box and a segment."""
    line_length = jnp.broadcast_to(
        jnp.asarray(line_length, box_pos.dtype), line_rot.shape
    )
    if _FUSED_SELECT:
        best_a = best_b = best_d = None
        for lp, lr, ll, ld in box_side_list(
            box_pos, box_rot, box_width, box_length
        ):
            pa, pb = closest_points_line_line(
                lp, lr, ll, line_pos, line_rot, line_length,
                direction=ld, direction2=line_direction,
            )
            d = _norm(pa - pb)
            if best_a is None:
                best_a, best_b, best_d = pa, pb, d
            else:
                better = (d < best_d)[..., None]
                best_a = jnp.where(better, pa, best_a)
                best_b = jnp.where(better, pb, best_b)
                best_d = jnp.minimum(best_d, d)
        return best_a, best_b
    lines_pos, lines_rot, lines_length = all_lines_box(
        box_pos, box_rot, box_width, box_length
    )
    ps_box, ps_line = closest_points_line_line(
        lines_pos,
        lines_rot,
        lines_length,
        line_pos[None],
        line_rot[None],
        line_length[None],
    )
    return _min_select(ps_box, ps_line)


def closest_box_box(
    box_pos: Array,
    box_rot: Array,
    box_width,
    box_length,
    box2_pos: Array,
    box2_rot: Array,
    box2_width,
    box2_length,
) -> Tuple[Array, Array]:
    """Closest point pair between two boxes.

    Mirrors the reference decomposition (physics.py:26-129): each box is
    split into its 4 sides and tested against the *other* box with
    ``closest_line_box``; the two stacked passes are fused into one call
    with an 8-way candidate axis, then min-reduced.
    """
    box_width = jnp.broadcast_to(jnp.asarray(box_width, box_pos.dtype), box_rot.shape)
    box_length = jnp.broadcast_to(
        jnp.asarray(box_length, box_pos.dtype), box_rot.shape
    )
    box2_width = jnp.broadcast_to(
        jnp.asarray(box2_width, box_pos.dtype), box2_rot.shape
    )
    box2_length = jnp.broadcast_to(
        jnp.asarray(box2_length, box_pos.dtype), box2_rot.shape
    )

    if _FUSED_SELECT:
        # Unstacked 8-candidate fold (same order as the stacked form:
        # box1's 4 sides vs box2, then box2's 4 sides vs box1).
        candidates = []
        for lp, lr, ll, ld in box_side_list(
            box_pos, box_rot, box_width, box_length
        ):
            pt_t, pt_l = closest_line_box(
                box2_pos, box2_rot, box2_width, box2_length, lp, lr, ll,
                line_direction=ld,
            )
            candidates.append((pt_l, pt_t))  # (on box1, on box2)
        for lp, lr, ll, ld in box_side_list(
            box2_pos, box2_rot, box2_width, box2_length
        ):
            pt_t, pt_l = closest_line_box(
                box_pos, box_rot, box_width, box_length, lp, lr, ll,
                line_direction=ld,
            )
            candidates.append((pt_t, pt_l))
        best_a, best_b = candidates[0]
        best_d = _norm(best_a - best_b)
        for pa, pb in candidates[1:]:
            d = _norm(pa - pb)
            better = (d < best_d)[..., None]
            best_a = jnp.where(better, pa, best_a)
            best_b = jnp.where(better, pb, best_b)
            best_d = jnp.minimum(best_d, d)
        return best_a, best_b

    lines_a_pos, lines_a_rot, lines_a_len = all_lines_box(
        box_pos, box_rot, box_width, box_length
    )
    lines_b_pos, lines_b_rot, lines_b_len = all_lines_box(
        box2_pos, box2_rot, box2_width, box2_length
    )

    # Pass 1: sides of box1 vs box2; pass 2: sides of box2 vs box1.
    tgt_pos = jnp.concatenate(
        [jnp.broadcast_to(box2_pos, lines_a_pos.shape),
         jnp.broadcast_to(box_pos, lines_b_pos.shape)], axis=0
    )
    tgt_rot = jnp.concatenate(
        [jnp.broadcast_to(box2_rot, lines_a_rot.shape),
         jnp.broadcast_to(box_rot, lines_b_rot.shape)], axis=0
    )
    tgt_w = jnp.concatenate(
        [jnp.broadcast_to(box2_width, lines_a_rot.shape),
         jnp.broadcast_to(box_width, lines_b_rot.shape)], axis=0
    )
    tgt_l = jnp.concatenate(
        [jnp.broadcast_to(box2_length, lines_a_rot.shape),
         jnp.broadcast_to(box_length, lines_b_rot.shape)], axis=0
    )
    src_pos = jnp.concatenate([lines_a_pos, lines_b_pos], axis=0)
    src_rot = jnp.concatenate([lines_a_rot, lines_b_rot], axis=0)
    src_len = jnp.concatenate([lines_a_len, lines_b_len], axis=0)

    pts_target, pts_line = closest_line_box(
        tgt_pos, tgt_rot, tgt_w, tgt_l, src_pos, src_rot, src_len
    )
    # First 4 candidates: line on box1, target point on box2.
    # Last 4 candidates: line on box2, target point on box1.
    pts_on_box1 = jnp.concatenate([pts_line[:4], pts_target[4:]], axis=0)
    pts_on_box2 = jnp.concatenate([pts_target[:4], pts_line[4:]], axis=0)
    return _min_select(pts_on_box1, pts_on_box2)


def inner_point_box(
    outside_point: Array, surface_point: Array, box_pos: Array
) -> Tuple[Array, Array]:
    """Project the surface contact point toward the box centre along the
    outside-point->surface ray (anti-tunneling helper, physics.py:13-23).

    Returns (inner point, distance surface->inner)."""
    v = surface_point - outside_point
    u = box_pos - surface_point
    v_norm = _norm(v)[..., None]
    x_magnitude = jnp.sum(v * u, axis=-1, keepdims=True) / jnp.maximum(
        v_norm, 1e-12
    )
    x = v / jnp.maximum(v_norm, 1e-12) * x_magnitude
    degenerate = v_norm == 0
    x = jnp.where(degenerate, surface_point, x)
    x_magnitude = jnp.where(degenerate, 0.0, x_magnitude)
    return surface_point + x, jnp.abs(x_magnitude[..., 0])
