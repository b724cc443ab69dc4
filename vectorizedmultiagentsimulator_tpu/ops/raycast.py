"""Vectorized LIDAR ray-cast kernels.

TPU-native rebuild of the ray casting backend in the reference
(``vmas/simulator/core.py:1281-1372`` boxes, ``:1414-1490`` spheres,
``:1544-1626`` lines).  Each kernel evaluates ``[B, n_entities, n_rays]``
densely in one fused elementwise program; misses produce ``max_range`` via
``where`` masks instead of in-place writes.

Inputs:
  origin         [B, 2]            ray start (the sensing agent position)
  angles         [B, R]            world-frame ray angles
  entity arrays  [B, E] / [B, E, 2] stacked per-shape state
Returns distances ``[B, E, R]``.
"""
from __future__ import annotations

import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.ops.geometry import closest_point_line
from vectorizedmultiagentsimulator_tpu.utils import Array, JaxUtils, X, Y


def cast_rays_to_box(
    box_pos: Array,      # [B, E, 2]
    box_rot: Array,      # [B, E]
    box_length: Array,   # [B, E] or [E]
    box_width: Array,    # [B, E] or [E]
    origin: Array,       # [B, 2]
    angles: Array,       # [B, R]
    max_range: float,
) -> Array:
    """Slab-method ray/oriented-box intersection (core.py:1281-1372)."""
    # Broadcast to [B, E, R, ...]
    o = origin[:, None, None, :]
    bp = box_pos[:, :, None, :]
    br = box_rot[:, :, None]
    bl = jnp.broadcast_to(jnp.asarray(box_length, box_pos.dtype), box_rot.shape)[
        :, :, None
    ]
    bw = jnp.broadcast_to(jnp.asarray(box_width, box_pos.dtype), box_rot.shape)[
        :, :, None
    ]
    ang = angles[:, None, :]

    pos_origin = o - bp
    pos_aabb = JaxUtils.rotate_vector(pos_origin, -br)
    ray_dir_world = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    ray_dir_aabb = JaxUtils.rotate_vector(ray_dir_world, -br)

    def slab(half, p, d):
        """Guarded slab interval: rays parallel to the slab (d == 0,
        which happens for every axis-aligned LIDAR ray) would divide by
        zero — correct in forward IEEE-inf arithmetic, but the div VJP
        turns the masked-out cotangents into 0 * inf = nan.  Mirror the
        inf-selection semantics with finite sentinels instead."""
        parallel = d == 0.0
        safe_d = jnp.where(parallel, 1.0, d)
        t1 = (-half - p) / safe_d
        t2 = (half - p) / safe_d
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        inside = (p >= -half) & (p <= half)
        big = jnp.asarray(1e9, p.dtype)
        lo = jnp.where(parallel, jnp.where(inside, -big, big), lo)
        hi = jnp.where(parallel, jnp.where(inside, big, -big), hi)
        return lo, hi

    tx_lo, tx_hi = slab(bl / 2, pos_aabb[..., X], ray_dir_aabb[..., X])
    ty_lo, ty_hi = slab(bw / 2, pos_aabb[..., Y], ray_dir_aabb[..., Y])
    tmin = jnp.maximum(tx_lo, ty_lo)
    tmax = jnp.minimum(tx_hi, ty_hi)

    intersect_aabb = tmin[..., None] * ray_dir_aabb + pos_aabb
    intersect_world = JaxUtils.rotate_vector(intersect_aabb, br) + bp

    collision = (tmax >= tmin) & (tmin > 0.0)
    dist = JaxUtils.safe_norm(o - intersect_world, axis=-1)
    return jnp.where(collision, dist, max_range)


def cast_rays_to_sphere(
    sphere_pos: Array,     # [B, E, 2]
    sphere_radius: Array,  # [B, E] or [E]
    origin: Array,         # [B, 2]
    angles: Array,         # [B, R]
    max_range: float,
) -> Array:
    """Ray/circle intersection via closest-point decomposition
    (core.py:1414-1490)."""
    o = origin[:, None, None, :]
    sp = sphere_pos[:, :, None, :]
    sr = jnp.broadcast_to(
        jnp.asarray(sphere_radius, sphere_pos.dtype), sphere_pos.shape[:-1]
    )[:, :, None]
    B, E = sphere_pos.shape[:2]
    R = angles.shape[-1]
    ang = jnp.broadcast_to(angles[:, None, :], (B, E, R))

    ray_dir_world = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    line_pos = o + ray_dir_world * (max_range / 2)
    closest = closest_point_line(
        line_pos, ang, max_range, sp, limit_to_line_length=False
    )

    d = sp - closest
    d_norm = JaxUtils.safe_norm(d, axis=-1)
    ray_intersects = d_norm < sr
    a = sr**2 - d_norm**2
    m = jnp.sqrt(jnp.where(a > 0, a, 1e-8))

    u = sp - o
    u1 = closest - o
    sphere_in_front = jnp.sum(u * ray_dir_world, axis=-1) > 0.0
    dist = JaxUtils.safe_norm(u1, axis=-1) - m
    return jnp.where(ray_intersects & sphere_in_front, dist, max_range)


def cast_rays_to_line(
    line_pos: Array,     # [B, E, 2]
    line_rot: Array,     # [B, E]
    line_length: Array,  # [B, E] or [E]
    origin: Array,       # [B, 2]
    angles: Array,       # [B, R]
    max_range: float,
) -> Array:
    """Ray/segment intersection (core.py:1544-1626)."""
    o = origin[:, None, None, :]
    lp = line_pos[:, :, None, :]
    lr = line_rot[:, :, None]
    ll = jnp.broadcast_to(jnp.asarray(line_length, line_pos.dtype), line_rot.shape)[
        :, :, None
    ]
    ang = angles[:, None, :]

    B, E = line_pos.shape[:2]
    R = angles.shape[-1]
    r = jnp.broadcast_to(
        jnp.stack([jnp.cos(lr), jnp.sin(lr)], axis=-1) * ll[..., None],
        (B, E, R, 2),
    )
    q = o
    s = jnp.broadcast_to(
        jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1), (B, E, R, 2)
    )

    rxs = JaxUtils.cross(r, s)
    # Guarded division: rays parallel to the segment (rxs == 0) would give
    # inf/nan — masked out of the result below, but the div VJP would
    # then produce 0 * inf = nan cotangents.
    parallel = rxs == 0.0
    safe_rxs = jnp.where(parallel, 1.0, rxs)
    t = JaxUtils.cross(q - lp, s / safe_rxs)
    u = JaxUtils.cross(q - lp, r / safe_rxs)
    d = JaxUtils.safe_norm(u * s, axis=-1)

    miss = (
        parallel[..., 0]
        | (t[..., 0] > 0.5)
        | (t[..., 0] < -0.5)
        | (u[..., 0] < 0.0)
    )
    return jnp.where(miss, max_range, d)
