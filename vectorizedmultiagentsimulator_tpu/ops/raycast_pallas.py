"""Fused Pallas TPU kernel for LIDAR ray casting.

The jnp path (:mod:`.raycast`) materializes ``[B, n_entities, n_rays]``
distance tensors per shape class in HBM and min-reduces them.  This kernel
fuses the entire cast — every entity of every shape class and the final
min-reduce — into one VMEM-resident program: the working set per grid step
is a ``[TB, R]`` tile, entity loops are unrolled at trace time (entity
counts and shape parameters are static), and only the ``[B, R]`` result
ever touches HBM.  On VMEM-bound scenes (discovery/pollock-style LIDAR
sweeps) this removes the dominant HBM round trips of the cast.

Gradients: the kernel is wrapped in ``jax.custom_vjp`` whose backward pass
re-runs the jnp reference implementation under ``jax.vjp`` — forward speed
from Pallas, full differentiability preserved (observations are
grad-tested, SURVEY.md §4).

Enable/disable with the environment variable ``VMT_PALLAS_LIDAR``
(default: on when running on TPU).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 512  # batch tile (env batch rides the 128-wide lane dim)


def pallas_lidar_enabled() -> bool:
    flag = os.environ.get("VMT_PALLAS_LIDAR")
    if flag is not None:
        return flag not in ("0", "false", "False")
    if os.environ.get("VMT_PALLAS_INTERPRET") == "1":
        return True  # interpret mode: exercised in CPU tests
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(
    origin_ref,
    angles_ref,
    sphere_pos_ref,
    box_pos_ref,
    box_rot_ref,
    line_pos_ref,
    line_rot_ref,
    out_ref,
    *,
    sphere_radius: Tuple[float, ...],
    box_length: Tuple[float, ...],
    box_width: Tuple[float, ...],
    line_length: Tuple[float, ...],
    max_range: float,
):
    """Transposed layout: every ref is ``[dim, TB_batch]`` so the env batch
    rides the 128-wide lane dimension at full utilization."""
    ang = angles_ref[:]  # [R, TB]
    ox = origin_ref[0:1, :]  # [1, TB]
    oy = origin_ref[1:2, :]
    dx = jnp.cos(ang)  # [R, TB]
    dy = jnp.sin(ang)
    dmin = jnp.full_like(ang, max_range)

    # ---- spheres: ray/circle via perpendicular decomposition ---- #
    for e, r in enumerate(sphere_radius):
        sx = sphere_pos_ref[2 * e : 2 * e + 1, :]  # [1, TB]
        sy = sphere_pos_ref[2 * e + 1 : 2 * e + 2, :]
        ux = sx - ox
        uy = sy - oy
        t = ux * dx + uy * dy  # [R, TB]
        dperp_sq = (ux * ux + uy * uy) - t * t
        a = r * r - dperp_sq
        m = jnp.sqrt(jnp.maximum(a, 1e-8))
        hit = (dperp_sq < r * r) & (t > 0.0)
        d = jnp.abs(t) - m
        dmin = jnp.minimum(dmin, jnp.where(hit, d, max_range))

    # ---- boxes: slab method in the box frame ---- #
    for e, (bl, bw) in enumerate(zip(box_length, box_width)):
        bx = box_pos_ref[2 * e : 2 * e + 1, :]
        by = box_pos_ref[2 * e + 1 : 2 * e + 2, :]
        br = box_rot_ref[e : e + 1, :]
        cos_b = jnp.cos(br)
        sin_b = jnp.sin(br)
        rx = ox - bx
        ry = oy - by
        px = rx * cos_b + ry * sin_b  # [1, TB]
        py = -rx * sin_b + ry * cos_b
        rdx = dx * cos_b + dy * sin_b  # [R, TB]
        rdy = -dx * sin_b + dy * cos_b

        tx1 = (-bl / 2 - px) / rdx
        tx2 = (bl / 2 - px) / rdx
        tmin = jnp.minimum(tx1, tx2)
        tmax = jnp.maximum(tx1, tx2)
        ty1 = (-bw / 2 - py) / rdy
        ty2 = (bw / 2 - py) / rdy
        tmin = jnp.maximum(tmin, jnp.minimum(ty1, ty2))
        tmax = jnp.minimum(tmax, jnp.maximum(ty1, ty2))
        ix = tmin * rdx + px
        iy = tmin * rdy + py
        dist = jnp.sqrt((ix - px) ** 2 + (iy - py) ** 2)
        hit = (tmax >= tmin) & (tmin > 0.0)
        dmin = jnp.minimum(dmin, jnp.where(hit, dist, max_range))

    # ---- lines: segment/ray crossing ---- #
    for e, ll in enumerate(line_length):
        lx = line_pos_ref[2 * e : 2 * e + 1, :]
        ly = line_pos_ref[2 * e + 1 : 2 * e + 2, :]
        lr = line_rot_ref[e : e + 1, :]
        rvx = jnp.cos(lr) * ll  # [1, TB]
        rvy = jnp.sin(lr) * ll
        qx = ox - lx
        qy = oy - ly
        rxs = rvx * dy - rvy * dx  # [R, TB]
        inv = 1.0 / rxs
        t = (qx * dy - qy * dx) * inv
        u = (qx * rvy - qy * rvx) * inv
        d = jnp.abs(u)
        miss = (rxs == 0.0) | (t > 0.5) | (t < -0.5) | (u < 0.0)
        dmin = jnp.minimum(dmin, jnp.where(miss, max_range, d))

    out_ref[:] = dmin


def _pallas_forward(
    origin,
    angles,
    sphere_pos,
    box_pos,
    box_rot,
    line_pos,
    line_rot,
    *,
    sphere_radius,
    box_length,
    box_width,
    line_length,
    max_range,
):
    B, R = angles.shape
    kernel = functools.partial(
        _kernel,
        sphere_radius=tuple(float(x) for x in sphere_radius),
        box_length=tuple(float(x) for x in box_length),
        box_width=tuple(float(x) for x in box_width),
        line_length=tuple(float(x) for x in line_length),
        max_range=float(max_range),
    )
    TB = _TB
    grid = (pl.cdiv(B, TB),)

    def col_spec(height):
        return pl.BlockSpec(
            (height, TB), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    ns = max(len(sphere_radius), 1)
    nb = max(len(box_length), 1)
    nl = max(len(line_length), 1)
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            col_spec(2),  # origin^T
            col_spec(R),  # angles^T
            col_spec(2 * ns),  # sphere pos^T
            col_spec(2 * nb),  # box pos^T
            col_spec(nb),  # box rot^T
            col_spec(2 * nl),  # line pos^T
            col_spec(nl),  # line rot^T
        ],
        out_specs=col_spec(R),
        out_shape=jax.ShapeDtypeStruct((R, B), jnp.float32),
        interpret=os.environ.get("VMT_PALLAS_INTERPRET") == "1",
    )(
        origin.T,
        angles.T,
        sphere_pos.T,
        box_pos.T,
        box_rot.T,
        line_pos.T,
        line_rot.T,
    )
    return out_t.T


def _jnp_reference(
    origin,
    angles,
    sphere_pos,
    box_pos,
    box_rot,
    line_pos,
    line_rot,
    *,
    sphere_radius,
    box_length,
    box_width,
    line_length,
    max_range,
):
    """Differentiable jnp implementation over the same flattened inputs
    (used for the backward pass and as the non-TPU fallback)."""
    from vectorizedmultiagentsimulator_tpu.ops import raycast as rc

    B, R = angles.shape
    dists = [jnp.full((B, R), max_range)]
    if len(sphere_radius):
        sp = sphere_pos.reshape(B, -1, 2)[:, : len(sphere_radius)]
        d = rc.cast_rays_to_sphere(
            sp, jnp.asarray(np.asarray(sphere_radius, np.float32)),
            origin, angles, max_range,
        )
        dists.append(jnp.min(d, axis=1))
    if len(box_length):
        bp = box_pos.reshape(B, -1, 2)[:, : len(box_length)]
        d = rc.cast_rays_to_box(
            bp,
            box_rot[:, : len(box_length)],
            jnp.asarray(np.asarray(box_length, np.float32)),
            jnp.asarray(np.asarray(box_width, np.float32)),
            origin,
            angles,
            max_range,
        )
        dists.append(jnp.min(d, axis=1))
    if len(line_length):
        lp = line_pos.reshape(B, -1, 2)[:, : len(line_length)]
        d = rc.cast_rays_to_line(
            lp,
            line_rot[:, : len(line_length)],
            jnp.asarray(np.asarray(line_length, np.float32)),
            origin,
            angles,
            max_range,
        )
        dists.append(jnp.min(d, axis=1))
    return jnp.min(jnp.stack(dists, axis=0), axis=0)


_PARTITIONED_CACHE = {}


def _make_partitioned_forward(statics):
    """Wrap the kernel with an SPMD rule so a batch-sharded LIDAR cast
    compiles collective-free under GSPMD (a raw pallas_call cannot be
    partitioned — see ops/physics_pallas._partitioned_forward)."""
    sphere_radius, box_length, box_width, line_length, max_range = statics
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def fwd(origin, angles, sphere_pos, box_pos, box_rot, line_pos,
            line_rot):
        return _pallas_forward(
            origin, angles, sphere_pos, box_pos, box_rot, line_pos,
            line_rot,
            sphere_radius=sphere_radius,
            box_length=box_length,
            box_width=box_width,
            line_length=line_length,
            max_range=max_range,
        )

    def _batch_only(sharding, ndim):
        spec = getattr(sharding, "spec", None)
        b = spec[0] if spec is not None and len(spec) else None
        return NamedSharding(
            sharding.mesh, PartitionSpec(b, *([None] * (ndim - 1)))
        )

    def infer(mesh, arg_shapes, result_shape):
        return _batch_only(arg_shapes[1].sharding, 2)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(
            _batch_only(a.sharding, a.ndim) for a in arg_shapes
        )
        result_shardings = _batch_only(arg_shapes[1].sharding, 2)

        def lower_fn(*args):
            return _pallas_forward(
                *args,
                sphere_radius=sphere_radius,
                box_length=box_length,
                box_width=box_width,
                line_length=line_length,
                max_range=max_range,
            )

        return mesh, lower_fn, result_shardings, arg_shardings

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b i, b r, b s, b p, b q, b l, b m -> b r",
    )
    return fwd


def _get_partitioned_forward(statics):
    fwd = _PARTITIONED_CACHE.get(statics)
    if fwd is None:
        fwd = _make_partitioned_forward(statics)
        _PARTITIONED_CACHE[statics] = fwd
    return fwd


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(7, 8, 9, 10, 11),
)
def fused_cast_rays(
    origin,
    angles,
    sphere_pos,
    box_pos,
    box_rot,
    line_pos,
    line_rot,
    sphere_radius,
    box_length,
    box_width,
    line_length,
    max_range,
):
    """Fused LIDAR cast: min distance over all entities, ``[B, R]``.

    Static per-entity shape parameters are passed as tuples; per-env entity
    poses as flattened ``[B, 2*E]`` / ``[B, E]`` arrays (zero-width when a
    class is empty).
    """
    statics = (
        tuple(float(x) for x in sphere_radius),
        tuple(float(x) for x in box_length),
        tuple(float(x) for x in box_width),
        tuple(float(x) for x in line_length),
        float(max_range),
    )
    return _get_partitioned_forward(statics)(
        origin, angles, sphere_pos, box_pos, box_rot, line_pos, line_rot
    )


def _fwd(
    origin, angles, sphere_pos, box_pos, box_rot, line_pos, line_rot,
    sphere_radius, box_length, box_width, line_length, max_range,
):
    out = fused_cast_rays(
        origin, angles, sphere_pos, box_pos, box_rot, line_pos, line_rot,
        sphere_radius, box_length, box_width, line_length, max_range,
    )
    return out, (
        origin, angles, sphere_pos, box_pos, box_rot, line_pos, line_rot,
    )


def _bwd(
    sphere_radius, box_length, box_width, line_length, max_range,
    residuals, g,
):
    args = residuals
    _, vjp = jax.vjp(
        lambda *a: _jnp_reference(
            *a,
            sphere_radius=sphere_radius,
            box_length=box_length,
            box_width=box_width,
            line_length=line_length,
            max_range=max_range,
        ),
        *args,
    )
    return vjp(g)


fused_cast_rays.defvjp(_fwd, _bwd)
