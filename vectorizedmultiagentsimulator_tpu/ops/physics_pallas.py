"""Fused Pallas TPU kernel for the physics step.

The jnp physics core (``World._step_core``) compiles to ~75 fused XLA
kernels per step whose ``[B, N, ·]`` intermediates round-trip HBM between
fusions; at 30k envs that is ~1.3 GB of traffic and ~0.3 ms of kernel
sequencing per step.  This kernel runs the ENTIRE step — action/gravity
forces, the pair narrowphase, soft contacts and every substep of the
semi-implicit Euler integration — as one VMEM-resident program: state is
read from HBM once and written once, with per-entity rows living in
registers/VMEM in the transposed layout (env batch on the 128-wide lane
dimension; entity loops, pair tables and substeps unrolled at trace time
since they are static).

Supported subset (``step_supported``): sphere-sphere and solid box-sphere
contacts, static gravity, drag, world-bound clamps, per-entity
max_speed/v_range — i.e. the bulk of the scenario library, including the
flagship bench configs.  Joints, lines, hollow boxes, friction and dynamic
gravity fall back to the jnp path with identical semantics.

Gradients: ``jax.custom_vjp`` whose backward re-runs ``World._step_core``
under ``jax.vjp`` — Pallas forward speed, full differentiability.

Disable with ``VMT_PALLAS_STEP=0``.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectorizedmultiagentsimulator_tpu.utils import LINE_MIN_DIST

_TB = 512  # batch tile (env batch rides the lane dim)


def pallas_step_enabled() -> bool:
    flag = os.environ.get("VMT_PALLAS_STEP")
    if flag is not None:
        return flag not in ("0", "false", "False")
    if os.environ.get("VMT_PALLAS_INTERPRET") == "1":
        return True  # interpret mode: exercised in CPU tests
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def step_supported(world) -> bool:
    if not pallas_step_enabled():
        return False
    if world._ordered_constraints:
        return False  # joints
    for cls in ("ls", "ll", "bl", "bb"):
        if len(world._pairs[cls]):
            return False  # line/box-box narrowphase not in the kernel yet
    if len(world._pairs["bs"]) and world._hollow[world._pairs["bs"][:, 0]].any():
        return False  # hollow boxes
    if np.any(world._lin_friction > 0) or np.any(world._ang_friction > 0):
        return False
    if world._dyn_gravity_names:
        return False
    # Unrolled-kernel size guard (compile time / VMEM)
    n_pairs = len(world._pairs["ss"]) + len(world._pairs["bs"])
    if world._n_entities > 64 or n_pairs * world._substeps > 512:
        return False
    return True


# ---------------------------------------------------------------------- #
# Kernel
# ---------------------------------------------------------------------- #
def _safe_norm2(x, y):
    sq = x * x + y * y
    n = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.where(sq > 0, n, 0.0)


def _make_kernel(world):
    """Build the kernel body with all static tables baked in."""
    N = world._n_entities
    nl = world._n_landmarks
    A = len(world._agents)
    movable = [bool(m) for m in world._movable]
    rotatable = [bool(r) for r in world._rotatable]
    mass = [float(m) for m in world._mass]
    moment = [float(m) for m in world._moment]
    drag = [float(d) for d in world._drag_coef]
    max_speed = [float(v) for v in world._max_speed]
    v_range = [float(v) for v in world._v_range]
    gravity = [
        (float(g[0]), float(g[1])) for g in np.atleast_2d(world._gravity_vec)
    ]
    radius = [float(r) for r in world._radius]
    length = [float(l) for l in world._length]
    width = [float(w) for w in world._width]
    ss_pairs = [(int(a), int(b)) for a, b in world._pairs["ss"]]
    bs_pairs = [(int(a), int(b)) for a, b in world._pairs["bs"]]
    substeps = int(world._substeps)
    sub_dt = float(world._sub_dt)
    k_margin = float(world._contact_margin)
    cforce = float(world._collision_force)
    x_semidim = world._x_semidim
    y_semidim = world._y_semidim

    def soft_contact(dx, dy, dist_min):
        """Soft (differentiable) repulsive contact force magnitude along
        (dx, dy) (core.py:2805-2839), returns (fx, fy) on entity a."""
        dist = _safe_norm2(dx, dy)
        penetration = (
            jnp.logaddexp(0.0, (dist_min - dist) / k_margin) * k_margin
        )
        scale = cforce * penetration / jnp.maximum(dist, 1e-8)
        fx = dx * scale
        fy = dy * scale
        zero = (dist < 1e-6) | (dist > dist_min)
        fx = jnp.where(zero, 0.0, fx)
        fy = jnp.where(zero, 0.0, fy)
        return fx, fy

    def closest_on_box(rel_x, rel_y, half_l, half_w):
        """Closest point on a box PERIMETER to a point, in the box frame —
        the 4-side decomposition of geo.closest_point_box, fused.

        The four sides (reference order): x = ±half_l segments along width,
        y = ±half_w segments along length."""
        # Side 1/2: vertical lines at x=+hl and x=-hl, y in [-hw, hw]
        y_cl = jnp.clip(rel_y, -half_w, half_w)
        c1x, c1y = jnp.full_like(rel_x, half_l), y_cl
        c2x, c2y = jnp.full_like(rel_x, -half_l), y_cl
        # Side 3/4: horizontal lines at y=±hw, x in [-hl, hl]
        x_cl = jnp.clip(rel_x, -half_l, half_l)
        c3x, c3y = x_cl, jnp.full_like(rel_y, half_w)
        c4x, c4y = x_cl, jnp.full_like(rel_y, -half_w)

        best_x, best_y = c1x, c1y
        best_d = _safe_norm2(rel_x - c1x, rel_y - c1y)
        for cx, cy in ((c2x, c2y), (c3x, c3y), (c4x, c4y)):
            d = _safe_norm2(rel_x - cx, rel_y - cy)
            better = d < best_d
            best_x = jnp.where(better, cx, best_x)
            best_y = jnp.where(better, cy, best_y)
            best_d = jnp.minimum(best_d, d)
        return best_x, best_y

    def kernel(pos_ref, vel_ref, rot_ref, angvel_ref, force_ref, torque_ref,
               opos_ref, ovel_ref, orot_ref, oangvel_ref):
        px = [pos_ref[2 * i : 2 * i + 1, :] for i in range(N)]
        py = [pos_ref[2 * i + 1 : 2 * i + 2, :] for i in range(N)]
        vx = [vel_ref[2 * i : 2 * i + 1, :] for i in range(N)]
        vy = [vel_ref[2 * i + 1 : 2 * i + 2, :] for i in range(N)]
        th = [rot_ref[i : i + 1, :] for i in range(N)]
        w = [angvel_ref[i : i + 1, :] for i in range(N)]

        # Static action forces (landmarks zero; immovable agents masked)
        afx = [None] * N
        afy = [None] * N
        atq = [None] * N
        for j in range(A):
            i = nl + j
            if movable[i]:
                afx[i] = force_ref[2 * j : 2 * j + 1, :]
                afy[i] = force_ref[2 * j + 1 : 2 * j + 2, :]
            if rotatable[i]:
                atq[i] = torque_ref[j : j + 1, :]

        for substep in range(substeps):
            fx = [None] * N
            fy = [None] * N
            tq = [None] * N

            def add(acc, i, val):
                acc[i] = val if acc[i] is None else acc[i] + val

            for i in range(N):
                if afx[i] is not None:
                    add(fx, i, afx[i])
                    add(fy, i, afy[i])
                if atq[i] is not None:
                    add(tq, i, atq[i])
                gx, gy = gravity[i] if len(gravity) > 1 else gravity[0]
                if movable[i] and (gx != 0.0 or gy != 0.0):
                    add(fx, i, gx * mass[i])
                    add(fy, i, gy * mass[i])

            # ---- sphere-sphere contacts (core.py:2294-2339) ---- #
            for a, b in ss_pairs:
                dmin = radius[a] + radius[b]
                cfx, cfy = soft_contact(px[a] - px[b], py[a] - py[b], dmin)
                if movable[a]:
                    add(fx, a, cfx)
                    add(fy, a, cfy)
                if movable[b]:
                    add(fx, b, -cfx)
                    add(fy, b, -cfy)

            # ---- box-sphere contacts (core.py:2459-2552, solid) ---- #
            for bi, si in bs_pairs:
                cos_b = jnp.cos(th[bi])
                sin_b = jnp.sin(th[bi])
                rx = px[si] - px[bi]
                ry = py[si] - py[bi]
                # rotate into box frame
                lx = rx * cos_b + ry * sin_b
                ly = -rx * sin_b + ry * cos_b
                cx_l, cy_l = closest_on_box(
                    lx, ly, length[bi] / 2, width[bi] / 2
                )
                # closest point back in world frame (relative to box)
                ccx = cx_l * cos_b - cy_l * sin_b
                ccy = cx_l * sin_b + cy_l * cos_b
                closest_x = px[bi] + ccx
                closest_y = py[bi] + ccy
                # inner point projection (solid box, physics.py:13-23)
                v_x = closest_x - px[si]
                v_y = closest_y - py[si]
                u_x = px[bi] - closest_x
                u_y = py[bi] - closest_y
                v_norm = _safe_norm2(v_x, v_y)
                x_mag = (v_x * u_x + v_y * u_y) / jnp.maximum(v_norm, 1e-12)
                inv_vn = 1.0 / jnp.maximum(v_norm, 1e-12)
                ix = closest_x + v_x * inv_vn * x_mag
                iy = closest_y + v_y * inv_vn * x_mag
                degenerate = v_norm == 0
                ix = jnp.where(degenerate, closest_x + closest_x, ix)
                iy = jnp.where(degenerate, closest_y + closest_y, iy)
                d_extra = jnp.where(degenerate, 0.0, jnp.abs(x_mag))
                # NOTE: reference inner point for degenerate v is the
                # surface point itself (x := surface_point), i.e. ix =
                # 2*closest in its coordinates; replicate exactly:
                # inner = surface_point + x where x = surface_point when
                # degenerate (physics.py:20-22).

                dmin = radius[si] + LINE_MIN_DIST + d_extra
                cfx, cfy = soft_contact(
                    px[si] - ix, py[si] - iy, dmin
                )
                if movable[si]:
                    add(fx, si, cfx)
                    add(fy, si, cfy)
                if movable[bi]:
                    add(fx, bi, -cfx)
                    add(fy, bi, -cfy)
                if rotatable[bi]:
                    # torque = cross(closest - box_pos, force_on_box)
                    add(tq, bi, ccx * (-cfy) - ccy * (-cfx))

            # ---- integrate (core.py:2860-2908) ---- #
            for i in range(N):
                if movable[i]:
                    if substep == 0 and drag[i] != 0.0:
                        vx[i] = vx[i] * (1 - drag[i])
                        vy[i] = vy[i] * (1 - drag[i])
                    if fx[i] is not None:
                        vx[i] = vx[i] + fx[i] * (sub_dt / mass[i])
                    if fy[i] is not None:
                        vy[i] = vy[i] + fy[i] * (sub_dt / mass[i])
                    if np.isfinite(max_speed[i]):
                        n = _safe_norm2(vx[i], vy[i])
                        scale = jnp.where(
                            n > max_speed[i],
                            max_speed[i] / jnp.maximum(n, 1e-12),
                            1.0,
                        )
                        vx[i] = vx[i] * scale
                        vy[i] = vy[i] * scale
                    if np.isfinite(v_range[i]):
                        vx[i] = jnp.clip(vx[i], -v_range[i], v_range[i])
                        vy[i] = jnp.clip(vy[i], -v_range[i], v_range[i])
                    px[i] = px[i] + vx[i] * sub_dt
                    py[i] = py[i] + vy[i] * sub_dt
                    if x_semidim is not None:
                        px[i] = jnp.clip(px[i], -x_semidim, x_semidim)
                    if y_semidim is not None:
                        py[i] = jnp.clip(py[i], -y_semidim, y_semidim)
                if rotatable[i]:
                    if substep == 0 and drag[i] != 0.0:
                        w[i] = w[i] * (1 - drag[i])
                    if tq[i] is not None:
                        w[i] = w[i] + tq[i] * (sub_dt / moment[i])
                    th[i] = th[i] + w[i] * sub_dt

        for i in range(N):
            opos_ref[2 * i : 2 * i + 1, :] = px[i]
            opos_ref[2 * i + 1 : 2 * i + 2, :] = py[i]
            ovel_ref[2 * i : 2 * i + 1, :] = vx[i]
            ovel_ref[2 * i + 1 : 2 * i + 2, :] = vy[i]
            orot_ref[i : i + 1, :] = th[i]
            oangvel_ref[i : i + 1, :] = w[i]

    return kernel


def _pallas_forward(world, pos, vel, rot, ang_vel, force_a, torque_a):
    B, N = pos.shape[0], pos.shape[1]
    A = force_a.shape[1]
    kernel = _make_kernel(world)
    grid = (pl.cdiv(B, _TB),)

    def col_spec(height):
        return pl.BlockSpec(
            (height, _TB), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    pos_t = pos.reshape(B, 2 * N).T
    vel_t = vel.reshape(B, 2 * N).T
    rot_t = rot[..., 0].T
    angvel_t = ang_vel[..., 0].T
    force_t = force_a.reshape(B, 2 * max(A, 1)).T if A else jnp.zeros((2, B))
    torque_t = torque_a[..., 0].T if A else jnp.zeros((1, B))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            col_spec(2 * N),
            col_spec(2 * N),
            col_spec(N),
            col_spec(N),
            col_spec(force_t.shape[0]),
            col_spec(torque_t.shape[0]),
        ],
        out_specs=[
            col_spec(2 * N),
            col_spec(2 * N),
            col_spec(N),
            col_spec(N),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * N, B), jnp.float32),
            jax.ShapeDtypeStruct((2 * N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
        ],
        interpret=os.environ.get("VMT_PALLAS_INTERPRET") == "1",
    )(pos_t, vel_t, rot_t, angvel_t, force_t, torque_t)
    new_pos = out[0].T.reshape(B, N, 2)
    new_vel = out[1].T.reshape(B, N, 2)
    new_rot = out[2].T[..., None]
    new_angvel = out[3].T[..., None]
    return new_pos, new_vel, new_rot, new_angvel


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_step(world, pos, vel, rot, ang_vel, force_a, torque_a):
    """One full physics step (all substeps) as a single Pallas kernel."""
    return _pallas_forward(world, pos, vel, rot, ang_vel, force_a, torque_a)


def _fwd(world, pos, vel, rot, ang_vel, force_a, torque_a):
    out = fused_step(world, pos, vel, rot, ang_vel, force_a, torque_a)
    return out, (pos, vel, rot, ang_vel, force_a, torque_a)


def _bwd(world, residuals, g):
    args = residuals
    _, vjp = jax.vjp(
        lambda *a: world._step_core(*a, extras={}), *args
    )
    return vjp(g)


fused_step.defvjp(_fwd, _bwd)
