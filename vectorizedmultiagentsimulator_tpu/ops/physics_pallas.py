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

Supported subset (``step_supported``): every narrowphase class —
sphere-sphere, box-sphere, line-sphere, line-line, box-line and box-box
(solid or hollow) — plus distance/fixed-rotation joints, linear/angular
friction, static gravity, drag, world-bound clamps and per-entity
max_speed/v_range and dynamic per-env gravity; i.e. the whole scenario
library except batch-dynamic joint fixed_rotation, which falls back to
the jnp path with identical semantics.  A weighted unroll-size guard
keeps compile time and VMEM bounded (the all-pairs ``pollock`` /
``waterfall`` stress scenarios fall back).

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
    # Per-env dynamic mass (extras "<name>.dyn_mass", e.g. het_mass) stays
    # on the jnp path: the kernel bakes masses in as compile-time scalars.
    if any(
        world.has_extra(f"{e.name}.dyn_mass") for e in world.entities
    ):
        return False
    for c in world._ordered_constraints:
        # batch-dynamic (extras-backed) fixed_rotation stays on the jnp path
        if not (
            c.fixed_rotation is None
            or isinstance(c.fixed_rotation, (int, float))
        ):
            return False
    # Unrolled-kernel size guard (compile time / VMEM), weighted by the
    # per-pair narrowphase cost (seg-seg tests each unroll ~30 VPU ops).
    weight = {"ss": 1, "bs": 2, "ls": 1, "ll": 3, "bl": 8, "bb": 16}
    cost = sum(w * len(world._pairs[c]) for c, w in weight.items())
    cost += 2 * len(world._ordered_constraints)
    if world._n_entities > 64 or cost * world._substeps > 2048:
        return False
    return True


# ---------------------------------------------------------------------- #
# Kernel
# ---------------------------------------------------------------------- #
def _safe_norm2(x, y):
    sq = x * x + y * y
    n = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.where(sq > 0, n, 0.0)


def _make_kernel(world, R=1):
    """Build the kernel body with all static tables baked in.

    ``R`` is the sublane packing factor: each per-entity feature row is a
    ``[R, TB]`` tile (``R=8`` fills all 8 sublanes of a vreg instead of 1,
    ~8x VPU utilization; the env batch is split as ``B = R * (B // R)``).
    """
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
    hollow = [bool(h) for h in world._hollow]
    lin_fric = [float(f) for f in world._lin_friction]
    ang_fric = [float(f) for f in world._ang_friction]
    # row index into the stacked dyn-gravity input, per entity (or None)
    dyn_row = [
        world._dyn_gravity_names.index(e.name)
        if e.name in world._dyn_gravity_names
        else None
        for e in world.entities
    ]
    ss_pairs = [(int(a), int(b)) for a, b in world._pairs["ss"]]
    bs_pairs = [(int(a), int(b)) for a, b in world._pairs["bs"]]
    ls_pairs = [(int(a), int(b)) for a, b in world._pairs["ls"]]
    ll_pairs = [(int(a), int(b)) for a, b in world._pairs["ll"]]
    bl_pairs = [(int(a), int(b)) for a, b in world._pairs["bl"]]
    bb_pairs = [(int(a), int(b)) for a, b in world._pairs["bb"]]
    substeps = int(world._substeps)
    sub_dt = float(world._sub_dt)
    k_margin = float(world._contact_margin)
    cforce = float(world._collision_force)
    jforce = float(world._joint_force)
    tcforce = float(world._torque_constraint_force)
    # (ia, ib, dax, day, dbx, dby, dist, rotate, fixed_rotation)
    joints = [
        (
            int(world._joint_ia[i]),
            int(world._joint_ib[i]),
            float(world._joint_delta_a[i][0]),
            float(world._joint_delta_a[i][1]),
            float(world._joint_delta_b[i][0]),
            float(world._joint_delta_b[i][1]),
            float(world._joint_dist[i]),
            bool(world._joint_rotate[i]),
            float(c.fixed_rotation or 0.0),
        )
        for i, c in enumerate(world._ordered_constraints)
    ]
    x_semidim = world._x_semidim
    y_semidim = world._y_semidim

    def constraint_pair(dx, dy, dist_min, mult, attractive):
        """Soft (differentiable) constraint force along (dx, dy) —
        core.py:2805-2839; returns (fx, fy) on entity a."""
        dist = _safe_norm2(dx, dy)
        sign = -1.0 if attractive else 1.0
        penetration = (
            jnp.logaddexp(0.0, (dist_min - dist) * sign / k_margin)
            * k_margin
        )
        scale = sign * mult * penetration / jnp.maximum(dist, 1e-8)
        fx = dx * scale
        fy = dy * scale
        zero = dist < 1e-6
        if attractive:
            zero = zero | (dist < dist_min)
        else:
            zero = zero | (dist > dist_min)
        fx = jnp.where(zero, 0.0, fx)
        fy = jnp.where(zero, 0.0, fy)
        return fx, fy

    def soft_contact(dx, dy, dist_min):
        return constraint_pair(dx, dy, dist_min, cforce, False)

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

    def closest_on_seg(sx, sy, cos_s, sin_s, half, qx, qy):
        """Closest point on a segment (center, direction, half-length) to a
        query point — geometry.closest_point_line (physics.py:400-429)."""
        dx = sx - qx
        dy = sy - qy
        dot = dx * cos_s + dy * sin_s
        sign = jnp.sign(dot)
        dist = jnp.minimum(jnp.abs(dot), half)
        return sx - sign * dist * cos_s, sy - sign * dist * sin_s

    def closest_seg_seg(ax, ay, cos_a, sin_a, ha, bx, by, cos_b, sin_b, hb):
        """Closest point pair between two segments —
        geometry.closest_points_line_line (physics.py:144-260), fused:
        intersection test + 4 endpoint-projection candidates, first-min."""
        a1x, a1y = ax + ha * cos_a, ay + ha * sin_a
        a2x, a2y = ax - ha * cos_a, ay - ha * sin_a
        b1x, b1y = bx + hb * cos_b, by + hb * sin_b
        b2x, b2y = bx - hb * cos_b, by - hb * sin_b
        rx, ry = a2x - a1x, a2y - a1y
        sx_, sy_ = b2x - b1x, b2y - b1y
        qpx, qpy = b1x - a1x, b1y - a1y
        cross_rs = rx * sy_ - ry * sx_
        denom = jnp.where(cross_rs != 0, cross_rs, 1.0)
        u = (qpx * ry - qpy * rx) / denom
        t = (qpx * sy_ - qpy * sx_) / denom
        crossing = (
            (cross_rs != 0) & (0 <= t) & (t <= 1) & (0 <= u) & (u <= 1)
        )
        pix = a1x + t * rx
        piy = a1y + t * ry
        a1bx, a1by = closest_on_seg(bx, by, cos_b, sin_b, hb, a1x, a1y)
        a2bx, a2by = closest_on_seg(bx, by, cos_b, sin_b, hb, a2x, a2y)
        b1ax, b1ay = closest_on_seg(ax, ay, cos_a, sin_a, ha, b1x, b1y)
        b2ax, b2ay = closest_on_seg(ax, ay, cos_a, sin_a, ha, b2x, b2y)
        cands = (
            (a1x, a1y, a1bx, a1by),
            (a2x, a2y, a2bx, a2by),
            (b1ax, b1ay, b1x, b1y),
            (b2ax, b2ay, b2x, b2y),
        )
        p1x, p1y, p2x, p2y = cands[0]
        best_d = _safe_norm2(p1x - p2x, p1y - p2y)
        for c1x, c1y, c2x, c2y in cands[1:]:
            d = _safe_norm2(c1x - c2x, c1y - c2y)
            better = d < best_d
            p1x = jnp.where(better, c1x, p1x)
            p1y = jnp.where(better, c1y, p1y)
            p2x = jnp.where(better, c2x, p2x)
            p2y = jnp.where(better, c2y, p2y)
            best_d = jnp.minimum(best_d, d)
        p1x = jnp.where(crossing, pix, p1x)
        p1y = jnp.where(crossing, piy, p1y)
        p2x = jnp.where(crossing, pix, p2x)
        p2y = jnp.where(crossing, piy, p2y)
        return p1x, p1y, p2x, p2y

    def closest_seg_box(sides, sx, sy, cos_s, sin_s, hs):
        """Closest (box point, segment point) pair between a box (as its 4
        sides) and a segment — geometry.closest_line_box
        (physics.py:328-382), first-min over the sides."""
        best = None
        best_d = None
        for ex, ey, ec, es, eh in sides:
            q = closest_seg_seg(ex, ey, ec, es, eh, sx, sy, cos_s, sin_s, hs)
            d = _safe_norm2(q[0] - q[2], q[1] - q[3])
            if best is None:
                best, best_d = q, d
            else:
                better = d < best_d
                best = tuple(
                    jnp.where(better, qq, bb) for qq, bb in zip(q, best)
                )
                best_d = jnp.minimum(best_d, d)
        return best  # (box_x, box_y, seg_x, seg_y)

    def inner_box(outx, outy, surfx, surfy, cx, cy):
        """geometry.inner_point_box (physics.py:13-23): project the surface
        contact point toward the box centre; returns (ix, iy, d)."""
        v_x = surfx - outx
        v_y = surfy - outy
        u_x = cx - surfx
        u_y = cy - surfy
        v_norm = _safe_norm2(v_x, v_y)
        x_mag = (v_x * u_x + v_y * u_y) / jnp.maximum(v_norm, 1e-12)
        inv_vn = 1.0 / jnp.maximum(v_norm, 1e-12)
        ix = surfx + v_x * inv_vn * x_mag
        iy = surfy + v_y * inv_vn * x_mag
        degenerate = v_norm == 0
        ix = jnp.where(degenerate, surfx + surfx, ix)
        iy = jnp.where(degenerate, surfy + surfy, iy)
        d = jnp.where(degenerate, 0.0, jnp.abs(x_mag))
        return ix, iy, d

    def kernel(pos_ref, vel_ref, rot_ref, angvel_ref, force_ref, torque_ref,
               dyn_ref, opos_ref, ovel_ref, orot_ref, oangvel_ref):
        px = [pos_ref[R * 2 * i : R * (2 * i + 1), :] for i in range(N)]
        py = [pos_ref[R * (2 * i + 1) : R * (2 * i + 2), :] for i in range(N)]
        vx = [vel_ref[R * 2 * i : R * (2 * i + 1), :] for i in range(N)]
        vy = [vel_ref[R * (2 * i + 1) : R * (2 * i + 2), :] for i in range(N)]
        th = [rot_ref[R * i : R * (i + 1), :] for i in range(N)]
        w = [angvel_ref[R * i : R * (i + 1), :] for i in range(N)]

        # Static action forces (landmarks zero; immovable agents masked)
        afx = [None] * N
        afy = [None] * N
        atq = [None] * N
        for j in range(A):
            i = nl + j
            if movable[i]:
                afx[i] = force_ref[R * 2 * j : R * (2 * j + 1), :]
                afy[i] = force_ref[R * (2 * j + 1) : R * (2 * j + 2), :]
            if rotatable[i]:
                atq[i] = torque_ref[R * j : R * (j + 1), :]

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
                # per-env dynamic gravity override (extras-backed)
                if movable[i] and dyn_row[i] is not None:
                    k = dyn_row[i]
                    add(fx, i, dyn_ref[R * 2 * k : R * (2 * k + 1), :] * mass[i])
                    add(fy, i, dyn_ref[R * (2 * k + 1) : R * (2 * k + 2), :] * mass[i])
                # static/kinetic friction (core.py:2054-2073)
                if movable[i] and lin_fric[i] > 0.0:
                    speed = _safe_norm2(vx[i], vy[i])
                    static = speed == 0
                    denom = jnp.where(static, 1e-8, speed)
                    fconst = lin_fric[i] * mass[i]
                    ffx = -(vx[i] / denom) * jnp.minimum(
                        fconst, jnp.abs(vx[i]) / sub_dt * mass[i]
                    )
                    ffy = -(vy[i] / denom) * jnp.minimum(
                        fconst, jnp.abs(vy[i]) / sub_dt * mass[i]
                    )
                    add(fx, i, jnp.where(static, 0.0, ffx))
                    add(fy, i, jnp.where(static, 0.0, ffy))
                if rotatable[i] and ang_fric[i] > 0.0:
                    aspeed = jnp.abs(w[i])
                    static = aspeed == 0
                    dirw = w[i] / jnp.where(static, 1e-8, aspeed)
                    tf = -dirw * jnp.minimum(
                        ang_fric[i] * moment[i],
                        aspeed / sub_dt * moment[i],
                    )
                    add(tq, i, jnp.where(static, 0.0, tf))

            # ---- joint constraints (core.py:2201-2292) ---- #
            for ia, ib, dax, day, dbx, dby, jdist, jrot, frot in joints:
                cos_a, sin_a = jnp.cos(th[ia]), jnp.sin(th[ia])
                cos_b, sin_b = jnp.cos(th[ib]), jnp.sin(th[ib])
                rax = dax * cos_a - day * sin_a
                ray = dax * sin_a + day * cos_a
                rbx = dbx * cos_b - dby * sin_b
                rby = dbx * sin_b + dby * cos_b
                pjax, pjay = px[ia] + rax, py[ia] + ray
                pjbx, pjby = px[ib] + rbx, py[ib] + rby
                dx = pjax - pjbx
                dy = pjay - pjby
                fx1, fy1 = constraint_pair(dx, dy, jdist, jforce, True)
                fx2, fy2 = constraint_pair(dx, dy, jdist, jforce, False)
                jfx = fx1 + fx2
                jfy = fy1 + fy2
                if movable[ia]:
                    add(fx, ia, jfx)
                    add(fy, ia, jfy)
                if movable[ib]:
                    add(fx, ib, -jfx)
                    add(fy, ib, -jfy)
                ta = rax * jfy - ray * jfx
                tb = rbx * (-jfy) - rby * (-jfx)
                if not jrot:
                    # fixed-rotation constraint torque (core.py:2841-2858)
                    delta_rot = th[ia] - (th[ib] + frot)
                    abs_dr = jnp.abs(delta_rot)
                    pen = jnp.exp(abs_dr) - 1.0
                    tq_c = tcforce * jnp.sign(delta_rot) * pen
                    tq_c = jnp.where(abs_dr < 1e-9, 0.0, tq_c)
                    ta = ta - tq_c
                    tb = tb + tq_c
                if rotatable[ia]:
                    add(tq, ia, ta)
                if rotatable[ib]:
                    add(tq, ib, tb)

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

            # ---- box-sphere contacts (core.py:2459-2552) ---- #
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
                if hollow[bi]:
                    ix, iy = closest_x, closest_y
                    d_extra = 0.0
                else:
                    # NOTE: reference inner point for degenerate v is the
                    # surface point itself (x := surface_point), i.e. ix =
                    # 2*closest in its coordinates (physics.py:20-22) —
                    # replicated exactly inside inner_box.
                    ix, iy, d_extra = inner_box(
                        px[si], py[si], closest_x, closest_y, px[bi], py[bi]
                    )

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

            # ---- line-sphere contacts (core.py:2341-2392) ---- #
            for li, si in ls_pairs:
                cos_l = jnp.cos(th[li])
                sin_l = jnp.sin(th[li])
                clx, cly = closest_on_seg(
                    px[li], py[li], cos_l, sin_l, length[li] / 2,
                    px[si], py[si],
                )
                cfx, cfy = soft_contact(
                    px[si] - clx, py[si] - cly, radius[si] + LINE_MIN_DIST
                )
                if movable[si]:
                    add(fx, si, cfx)
                    add(fy, si, cfy)
                if movable[li]:
                    add(fx, li, -cfx)
                    add(fy, li, -cfy)
                if rotatable[li]:
                    add(
                        tq, li,
                        (clx - px[li]) * (-cfy) - (cly - py[li]) * (-cfx),
                    )

            # ---- line-line contacts (core.py:2394-2457) ---- #
            for a, b in ll_pairs:
                cos_a, sin_a = jnp.cos(th[a]), jnp.sin(th[a])
                cos_b, sin_b = jnp.cos(th[b]), jnp.sin(th[b])
                pax, pay, pbx, pby = closest_seg_seg(
                    px[a], py[a], cos_a, sin_a, length[a] / 2,
                    px[b], py[b], cos_b, sin_b, length[b] / 2,
                )
                cfx, cfy = soft_contact(pax - pbx, pay - pby, LINE_MIN_DIST)
                if movable[a]:
                    add(fx, a, cfx)
                    add(fy, a, cfy)
                if rotatable[a]:
                    add(tq, a, (pax - px[a]) * cfy - (pay - py[a]) * cfx)
                if movable[b]:
                    add(fx, b, -cfx)
                    add(fy, b, -cfy)
                if rotatable[b]:
                    add(
                        tq, b,
                        (pbx - px[b]) * (-cfy) - (pby - py[b]) * (-cfx),
                    )

            def box_sides(i, cos_b, sin_b):
                """The 4 sides of box i as segments, in the reference order
                (+length, -length, +width, -width — geometry.all_lines_box,
                physics.py:298-325).  perp = (cos(r+pi/2), sin(r+pi/2)) =
                (-sin, cos)."""
                hl = length[i] / 2
                hw = width[i] / 2
                return (
                    (px[i] + hl * cos_b, py[i] + hl * sin_b,
                     -sin_b, cos_b, hw),
                    (px[i] - hl * cos_b, py[i] - hl * sin_b,
                     -sin_b, cos_b, hw),
                    (px[i] - hw * sin_b, py[i] + hw * cos_b,
                     cos_b, sin_b, hl),
                    (px[i] + hw * sin_b, py[i] - hw * cos_b,
                     cos_b, sin_b, hl),
                )

            # ---- box-line contacts (core.py:2554-2653) ---- #
            for bi, li in bl_pairs:
                cos_b, sin_b = jnp.cos(th[bi]), jnp.sin(th[bi])
                cos_l, sin_l = jnp.cos(th[li]), jnp.sin(th[li])
                sides = box_sides(bi, cos_b, sin_b)
                pbx_, pby_, plx, ply = closest_seg_box(
                    sides, px[li], py[li], cos_l, sin_l, length[li] / 2
                )
                if hollow[bi]:
                    ix, iy, d_extra = pbx_, pby_, 0.0
                else:
                    ix, iy, d_extra = inner_box(
                        plx, ply, pbx_, pby_, px[bi], py[bi]
                    )
                cfx, cfy = soft_contact(
                    ix - plx, iy - ply, LINE_MIN_DIST + d_extra
                )
                if movable[bi]:
                    add(fx, bi, cfx)
                    add(fy, bi, cfy)
                if rotatable[bi]:
                    add(
                        tq, bi,
                        (pbx_ - px[bi]) * cfy - (pby_ - py[bi]) * cfx,
                    )
                if movable[li]:
                    add(fx, li, -cfx)
                    add(fy, li, -cfy)
                if rotatable[li]:
                    add(
                        tq, li,
                        (plx - px[li]) * (-cfy) - (ply - py[li]) * (-cfx),
                    )

            # ---- box-box contacts (core.py:2655-2786) ---- #
            for a, b in bb_pairs:
                cos_a, sin_a = jnp.cos(th[a]), jnp.sin(th[a])
                cos_b, sin_b = jnp.cos(th[b]), jnp.sin(th[b])
                sides_a = box_sides(a, cos_a, sin_a)
                sides_b = box_sides(b, cos_b, sin_b)
                # 8 candidates, reference order (geometry.closest_box_box):
                # pass 1 = sides of box a vs box b, pass 2 = sides of box b
                # vs box a; first-min select.
                cands = []
                for ex, ey, ec, es, eh in sides_a:
                    qbx, qby, qax, qay = closest_seg_box(
                        sides_b, ex, ey, ec, es, eh
                    )
                    cands.append((qax, qay, qbx, qby))  # (on a, on b)
                for ex, ey, ec, es, eh in sides_b:
                    qax, qay, qbx, qby = closest_seg_box(
                        sides_a, ex, ey, ec, es, eh
                    )
                    cands.append((qax, qay, qbx, qby))
                pax, pay, pbx, pby = cands[0]
                best_d = _safe_norm2(pax - pbx, pay - pby)
                for c1x, c1y, c2x, c2y in cands[1:]:
                    d = _safe_norm2(c1x - c2x, c1y - c2y)
                    better = d < best_d
                    pax = jnp.where(better, c1x, pax)
                    pay = jnp.where(better, c1y, pay)
                    pbx = jnp.where(better, c2x, pbx)
                    pby = jnp.where(better, c2y, pby)
                    best_d = jnp.minimum(best_d, d)
                if hollow[a]:
                    iax, iay, d_a = pax, pay, 0.0
                else:
                    iax, iay, d_a = inner_box(
                        pbx, pby, pax, pay, px[a], py[a]
                    )
                if hollow[b]:
                    ibx, iby, d_b = pbx, pby, 0.0
                else:
                    ibx, iby, d_b = inner_box(
                        pax, pay, pbx, pby, px[b], py[b]
                    )
                cfx, cfy = soft_contact(
                    iax - ibx, iay - iby, d_a + d_b + LINE_MIN_DIST
                )
                if movable[a]:
                    add(fx, a, cfx)
                    add(fy, a, cfy)
                if rotatable[a]:
                    add(tq, a, (pax - px[a]) * cfy - (pay - py[a]) * cfx)
                if movable[b]:
                    add(fx, b, -cfx)
                    add(fy, b, -cfy)
                if rotatable[b]:
                    add(
                        tq, b,
                        (pbx - px[b]) * (-cfy) - (pby - py[b]) * (-cfx),
                    )

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
            opos_ref[R * 2 * i : R * (2 * i + 1), :] = px[i]
            opos_ref[R * (2 * i + 1) : R * (2 * i + 2), :] = py[i]
            ovel_ref[R * 2 * i : R * (2 * i + 1), :] = vx[i]
            ovel_ref[R * (2 * i + 1) : R * (2 * i + 2), :] = vy[i]
            orot_ref[R * i : R * (i + 1), :] = th[i]
            oangvel_ref[R * i : R * (i + 1), :] = w[i]

    return kernel


def pack_R(B: int) -> int:
    """Sublane packing factor: a [1, TB] feature row uses 1 of 8 vreg
    sublanes; splitting the batch as [R=8, B/8] per feature fills the
    vreg (~8x VPU utilization, measured ~3x step time on
    transport@30k)."""
    return 8 if B % 8 == 0 else 1


def _pack_rows_local(x, R: int):
    """[B, *feat] -> [F*R, B/R] kernel-layout rows: row ``f*R+s``,
    column ``l`` holds env ``s*(B/R)+l`` of feature ``f``.

    Transpose-FIRST: the state arrays live batch-minor ({0,2,1}
    layouts) inside the step, so ``moveaxis(0, -1)`` is a near-bitcast
    and XLA only pays the T(2,128)->T(8,128) retile.  (The alternative
    env=``l*R+s`` convention — contiguous env blocks per column, which
    would make the GLOBAL reshape shard-friendly — lowers to sublane/
    lane transpose copies costing ~2x the whole step at 30k envs;
    hence the shard-LOCAL wrappers below instead.)"""
    B = x.shape[0]
    F = int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
    t = jnp.moveaxis(x, 0, -1).reshape(F, B)
    return t.reshape(F * R, B // R)


def _unpack_rows_local(x, shape: Tuple[int, ...], R: int):
    """Inverse of ``_pack_rows_local``: [F*R, BT] -> [B, *shape]."""
    B = x.shape[1] * R
    t = x.reshape(tuple(shape) + (B,))
    return jnp.moveaxis(t, -1, 0)


def _axis_of(sharding, dim):
    spec = getattr(sharding, "spec", None)
    if spec is None or len(spec) <= dim:
        return None
    return spec[dim]


@functools.lru_cache(maxsize=None)
def _pack_op(R: int, F: int):
    """Shard-local ``_pack_rows_local`` as a custom-partitioned op.

    The packed mirror crosses jit/scan boundaries inside the state
    pytree (``WorldState.phys_pack``), so on a sharded env EVERY
    producer/consumer must agree on which envs live in which columns.
    The cheap packing above is only cheap shard-locally (its global
    form spreads each device's envs across sublane groups), so this op
    pins shard-local semantics: each device packs its own contiguous
    env block, dim 1 of the result carries the env axis, and the fused
    kernel's partition rule sees exactly matching blocks.  On one
    device it is the plain cheap reshape."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def op(x):
        return _pack_rows_local(x, R)

    def infer(mesh, arg_shapes, result_shape):
        sh = arg_shapes[0].sharding
        return NamedSharding(sh.mesh, PartitionSpec(None, _axis_of(sh, 0)))

    def partition(mesh, arg_shapes, result_shape):
        sh = arg_shapes[0].sharding
        b = _axis_of(sh, 0)
        ndim = arg_shapes[0].ndim
        arg_shardings = (
            NamedSharding(sh.mesh, PartitionSpec(b, *([None] * (ndim - 1)))),
        )
        result_shardings = NamedSharding(sh.mesh, PartitionSpec(None, b))

        def lower(x):
            return _pack_rows_local(x, R)

        return mesh, lower, result_shardings, arg_shardings

    # Propagation-only rule: env sharding on the native batch dim
    # corresponds to dim-1 block sharding of the packed form (the
    # per-shard data layout itself is what partition() implements).
    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="(q s) e i -> (f s2) q",
        s=R,
        s2=R,
        f=F,
    )
    return op


@functools.lru_cache(maxsize=None)
def _unpack_op(shape: Tuple[int, ...], R: int):
    """Shard-local inverse of ``_pack_op`` (see there)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def op(x):
        return _unpack_rows_local(x, shape, R)

    def infer(mesh, arg_shapes, result_shape):
        sh = arg_shapes[0].sharding
        ndim = result_shape.ndim
        return NamedSharding(
            sh.mesh,
            PartitionSpec(_axis_of(sh, 1), *([None] * (ndim - 1))),
        )

    def partition(mesh, arg_shapes, result_shape):
        sh = arg_shapes[0].sharding
        b = _axis_of(sh, 1)
        ndim = result_shape.ndim
        arg_shardings = (NamedSharding(sh.mesh, PartitionSpec(None, b)),)
        result_shardings = NamedSharding(
            sh.mesh, PartitionSpec(b, *([None] * (ndim - 1)))
        )

        def lower(x):
            return _unpack_rows_local(x, shape, R)

        return mesh, lower, result_shardings, arg_shardings

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="(f s2) q -> (q s) e i",
        s=R,
        s2=R,
        f=int(np.prod(shape)),
    )
    return op


@functools.lru_cache(maxsize=None)
def _pack_vjp(R: int, feat_shape: Tuple[int, ...]):
    """custom_partitioning has no differentiation rule, but pack/unpack
    are value permutations — transpose(pack) == unpack exactly — so the
    custom VJPs here make the ops transparent to reverse-mode AD (the
    mirror is written inside differentiated rollouts whenever a
    scenario calls set_pos)."""
    F = int(np.prod(feat_shape)) if feat_shape else 1
    op = _pack_op(R, F)

    @jax.custom_vjp
    def f(x):
        return op(x)

    def fwd(x):
        return f(x), None

    def bwd(_, g):
        return (_unpack_op(feat_shape, R)(g),)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _unpack_vjp(shape: Tuple[int, ...], R: int):
    op = _unpack_op(shape, R)
    F = int(np.prod(shape)) if shape else 1

    @jax.custom_vjp
    def f(x):
        return op(x)

    def fwd(x):
        return f(x), None

    def bwd(_, g):
        return (_pack_op(R, F)(g),)

    f.defvjp(fwd, bwd)
    return f


def pack_rows(x, R: int):
    """[B, *feat] -> [F*R, B/R] packed kernel layout (shard-local
    semantics; see ``_pack_op``)."""
    return _pack_vjp(R, tuple(x.shape[1:]))(x)


def unpack_rows(x, shape: Tuple[int, ...], R: int):
    """[F*R, BT] -> [B, *shape] (shard-local inverse of
    ``pack_rows``)."""
    return _unpack_vjp(tuple(shape), R)(x)


def pack_state(pos, vel, rot, ang_vel):
    """The 4-array packed physics mirror (``WorldState.phys_pack``)."""
    R = pack_R(pos.shape[0])
    return (
        pack_rows(pos, R),
        pack_rows(vel, R),
        pack_rows(rot, R),
        pack_rows(ang_vel, R),
    )


def _pallas_forward_packed(world, ppos, pvel, prot, pangvel, force_a,
                           torque_a, dyn_g):
    """Packed-in/packed-out fused step (the phys_pack fast path).

    State operands arrive in the kernel's packed layout (the
    ``phys_pack`` mirror carried in the state pytree), so consecutive
    steps feed each other with ZERO relayout; only the per-step force/
    torque/dyn-gravity operands are packed here, and the native-layout
    results are unpacked once for observations/rewards.  Returns
    ``(pos, vel, rot, ang_vel, ppos', pvel', prot', pangvel')``.

    ``R`` comes from the packed operand's row count (not from the local
    batch) so the same kernel layout holds per shard when this runs as a
    partition lower_fn."""
    B, A = force_a.shape[0], force_a.shape[1]
    N = world._n_entities
    D = dyn_g.shape[1]
    R = ppos.shape[0] // (2 * N)
    BT = B // R
    kernel = _make_kernel(world, R)
    grid = (pl.cdiv(BT, _TB),)

    def col_spec(height):
        return pl.BlockSpec(
            (height * R, _TB), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    force_t = (
        _pack_rows_local(force_a, R) if A else jnp.zeros((2 * R, BT))
    )
    torque_t = (
        _pack_rows_local(torque_a, R) if A else jnp.zeros((R, BT))
    )
    dyn_t = _pack_rows_local(dyn_g, R) if D else jnp.zeros((2 * R, BT))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            col_spec(2 * N),
            col_spec(2 * N),
            col_spec(N),
            col_spec(N),
            col_spec(force_t.shape[0] // R),
            col_spec(torque_t.shape[0] // R),
            col_spec(dyn_t.shape[0] // R),
        ],
        out_specs=[
            col_spec(2 * N),
            col_spec(2 * N),
            col_spec(N),
            col_spec(N),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * N * R, BT), jnp.float32),
            jax.ShapeDtypeStruct((2 * N * R, BT), jnp.float32),
            jax.ShapeDtypeStruct((N * R, BT), jnp.float32),
            jax.ShapeDtypeStruct((N * R, BT), jnp.float32),
        ],
        interpret=os.environ.get("VMT_PALLAS_INTERPRET") == "1",
    )(ppos, pvel, prot, pangvel, force_t, torque_t, dyn_t)

    new_pos = _unpack_rows_local(out[0], (N, 2), R)
    new_vel = _unpack_rows_local(out[1], (N, 2), R)
    new_rot = _unpack_rows_local(out[2], (N, 1), R)
    new_angvel = _unpack_rows_local(out[3], (N, 1), R)
    return (new_pos, new_vel, new_rot, new_angvel,
            out[0], out[1], out[2], out[3])


def _pallas_forward(world, pos, vel, rot, ang_vel, force_a, torque_a,
                    dyn_g):
    """Native-interface fused step: packs the state locally, runs the
    kernel, unpacks.  Used when no ``phys_pack`` mirror is carried —
    hand-built states, and meshes whose per-shard batch cannot hold the
    global packing factor (``shard_environment`` strips the mirror
    then).  ``R`` adapts to the (possibly per-shard) batch."""
    B = pos.shape[0]
    N = pos.shape[1]
    R = pack_R(B)
    out = _pallas_forward_packed(
        world,
        _pack_rows_local(pos, R),
        _pack_rows_local(vel, R),
        _pack_rows_local(rot, R),
        _pack_rows_local(ang_vel, R),
        force_a,
        torque_a,
        dyn_g,
    )
    return out[:4]


def _partitioned_forward_packed(world):
    """SPMD rule for the packed-interface fused step.

    GSPMD cannot partition a custom (Pallas) call by itself: without a
    rule a batch-sharded step compiles with all-gathers around the
    kernel (measured: 18 all-gathers + 196 collective-permutes on an
    8-device mesh vs ZERO for the jnp path).  Envs are embarrassingly
    parallel: packed operands/results shard on dim 1 (columns are the
    per-shard env blocks, matching the shard-local ``_pack_op``
    convention), native operands/results on dim 0.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def fwd(ppos, pvel, prot, pangvel, force_a, torque_a, dyn_g):
        return _pallas_forward_packed(world, ppos, pvel, prot, pangvel,
                                      force_a, torque_a, dyn_g)

    def _env_axis(arg_shapes):
        return _axis_of(arg_shapes[0].sharding, 1) or _axis_of(
            arg_shapes[4].sharding, 0
        )

    def _shardings(mesh, b):
        packed = NamedSharding(mesh, PartitionSpec(None, b))

        def native(ndim):
            return NamedSharding(
                mesh, PartitionSpec(b, *([None] * (ndim - 1)))
            )

        args = (packed,) * 4 + (native(3),) * 3
        results = (native(3),) * 4 + (packed,) * 4
        return args, results

    def infer(mesh, arg_shapes, result_shape):
        _, results = _shardings(
            arg_shapes[0].sharding.mesh, _env_axis(arg_shapes)
        )
        return results

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings, result_shardings = _shardings(
            arg_shapes[0].sharding.mesh, _env_axis(arg_shapes)
        )

        def lower_fn(*args):
            return _pallas_forward_packed(world, *args)

        return mesh, lower_fn, result_shardings, arg_shardings

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            "p q, p q, s q, s q, b a i, b a w, b d i"
            " -> b e i, b e i, b e w, b e w, p q, p q, s q, s q"
        ),
    )
    return fwd


def _partitioned_forward(world):
    """SPMD rule for the native-interface fused step: every operand and
    result shards on dim 0 (the env batch); each shard packs/unpacks
    locally with its own batch-adapted ``R`` (see ``_pallas_forward``).
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def fwd(pos, vel, rot, ang_vel, force_a, torque_a, dyn_g):
        return _pallas_forward(world, pos, vel, rot, ang_vel, force_a,
                               torque_a, dyn_g)

    def _batch_only(sharding, ndim):
        b = _axis_of(sharding, 0)
        return NamedSharding(
            sharding.mesh, PartitionSpec(b, *([None] * (ndim - 1)))
        )

    def infer(mesh, arg_shapes, result_shape):
        return tuple(
            _batch_only(arg_shapes[i].sharding, arg_shapes[i].ndim)
            for i in range(4)
        )

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(
            _batch_only(a.sharding, a.ndim) for a in arg_shapes
        )
        result_shardings = tuple(
            _batch_only(a.sharding, a.ndim) for a in arg_shapes[:4]
        )

        def lower_fn(*args):
            return _pallas_forward(world, *args)

        return mesh, lower_fn, result_shardings, arg_shardings

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            "b e i, b e i, b e r, b e r, b a i, b a r2, b d i"
            " -> b e i, b e i, b e r, b e r"
        ),
    )
    return fwd


def _get_partitioned_forward(world, packed: bool):
    key = "_pallas_partitioned_fwd_p" if packed else "_pallas_partitioned_fwd"
    fwd = world.__dict__.get(key)
    if fwd is None:
        fwd = (
            _partitioned_forward_packed(world)
            if packed
            else _partitioned_forward(world)
        )
        setattr(world, key, fwd)
    return fwd


def stacked_dyn_gravity(world, extras, B):
    """Stack the per-env dynamic gravity extras into ``[B, D, 2]``
    (``D = 0`` when the world has none)."""
    names = world._dyn_gravity_names
    if not names:
        return jnp.zeros((B, 0, 2), jnp.float32)
    return jnp.stack(
        [extras[f"{n}.dyn_gravity"] for n in names], axis=1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_step(world, pos, vel, rot, ang_vel, force_a, torque_a, dyn_g):
    """One full physics step (all substeps) as a single Pallas kernel,
    native-layout in/out.  Fallback path for states without a
    ``phys_pack`` mirror; returns ``(pos, vel, rot, ang_vel)``."""
    return _get_partitioned_forward(world, packed=False)(
        pos, vel, rot, ang_vel, force_a, torque_a, dyn_g
    )


def _core_vjp(world, pos, vel, rot, ang_vel, force_a, torque_a, dyn_g,
              g_native):
    """VJP of one step through the jnp core (shared by both
    interfaces)."""
    names = world._dyn_gravity_names

    def core(pos, vel, rot, ang_vel, force_a, torque_a, dyn):
        extras = {
            f"{n}.dyn_gravity": dyn[:, k] for k, n in enumerate(names)
        }
        return world._step_core(
            pos, vel, rot, ang_vel, force_a, torque_a, extras
        )

    _, vjp = jax.vjp(core, pos, vel, rot, ang_vel, force_a, torque_a,
                     dyn_g)
    return vjp(g_native)


def _fwd(world, pos, vel, rot, ang_vel, force_a, torque_a, dyn_g):
    out = fused_step(world, pos, vel, rot, ang_vel, force_a, torque_a,
                     dyn_g)
    return out, (pos, vel, rot, ang_vel, force_a, torque_a, dyn_g)


def _bwd(world, residuals, g):
    return _core_vjp(world, *residuals, g)


fused_step.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_step_packed(world, ppos, pvel, prot, pangvel, force_a, torque_a,
                      dyn_g):
    """One full physics step on the packed ``phys_pack`` mirror.

    State arrives/leaves in the packed kernel layout; native-layout
    copies of the results ride along for observation/reward consumers.
    Returns ``(pos, vel, rot, ang_vel, ppos', pvel', prot',
    pangvel')``."""
    return _get_partitioned_forward(world, packed=True)(
        ppos, pvel, prot, pangvel, force_a, torque_a, dyn_g
    )


def _fwd_packed(world, ppos, pvel, prot, pangvel, force_a, torque_a,
                dyn_g):
    out = fused_step_packed(world, ppos, pvel, prot, pangvel, force_a,
                            torque_a, dyn_g)
    return out, (ppos, pvel, prot, pangvel, force_a, torque_a, dyn_g)


def _bwd_packed(world, residuals, g):
    ppos, pvel, prot, pangvel, force_a, torque_a, dyn_g = residuals
    N = world._n_entities
    R = ppos.shape[0] // (2 * N)
    pos = unpack_rows(ppos, (N, 2), R)
    vel = unpack_rows(pvel, (N, 2), R)
    rot = unpack_rows(prot, (N, 1), R)
    ang_vel = unpack_rows(pangvel, (N, 1), R)

    # pack/unpack are value permutations (transpose of pack == unpack),
    # so the packed-output cotangents fold into the native ones exactly.
    g_pos, g_vel, g_rot, g_av, g_pp, g_pv, g_pr, g_pa = g
    g_pos = g_pos + unpack_rows(g_pp, (N, 2), R)
    g_vel = g_vel + unpack_rows(g_pv, (N, 2), R)
    g_rot = g_rot + unpack_rows(g_pr, (N, 1), R)
    g_av = g_av + unpack_rows(g_pa, (N, 1), R)

    gi = _core_vjp(world, pos, vel, rot, ang_vel, force_a, torque_a,
                   dyn_g, (g_pos, g_vel, g_rot, g_av))
    gi_pos, gi_vel, gi_rot, gi_av, gi_force, gi_torque, gi_dyn = gi
    return (
        pack_rows(gi_pos, R),
        pack_rows(gi_vel, R),
        pack_rows(gi_rot, R),
        pack_rows(gi_av, R),
        gi_force,
        gi_torque,
        gi_dyn,
    )


fused_step_packed.defvjp(_fwd_packed, _bwd_packed)
