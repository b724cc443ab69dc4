"""Fused Pallas TPU kernel for the road_traffic path geometry.

The scenario's per-step geometry (reference road_traffic.py:1441-1716 —
perpendicular distances to the reference path and lanelet boundaries,
short-term reference-path selection, and the ``interX`` collision tests)
dominates the jnp step: every pass first gathers per-(env, agent)
polylines into ``[B, A, P, 2]`` HBM intermediates (~180 MB of traffic per
step at B=1000, A=20, P=185) that XLA streams ~20x off roofline on their
tiny minor dims.

This kernel keeps the static path tables (<200 KB) resident in VMEM and
computes EVERYTHING per (env-block, agent) on chip:

- per-agent polyline gather as a one-hot MXU matmul
  ``[P, n_paths] @ [n_paths, TB]`` (exact 0/1 selection, HIGHEST
  precision — same trick as the jnp path's einsum, but the gathered
  polyline never leaves VMEM);
- perpendicular distances from the agent center (reference path) and the
  4 rectangle vertices + center (left/right boundaries), sharing one set
  of polyline segment diffs per boundary;
- short-term reference path: first-min index fold + one-hot column
  reductions with the reference's loop-wrap semantics;
- strict segment crossings (``interX``): rectangle x left/right boundary,
  rectangle x entry/exit segments, and all agent-agent rectangle pairs
  (grouped per-agent with a block-diagonal 0/1 matmul).

Layout: env batch on the 128-wide lane dimension (``TB`` columns per
block), polyline points on sublanes — every elementwise pass is a
``[P-1, TB]`` vreg-dense tile.

Gradients: ``jax.custom_vjp`` whose backward re-runs the scenario's jnp
bundle under ``jax.vjp`` (road_traffic is not gradient-benchmarked by the
reference, but grads stay correct).  Multi-chip: the forward is wrapped in
``custom_partitioning`` with a batch-dim rule so GSPMD shards the env axis
with zero collectives (same scheme as ``ops/physics_pallas.py``).

Disable with ``VMT_PALLAS_GEOM=0``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _parse_tb() -> int:
    """Env-batch lane tile.  Must be a positive multiple of 128 (the TPU
    lane width) — validate here so a bad override fails with a clear
    message instead of an opaque Mosaic error at first compile.  Values
    above 512 exceed the 16 MB scoped-VMEM limit on v5e (1024 needs
    21.2 MB); warn rather than reject in case a larger-VMEM part runs
    this."""
    raw = os.environ.get("VMT_GEOM_TB", "512")
    try:
        tb = int(raw)
    except ValueError:
        raise ValueError(
            f"VMT_GEOM_TB={raw!r} is not an integer; expected a positive"
            " multiple of 128 (TPU lane width), e.g. 256 or 512."
        ) from None
    if tb <= 0 or tb % 128 != 0:
        raise ValueError(
            f"VMT_GEOM_TB={tb} must be a positive multiple of 128 (TPU"
            " lane width); e.g. 256 or 512 (the v5e VMEM ceiling)."
        )
    return tb


_TB = _parse_tb()


def geometry_enabled() -> bool:
    flag = os.environ.get("VMT_PALLAS_GEOM")
    if flag is not None:
        return flag not in ("0", "false", "False")
    if os.environ.get("VMT_PALLAS_INTERPRET") == "1":
        return True  # interpret mode: exercised in CPU tests
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pad_tables(paths):
    """Pad the point dim to a sublane multiple by repeating the last row
    (repeats are degenerate segments: inert in both the masked
    perpendicular-distance pipeline and the strict interX test, exactly
    like the builder's own last-point padding).

    The 6 polyline components + the 12 meta rows are stacked into ONE
    tall [R, n_paths] matrix and pre-split into an exact 3-way bf16
    decomposition (a0 = bf16(S), a1 = bf16(S - a0), a2 = S - a0 - a1;
    every residual is exactly representable, asserted below).  The
    kernel then gathers a whole path family with THREE single-pass bf16
    matmuls against the 0/1 one-hot selector instead of seven 6-pass
    f32 ``HIGHEST`` matmuls: a one-hot column picks exactly one table
    column, each bf16 product against 1.0 is exact and the f32
    accumulator adds a0+a1+a2 back to the original f32 value bitwise —
    same result, ~2.6x fewer MXU passes (the gathers, not the
    elementwise passes, bound the kernel on v5e: n_paths=40 leaves the
    128-wide contraction dim 31% utilized)."""
    import ml_dtypes

    P = paths.center.shape[1]
    P_pad = _round_up(P, 8)
    pad = P_pad - P

    def padded(t):  # [n, P, 2] -> [P_pad, n] per component
        t = np.concatenate([t, np.repeat(t[:, -1:], pad, axis=1)], axis=1)
        return (
            np.ascontiguousarray(t[..., 0].T),
            np.ascontiguousarray(t[..., 1].T),
        )

    cx, cy = padded(paths.center)
    lx, ly = padded(paths.left)
    rx, ry = padded(paths.right)
    # meta rows: 0 n_points, 1 n_left, 2 n_right, 3 is_loop,
    # 4-7 entry (p0x p0y p1x p1y), 8-11 exit
    meta = np.stack(
        [
            paths.n_points.astype(np.float32),
            paths.n_left.astype(np.float32),
            paths.n_right.astype(np.float32),
            paths.is_loop.astype(np.float32),
            paths.entry[:, 0, 0],
            paths.entry[:, 0, 1],
            paths.entry[:, 1, 0],
            paths.entry[:, 1, 1],
            paths.exit[:, 0, 0],
            paths.exit[:, 0, 1],
            paths.exit[:, 1, 0],
            paths.exit[:, 1, 1],
        ],
        axis=0,
    ).astype(np.float32)
    stacked = np.concatenate([cx, cy, lx, ly, rx, ry, meta], axis=0)
    rows = stacked.shape[0]
    rows_pad = _round_up(rows, 8)
    stacked = np.concatenate(
        [
            stacked,
            np.zeros((rows_pad - rows, stacked.shape[1]), np.float32),
        ],
        axis=0,
    )
    bf16 = ml_dtypes.bfloat16
    a0 = stacked.astype(bf16)
    r1 = stacked - a0.astype(np.float32)
    a1 = r1.astype(bf16)
    a2 = (r1 - a1.astype(np.float32)).astype(bf16)
    recon = (
        a0.astype(np.float32) + a1.astype(np.float32)
    ) + a2.astype(np.float32)
    assert (recon == stacked).all(), "bf16 3-way table split not exact"
    return (a0, a1, a2), P, P_pad, rows_pad


def _dot(a, b):
    """Single-pass bf16 MXU matmul with f32 accumulation.  Exact when
    one operand is a 0/1 selector (bf16 represents 0/1 exactly, each
    product against 1.0 is exact, and the accumulator is f32); paired
    with the 3-way bf16 table split in ``_pad_tables`` this reproduces
    the f32 gather bitwise at 1/6 the MXU passes of a ``HIGHEST``
    matmul."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _make_agent_kernel(scn, with_collisions, P, P_pad):
    """Per-(env-block, agent) program: polyline gathers, perpendicular
    distances, short-term path selection and the boundary/entry/exit
    crossings for ONE agent.  Agents ride the second grid dimension so a
    program's live set is one gathered polyline family (~2.4 MB at
    TB=512) instead of all A of them (the fully-unrolled first version
    held 67 MB live and OOM'd VMEM); the table blocks' index_map is
    constant so Mosaic skips their re-fetch between agent steps."""
    A = scn.n_agents
    n_p = scn.n_paths
    K = scn.n_points_short_term
    SI = scn.sample_interval_ref_path
    half_w = scn.agent_width / 2.0
    half_l = (scn.l_f + scn.l_r) / 2.0
    compute_entry_exit = bool(
        with_collisions
        and (scn.map_type == "3" or scn.is_testing_mode)
        and not all(scn.paths.is_loop)
    )

    def kernel(
        pos_ref,
        rot_ref,
        pid_ref,
        t0_ref,
        t1_ref,
        t2_ref,
        *out_refs,
    ):
        if with_collisions:
            ref_o, la_o, ra_o, bd_o, st_o, lane_o, ent_o, ext_o = out_refs
        else:
            ref_o, la_o, ra_o, bd_o, st_o = out_refs

        # Mosaic requires block sublane heights divisible by 8 (or full),
        # so inputs/outputs arrive as full [rows, TB] blocks revisited
        # across the agent grid dim; each program addresses its agent's
        # rows with dynamic slices.
        a = pl.program_id(1)
        TB = pos_ref.shape[1]
        # Mosaic iota must be integer-typed; cast to f32 for the compares.
        iota_paths = jax.lax.broadcasted_iota(
            jnp.int32, (n_p, 1), 0
        ).astype(jnp.float32)
        seg_iota = jax.lax.broadcasted_iota(
            jnp.int32, (P_pad - 1, 1), 0
        ).astype(jnp.float32)
        p_iota = jax.lax.broadcasted_iota(
            jnp.int32, (P_pad, 1), 0
        ).astype(jnp.float32)

        def polyline_segs(Xp, Yp):
            x0, y0 = Xp[:-1], Yp[:-1]
            dx, dy = Xp[1:] - x0, Yp[1:] - y0
            lsq = dx * dx + dy * dy + 1e-8
            # Reciprocal once per polyline: perp_dsq runs 1x (center) /
            # 5x per boundary side, and a VPU divide costs several
            # multiply-equivalents — hoist it out of the per-point pass.
            # t = q * (1/lsq) instead of q / lsq changes the rounding of
            # t by <=1ulp; t is then clipped and only feeds the soft
            # closest-point, so outputs stay within the 1e-5 tie
            # tolerance used downstream (verified vs jnp on real TPU).
            return x0, y0, dx, dy, lsq, 1.0 / lsq

        def perp_dsq(px, py, segs, n, with_pv=False):
            """Masked per-segment SQUARED distances [P_pad-1, TB] (the
            in-VMEM form of get_perpendicular_distances).  sqrt is
            hoisted past the min by the callers — sqrt is monotone and
            correctly rounded, so sqrt(min(d^2)) == min(sqrt(d^2))
            bitwise and the [P-1, TB] sqrt pass (~18% of the kernel)
            collapses to one [1, TB] sqrt per reduction.

            Padding rows (index >= n-1) get a large sentinel.  The min
            over segments is unchanged (every polyline has >= 1 real
            segment) and the tie-tolerant first-min index fold is also
            unchanged (padding indices are strictly larger than the
            real row holding the same value), so this is output-bitwise
            equivalent to the earlier d_end replication — minus a
            full-tile select-multiply-reduce per call (11 calls/agent).

            with_pv=True also returns the point-minus-segment-start
            components so the boundary-crossing pass can reuse them
            (see the crossing block below)."""
            x0, y0, dx, dy, lsq, inv_lsq = segs
            pvx, pvy = px - x0, py - y0
            t = jnp.clip((pvx * dx + pvy * dy) * inv_lsq, 0.0, 1.0)
            cx = x0 + dx * t - px
            cy = y0 + dy * t - py
            dsq = cx * cx + cy * cy
            dsq = jnp.where(seg_iota >= n - 1.0, 1e30, dsq)
            if with_pv:
                return dsq, pvx, pvy
            return dsq

        def seg_cross_any(p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y):
            """Strict crossing of segment p against segment array q,
            reduced over q's rows -> [1, TB] 0/1 (interX semantics)."""
            sx, sy = q2x - q1x, q2y - q1y
            rx_, ry_ = p2x - p1x, p2y - p1y
            d1 = sx * (p1y - q1y) - sy * (p1x - q1x)
            d2 = sx * (p2y - q1y) - sy * (p2x - q1x)
            d3 = rx_ * (q1y - p1y) - ry_ * (q1x - p1x)
            d4 = rx_ * (q2y - p1y) - ry_ * (q2x - p1x)
            hit = ((d1 * d2 < 0) & (d3 * d4 < 0)).astype(jnp.float32)
            return jnp.max(hit, axis=0, keepdims=True)

        px = pos_ref[pl.ds(2 * a, 1), :]
        py = pos_ref[pl.ds(2 * a + 1, 1), :]
        th = rot_ref[pl.ds(a, 1), :]
        pid = pid_ref[pl.ds(a, 1), :]

        _abl = set(
            filter(
                None, os.environ.get("VMT_GEOM_ABLATE", "").split(",")
            )
        )
        # Whole path family (6 polyline components + meta) in ONE
        # stacked gather: three single-pass bf16 matmuls whose f32 sum
        # reconstructs the f32 tables bitwise (see _pad_tables).
        onehot = (iota_paths == pid).astype(jnp.bfloat16)  # [n_p, TB]
        if "nogather" in _abl:
            g = jnp.broadcast_to(
                t0_ref[:].astype(jnp.float32)[:, 0:1],
                (t0_ref.shape[0], TB),
            ) + 0.0 * jnp.sum(onehot.astype(jnp.float32))
        else:
            g = (
                _dot(t0_ref[:], onehot) + _dot(t1_ref[:], onehot)
            ) + _dot(t2_ref[:], onehot)  # [R, TB] f32
        gcx = g[0 * P_pad : 1 * P_pad]  # [P_pad, TB]
        gcy = g[1 * P_pad : 2 * P_pad]
        glx = g[2 * P_pad : 3 * P_pad]
        gly = g[3 * P_pad : 4 * P_pad]
        grx = g[4 * P_pad : 5 * P_pad]
        gry = g[5 * P_pad : 6 * P_pad]
        mg = g[6 * P_pad : 6 * P_pad + 12]  # [12, TB]
        n_c = mg[0:1, :]
        n_l = mg[1:2, :]
        n_r = mg[2:3, :]
        loop_f = mg[3:4, :]

        # --- reference-path distance + closest index --- #
        if "nocenter" in _abl:
            dmin = px * 0.0
        else:
            segs_c = polyline_segs(gcx, gcy)
            dsq_c = perp_dsq(px, py, segs_c, n_c)
            dmin = jnp.sqrt(jnp.min(dsq_c, axis=0, keepdims=True))
        ref_o[pl.ds(a, 1), :] = dmin
        if "nocenter" in _abl:
            dsq_c = jnp.zeros((P_pad - 1, TB), jnp.float32)
        # First index within EPS of the min (the tie-tolerant rule of
        # get_perpendicular_distances — see the note there), tested in
        # squared space: d <= thr  <=>  d^2 <= thr^2 for nonnegatives.
        thr = dmin + 1e-5
        idx = (
            jnp.min(
                jnp.where(dsq_c <= thr * thr, seg_iota, 1e9),
                axis=0,
                keepdims=True,
            )
            + 1.0
        )

        # --- short-term reference path --- #
        for k in range(K if "noshort" not in _abl else 0):
            fut = idx + float(k * SI + 1)
            wrapped = jnp.mod(fut + 1.0, n_c)
            fut = jnp.where(
                (loop_f > 0) & (fut >= n_c - 1.0), wrapped, fut
            )
            fut = jnp.clip(fut, 0.0, float(P - 1))
            mask = (p_iota == fut).astype(jnp.float32)  # [P_pad, TB]
            st_o[pl.ds(2 * K * a + 2 * k, 1), :] = jnp.sum(
                gcx * mask, axis=0, keepdims=True
            )
            st_o[pl.ds(2 * K * a + 2 * k + 1, 1), :] = jnp.sum(
                gcy * mask, axis=0, keepdims=True
            )

        # --- rectangle vertices (closed shape) --- #
        cos_t, sin_t = jnp.cos(th), jnp.sin(th)
        vxs, vys = [], []
        # Rotate-then-translate in the same association as the jnp
        # path's get_rectangle_vertices (bit-exact parity).
        for bx, by in _CORNERS(half_l, half_w):
            vxs.append(bx * cos_t - by * sin_t + px)
            vys.append(bx * sin_t + by * cos_t + py)

        # --- boundary distances (center + 4 vertices), fused with the
        #     rectangle x boundary crossings --- #
        # The crossing test's d1/d2 terms are cross(boundary-segment,
        # vertex - segment-start) — bitwise-identical to dx*pvy - dy*pvx
        # built from the perpendicular pass's pv intermediates (sx == dx
        # and p1y - q1y == pvy are the same subtractions), and d3 is an
        # exact IEEE rearrangement (q1y-p1y == -pvy; (-u)-(-v) == v-u).
        # Reusing them drops two full cross-product passes per rectangle
        # edge per side (8 of the kernel's ~20 elementwise passes shrink
        # by ~half); outputs are bit-identical to the standalone
        # seg_cross_any form.
        segs_l = polyline_segs(glx, gly)
        segs_r = polyline_segs(grx, gry)
        # Zero placeholder ONLY under the nobound ablation (keeps bd
        # defined); the real path folds over the 10 true distances.
        mins = [px * 0.0] if "nobound" in _abl else []
        hit = jnp.zeros((1, TB), jnp.float32)
        _sides = (
            (((glx, gly), segs_l, n_l), ((grx, gry), segs_r, n_r))
            if "nobound" not in _abl
            else ()
        )
        for side, (XY, segs, n_s) in enumerate(_sides):
            out_ref_s = la_o if side == 0 else ra_o
            x0, y0, dx, dy = segs[0], segs[1], segs[2], segs[3]
            pvs, crosses = [], []
            for j, (qx, qy) in enumerate(
                [(px, py)] + list(zip(vxs[:4], vys[:4]))
            ):
                dsq, pvx, pvy = perp_dsq(
                    qx, qy, segs, n_s, with_pv=True
                )
                dmin_s = jnp.sqrt(jnp.min(dsq, axis=0, keepdims=True))
                if j == 0:
                    dmin_s = dmin_s - half_w
                elif with_collisions:
                    if "nocross" not in _abl:
                        pvs.append((pvx, pvy))
                        crosses.append(dx * pvy - dy * pvx)
                out_ref_s[pl.ds(5 * a + j, 1), :] = dmin_s
                mins.append(dmin_s)
            if with_collisions and "nocross" not in _abl:
                # Rectangle edge s runs vertex s -> s+1; vertex 4 is
                # the closed-shape repeat of vertex 0, so its cross
                # term is bitwise equal to crosses[0].
                crosses.append(crosses[0])
                x1, y1 = XY[0][1:], XY[1][1:]
                for s in range(4):
                    rx_ = vxs[s + 1] - vxs[s]
                    ry_ = vys[s + 1] - vys[s]
                    d1 = crosses[s]
                    d2 = crosses[s + 1]
                    pvx_s, pvy_s = pvs[s]
                    d3 = ry_ * pvx_s - rx_ * pvy_s
                    d4 = rx_ * (y1 - vys[s]) - ry_ * (x1 - vxs[s])
                    hit = jnp.maximum(
                        hit,
                        jnp.max(
                            (
                                (d1 * d2 < 0) & (d3 * d4 < 0)
                            ).astype(jnp.float32),
                            axis=0,
                            keepdims=True,
                        ),
                    )
        bd = mins[0]
        for m in mins[1:]:
            bd = jnp.minimum(bd, m)
        bd_o[pl.ds(a, 1), :] = bd

        if with_collisions:
            lane_o[pl.ds(a, 1), :] = hit

            # --- entry / exit segment crossings --- #
            if compute_entry_exit:
                not_loop = 1.0 - loop_f
                for rows, o_ref in ((4, ent_o), (8, ext_o)):
                    h = jnp.zeros((1, TB), jnp.float32)
                    for s in range(4):
                        h = jnp.maximum(
                            h,
                            seg_cross_any(
                                vxs[s], vys[s], vxs[s + 1], vys[s + 1],
                                mg[rows : rows + 1, :],
                                mg[rows + 1 : rows + 2, :],
                                mg[rows + 2 : rows + 3, :],
                                mg[rows + 3 : rows + 4, :],
                            ),
                        )
                    o_ref[pl.ds(a, 1), :] = h * not_loop
            else:
                ent_o[pl.ds(a, 1), :] = jnp.zeros((1, TB), jnp.float32)
                ext_o[pl.ds(a, 1), :] = jnp.zeros((1, TB), jnp.float32)

    return kernel


def _CORNERS(half_l, half_w):
    return (
        (half_l, half_w),
        (half_l, -half_w),
        (-half_l, -half_w),
        (-half_l, half_w),
        (half_l, half_w),
    )


def _make_pair_kernel(scn):
    """Per-env-block program: all agents' rectangle vertices + the
    agent-agent strict-crossing matrix (all vertex rows are [1, TB] —
    tiny, so the whole-block live set stays ~1 MB)."""
    A = scn.n_agents
    half_w = scn.agent_width / 2.0
    half_l = (scn.l_f + scn.l_r) / 2.0

    def kernel(pos_ref, rot_ref, g_ref, vt_o, ag_o):
        TB = pos_ref.shape[1]
        iota_A = jax.lax.broadcasted_iota(
            jnp.int32, (A, 1), 0
        ).astype(jnp.float32)

        all_vx = [[None] * 5 for _ in range(A)]
        all_vy = [[None] * 5 for _ in range(A)]
        for a in range(A):
            px = pos_ref[2 * a : 2 * a + 1, :]
            py = pos_ref[2 * a + 1 : 2 * a + 2, :]
            th = rot_ref[a : a + 1, :]
            cos_t, sin_t = jnp.cos(th), jnp.sin(th)
            for v, (bx, by) in enumerate(_CORNERS(half_l, half_w)):
                # same association as get_rectangle_vertices (bit-exact)
                vx = bx * cos_t - by * sin_t + px
                vy = bx * sin_t + by * cos_t + py
                all_vx[a][v] = vx
                all_vy[a][v] = vy
                vt_o[a * 10 + 2 * v : a * 10 + 2 * v + 1, :] = vx
                vt_o[a * 10 + 2 * v + 1 : a * 10 + 2 * v + 2, :] = vy

        # All agents' segment endpoints stacked on sublanes [4A, TB];
        # self-pairs are degenerate (shared endpoints / identical
        # segments give d==0, never a strict crossing) but are masked to
        # match the jnp path's ~eye exactly.
        q1x = jnp.concatenate(
            [all_vx[j][s] for j in range(A) for s in range(4)], axis=0
        )
        q1y = jnp.concatenate(
            [all_vy[j][s] for j in range(A) for s in range(4)], axis=0
        )
        q2x = jnp.concatenate(
            [all_vx[j][s + 1] for j in range(A) for s in range(4)],
            axis=0,
        )
        q2y = jnp.concatenate(
            [all_vy[j][s + 1] for j in range(A) for s in range(4)],
            axis=0,
        )
        for i in range(A):
            acc = jnp.zeros((4 * A, TB), jnp.float32)
            for s in range(4):
                p1x, p1y = all_vx[i][s], all_vy[i][s]
                p2x, p2y = all_vx[i][s + 1], all_vy[i][s + 1]
                sx, sy = q2x - q1x, q2y - q1y
                rx_, ry_ = p2x - p1x, p2y - p1y
                d1 = sx * (p1y - q1y) - sy * (p1x - q1x)
                d2 = sx * (p2y - q1y) - sy * (p2x - q1x)
                d3 = rx_ * (q1y - p1y) - ry_ * (q1x - p1x)
                d4 = rx_ * (q2y - p1y) - ry_ * (q2x - p1x)
                acc = jnp.maximum(
                    acc,
                    ((d1 * d2 < 0) & (d3 * d4 < 0)).astype(jnp.float32),
                )
            # Both operands are exact 0/1 in bf16 -> single-pass matmul
            # with f32 accumulation is exact (counts <= 4 per cell).
            pair = _dot(g_ref[:], acc.astype(jnp.bfloat16))
            pair = jnp.where(iota_A == float(i), 0.0, pair)
            ag_o[i * A : (i + 1) * A, :] = (pair > 0).astype(jnp.float32)

    return kernel


def _make_neighbor_obs_kernel(A, k, half_l, half_w):
    """Per-env-block program: the partial-observation top-k neighbor
    block (reference road_traffic.py:1937-2030) entirely on chip.

    For every agent i: a k-round first-min fold over the normalized
    agent-distance matrix (same tie rule as ``jnp.argmin``), one-hot
    row-reductions gathering the selected neighbors' pose / speed /
    rectangle vertices, and the ego-frame transforms.  Replaces the jnp
    chain of [B, A, k, A] one-hot einsums + [B, A, k, 4, 2] rel-vertex
    transforms whose tiny (4, 2) minor dims tile at ~3% vreg utilization
    and drag layout-fixup copies behind them (~11% of the step at
    B=10k).  All outputs are RAW (unnormalized) — the caller divides by
    the normalizers in the same order as the jnp path."""

    def kernel(pos_ref, rot_ref, vel_ref, dn_ref, *out_refs):
        nd_o, pe_o, re_o, ve_o, vt_o = out_refs
        TB = pos_ref.shape[1]
        iota_A = jax.lax.broadcasted_iota(
            jnp.int32, (A, 1), 0
        ).astype(jnp.float32)

        # All agents' x/y/rot/|v| stacked on sublanes [A, TB], plus the
        # 4 rectangle corners (same association as
        # get_rectangle_vertices — bit-exact parity with the jnp path).
        PX = jnp.concatenate(
            [pos_ref[2 * j : 2 * j + 1, :] for j in range(A)], axis=0
        )
        PY = jnp.concatenate(
            [pos_ref[2 * j + 1 : 2 * j + 2, :] for j in range(A)], axis=0
        )
        TH = rot_ref[:, :]
        # Mosaic has no strided vector loads — gather the interleaved
        # x/y rows with explicit unit slices.
        VX = jnp.concatenate(
            [vel_ref[2 * j : 2 * j + 1, :] for j in range(A)], axis=0
        )
        VY = jnp.concatenate(
            [vel_ref[2 * j + 1 : 2 * j + 2, :] for j in range(A)], axis=0
        )
        VA = jnp.sqrt(VX * VX + VY * VY)
        cos_all = jnp.cos(TH)
        sin_all = jnp.sin(TH)
        corner_x = []
        corner_y = []
        for bx, by in _CORNERS(half_l, half_w)[:4]:
            corner_x.append(bx * cos_all - by * sin_all + PX)
            corner_y.append(bx * sin_all + by * cos_all + PY)

        for i in range(A):
            px = PX[i : i + 1, :]
            py = PY[i : i + 1, :]
            th = TH[i : i + 1, :]
            c_i = cos_all[i : i + 1, :]
            s_i = sin_all[i : i + 1, :]
            cur = dn_ref[i * A : (i + 1) * A, :]  # [A, TB]
            # NaN divergence note: if a distance were NaN, `cur == m` is
            # all-false -> idx = A, the one-hot is all-zero, gathers
            # return 0 and nd is NaN — whereas jnp.argmin would select
            # the NaN index.  Distances here are norms of finite poses
            # (the integrator clamps speed/pos), so NaN cannot occur in
            # normal operation; the divergence is latent only.
            for kk in range(k):
                m = jnp.min(cur, axis=0, keepdims=True)
                idx = jnp.min(
                    jnp.where(cur == m, iota_A, float(A)),
                    axis=0,
                    keepdims=True,
                )
                oh = (iota_A == idx).astype(jnp.float32)  # [A, TB]
                cur = jnp.where(oh > 0, jnp.inf, cur)
                nd_o[pl.ds(i * k + kk, 1), :] = m

                def g(rows):  # one-hot gather [A, TB] -> [1, TB]
                    return jnp.sum(oh * rows, axis=0, keepdims=True)

                pjx, pjy = g(PX), g(PY)
                rot_rel = g(TH) - th
                va_j = g(VA)
                # ego position: rotate (p_j - p_i) by -th.  cos(-th) ==
                # cos(th) and sin(-th) == -sin(th) bitwise, so the
                # rotate_vector form collapses to the +/- pattern below.
                rx_, ry_ = pjx - px, pjy - py
                pe_o[pl.ds((i * k + kk) * 2, 1), :] = (
                    rx_ * c_i + ry_ * s_i
                )
                pe_o[pl.ds((i * k + kk) * 2 + 1, 1), :] = (
                    ry_ * c_i - rx_ * s_i
                )
                re_o[pl.ds(i * k + kk, 1), :] = rot_rel
                ve_o[pl.ds((i * k + kk) * 2, 1), :] = va_j * jnp.cos(
                    rot_rel
                )
                ve_o[pl.ds((i * k + kk) * 2 + 1, 1), :] = va_j * jnp.sin(
                    rot_rel
                )
                for v in range(4):
                    vx_ = g(corner_x[v]) - px
                    vy_ = g(corner_y[v]) - py
                    base = ((i * k + kk) * 4 + v) * 2
                    vt_o[pl.ds(base, 1), :] = vx_ * c_i + vy_ * s_i
                    vt_o[pl.ds(base + 1, 1), :] = vy_ * c_i - vx_ * s_i

    return kernel


def _neighbor_obs_jnp(A, k, half_l, half_w, pos, rot, vel, dn):
    """jnp mirror of the neighbor-obs kernel (the fused path's custom-VJP
    backward and the CPU reference for equivalence tests).  Matches the
    scenario's original inline chain op-for-op."""
    from vectorizedmultiagentsimulator_tpu.utils import JaxUtils

    # safe_norm: 0 subgradient at exactly-zero velocity (this mirror is
    # the fused path's custom-VJP backward; jnp.linalg.norm would bake a
    # NaN grad into the fused path for parked agents).
    vel_abs = JaxUtils.safe_norm(vel, axis=-1)  # [B, A]
    lw = 2 * half_w
    ll = 2 * half_l
    # local import to avoid a cycle at module load
    from vectorizedmultiagentsimulator_tpu.scenarios.road_traffic import (
        get_rectangle_vertices,
    )

    vertices = get_rectangle_vertices(pos, rot, lw, ll)[..., :4, :]
    cur = dn
    vals, ohs = [], []
    for _ in range(k):
        vals.append(jnp.min(cur, axis=-1))
        oh = jnp.argmin(cur, axis=-1)[..., None] == jnp.arange(A)
        ohs.append(oh)
        cur = jnp.where(oh, jnp.inf, cur)
    nd = jnp.stack(vals, axis=-1)  # [B, A, k]
    one_hot = jnp.stack(ohs, axis=-2).astype(pos.dtype)

    def sel(x):
        return jnp.einsum(
            "bika,ba...->bik...",
            one_hot,
            x,
            precision=jax.lax.Precision.HIGHEST,
        )

    def to_local(vec, rot_i):
        cos = jnp.cos(-rot_i)
        sin = jnp.sin(-rot_i)
        return jnp.stack(
            [
                vec[..., 0] * cos - vec[..., 1] * sin,
                vec[..., 0] * sin + vec[..., 1] * cos,
            ],
            axis=-1,
        )

    pos_j = sel(pos)
    rot_j = sel(rot)
    va_j = sel(vel_abs)
    vert_j = sel(vertices)
    rel = pos_j - pos[:, :, None, :]
    pe = to_local(rel, rot[:, :, None])
    rot_rel = rot_j - rot[:, :, None]
    ve = jnp.stack(
        [va_j * jnp.cos(rot_rel), va_j * jnp.sin(rot_rel)], axis=-1
    )
    vert_rel = vert_j - pos[:, :, None, None, :]
    vt = to_local(vert_rel, rot[:, :, None, None])
    return nd, pe, rot_rel, ve, vt


def _neighbor_obs_forward(A, k, half_l, half_w, pos, rot, vel, dn):
    B = pos.shape[0]
    interpret = os.environ.get("VMT_PALLAS_INTERPRET") == "1"
    pos_t = jnp.moveaxis(pos, 0, -1).reshape(2 * A, B)
    rot_t = jnp.moveaxis(rot, 0, -1).reshape(A, B)
    vel_t = jnp.moveaxis(vel, 0, -1).reshape(2 * A, B)
    dn_t = jnp.moveaxis(dn, 0, -1).reshape(A * A, B)

    def spec(height):
        return pl.BlockSpec(
            (height, _TB), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    out_rows = [A * k, A * k * 2, A * k, A * k * 2, A * k * 8]
    nd, pe, re, ve, vt = pl.pallas_call(
        _make_neighbor_obs_kernel(A, k, half_l, half_w),
        grid=(pl.cdiv(B, _TB),),
        in_specs=[spec(2 * A), spec(A), spec(2 * A), spec(A * A)],
        out_specs=[spec(r) for r in out_rows],
        out_shape=[
            jax.ShapeDtypeStruct((r, B), jnp.float32) for r in out_rows
        ],
        interpret=interpret,
    )(pos_t, rot_t, vel_t, dn_t)

    def unpack(x, shape):
        return jnp.moveaxis(x.reshape(shape + (B,)), -1, 0)

    return (
        unpack(nd, (A, k)),
        unpack(pe, (A, k, 2)),
        unpack(re, (A, k)),
        unpack(ve, (A, k, 2)),
        unpack(vt, (A, k, 4, 2)),
    )


def _neighbor_partitioned(A, k, half_l, half_w):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def fwd(pos, rot, vel, dn):
        return _neighbor_obs_forward(A, k, half_l, half_w, pos, rot, vel,
                                     dn)

    def _batch_only(sharding, ndim):
        spec = getattr(sharding, "spec", None)
        b = spec[0] if spec is not None and len(spec) else None
        return NamedSharding(
            sharding.mesh, PartitionSpec(b, *([None] * (ndim - 1)))
        )

    def infer(mesh, arg_shapes, result_shape):
        return tuple(
            _batch_only(arg_shapes[0].sharding, r.ndim)
            for r in result_shape
        )

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(
            _batch_only(a.sharding, a.ndim) for a in arg_shapes
        )
        result_shardings = tuple(
            _batch_only(arg_shapes[0].sharding, r.ndim)
            for r in result_shape
        )

        def lower_fn(*args):
            return _neighbor_obs_forward(A, k, half_l, half_w, *args)

        return mesh, lower_fn, result_shardings, arg_shardings

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            "b a i, b a, b a j, b a a2 -> "
            "b a3 k, b a4 k2 i2, b a5 k3, b a6 k4 j2, b a7 k5 v i3"
        ),
    )
    return fwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_neighbor_obs(scn, pos, rot, vel, dn):
    """Top-k nearest-neighbor ego observations as one Pallas kernel.

    pos [B,A,2], rot [B,A], vel [B,A,2], dn [B,A,A] (normalized mutual
    distances, big diagonal) -> (nearing_dist [B,A,k], pos_ego
    [B,A,k,2], rot_rel [B,A,k], vel_ego [B,A,k,2], vert_ego
    [B,A,k,4,2]), all raw/unnormalized.
    """
    key = "_fused_neighbor_obs"
    fwd = scn.__dict__.get(key)
    if fwd is None:
        fwd = _neighbor_partitioned(
            scn.n_agents,
            scn.n_nearing_agents_observed,
            (scn.l_f + scn.l_r) / 2.0,
            scn.agent_width / 2.0,
        )
        scn.__dict__[key] = fwd
    return fwd(pos, rot, vel, dn)


def _nobs_fwd(scn, pos, rot, vel, dn):
    return fused_neighbor_obs(scn, pos, rot, vel, dn), (pos, rot, vel, dn)


def _nobs_bwd(scn, residuals, g):
    pos, rot, vel, dn = residuals
    A = scn.n_agents
    k = scn.n_nearing_agents_observed

    def core(p, r, v, d):
        return _neighbor_obs_jnp(
            A,
            k,
            (scn.l_f + scn.l_r) / 2.0,
            scn.agent_width / 2.0,
            p,
            r,
            v,
            d,
        )

    _, vjp = jax.vjp(core, pos, rot, vel, dn)
    return vjp(g)


fused_neighbor_obs.defvjp(_nobs_fwd, _nobs_bwd)


def _geom_tables(scn):
    """Padded transposed table operands (+ the block-diagonal grouping
    matrix for the pair-collision reduce), cached on the scenario."""
    cached = scn.__dict__.get("_geom_tables_cache")
    if cached is None:
        tables, P, P_pad, rows_pad = _pad_tables(scn.paths)
        A = scn.n_agents
        G = np.zeros((A, 4 * A), np.float32)
        for j in range(A):
            G[j, 4 * j : 4 * (j + 1)] = 1.0
        cached = (
            tuple(jnp.asarray(t) for t in tables)
            + (jnp.asarray(G).astype(jnp.bfloat16),),
            P,
            P_pad,
            rows_pad,
        )
        scn.__dict__["_geom_tables_cache"] = cached
    return cached


def _pallas_forward(scn, with_collisions, pos, rot, pidf, *tables):
    B, A = pos.shape[0], pos.shape[1]
    K = scn.n_points_short_term
    _, P, P_pad, rows_pad = _geom_tables(scn)
    n_p = scn.n_paths
    interpret = os.environ.get("VMT_PALLAS_INTERPRET") == "1"
    path_tables, g_table = tables[:3], tables[3]

    pos_t = jnp.moveaxis(pos, 0, -1).reshape(2 * A, B)
    rot_t = jnp.moveaxis(rot, 0, -1).reshape(A, B)
    pid_t = jnp.moveaxis(pidf, 0, -1).reshape(A, B)

    # --- per-(env-block, agent) kernel --- #
    # Blocks span the full row dim (Mosaic needs sublane heights
    # divisible by 8 or full); the agent grid dim is fastest, so the
    # env-block's output blocks are revisited A times (each program
    # writes its own agent's rows) and flushed when the env block moves.
    def full_spec(height):
        return pl.BlockSpec(
            (height, _TB), lambda i, a: (0, i), memory_space=pltpu.VMEM
        )

    def tab_spec(shape):
        return pl.BlockSpec(
            shape, lambda i, a: (0, 0), memory_space=pltpu.VMEM
        )

    out_rows = [1, 5, 5, 1, 2 * K]
    if with_collisions:
        out_rows += [1, 1, 1]

    out = pl.pallas_call(
        _make_agent_kernel(scn, with_collisions, P, P_pad),
        grid=(pl.cdiv(B, _TB), A),
        in_specs=[full_spec(2 * A), full_spec(A), full_spec(A)]
        + [tab_spec((rows_pad, n_p))] * 3,
        out_specs=[full_spec(r * A) for r in out_rows],
        out_shape=[
            jax.ShapeDtypeStruct((r * A, B), jnp.float32)
            for r in out_rows
        ],
        interpret=interpret,
    )(pos_t, rot_t, pid_t, *path_tables)

    def unpack(x, shape):
        return jnp.moveaxis(x.reshape(shape + (B,)), -1, 0)

    ref = unpack(out[0], (A,))
    la = unpack(out[1], (A, 5))
    ra = unpack(out[2], (A, 5))
    bd = unpack(out[3], (A,))
    st = unpack(out[4], (A, K, 2))
    if not with_collisions:
        return ref, la, ra, bd, st
    lane = unpack(out[5], (A,))
    ent = unpack(out[6], (A,))
    ext = unpack(out[7], (A,))

    # --- per-env-block pair kernel (vertices + agent-agent interX) --- #
    def col_spec(height):
        return pl.BlockSpec(
            (height, _TB), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    vt_t, ag_t = pl.pallas_call(
        _make_pair_kernel(scn),
        grid=(pl.cdiv(B, _TB),),
        in_specs=[
            col_spec(2 * A),
            col_spec(A),
            pl.BlockSpec(
                (A, 4 * A), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[col_spec(10 * A), col_spec(A * A)],
        out_shape=[
            jax.ShapeDtypeStruct((10 * A, B), jnp.float32),
            jax.ShapeDtypeStruct((A * A, B), jnp.float32),
        ],
        interpret=interpret,
    )(pos_t, rot_t, g_table)

    vt = unpack(vt_t, (A, 5, 2))
    ag = unpack(ag_t, (A, A))
    return ref, la, ra, bd, st, vt, lane, ent, ext, ag


def _partitioned_forward(scn, with_collisions):
    """Batch-dim GSPMD rule (see ops/physics_pallas.py:736): without it a
    sharded step compiles with all-gathers around the custom call."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    n_out = 10 if with_collisions else 5

    @custom_partitioning
    def fwd(pos, rot, pidf, *tables):
        return _pallas_forward(scn, with_collisions, pos, rot, pidf,
                               *tables)

    def _batch_only(sharding, ndim):
        spec = getattr(sharding, "spec", None)
        b = spec[0] if spec is not None and len(spec) else None
        return NamedSharding(
            sharding.mesh, PartitionSpec(b, *([None] * (ndim - 1)))
        )

    def _replicated(sharding, ndim):
        return NamedSharding(
            sharding.mesh, PartitionSpec(*([None] * ndim))
        )

    def infer(mesh, arg_shapes, result_shape):
        return tuple(
            _batch_only(arg_shapes[0].sharding, r.ndim)
            for r in result_shape
        )

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(
            _batch_only(a.sharding, a.ndim) for a in arg_shapes[:3]
        ) + tuple(
            _replicated(a.sharding, a.ndim) for a in arg_shapes[3:]
        )
        result_shardings = tuple(
            _batch_only(arg_shapes[0].sharding, r.ndim)
            for r in result_shape
        )

        def lower_fn(*args):
            return _pallas_forward(scn, with_collisions, *args)

        return mesh, lower_fn, result_shardings, arg_shardings

    outs = ", ".join(
        [
            "b a2 k2 i" if i == 4 else
            "b a3 v i2" if i == 5 else
            "b a4 a5" if i == 9 else
            f"b a{i} f{i}" if i in (1, 2) else
            f"b x{i}"
            for i in range(n_out)
        ]
    )
    tabs = ", ".join([f"p{j} n{j}" for j in range(4)])
    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=f"b a i, b a, b a, {tabs} -> {outs}",
    )
    return fwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_geometry(scn, with_collisions, pos, rot, pidf):
    """All per-step road_traffic path geometry as one Pallas kernel.

    Returns f32 arrays (collision flags as 0/1): with_collisions=True ->
    (ref, left_all, right_all, boundaries, short_term, vertices,
    collide_lanelets, collide_entry, collide_exit, collide_agents);
    False -> the first 5 (reset paths never need the crossings).
    """
    key = f"_fused_geom_{int(with_collisions)}"
    fwd = scn.__dict__.get(key)
    if fwd is None:
        fwd = _partitioned_forward(scn, with_collisions)
        scn.__dict__[key] = fwd
    tables, _, _, _ = _geom_tables(scn)
    return fwd(pos, rot, pidf, *tables)


def _fwd(scn, with_collisions, pos, rot, pidf):
    out = fused_geometry(scn, with_collisions, pos, rot, pidf)
    return out, (pos, rot, pidf)


def _bwd(scn, with_collisions, residuals, g):
    pos, rot, pidf = residuals

    def core(p, r):
        return scn._bundle_jnp_pure(
            p, r, pidf.astype(jnp.int32), with_collisions
        )

    _, vjp = jax.vjp(core, pos, rot)
    gp, gr = vjp(g)
    return gp, gr, jnp.zeros_like(pidf)


fused_geometry.defvjp(_fwd, _bwd)
