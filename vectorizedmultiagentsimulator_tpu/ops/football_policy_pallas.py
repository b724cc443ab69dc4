"""Fused Pallas kernel for football's scripted-AI position planner.

The stacked ``AgentPolicy._check_better_positions_all`` pipeline
(reference football.py:1871-1915 ``check_better_positions`` /
``get_pos_value``) evaluates S+1 candidate targets per teammate per step:
candidate building (ball-/agent-centred normal samples + the current
target), pitch clamping, and a 5-term value function (ball proximity,
shooting-side and defend dot products, teammate repulsion, wall
repulsion).  In jnp at B=30k this is ~26% of the football step — a chain
of [B, T, S+1, T'] / [B, T, S+1, 2, 2] broadcast-subtract / norm / exp
fusions whose tiny minor dims tile poorly and bounce every intermediate
through VMEM writes (xprof: the 6 largest fusions of the step after the
physics kernel all live on football.py:1513-1555).

Here the whole planner runs as ONE VMEM-resident kernel with the env
batch on lanes: inputs are transposed to [rows, B] (rows = stacked
team/component planes, full-height blocks), every intermediate is a
[T, TB] vreg tile, and the first-max candidate fold happens in
registers.  The sample draw stays OUTSIDE the kernel (one
``jax.random.normal`` per step, exactly the jnp path's key sequence), so
the kernel is deterministic given its operands and A/B-able against the
jnp mirror; enabling/disabling it never changes which random numbers are
consumed.

Differentiation: forward runs the kernel, backward replays the jnp
mirror under ``jax.vjp`` (same pattern as
``road_geometry_pallas.fused_neighbor_obs``).  The reference never
differentiates through the scripted AI (football is excluded from its
grad tests, tests/test_vmas.py:281-285), so the backward exists for API
completeness, not parity.

Sharding: wrapped in ``custom_partitioning`` with a batch-dim rule so a
GSPMD-sharded step keeps zero collectives.

Disable with ``VMT_PALLAS_POLICY=0``.
"""
import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 512  # env-block lane width


def policy_enabled() -> bool:
    flag = os.environ.get("VMT_PALLAS_POLICY")
    if flag is not None:
        return flag != "0"
    if os.environ.get("VMT_PALLAS_INTERPRET") == "1":
        return True  # interpret mode: exercised in CPU tests
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


class PlannerParams(NamedTuple):
    """Static planner configuration (hashable: used as nondiff arg)."""

    T: int  # teammates
    S: int  # nsamples
    clamp_y: float  # pitch_width/2 - agent_size
    clamp_x: float  # pitch_length/2 - agent_size
    goal_y: float  # goal_size/2 - agent_size
    goal_x: float  # goal_depth
    wall_w2: float  # pitch_width/2
    wall_l2: float  # pitch_length/2
    margin0: float  # replan_margin + 3*(1 - decision_strength)
    has_noise: bool  # decision_strength != 1 -> value-noise operand


# ------------------------------------------------------------------ #
# jnp mirror — reproduces the scenario's original inline chain
# op-for-op (football.py _check_better_positions_all /
# _get_pos_value_all before this kernel existed).  Used as the CPU /
# disabled fallback and as the custom-VJP backward.
# ------------------------------------------------------------------ #
def best_positions_jnp(
    p: PlannerParams,
    agents_pos,
    curr_target,
    samples,
    ball_pos,
    target_net_pos,
    own_net_pos,
    value_noise=None,
):
    """agents_pos [B,T,2], curr_target [B,T,2], samples [B,T,S,2]
    (already scaled by sigma * (1 + 3*(1-decision_strength))),
    ball/net positions [B,2], value_noise [B,T,S+1] or None
    -> best candidate positions [B,T,2]."""
    T, S = p.T, p.S
    samples = samples.at[:, :, ::2].add(ball_pos[:, None, None])
    samples = samples.at[:, :, 1::2].add(agents_pos[:, :, None])
    test_pos = jnp.concatenate(
        [curr_target[:, :, None, :], samples], axis=2
    )  # [B, T, S+1, 2]

    # clamp_pos (football.py:1770-1787)
    new_y = jnp.clip(test_pos[..., 1], -p.clamp_y, p.clamp_y)
    inside_goal_y = jnp.abs(new_y) < p.goal_y
    new_x = jnp.where(
        inside_goal_y,
        jnp.clip(test_pos[..., 0], -p.clamp_x - p.goal_x, p.clamp_x + p.goal_x),
        jnp.clip(test_pos[..., 0], -p.clamp_x, p.clamp_x),
    )
    pos = jnp.stack([new_x, new_y], axis=-1)  # [B, T, S+1, 2]

    # get_pos_value (football.py:1888-1915)
    ball = ball_pos[:, None, None]
    tnet = target_net_pos[:, None, None]
    onet = own_net_pos[:, None, None]
    ball_vec = ball - pos
    ball_norm = jnp.linalg.norm(ball_vec, axis=-1, keepdims=True)
    ball_vec = jnp.where(
        ball_norm > 0, ball_vec / jnp.maximum(ball_norm, 1e-12), 0.0
    )
    ball_dist = jnp.linalg.norm(pos - ball, axis=-1)
    ball_dist_value = jnp.exp(-2 * ball_dist**4)

    net_vec = tnet - pos
    net_norm = jnp.maximum(
        jnp.linalg.norm(net_vec, axis=-1, keepdims=True), 1e-12
    )
    net_vec = net_vec / net_norm
    side_dot_prod = jnp.sum(ball_vec * net_vec, axis=-1)
    side_value = jnp.minimum(side_dot_prod + 1.25, 1.0)

    own_net_vec = (onet - pos) / net_norm
    defend_dot_prod = jnp.sum(ball_vec * -own_net_vec, axis=-1)
    defend_value = jnp.maximum(defend_dot_prod, 0.0)

    if T > 1:
        team_dists = jnp.linalg.norm(
            agents_pos[:, None, None] - pos[..., None, :], axis=-1
        )  # [B, T, S+1, T']
        not_self = 1.0 - jnp.eye(T, dtype=jnp.float32)
        other_agent_value = (
            -jnp.linalg.norm(
                jnp.exp(-5 * team_dists) * not_self[None, :, None, :],
                axis=-1,
            )
            + 1
        )
    else:
        other_agent_value = 0.0

    # get_wall_separations (football.py:1920-1940), kept in the original
    # stacked-displacement form so this mirror is op-for-op identical to
    # the scenario's pre-kernel inline chain (the kernel uses the
    # algebraically-collapsed |mag| form; the two differ only in ulps).
    top = -pos[..., 1] + p.wall_w2
    bottom = pos[..., 1] + p.wall_w2
    left = pos[..., 0] + p.wall_l2
    right = -pos[..., 0] + p.wall_l2
    vmag = jnp.minimum(top, bottom)
    vsign = jnp.where(bottom < top, -1.0, 1.0)
    vdisp = jnp.stack([jnp.zeros_like(vmag), vmag * vsign], axis=-1)
    hmag = jnp.minimum(left, right)
    hsign = jnp.where(left < right, -1.0, 1.0)
    hdisp = jnp.stack([hmag * hsign, jnp.zeros_like(hmag)], axis=-1)
    wall_disps = jnp.stack([vdisp, hdisp], axis=-2)
    wall_dists = jnp.linalg.norm(wall_disps, axis=-1)
    wall_value = -jnp.linalg.norm(jnp.exp(-8 * wall_dists), axis=-1) + 1

    values = (
        wall_value
        + other_agent_value
        + ball_dist_value
        + side_value
        + defend_value
    ) / 5
    if p.has_noise:
        values = values + value_noise
    values = values.at[:, :, 0].add(p.margin0)

    # First-max where-fold over candidates (same tie rule as the
    # scenario's original fold: strictly-greater keeps the earliest).
    best_pos = pos[:, :, 0]
    best_val = values[:, :, 0]
    for k in range(1, S + 1):
        better = (values[:, :, k] > best_val)[..., None]
        best_pos = jnp.where(better, pos[:, :, k], best_pos)
        best_val = jnp.maximum(best_val, values[:, :, k])
    return best_pos


# ------------------------------------------------------------------ #
# Pallas kernel
# ------------------------------------------------------------------ #
def _make_kernel(p: PlannerParams):
    T, S = p.T, p.S

    def kernel(*refs):
        if p.has_noise:
            (ap, ct, smp, ball, tn, on, vn, out) = refs
        else:
            (ap, ct, smp, ball, tn, on, out) = refs
            vn = None
        AX = ap[0:T, :]  # [T, TB]
        AY = ap[T : 2 * T, :]
        BX = ball[0:1, :]  # [1, TB]
        BY = ball[1:2, :]
        TNX = tn[0:1, :]
        TNY = tn[1:2, :]
        ONX = on[0:1, :]
        ONY = on[1:2, :]

        best_px = best_py = best_val = None
        for s in range(S + 1):
            if s == 0:
                rpx = ct[0:T, :]
                rpy = ct[T : 2 * T, :]
            else:
                j = s - 1
                sx = smp[(2 * j) * T : (2 * j + 1) * T, :]
                sy = smp[(2 * j + 1) * T : (2 * j + 2) * T, :]
                if j % 2 == 0:  # ball-centred sample
                    rpx, rpy = BX + sx, BY + sy
                else:  # agent-centred sample
                    rpx, rpy = AX + sx, AY + sy

            # clamp_pos
            py = jnp.clip(rpy, -p.clamp_y, p.clamp_y)
            inside_goal = jnp.abs(py) < p.goal_y
            px = jnp.where(
                inside_goal,
                jnp.clip(rpx, -p.clamp_x - p.goal_x, p.clamp_x + p.goal_x),
                jnp.clip(rpx, -p.clamp_x, p.clamp_x),
            )

            # ball proximity + direction
            bvx = BX - px
            bvy = BY - py
            bn = jnp.sqrt(bvx * bvx + bvy * bvy)
            pos_vld = bn > 0
            bden = jnp.maximum(bn, 1e-12)
            bhx = jnp.where(pos_vld, bvx / bden, 0.0)
            bhy = jnp.where(pos_vld, bvy / bden, 0.0)
            ball_dist_value = jnp.exp(-2 * bn**4)

            # shooting-side / defend terms
            nvx = TNX - px
            nvy = TNY - py
            nn = jnp.maximum(jnp.sqrt(nvx * nvx + nvy * nvy), 1e-12)
            nhx = nvx / nn
            nhy = nvy / nn
            side_value = jnp.minimum(bhx * nhx + bhy * nhy + 1.25, 1.0)
            ovx = (ONX - px) / nn
            ovy = (ONY - py) / nn
            defend_value = jnp.maximum(bhx * -ovx + bhy * -ovy, 0.0)

            # teammate repulsion: sqrt(sum_j (exp(-5 d_j) * not_self)^2)
            if T > 1:
                acc = jnp.zeros_like(px)
                iota_T = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
                for tp in range(T):
                    dx = px - AX[tp : tp + 1, :]
                    dy = py - AY[tp : tp + 1, :]
                    e = jnp.exp(-5 * jnp.sqrt(dx * dx + dy * dy))
                    e = jnp.where(iota_T == tp, 0.0, e)
                    acc = acc + e * e
                other_agent_value = -jnp.sqrt(acc) + 1
            else:
                other_agent_value = 0.0

            # wall repulsion
            vmag = jnp.abs(jnp.minimum(-py + p.wall_w2, py + p.wall_w2))
            hmag = jnp.abs(jnp.minimum(px + p.wall_l2, -px + p.wall_l2))
            ev = jnp.exp(-8 * vmag)
            eh = jnp.exp(-8 * hmag)
            wall_value = -jnp.sqrt(ev * ev + eh * eh) + 1

            value = (
                wall_value
                + other_agent_value
                + ball_dist_value
                + side_value
                + defend_value
            ) / 5
            if p.has_noise:
                value = value + vn[s * T : (s + 1) * T, :]
            if s == 0:
                value = value + p.margin0
                best_px, best_py, best_val = px, py, value
            else:
                better = value > best_val
                best_px = jnp.where(better, px, best_px)
                best_py = jnp.where(better, py, best_py)
                best_val = jnp.maximum(best_val, value)

        out[0:T, :] = best_px
        out[T : 2 * T, :] = best_py

    return kernel


def _forward(
    p: PlannerParams,
    agents_pos,
    curr_target,
    samples,
    ball_pos,
    target_net_pos,
    own_net_pos,
    value_noise=None,
):
    B, T = agents_pos.shape[:2]
    S = p.S
    interpret = os.environ.get("VMT_PALLAS_INTERPRET") == "1"

    # [rows, B] transposes: component-major so the kernel slices
    # contiguous [T, TB] planes (Mosaic has no strided vector loads).
    ap_t = jnp.transpose(agents_pos, (2, 1, 0)).reshape(2 * T, B)
    ct_t = jnp.transpose(curr_target, (2, 1, 0)).reshape(2 * T, B)
    smp_t = jnp.transpose(samples, (2, 3, 1, 0)).reshape(S * 2 * T, B)
    ball_t = jnp.transpose(ball_pos, (1, 0))
    tn_t = jnp.transpose(target_net_pos, (1, 0))
    on_t = jnp.transpose(own_net_pos, (1, 0))

    def spec(height):
        return pl.BlockSpec(
            (height, _TB), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    ins = [ap_t, ct_t, smp_t, ball_t, tn_t, on_t]
    in_specs = [spec(2 * T), spec(2 * T), spec(S * 2 * T), spec(2),
                spec(2), spec(2)]
    if p.has_noise:
        vn_t = jnp.transpose(value_noise, (2, 1, 0)).reshape((S + 1) * T, B)
        ins.append(vn_t)
        in_specs.append(spec((S + 1) * T))

    out = pl.pallas_call(
        _make_kernel(p),
        grid=(pl.cdiv(B, _TB),),
        in_specs=in_specs,
        out_specs=spec(2 * T),
        out_shape=jax.ShapeDtypeStruct((2 * T, B), jnp.float32),
        interpret=interpret,
    )(*ins)
    return jnp.transpose(out.reshape(2, T, B), (2, 1, 0))


def _partitioned(p: PlannerParams):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def fwd(*args):
        return _forward(p, *args)

    def _batch_only(sharding, ndim):
        spec = getattr(sharding, "spec", None)
        b = spec[0] if spec is not None and len(spec) else None
        return NamedSharding(
            sharding.mesh, PartitionSpec(b, *([None] * (ndim - 1)))
        )

    def infer(mesh, arg_shapes, result_shape):
        return _batch_only(arg_shapes[0].sharding, result_shape.ndim)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(
            _batch_only(a.sharding, a.ndim) for a in arg_shapes
        )
        result_sharding = _batch_only(
            arg_shapes[0].sharding, result_shape.ndim
        )

        def lower_fn(*args):
            return _forward(p, *args)

        return mesh, lower_fn, result_sharding, arg_shardings

    rule_in = "b t i, b t2 i2, b t3 s i3, b i4, b i5, b i6"
    if p.has_noise:
        rule_in += ", b t4 s2"
    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule_in + " -> b t5 i7",
    )
    return fwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_best_positions(
    p: PlannerParams,
    agents_pos,
    curr_target,
    samples,
    ball_pos,
    target_net_pos,
    own_net_pos,
    value_noise,
):
    """Pallas-fused scripted-AI candidate planner: [B,T,2] best target
    positions.  ``value_noise`` must be None iff ``not p.has_noise``
    (asserted at trace time).

    Gradient caveat (API completeness only — the reference never
    differentiates the scripted AI, tests/test_vmas.py:281-285): the
    backward pass replays the jnp mirror, whose wall-distance form differs
    from the kernel's collapsed |mag| form at the ulp level; on rows where
    two candidate values tie to within ulps the mirror can pick a
    different argmax candidate, so the gradient then corresponds to that
    other candidate, silently.  Exact-tie rows are measure-zero under the
    uniform candidate sampling."""
    assert (value_noise is None) == (not p.has_noise), (
        "fused_best_positions: value_noise must be provided iff "
        f"p.has_noise (has_noise={p.has_noise}, "
        f"value_noise={'None' if value_noise is None else 'array'})"
    )
    cache = fused_best_positions.__dict__.setdefault("_cache", {})
    fwd = cache.get(p)
    if fwd is None:
        fwd = _partitioned(p)
        cache[p] = fwd
    args = (agents_pos, curr_target, samples, ball_pos, target_net_pos,
            own_net_pos)
    if p.has_noise:
        args = args + (value_noise,)
    return fwd(*args)


def _fbp_fwd(p, agents_pos, curr_target, samples, ball, tn, on, vn):
    out = fused_best_positions(p, agents_pos, curr_target, samples, ball,
                               tn, on, vn)
    return out, (agents_pos, curr_target, samples, ball, tn, on, vn)


def _fbp_bwd(p, residuals, g):
    agents_pos, curr_target, samples, ball, tn, on, vn = residuals
    if p.has_noise:
        _, vjp = jax.vjp(
            lambda a, c, s, b, t, o, v: best_positions_jnp(
                p, a, c, s, b, t, o, v
            ),
            agents_pos, curr_target, samples, ball, tn, on, vn,
        )
        return vjp(g)
    _, vjp = jax.vjp(
        lambda a, c, s, b, t, o: best_positions_jnp(
            p, a, c, s, b, t, o, None
        ),
        agents_pos, curr_target, samples, ball, tn, on,
    )
    return vjp(g) + (None,)


fused_best_positions.defvjp(_fbp_fwd, _fbp_bwd)


def planner_params(policy) -> PlannerParams:
    """Build the static planner config from a live AgentPolicy."""
    world = policy.world
    ds = policy.decision_strength
    return PlannerParams(
        T=len(policy.teammates),
        S=int(policy.nsamples),
        clamp_y=float(world.pitch_width / 2 - world.agent_size),
        clamp_x=float(world.pitch_length / 2 - world.agent_size),
        goal_y=float(world.goal_size / 2 - world.agent_size),
        goal_x=float(world.goal_depth),
        wall_w2=float(world.pitch_width / 2),
        wall_l2=float(world.pitch_length / 2),
        margin0=float(policy.replan_margin + 3 * (1 - ds)),
        has_noise=bool(ds != 1),
    )
