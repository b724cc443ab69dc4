"""Fused Pallas TPU kernel for the PPO minibatch update (examples/jax_ppo).

Net-new vs the reference (VMAS trains through external torch stacks,
/root/reference/vmas/examples/rllib.py); this is the TPU-native answer to
the profile of the pure-XLA update phase, which showed three structural
costs at 786k samples/iter:

1. per-minibatch thin-column extracts from the shuffled ``[mb, D]``
   packed array (scalar logp/adv/ret rows) forcing sublane->1D relayouts
   at ~1% of HBM bandwidth;
2. every Dense activation made a full HBM round trip between forward and
   backward;
3. a separate HBM-materialized shuffle gather per epoch.

The kernel runs the WHOLE minibatch step — actor-critic forward, PPO
loss, and the hand-derived backward — in one VMEM-resident program:

- The rollout is packed once per iteration into a FEATURE-MAJOR
  ``[D, n]`` f32 array (rows: obs | action | logp | adv | ret | mask),
  so every field is a free row slice in VMEM and the sample axis rides
  the lanes.
- The epoch shuffle costs nothing: a scalar-prefetch permutation
  (``pltpu.PrefetchScalarGridSpec``) drives the input ``index_map``, so
  each grid step DMAs its ``[D, LB]`` sample block directly from the
  permuted position — samples stream HBM->VMEM exactly once per epoch,
  already shuffled.
- Trunk matmuls run bf16->f32 on the MXU (mirroring the example's
  ``trunk_dtype='bfloat16'`` flax path); heads and all loss math stay
  f32.
- Parameter gradients and loss sums accumulate in the (revisited) f32
  output blocks across the sequential grid.

Shuffle granularity: the permutation moves ``LB``-sample blocks.  Sample
order in ``n`` is ``(t, agent, env)`` with env fastest, so a block spans
``LB`` consecutive (independent) envs sharing ``(t, agent)`` — the same
argument as the example's G-block shuffle, at coarser G.  Minibatches
then draw ``mb/LB`` blocks i.i.d. from the ``n/LB`` pool.

Gradient semantics are those of ``jax.grad`` of the example's
``loss_fn`` (clip/min subgradients via ``<=`` tie-breaks; the advantage
normalization uses minibatch stats passed in as ``(mean, inv_std)``,
computed by the caller from per-block sums).  ``reference_minibatch``
in this module is the jnp mirror used by the tests.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = float(np.log(2.0 * np.pi))
_ENT_C = float(0.5 * np.log(2.0 * np.pi) + 0.5)  # per-dim Gaussian ent.


class PPOUpdateSpec(NamedTuple):
    """Static shape/hyper config of the fused update.

    ``n_logits == 0`` is the continuous (Gaussian) mode: ``act_w``-wide
    actions, multiplicative per-dim action mask.  ``n_logits > 0`` is the
    factored-categorical mode: the policy is a product of ``act_w``
    independent categoricals of ``n_logits`` choices each (flat Discrete
    is ``act_w == 1``; MultiDiscrete stores one index per dim).  The
    action rows store the chosen indices as f32 and the mask rows hold
    the ADDITIVE ``act_w * n_logits``-wide logits mask (0 on an agent's
    real choices, -1e9 on padding; a fully-padded dim keeps choice 0
    valid so it contributes 0 to both logp and entropy), mirroring
    examples/jax_ppo.py's categorical head.
    """

    obs_d: int  # observation row count (incl. one-hot agent id)
    act_w: int  # action width (padded to the widest agent)
    hidden: int
    lb: int  # lanes (samples) per grid block == shuffle granularity
    mb: int  # samples per minibatch (LOCAL, on this device/shard)
    clip_eps: float
    vf_coef: float
    ent_coef: float
    n_logits: int = 0  # categorical head width; 0 = continuous mode
    # Mean-normalization count.  0 -> mb (single device).  Under data
    # parallelism each shard's kernel sees its local mb samples but the
    # loss is the mean over the GLOBAL minibatch: set norm_n to the
    # global size so per-sample gradients carry 1/norm_n and a psum of
    # shard gradients is exactly the global-mean gradient.
    norm_n: int = 0

    @property
    def norm(self) -> int:
        return self.norm_n if self.norm_n else self.mb

    @property
    def discrete(self) -> bool:
        return self.n_logits > 0

    @property
    def mask_w(self) -> int:
        return self.act_w * self.n_logits if self.discrete else self.act_w

    @property
    def d(self) -> int:  # packed row count
        return self.obs_d + self.act_w + 3 + self.mask_w


def pack_rows(spec: PPOUpdateSpec):
    """Row offsets of each field in the packed [D, n] array."""
    od, aw = spec.obs_d, spec.act_w
    return {
        "obs": (0, od),
        "action": (od, od + aw),
        "logp": (od + aw, od + aw + 1),
        "adv": (od + aw + 1, od + aw + 2),
        "ret": (od + aw + 2, od + aw + 3),
        "mask": (od + aw + 3, od + aw + 3 + spec.mask_w),
    }


def _interpret() -> bool:
    return os.environ.get("VMT_PALLAS_INTERPRET") == "1"


def available() -> bool:
    if _interpret():
        return True
    return jax.default_backend() == "tpu"


def _fwd_math(spec, params, obs, act, logp_old, adv_n, ret, mask):
    """Forward pass + per-sample loss pieces, feature-major.

    All arrays are [rows, lanes]; trunk dots bf16 with f32 accumulation,
    everything else f32.  Shared verbatim by the kernel body and the jnp
    reference (same ops -> near-bitwise agreement in interpret mode).
    """
    (W1, b1, W2, b2, Wm, bm, ls, Wv, bv, Wv2, bv2) = params
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=f32
    )
    c_in = (((0,), (0,)), ((), ()))  # contract both dim-0s

    obs_b = obs.astype(bf16)
    z1 = dot(W1.astype(bf16), obs_b, c_in) + b1  # [H, LB]
    h1 = jnp.tanh(z1)
    z2 = dot(W2.astype(bf16), h1.astype(bf16), c_in) + b2
    h2 = jnp.tanh(z2)
    mean = dot(Wm, h2, c_in) + bm  # [aw, LB] f32 head
    zv = dot(Wv.astype(bf16), obs_b, c_in) + bv
    hv = jnp.tanh(zv)
    value = dot(Wv2, hv, c_in) + bv2  # [1, LB]

    if spec.discrete:
        # ``mean`` is the [act_w * n_logits, LB] factored-categorical
        # head (act_w independent distributions of n_logits choices);
        # ``mask`` the additive logits mask; ``act`` the [act_w, LB]
        # chosen indices (f32).  Static python loop over the (small)
        # dim count; each dim is a full softmax over its row group.
        nl = spec.n_logits
        logp = jnp.zeros_like(logp_old)
        ent_i = jnp.zeros_like(logp_old)
        dims = []
        for k in range(spec.act_w):
            logits = mean[k * nl:(k + 1) * nl] + mask[k * nl:(k + 1) * nl]
            mx = jnp.max(logits, axis=0, keepdims=True)
            ex = jnp.exp(logits - mx)
            z = jnp.sum(ex, axis=0, keepdims=True)
            probs = ex / z
            logp_all = logits - (jnp.log(z) + mx)  # log_softmax
            idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            onehot = (
                idx == act[k:k + 1].astype(jnp.int32)
            ).astype(f32)
            logp = logp + jnp.sum(onehot * logp_all, axis=0,
                                  keepdims=True)
            # Padded choices: probs == 0 exactly (exp underflows at
            # -1e9), so 0 * finite logp_all adds nothing to entropy.
            ent_k = -jnp.sum(probs * logp_all, axis=0, keepdims=True)
            ent_i = ent_i + ent_k
            dims.append((probs, logp_all, onehot, ent_k))
        var = diff = None
        extra = tuple(dims)
    else:
        var = jnp.exp(2.0 * ls)  # [aw, 1]
        diff = act - mean
        contrib = -0.5 * diff * diff / var - ls - 0.5 * _LOG_2PI
        logp = jnp.sum(mask * contrib, axis=0, keepdims=True)  # [1, LB]
        ent_i = jnp.sum(mask * (ls + _ENT_C), axis=0, keepdims=True)
        extra = None
    ratio = jnp.exp(logp - logp_old)
    rclip = jnp.clip(ratio, 1.0 - spec.clip_eps, 1.0 + spec.clip_eps)
    t1 = ratio * adv_n
    t2 = rclip * adv_n
    pg_i = jnp.minimum(t1, t2)  # pg loss = -mean(pg_i)
    vf_i = 0.5 * (value - ret) ** 2
    return (h1, h2, hv, mean, value, var, diff, ratio, t1, t2, extra,
            pg_i, vf_i, ent_i)


def _bwd_math(spec, params, obs, adv_n, ret, mask, fwd):
    """Hand-derived backward of ``loss = -mean(pg_i) + vf_coef*mean(vf_i)
    - ent_coef*mean(ent_i)`` wrt every parameter.  Matches ``jax.grad``
    of the same forward (minimum/clip subgradients via ``<=`` / interval
    membership)."""
    (W1, b1, W2, b2, Wm, bm, ls, Wv, bv, Wv2, bv2) = params
    (h1, h2, hv, mean, value, var, diff, ratio, t1, t2, extra,
     pg_i, vf_i, ent_i) = fwd
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=f32
    )
    c_lanes = (((1,), (1,)), ((), ()))  # contract the lane (sample) dim
    inv_mb = 1.0 / spec.norm

    # d loss / d logp  (through pg only)
    sel = (t1 <= t2).astype(f32)
    inside = (
        (ratio >= 1.0 - spec.clip_eps) & (ratio <= 1.0 + spec.clip_eps)
    ).astype(f32)
    dratio = -inv_mb * adv_n * (sel + (1.0 - sel) * inside)
    dlogp = dratio * ratio  # [1, LB]

    if spec.discrete:
        # Per dim k: pg has d logp_sel / d logits_k = onehot_k - p_k;
        # the entropy term (loss has -ent_coef*mean(sum_k H_k)) has
        # dH_k/dlogits_k = -p_k*(logp_all_k + H_k) — note the PER-DIM
        # entropy H_k, not the total — contributing
        # +ent_coef/mb * p_k*(logp_all_k + H_k).
        dmean = jnp.concatenate(
            [
                dlogp * (onehot - probs)
                + (spec.ent_coef * inv_mb) * probs * (logp_all + ent_k)
                for (probs, logp_all, onehot, ent_k) in extra
            ],
            axis=0,
        )  # [act_w * n_logits, LB]
        dls = jnp.zeros_like(ls)  # log_std unused by the discrete head
    else:
        dmean = dlogp * mask * diff / var  # [aw, LB]
        dls = (
            jnp.sum(dlogp * mask * (diff * diff / var - 1.0), axis=1,
                    keepdims=True)
            - spec.ent_coef * inv_mb
            * jnp.sum(mask, axis=1, keepdims=True)
        )  # [aw, 1]
    dvalue = spec.vf_coef * inv_mb * (value - ret)  # [1, LB]

    # mean head (f32)
    c_head = (((1,), (0,)), ((), ()))  # W [in,out]: contract out w/ dY
    dh2 = dot(Wm, dmean, c_head)  # [H, LB]
    dWm = dot(h2, dmean, c_lanes)  # [H, aw]
    dbm = jnp.sum(dmean, axis=1, keepdims=True)
    dz2 = dh2 * (1.0 - h2 * h2)
    dW2 = dot(h1.astype(bf16), dz2.astype(bf16), c_lanes)  # [H, H]
    db2 = jnp.sum(dz2, axis=1, keepdims=True)
    dh1 = dot(W2.astype(bf16), dz2.astype(bf16), c_head)
    dz1 = dh1 * (1.0 - h1 * h1)
    dW1 = dot(obs.astype(bf16), dz1.astype(bf16), c_lanes)  # [od, H]
    db1 = jnp.sum(dz1, axis=1, keepdims=True)
    # value branch
    dhv = dot(Wv2, dvalue, c_head)  # [H, LB]
    dzv = dhv * (1.0 - hv * hv)
    dWv = dot(obs.astype(bf16), dzv.astype(bf16), c_lanes)
    dbv = jnp.sum(dzv, axis=1, keepdims=True)
    dWv2 = dot(hv, dvalue, c_lanes)  # [H, 1]
    dbv2 = jnp.sum(dvalue, axis=1, keepdims=True)
    return (dW1, db1, dW2, db2, dWm, dbm, dls, dWv, dbv, dWv2, dbv2)


def _slice_fields(spec: PPOUpdateSpec, x, mean_adv, inv_std):
    rows = pack_rows(spec)

    def row(name):
        a, b = rows[name]
        return x[a:b, :]

    obs = row("obs")
    act = row("action")
    logp_old = row("logp")
    adv_n = (row("adv") - mean_adv) * inv_std
    ret = row("ret")
    mask = row("mask")
    return obs, act, logp_old, adv_n, ret, mask


def _kernel(spec: PPOUpdateSpec, perm_ref, stats_ref, x_ref, *refs):
    params = tuple(refs[:11])
    outs = refs[11:]
    b = pl.program_id(0)

    p = tuple(r[...] for r in params)
    mean_adv = stats_ref[0]
    inv_std = stats_ref[1]
    x = x_ref[...]  # [D, LB] f32
    obs, act, logp_old, adv_n, ret, mask = _slice_fields(
        spec, x, mean_adv, inv_std
    )
    fwd = _fwd_math(spec, p, obs, act, logp_old, adv_n, ret, mask)
    grads = _bwd_math(spec, p, obs, adv_n, ret, mask, fwd)
    pg_i, vf_i, ent_i = fwd[-3], fwd[-2], fwd[-1]
    sums = (
        jnp.sum(pg_i, keepdims=True).reshape(1, 1),
        jnp.sum(vf_i, keepdims=True).reshape(1, 1),
        jnp.sum(ent_i, keepdims=True).reshape(1, 1),
    )
    vals = grads + sums

    @pl.when(b == 0)
    def _init():
        for o, v in zip(outs, vals):
            o[...] = v

    @pl.when(b != 0)
    def _acc():
        for o, v in zip(outs, vals):
            o[...] = o[...] + v


def minibatch_update(
    spec: PPOUpdateSpec,
    packed_fm,  # f32 [D, n] feature-major packed rollout
    perm_mb,  # int32 [mb // LB] global block indices for this minibatch
    adv_stats,  # f32 [2]: (minibatch adv mean, 1/(std+1e-8))
    params: Tuple,  # (W1,b1,W2,b2,Wm,bm,log_std,Wv,bv,Wv2,bv2),
    # weights [in,out] f32, biases/log_std as column vectors
) -> Tuple[Tuple, Tuple]:
    """Gradients + loss sums for one PPO minibatch.

    Returns ``(grads, (pg_sum, vf_sum, ent_sum))`` where ``grads``
    mirrors ``params`` and the caller combines the scalars as
    ``loss = -pg/mb + vf_coef*vf/mb - ent_coef*ent/mb``.
    """
    D, n = packed_fm.shape
    assert D == spec.d, (D, spec.d)
    nb = spec.mb // spec.lb
    assert perm_mb.shape == (nb,)
    H, aw, od = spec.hidden, spec.act_w, spec.obs_d

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda b, p_, s_, _nd=nd: (0,) * _nd
        )

    in_specs = [
        pl.BlockSpec((D, spec.lb), lambda b, p_, s_: (0, p_[b])),
    ] + [const_spec(p.shape) for p in params]

    out_shapes = [
        jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params
    ] + [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 3
    out_specs = [const_spec(s.shape) for s in out_shapes]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, spec),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(perm_mb.astype(jnp.int32), adv_stats.astype(jnp.float32),
      packed_fm, *params)
    return tuple(out[:11]), tuple(x[0, 0] for x in out[11:])


def reference_minibatch(spec, packed_fm, perm_mb, adv_stats, params):
    """jnp mirror of the kernel (same casts/ops, jax.grad backward) —
    the tests' ground truth for the hand-derived gradients."""
    lb = spec.lb
    blocks = packed_fm.reshape(spec.d, -1, lb)
    x = blocks[:, perm_mb, :].reshape(spec.d, -1)  # [D, mb]

    def loss(params):
        obs, act, logp_old, adv_n, ret, mask = _slice_fields(
            spec, x, adv_stats[0], adv_stats[1]
        )
        fwd = _fwd_math(
            spec, params, obs, act, logp_old, adv_n, ret, mask
        )
        pg_i, vf_i, ent_i = fwd[-3], fwd[-2], fwd[-1]
        loss = (
            -jnp.sum(pg_i) / spec.norm
            + spec.vf_coef * jnp.sum(vf_i) / spec.norm
            - spec.ent_coef * jnp.sum(ent_i) / spec.norm
        )
        return loss, (jnp.sum(pg_i), jnp.sum(vf_i), jnp.sum(ent_i))

    (_, sums), grads = jax.value_and_grad(loss, has_aux=True)(params)
    return grads, sums
