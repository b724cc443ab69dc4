"""End-to-end TPU-native PPO training on a vectorized scenario.

The reference trains through external torch stacks (RLlib example,
`/root/reference/vmas/examples/rllib.py`; TorchRL in its docs).  This
example shows the tpu-first equivalent: the WHOLE training iteration —
on-device `lax.scan` rollout with masked auto-resets, GAE, and every PPO
epoch/minibatch — compiles into ONE XLA program via the environment's
functional core (`env.step_fn` / `env.reset_at_fn` on the `WorldState`
pytree).  No host round-trips inside an iteration; multi-chip data
parallelism is one `jax.sharding` constraint away (see
`parallel/sharding.shard_environment`).

Agents share one actor-critic MLP; each agent's transition is a training
sample.  Heterogeneous scenarios (per-agent observation/action sizes,
e.g. the MPE adversary games) are handled by zero-padding observations to
the widest agent and appending a one-hot agent ID, with a per-agent
action-dimension mask so padded action dims carry no log-prob/entropy —
everything stays one stacked [A, B, ...] computation.  All three action
modes work: Gaussian for ``continuous_actions=True`` (the default), a
masked categorical head for flat ``continuous_actions=False``, and a
factored (per-dim) categorical head for ``multidiscrete_actions=True``.

Run:  python -m vectorizedmultiagentsimulator_tpu.examples.jax_ppo \
          [scenario] [num_envs] [iterations]
"""
from __future__ import annotations

import functools
import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    import optax
except ImportError:  # pragma: no cover
    nn = optax = None

import vectorizedmultiagentsimulator_tpu as vmt


class PPOConfig(NamedTuple):
    rollout_steps: int = 64
    epochs: int = 4
    minibatches: int = 4
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 0.5
    hidden: int = 64
    # Computation dtype for the TRUNK Dense layers (params stay f32;
    # the mean/value/log-prob heads always compute in f32).  bfloat16
    # halves both the MXU time of the small-K trunk matmuls (the
    # dominant cost of the update phase on TPU) and their activation
    # HBM traffic.  On the XLA update path rollout and update reuse
    # model.apply, so the PPO ratio compares log-probs computed under
    # identical precision.  The fused Pallas kernel accumulates its
    # dots to f32 and runs bias/tanh in f32, so at identical params its
    # logp differs from the stored logp_old by ~bf16 eps — the epoch-0
    # ratio is 1 + O(1e-3) rather than exactly 1 (a bounded, slightly
    # MORE accurate forward; well inside clip_eps).
    trunk_dtype: str = "bfloat16"
    # Fused Pallas minibatch update (ops/ppo_update_pallas.py): forward,
    # loss, and hand-derived backward in one VMEM-resident kernel over a
    # feature-major packed rollout, with the epoch shuffle folded into
    # scalar-prefetch block indexing.  Covers continuous (Gaussian) and
    # discrete (categorical) modes.  Auto-falls back to the pure-XLA
    # path when unavailable (non-TPU backend without interpret mode, a
    # mesh, f32 trunk, or indivisible shapes).
    fused_update: bool = True
    fused_block: int = 4096  # samples per kernel block & shuffle unit


class ActorCritic(nn.Module if nn else object):
    """Shared-parameter actor-critic: obs -> (mean-or-logits, log_std,
    value).  In discrete mode the first head is read as categorical
    logits and log_std is unused.

    ``dtype`` is the trunk computation dtype (params are always f32,
    flax's default ``param_dtype``); the output heads compute in f32 so
    log-probs/values keep full precision."""

    action_dim: int
    hidden: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(self.dtype)
        for _ in range(2):
            x = nn.tanh(nn.Dense(self.hidden, dtype=self.dtype)(x))
        mean = nn.Dense(self.action_dim, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.action_dim,)
        )
        v = nn.tanh(nn.Dense(self.hidden, dtype=self.dtype)(obs.astype(self.dtype)))
        value = nn.Dense(1, dtype=jnp.float32)(v.astype(jnp.float32))[..., 0]
        return mean, log_std, value


def _gaussian_logp(mean, log_std, action, mask):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        (
            -0.5 * ((action - mean) ** 2 / var)
            - log_std
            - 0.5 * jnp.log(2 * jnp.pi)
        )
        * mask,
        axis=-1,
    )


def make_obs_padder(env):
    """Stack per-agent observations into one [A, B, Dmax + A] array:
    zero-pad each agent's obs to the widest and append a one-hot agent
    ID (so shared parameters can condition on the role)."""
    A = env.n_agents

    def pad(obs):
        dmax = max(o.shape[-1] for o in obs)
        rows = []
        for i, o in enumerate(obs):
            o = jnp.asarray(o, jnp.float32)
            one_hot = jnp.zeros(o.shape[:-1] + (A,), o.dtype)
            one_hot = one_hot.at[..., i].set(1.0)
            fill = jnp.zeros(o.shape[:-1] + (dmax - o.shape[-1],), o.dtype)
            rows.append(jnp.concatenate([o, fill, one_hot], axis=-1))
        return jnp.stack(rows)

    return pad


def make_train_step(env, cfg: PPOConfig, model, optimizer, mesh=None):
    """Build the fully-jitted training iteration.

    carry = (env_state, obs [A, B, D], params, opt_state, key)
    returns (carry, metrics)

    ``mesh``: pass the data-parallel mesh (if any).  The fused Pallas
    update then runs shard-local inside ``shard_map`` with psum-ed
    gradients/statistics (see ``_fused_epochs_sharded``); the pure-XLA
    path shards via GSPMD.
    """
    A = env.n_agents
    B = env.num_envs
    u_ranges = [
        jnp.asarray(a.action.u_range_tensor, jnp.float32)
        for a in env.agents
    ]
    discrete = not env.continuous_actions
    if discrete:
        # factored-categorical head: K independent distributions of up
        # to n_cats choices (flat Discrete is K=1; MultiDiscrete one
        # dim per nvec entry).  Additive -inf mask hides choices an
        # agent doesn't have; a dim an agent lacks keeps only choice 0
        # valid, so it samples 0 and contributes 0 to logp/entropy.
        if env.multidiscrete_actions:
            nvecs = [
                [int(x) for x in env.get_agent_action_space(a).nvec]
                for a in env.agents
            ]
        else:
            nvecs = [
                [env.get_agent_action_space(a).n] for a in env.agents
            ]
        K = max(len(v) for v in nvecs)
        n_cats = max(max(v) for v in nvecs)
        act_max = K * n_cats  # categorical head width
        act_mask3 = jnp.asarray(
            [
                [
                    [0.0] * (v[j] if j < len(v) else 1)
                    + [-1e9] * (n_cats - (v[j] if j < len(v) else 1))
                    for j in range(K)
                ]
                for v in nvecs
            ],
            jnp.float32,
        )  # [A, K, n_cats]
        act_mask = act_mask3.reshape(len(nvecs), act_max)
    else:
        # full per-agent action width: physical dims + communication dims
        act_dims = [env.get_agent_action_size(a) for a in env.agents]
        phys_dims = [a.action_size for a in env.agents]
        act_max = max(act_dims)
        # [A, act_max] mask: 1 on an agent's real action dims, 0 on pad
        act_mask = jnp.asarray(
            [[1.0] * d + [0.0] * (act_max - d) for d in act_dims],
            jnp.float32,
        )
    step_fn = env.step_fn
    reset_at_fn = env.reset_at_fn
    T = cfg.rollout_steps
    pad_obs = make_obs_padder(env)

    def policy_step(carry, _):
        state, obs, params, key = carry
        key, k_act = jax.random.split(key)
        mean, log_std, value = model.apply(params, obs)  # [A, B, ...]
        if discrete:
            logits = (
                mean.reshape(A, B, K, n_cats) + act_mask3[:, None]
            )
            action = jax.random.categorical(k_act, logits)  # [A, B, K]
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[..., None], axis=-1
            )[..., 0].sum(-1)  # [A, B]
            env_action = tuple(
                action[i][:, : len(nvecs[i])] for i in range(A)
            )
        else:
            noise = jax.random.normal(k_act, mean.shape)
            action = mean + jnp.exp(log_std) * noise
            logp = _gaussian_logp(mean, log_std, action, act_mask[:, None])
            env_action = tuple(
                jnp.concatenate(
                    [
                        jnp.clip(
                            action[i, :, : phys_dims[i]],
                            -u_ranges[i],
                            u_ranges[i],
                        ),
                        # communication dims live in [0, 1]
                        jnp.clip(
                            action[i, :, phys_dims[i] : act_dims[i]],
                            0.0,
                            1.0,
                        ),
                    ],
                    axis=-1,
                )
                for i in range(A)
            )
        state, (new_obs, rews, dones, _) = step_fn(state, env_action)
        # masked auto-reset of finished envs (kept inside the scan: the
        # whole rollout stays one XLA while-op, no host sync on dones)
        state, reset_outs = reset_at_fn(state, dones)
        reset_obs = reset_outs[0]
        new_obs = pad_obs(new_obs)
        reset_obs = pad_obs(reset_obs)
        new_obs = jnp.where(dones[None, :, None], reset_obs, new_obs)
        rews = jnp.stack(rews)  # [A, B]
        trans = {
            "obs": obs,
            "action": action,
            "logp": logp,
            "value": value,
            "rew": rews,
            "done": jnp.broadcast_to(dones, (A, B)),
        }
        return (state, new_obs, params, key), trans

    def compute_gae(traj, last_value):
        def body(carry, xs):
            gae, next_value = carry
            rew, done, value = xs
            not_done = 1 - done
            delta = rew + cfg.gamma * next_value * not_done - value
            gae = delta + cfg.gamma * cfg.gae_lambda * not_done * gae
            return (gae, value), gae

        (_, _), adv = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            (traj["rew"], traj["done"], traj["value"]),
            reverse=True,
        )
        return adv, adv + traj["value"]

    def loss_fn(params, batch):
        mean, log_std, value = model.apply(params, batch["obs"])
        if discrete:
            lg = jax.nn.log_softmax(
                mean.reshape(-1, K, n_cats)
                + batch["mask"].reshape(-1, K, n_cats)
            )
            logp = jnp.take_along_axis(
                lg, batch["action"][..., None], axis=-1
            )[..., 0].sum(-1)
            ent_term = (
                -jnp.sum(jnp.exp(lg) * lg, axis=-1).sum(-1).mean()
            )
        else:
            logp = _gaussian_logp(
                mean, log_std, batch["action"], batch["mask"]
            )
            ent_term = jnp.mean(
                jnp.sum(
                    (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
                    * batch["mask"],
                    -1,
                )
            )
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv,
        ).mean()
        vf = 0.5 * jnp.mean((value - batch["ret"]) ** 2)
        loss = pg + cfg.vf_coef * vf - cfg.ent_coef * ent_term
        return loss, {"pg_loss": pg, "vf_loss": vf, "entropy": ent_term}

    # ------------------------------------------------------------------
    # Fused Pallas minibatch update (ops/ppo_update_pallas.py).  Same
    # training semantics as the loss_fn path (bf16 trunk, minibatch adv
    # normalization, identical clip/min subgradients), one VMEM-resident
    # kernel per minibatch instead of ~20 XLA ops round-tripping HBM.
    # ------------------------------------------------------------------
    fused = cfg.fused_update and cfg.trunk_dtype == "bfloat16"
    if fused:
        from vectorizedmultiagentsimulator_tpu.ops import (
            ppo_update_pallas as pup,
        )

        fused = pup.available()

    def _params_tuple(params):
        p = params["params"]

        def col(v):
            return v[:, None]

        return (
            p["Dense_0"]["kernel"], col(p["Dense_0"]["bias"]),
            p["Dense_1"]["kernel"], col(p["Dense_1"]["bias"]),
            p["Dense_2"]["kernel"], col(p["Dense_2"]["bias"]),
            col(p["log_std"]),
            p["Dense_3"]["kernel"], col(p["Dense_3"]["bias"]),
            p["Dense_4"]["kernel"], col(p["Dense_4"]["bias"]),
        )

    def _grads_pytree(params, g):
        (dW1, db1, dW2, db2, dWm, dbm, dls, dWv, dbv, dWv2, dbv2) = g
        flat = {
            ("Dense_0", "kernel"): dW1, ("Dense_0", "bias"): db1[:, 0],
            ("Dense_1", "kernel"): dW2, ("Dense_1", "bias"): db2[:, 0],
            ("Dense_2", "kernel"): dWm, ("Dense_2", "bias"): dbm[:, 0],
            ("Dense_3", "kernel"): dWv, ("Dense_3", "bias"): dbv[:, 0],
            ("Dense_4", "kernel"): dWv2, ("Dense_4", "bias"): dbv2[:, 0],
            ("log_std",): dls[:, 0],
        }
        # Rebuild with the params pytree's own structure (dict or
        # FrozenDict) so optax tree ops line up.
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)
        out = []
        for path, _leaf in leaves_with_paths[0]:
            keys = tuple(
                k.key for k in path if hasattr(k, "key")
            )[1:]  # drop the leading "params" collection key
            out.append(flat[keys])
        return jax.tree_util.tree_unflatten(leaves_with_paths[1], out)

    def _fused_epochs(packed, traj, n, mb, lb, obs_d, act_w, carry,
                      k_perm):
        state, obs, params, opt_state, key = carry
        spec = pup.PPOUpdateSpec(
            obs_d=obs_d, act_w=act_w, hidden=cfg.hidden, lb=lb, mb=mb,
            clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
            ent_coef=cfg.ent_coef,
            n_logits=n_cats if discrete else 0,
        )
        packed_fm = packed.T  # [D, n] feature-major
        nb_tot = n // lb
        nbm = mb // lb
        # Per-block advantage sums: minibatch mean/std come from the
        # selected blocks' sums (the kernel receives them as scalars).
        adv_row = packed_fm[obs_d + act_w + 1].reshape(nb_tot, lb)
        bs = adv_row.sum(axis=1)
        bsq = (adv_row * adv_row).sum(axis=1)

        def epoch(carry2, k):
            params, opt_state = carry2
            perm = jax.random.permutation(k, nb_tot).astype(jnp.int32)

            def minibatch(carry3, i):
                params, opt_state = carry3
                pm = jax.lax.dynamic_slice_in_dim(perm, i * nbm, nbm)
                s = jnp.take(bs, pm).sum()
                sq = jnp.take(bsq, pm).sum()
                mean = s / mb
                var = jnp.maximum(sq / mb - mean * mean, 0.0)
                inv_std = 1.0 / (jnp.sqrt(var) + 1e-8)
                g, (pg, vf, ent) = pup.minibatch_update(
                    spec, packed_fm, pm, jnp.stack([mean, inv_std]),
                    _params_tuple(params),
                )
                grads = _grads_pytree(params, g)
                loss = (
                    -pg / mb
                    + cfg.vf_coef * vf / mb
                    - cfg.ent_coef * ent / mb
                )
                updates, opt_state = optimizer.update(
                    grads, opt_state, params
                )
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(cfg.minibatches),
            )
            return (params, opt_state), losses.mean()

        (params, opt_state), losses = jax.lax.scan(
            epoch, (params, opt_state),
            jax.random.split(k_perm, cfg.epochs),
        )
        metrics = {
            "loss": losses.mean(),
            "mean_reward": traj["rew"].mean(),
        }
        return (state, obs, params, opt_state, key), metrics

    def _fused_epochs_sharded(packed4, traj, mb_loc, lb, obs_d, act_w,
                              carry, k_perm):
        """Data-parallel fused update: ``shard_map`` over the mesh's
        ``envs`` axis.  Each shard packs its LOCAL [T, A, B_loc, D]
        rollout feature-major (no resharding: the env axis stays where
        the rollout left it), shuffles and minibatches its own blocks,
        and runs the Pallas kernel on local samples; advantage stats,
        gradients, and loss sums are ``psum``-ed so every shard applies
        the identical global-mean optimizer update.  Deviation from the
        single-device path: the epoch shuffle permutes within shards
        (shard-local blocks never migrate), statistically equivalent for
        independent envs.  The kernel normalizes per-sample grads by the
        GLOBAL minibatch size via ``spec.norm_n``, making the psum of
        shard grads exactly the global-mean gradient."""
        from jax.sharding import PartitionSpec as P

        state, obs, params, opt_state, key = carry
        n_sh = mesh.shape["envs"]
        mb_g = mb_loc * n_sh
        spec = pup.PPOUpdateSpec(
            obs_d=obs_d, act_w=act_w, hidden=cfg.hidden, lb=lb,
            mb=mb_loc, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
            ent_coef=cfg.ent_coef,
            n_logits=n_cats if discrete else 0, norm_n=mb_g,
        )
        nbm = mb_loc // lb

        def run(packed4_loc, params, opt_state, k_perm):
            Tl, Al, Bl, Dl = packed4_loc.shape
            n_l = Tl * Al * Bl
            packed_fm = packed4_loc.reshape(n_l, Dl).T  # [D, n_loc]
            nb_tot = n_l // lb
            shard = jax.lax.axis_index("envs")
            adv_row = packed_fm[obs_d + act_w + 1].reshape(nb_tot, lb)
            bs = adv_row.sum(axis=1)
            bsq = (adv_row * adv_row).sum(axis=1)

            def epoch(carry2, k):
                params, opt_state = carry2
                perm = jax.random.permutation(
                    jax.random.fold_in(k, shard), nb_tot
                ).astype(jnp.int32)

                def minibatch(carry3, i):
                    params, opt_state = carry3
                    pm = jax.lax.dynamic_slice_in_dim(
                        perm, i * nbm, nbm
                    )
                    s = jax.lax.psum(jnp.take(bs, pm).sum(), "envs")
                    sq = jax.lax.psum(jnp.take(bsq, pm).sum(), "envs")
                    mean = s / mb_g
                    var = jnp.maximum(sq / mb_g - mean * mean, 0.0)
                    inv_std = 1.0 / (jnp.sqrt(var) + 1e-8)
                    g, sums = pup.minibatch_update(
                        spec, packed_fm, pm,
                        jnp.stack([mean, inv_std]),
                        _params_tuple(params),
                    )
                    g = jax.lax.psum(g, "envs")
                    pg, vf, ent = jax.lax.psum(sums, "envs")
                    grads = _grads_pytree(params, g)
                    loss = (
                        -pg / mb_g
                        + cfg.vf_coef * vf / mb_g
                        - cfg.ent_coef * ent / mb_g
                    )
                    updates, opt_state = optimizer.update(
                        grads, opt_state, params
                    )
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    minibatch, (params, opt_state),
                    jnp.arange(cfg.minibatches),
                )
                return (params, opt_state), losses.mean()

            (params, opt_state), losses = jax.lax.scan(
                epoch, (params, opt_state),
                jax.random.split(k_perm, cfg.epochs),
            )
            return params, opt_state, losses.mean()

        # check_vma=False: pallas_call's out_shape structs carry no vma
        # annotation, which the varying-axis checker rejects; output
        # replication is instead guaranteed by the psums (and pinned by
        # the fused-vs-single-device equality test).
        params, opt_state, loss = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(P(None, None, "envs", None), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(packed4, params, opt_state, k_perm)
        metrics = {
            "loss": loss,
            "mean_reward": traj["rew"].mean(),
        }
        return (state, obs, params, opt_state, key), metrics

    def train_step(carry):
        state, obs, params, opt_state, key = carry
        key, k_roll, k_perm = jax.random.split(key, 3)
        (state, obs, _, _), traj = jax.lax.scan(
            policy_step, (state, obs, params, k_roll), None, length=T
        )
        _, _, last_value = model.apply(params, obs)
        adv, ret = compute_gae(traj, last_value)

        n = T * A * B
        mb = n // cfg.minibatches
        assert n % cfg.minibatches == 0, (
            f"rollout_steps*n_agents*num_envs ({T}*{A}*{B}={n}) must be"
            f" divisible by minibatches ({cfg.minibatches}) or samples"
            " would be silently dropped"
        )

        # Pack every per-sample field into ONE [n, D] f32 array and
        # shuffle it at G-sample block granularity.  TPU row gathers read
        # whole (8,128) tiles, so gathering six thin arrays per minibatch
        # (scalar logp/adv/ret rows, 2-wide actions) runs at <1% of HBM
        # bandwidth — it was 86% of the train step at 16k envs.  One
        # contiguous-row gather of [n/G, G*D] blocks per epoch runs at
        # full bandwidth, and minibatches become free dynamic slices.
        # Samples within a block share (t, agent) and span G consecutive
        # (independent) envs, so the G-granular random partition is
        # statistically indistinguishable from per-sample permutation at
        # VMAS batch sizes; G=1 (tiny configs) degenerates to exact.
        obs_d = traj["obs"].shape[-1]
        act_w = K if discrete else act_max
        # Built 4-D first ([T, A, B, D], env axis explicit) so the
        # data-parallel fused path can shard_map over envs and pack
        # locally; the single-device paths flatten to [n, D] (same
        # layout: D is the trailing axis either way).  Samples lay out
        # as (t, agent, env) with env fastest: sample i belongs to
        # agent (i // B) % A.
        parts4 = [
            traj["obs"],
            traj["action"].astype(jnp.float32).reshape(T, A, B, act_w),
            traj["logp"][..., None],
            adv[..., None],
            ret[..., None],
            jnp.broadcast_to(
                act_mask[None, :, None, :], (T, A, B, act_max)
            ),
        ]
        packed4 = jnp.concatenate(parts4, axis=-1)  # [T, A, B, D]
        D = packed4.shape[-1]

        if fused and mesh is not None:
            n_sh = mesh.shape["envs"]
            B_loc = B // n_sh
            n_loc = T * A * B_loc
            mb_loc = n_loc // cfg.minibatches
            lb = cfg.fused_block
            while lb > 8 and (mb_loc % lb):
                lb //= 2
            if (
                B % n_sh == 0
                and n_loc % cfg.minibatches == 0
                and mb_loc % lb == 0
            ):
                return _fused_epochs_sharded(
                    packed4, traj, mb_loc, lb, obs_d, act_w,
                    (state, obs, params, opt_state, key), k_perm,
                )

        packed = packed4.reshape(n, D)
        if fused and mesh is None:
            lb = cfg.fused_block
            while lb > 8 and mb % lb:
                lb //= 2
            if mb % lb == 0:
                return _fused_epochs(
                    packed, traj, n, mb, lb, obs_d, act_w,
                    (state, obs, params, opt_state, key), k_perm,
                )
        G = 1
        while G < 64 and mb % (2 * G) == 0:
            G *= 2
        blocks = packed.reshape(n // G, G * D)
        mbb = mb // G  # blocks per minibatch

        def unpack(rows):
            x = rows.reshape(mb, D)
            o = obs_d + act_w
            action = x[:, obs_d:o]
            batch = {
                "obs": x[:, :obs_d],
                "action": (
                    action.astype(jnp.int32) if discrete else action
                ),
                "logp": x[:, o],
                "adv": x[:, o + 1],
                "ret": x[:, o + 2],
                "mask": x[:, o + 3 :],
            }
            return batch

        def epoch(carry2, k):
            params, opt_state = carry2
            perm = jax.random.permutation(k, n // G)
            shuffled = blocks[perm]  # one full-bandwidth row gather

            def minibatch(carry3, i):
                params, opt_state = carry3
                batch = unpack(
                    jax.lax.dynamic_slice_in_dim(shuffled, i * mbb, mbb)
                )
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params
                )
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                minibatch,
                (params, opt_state),
                jnp.arange(cfg.minibatches),
            )
            return (params, opt_state), losses.mean()

        (params, opt_state), losses = jax.lax.scan(
            epoch,
            (params, opt_state),
            jax.random.split(k_perm, cfg.epochs),
        )
        metrics = {
            "loss": losses.mean(),
            "mean_reward": traj["rew"].mean(),
        }
        return (state, obs, params, opt_state, key), metrics

    # No buffer donation: carry[0] aliases env.state, and donating it
    # would delete the env object's live buffers on the first call
    # (breaking later imperative env.step()/render() use on TPU, where
    # donation is real).  Rebind env.state = carry[0] and donate if you
    # need the memory at very large num_envs.
    return jax.jit(train_step)


def init_training(scenario="dispersion", num_envs=512, seed=0,
                  cfg: PPOConfig = PPOConfig(), mesh=None,
                  **scenario_kwargs):
    """Build env + model + optimizer and the jitted train_step.

    ``mesh``: an optional ``jax.sharding.Mesh`` with an ``"envs"`` axis.
    The environment state and rollout batch are sharded over it, so the
    whole training iteration runs data-parallel across chips — the
    rollout needs zero collectives (envs are independent); GSPMD inserts
    the gradient/minibatch reductions.
    """
    assert nn is not None, "flax/optax required for the PPO example"
    env = vmt.make_env(scenario, num_envs=num_envs, seed=seed,
                       **scenario_kwargs)
    obs0 = env.reset(seed=seed)
    obs = make_obs_padder(env)(obs0)  # [A, B, Dmax + A]
    if env.continuous_actions:
        act_dim = max(env.get_agent_action_size(a) for a in env.agents)
    elif env.multidiscrete_actions:
        # factored-categorical head: K dims x widest choice count
        nvecs = [
            [int(x) for x in env.get_agent_action_space(a).nvec]
            for a in env.agents
        ]
        act_dim = max(len(v) for v in nvecs) * max(
            max(v) for v in nvecs
        )
    else:
        # flat categorical head over the widest agent's action count
        act_dim = max(env.get_agent_action_space(a).n for a in env.agents)
    model = ActorCritic(
        action_dim=act_dim,
        hidden=cfg.hidden,
        dtype=jnp.dtype(cfg.trunk_dtype),
    )
    # one root key, folded into independent streams: the env's state key
    # chain already consumed PRNGKey(seed) via reset(seed=seed), so give
    # weight-init and the rollout distinct derived keys (use-once rule)
    root = jax.random.PRNGKey(seed)
    params = model.init(jax.random.fold_in(root, 1), obs)
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr),
    )
    opt_state = optimizer.init(params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vectorizedmultiagentsimulator_tpu.parallel import (
            shard_environment,
        )

        shard_environment(env, mesh)
        obs = jax.device_put(
            obs, NamedSharding(mesh, P(None, "envs", None))
        )
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, replicated)
        opt_state = jax.device_put(opt_state, replicated)
    train_step = make_train_step(env, cfg, model, optimizer, mesh=mesh)
    carry = (env.state, obs, params, opt_state, jax.random.fold_in(root, 2))
    return env, train_step, carry


def main():
    scenario = sys.argv[1] if len(sys.argv) > 1 else "dispersion"
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    env, train_step, carry = init_training(scenario, num_envs)
    for it in range(iters):
        carry, metrics = train_step(carry)
        print(
            f"iter {it:3d}  loss {float(metrics['loss']):+.4f}"
            f"  mean_reward {float(metrics['mean_reward']):+.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
