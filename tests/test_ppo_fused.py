"""Fused Pallas PPO update kernel (ops/ppo_update_pallas.py): the
hand-derived backward must match jax.grad of the jnp mirror, and the
fused train step must reproduce the pure-XLA path's update."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vectorizedmultiagentsimulator_tpu.ops import ppo_update_pallas as pup


def _make(key, od=6, aw=2, H=8, lb=16, nb_tot=8, nbm=4):
    spec = pup.PPOUpdateSpec(
        obs_d=od, act_w=aw, hidden=H, lb=lb, mb=nbm * lb,
        clip_eps=0.2, vf_coef=0.5, ent_coef=0.01,
    )
    n = nb_tot * lb
    ks = jax.random.split(key, 16)
    packed = jax.random.normal(ks[0], (spec.d, n), jnp.float32)
    # mask rows must be 0/1
    rows = pup.pack_rows(spec)
    a, b = rows["mask"]
    mask = (jax.random.uniform(ks[1], (aw, n)) > 0.2).astype(jnp.float32)
    packed = packed.at[a:b].set(mask)
    perm = jax.random.permutation(ks[2], nb_tot)[:nbm].astype(jnp.int32)
    # advantage stats over the selected blocks, as the caller computes
    adv = packed[rows["adv"][0]].reshape(nb_tot, lb)[perm].ravel()
    mean = adv.mean()
    inv_std = 1.0 / (adv.std() + 1e-8)
    stats = jnp.stack([mean, inv_std])

    def w(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * 0.3

    params = (
        w(ks[3], (od, H)), w(ks[4], (H, 1)),
        w(ks[5], (H, H)), w(ks[6], (H, 1)),
        w(ks[7], (H, aw)), w(ks[8], (aw, 1)),
        w(ks[9], (aw, 1)) * 0.1,  # log_std
        w(ks[10], (od, H)), w(ks[11], (H, 1)),
        w(ks[12], (H, 1)), w(ks[13], (1, 1)),
    )
    return spec, packed, perm, stats, params


def test_kernel_grads_match_jax_grad(monkeypatch):
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    spec, packed, perm, stats, params = _make(jax.random.PRNGKey(0))
    g_k, sums_k = pup.minibatch_update(spec, packed, perm, stats, params)
    g_r, sums_r = pup.reference_minibatch(
        spec, packed, perm, stats, params
    )
    for a, b in zip(sums_k, sums_r):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)
    assert len(g_k) == len(g_r) == 11
    for i, (a, b) in enumerate(zip(g_k, g_r)):
        assert a.shape == b.shape, i
        # identical math modulo accumulation order and the bf16 cast of
        # cotangents in the hand-written dW dots (jax.grad keeps them
        # f32), so tolerances are bf16-scaled
        np.testing.assert_allclose(
            a, b, rtol=2e-2, atol=2e-3, err_msg=f"grad {i}"
        )


def test_kernel_grads_larger_shapes(monkeypatch):
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    spec, packed, perm, stats, params = _make(
        jax.random.PRNGKey(3), od=24, aw=3, H=64, lb=128, nb_tot=6,
        nbm=3,
    )
    g_k, sums_k = pup.minibatch_update(spec, packed, perm, stats, params)
    g_r, sums_r = pup.reference_minibatch(
        spec, packed, perm, stats, params
    )
    for a, b in zip(sums_k, sums_r):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-4)
    for i, (a, b) in enumerate(zip(g_k, g_r)):
        np.testing.assert_allclose(
            a, b, rtol=2e-2, atol=2e-3, err_msg=f"grad {i}"
        )


def test_kernel_grads_single_action_dim(monkeypatch):
    """aw=1 edge (Forward/Rotation-dynamics agents): scalar action,
    mask, and log_std rows."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    spec, packed, perm, stats, params = _make(
        jax.random.PRNGKey(7), od=5, aw=1, H=16, lb=32, nb_tot=4, nbm=2
    )
    g_k, _ = pup.minibatch_update(spec, packed, perm, stats, params)
    g_r, _ = pup.reference_minibatch(spec, packed, perm, stats, params)
    for i, (a, b) in enumerate(zip(g_k, g_r)):
        np.testing.assert_allclose(
            a, b, rtol=2e-2, atol=2e-3, err_msg=f"grad {i}"
        )


def _make_discrete(key, od=6, nl=5, H=8, lb=16, nb_tot=8, nbm=4):
    spec = pup.PPOUpdateSpec(
        obs_d=od, act_w=1, hidden=H, lb=lb, mb=nbm * lb,
        clip_eps=0.2, vf_coef=0.5, ent_coef=0.01, n_logits=nl,
    )
    n = nb_tot * lb
    ks = jax.random.split(key, 16)
    packed = jax.random.normal(ks[0], (spec.d, n), jnp.float32)
    rows = pup.pack_rows(spec)
    # per-sample additive logits mask: first cnt choices valid
    cnt = jax.random.randint(ks[1], (n,), 2, nl + 1)
    mask = jnp.where(jnp.arange(nl)[:, None] < cnt[None, :], 0.0, -1e9)
    a, b = rows["mask"]
    packed = packed.at[a:b].set(mask)
    # chosen action index, always a valid (unmasked) choice
    act = jax.random.randint(ks[2], (n,), 0, nl) % cnt
    a, b = rows["action"]
    packed = packed.at[a:b].set(act.astype(jnp.float32)[None, :])
    perm = jax.random.permutation(ks[3], nb_tot)[:nbm].astype(jnp.int32)
    adv = packed[rows["adv"][0]].reshape(nb_tot, lb)[perm].ravel()
    stats = jnp.stack([adv.mean(), 1.0 / (adv.std() + 1e-8)])

    def w(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * 0.3

    params = (
        w(ks[4], (od, H)), w(ks[5], (H, 1)),
        w(ks[6], (H, H)), w(ks[7], (H, 1)),
        w(ks[8], (H, nl)), w(ks[9], (nl, 1)),
        w(ks[10], (nl, 1)) * 0.1,  # log_std (unused by discrete head)
        w(ks[11], (od, H)), w(ks[12], (H, 1)),
        w(ks[13], (H, 1)), w(ks[14], (1, 1)),
    )
    return spec, packed, perm, stats, params


def test_kernel_grads_discrete(monkeypatch):
    """Categorical mode: kernel grads (incl. the entropy term through
    the softmax) must match jax.grad of the jnp mirror."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    spec, packed, perm, stats, params = _make_discrete(
        jax.random.PRNGKey(11)
    )
    g_k, sums_k = pup.minibatch_update(spec, packed, perm, stats, params)
    g_r, sums_r = pup.reference_minibatch(
        spec, packed, perm, stats, params
    )
    for a, b in zip(sums_k, sums_r):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)
    # log_std gradient must be exactly zero in discrete mode
    np.testing.assert_array_equal(np.asarray(g_k[6]), 0.0)
    for i, (a, b) in enumerate(zip(g_k, g_r)):
        np.testing.assert_allclose(
            a, b, rtol=2e-2, atol=2e-3, err_msg=f"grad {i}"
        )


def test_kernel_grads_discrete_larger(monkeypatch):
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    spec, packed, perm, stats, params = _make_discrete(
        jax.random.PRNGKey(13), od=24, nl=9, H=64, lb=128, nb_tot=6,
        nbm=3,
    )
    g_k, _ = pup.minibatch_update(spec, packed, perm, stats, params)
    g_r, _ = pup.reference_minibatch(spec, packed, perm, stats, params)
    for i, (a, b) in enumerate(zip(g_k, g_r)):
        np.testing.assert_allclose(
            a, b, rtol=2e-2, atol=2e-3, err_msg=f"grad {i}"
        )


def test_fused_train_step_matches_xla_path_discrete(monkeypatch):
    """Discrete-action env end-to-end: fused categorical update must
    reproduce the pure-XLA path's parameter update."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    from vectorizedmultiagentsimulator_tpu.examples.jax_ppo import (
        PPOConfig,
        init_training,
    )

    results = {}
    for fused in (True, False):
        cfg = PPOConfig(
            rollout_steps=4, epochs=1, minibatches=1, hidden=16,
            fused_update=fused, fused_block=32,
        )
        env, train_step, carry = init_training(
            "dispersion", num_envs=16, seed=0, cfg=cfg,
            continuous_actions=False,
        )
        carry2, metrics = train_step(carry)
        jax.block_until_ready(metrics["loss"])
        results[fused] = (carry2[2], metrics)

    p_f, m_f = results[True]
    p_x, m_x = results[False]
    assert np.isfinite(float(m_f["loss"]))
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_x["loss"]), rtol=5e-3, atol=5e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_x)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3
        )


def test_fused_train_step_matches_xla_path(monkeypatch):
    """With a single minibatch and epoch the shuffle is irrelevant, so
    the fused and pure-XLA paths must produce the same parameter update
    (up to bf16/accumulation noise)."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    from vectorizedmultiagentsimulator_tpu.examples.jax_ppo import (
        PPOConfig,
        init_training,
    )

    cfgs = {}
    for fused in (True, False):
        cfg = PPOConfig(
            rollout_steps=4, epochs=1, minibatches=1, hidden=16,
            fused_update=fused, fused_block=32,
        )
        env, train_step, carry = init_training(
            "dispersion", num_envs=16, seed=0, cfg=cfg
        )
        carry2, metrics = train_step(carry)
        jax.block_until_ready(metrics["loss"])
        cfgs[fused] = (carry2[2], metrics)

    p_f, m_f = cfgs[True]
    p_x, m_x = cfgs[False]
    assert np.isfinite(float(m_f["loss"]))
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_x["loss"]), rtol=5e-3, atol=5e-4
    )
    flat_f = jax.tree_util.tree_leaves(p_f)
    flat_x = jax.tree_util.tree_leaves(p_x)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3
        )


def _make_multidiscrete(key, od=6, Kd=3, nl=4, H=8, lb=16, nb_tot=8,
                        nbm=4):
    """Factored categorical: Kd dims of up to nl choices each."""
    spec = pup.PPOUpdateSpec(
        obs_d=od, act_w=Kd, hidden=H, lb=lb, mb=nbm * lb,
        clip_eps=0.2, vf_coef=0.5, ent_coef=0.01, n_logits=nl,
    )
    n = nb_tot * lb
    ks = jax.random.split(key, 16)
    packed = jax.random.normal(ks[0], (spec.d, n), jnp.float32)
    rows = pup.pack_rows(spec)
    # per-dim per-sample valid-choice counts (incl. fully-padded dims
    # with a single valid choice)
    cnt = jax.random.randint(ks[1], (Kd, n), 1, nl + 1)
    mask = jnp.where(
        jnp.arange(nl)[None, :, None] < cnt[:, None, :], 0.0, -1e9
    ).reshape(Kd * nl, n)
    a, b = rows["mask"]
    packed = packed.at[a:b].set(mask)
    act = jax.random.randint(ks[2], (Kd, n), 0, nl) % cnt
    a, b = rows["action"]
    packed = packed.at[a:b].set(act.astype(jnp.float32))
    perm = jax.random.permutation(ks[3], nb_tot)[:nbm].astype(jnp.int32)
    adv = packed[rows["adv"][0]].reshape(nb_tot, lb)[perm].ravel()
    stats = jnp.stack([adv.mean(), 1.0 / (adv.std() + 1e-8)])

    def w(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * 0.3

    hw = Kd * nl  # head width
    params = (
        w(ks[4], (od, H)), w(ks[5], (H, 1)),
        w(ks[6], (H, H)), w(ks[7], (H, 1)),
        w(ks[8], (H, hw)), w(ks[9], (hw, 1)),
        w(ks[10], (hw, 1)) * 0.1,  # log_std (unused)
        w(ks[11], (od, H)), w(ks[12], (H, 1)),
        w(ks[13], (H, 1)), w(ks[14], (1, 1)),
    )
    return spec, packed, perm, stats, params


def test_kernel_grads_multidiscrete(monkeypatch):
    """Factored-categorical mode: per-dim softmax/entropy backward
    (note dH/dlogits_k uses the PER-DIM entropy) must match jax.grad."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    spec, packed, perm, stats, params = _make_multidiscrete(
        jax.random.PRNGKey(17)
    )
    g_k, sums_k = pup.minibatch_update(spec, packed, perm, stats, params)
    g_r, sums_r = pup.reference_minibatch(
        spec, packed, perm, stats, params
    )
    for a, b in zip(sums_k, sums_r):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)
    for i, (a, b) in enumerate(zip(g_k, g_r)):
        np.testing.assert_allclose(
            a, b, rtol=2e-2, atol=2e-3, err_msg=f"grad {i}"
        )


def test_fused_train_step_matches_xla_path_multidiscrete(monkeypatch):
    """MultiDiscrete-action env end-to-end: fused factored-categorical
    update must reproduce the pure-XLA path's parameter update."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    from vectorizedmultiagentsimulator_tpu.examples.jax_ppo import (
        PPOConfig,
        init_training,
    )

    results = {}
    for fused in (True, False):
        cfg = PPOConfig(
            rollout_steps=4, epochs=1, minibatches=1, hidden=16,
            fused_update=fused, fused_block=32,
        )
        env, train_step, carry = init_training(
            "dispersion", num_envs=16, seed=0, cfg=cfg,
            continuous_actions=False, multidiscrete_actions=True,
        )
        carry2, metrics = train_step(carry)
        jax.block_until_ready(metrics["loss"])
        results[fused] = (carry2[2], metrics)

    p_f, m_f = results[True]
    p_x, m_x = results[False]
    assert np.isfinite(float(m_f["loss"]))
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_x["loss"]), rtol=5e-3, atol=5e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_x)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3
        )


def test_fused_sharded_matches_single_device(monkeypatch):
    """Data-parallel fused path (shard_map + psum) vs the single-device
    fused path on identical rollouts.  With one epoch and one minibatch
    the shuffle (the only sharding-dependent choice) is irrelevant, so
    the psum-of-shard-grads update must equal the single-device update
    up to float reassociation."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    import numpy as onp
    from jax.sharding import Mesh

    from vectorizedmultiagentsimulator_tpu.examples.jax_ppo import (
        PPOConfig,
        init_training,
    )

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs 4 devices")
    results = {}
    for mesh in (None, Mesh(onp.asarray(devices[:4]), ("envs",))):
        cfg = PPOConfig(
            rollout_steps=4, epochs=1, minibatches=1, hidden=16,
            fused_update=True, fused_block=8,
        )
        env, train_step, carry = init_training(
            "dispersion", num_envs=16, seed=0, cfg=cfg, mesh=mesh
        )
        carry2, metrics = train_step(carry)
        jax.block_until_ready(metrics["loss"])
        results[mesh is None] = (carry2[2], metrics)

    p_s, m_s = results[True]
    p_m, m_m = results[False]
    assert np.isfinite(float(m_m["loss"]))
    np.testing.assert_allclose(
        float(m_m["loss"]), float(m_s["loss"]), rtol=5e-3, atol=5e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_m), jax.tree_util.tree_leaves(p_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3
        )


def test_fused_sharded_multiple_iters_discrete(monkeypatch):
    """Sharded fused path runs multiple iterations (shuffles engaged)
    in discrete mode and stays finite."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    import numpy as onp
    from jax.sharding import Mesh

    from vectorizedmultiagentsimulator_tpu.examples.jax_ppo import (
        PPOConfig,
        init_training,
    )

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(onp.asarray(devices[:4]), ("envs",))
    cfg = PPOConfig(
        rollout_steps=4, epochs=2, minibatches=2, hidden=16,
        fused_update=True, fused_block=8,
    )
    env, train_step, carry = init_training(
        "dispersion", num_envs=16, seed=1, cfg=cfg, mesh=mesh,
        continuous_actions=False,
    )
    for _ in range(2):
        carry, metrics = train_step(carry)
    assert np.isfinite(float(metrics["loss"]))


def test_fused_training_runs_multiple_iters(monkeypatch):
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    from vectorizedmultiagentsimulator_tpu.examples.jax_ppo import (
        PPOConfig,
        init_training,
    )

    cfg = PPOConfig(
        rollout_steps=4, epochs=2, minibatches=2, hidden=16,
        fused_update=True, fused_block=16,
    )
    env, train_step, carry = init_training(
        "dispersion", num_envs=16, seed=1, cfg=cfg
    )
    for _ in range(2):
        carry, metrics = train_step(carry)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))
