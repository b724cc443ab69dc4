"""The TPU-native PPO example: one fully-jitted train iteration
(rollout scan + masked auto-resets + GAE + epoch/minibatch updates)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax

flax = pytest.importorskip("flax")

from vectorizedmultiagentsimulator_tpu.examples.jax_ppo import (  # noqa: E402
    PPOConfig,
    init_training,
)


def test_ppo_train_step_runs_and_updates():
    cfg = PPOConfig(rollout_steps=8, epochs=2, minibatches=2, hidden=16)
    env, train_step, carry = init_training(
        "dispersion", num_envs=16, cfg=cfg
    )
    p0 = np.asarray(jax.tree_util.tree_leaves(carry[2])[0]).copy()
    for _ in range(2):
        carry, metrics = train_step(carry)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mean_reward"]))
    p1 = np.asarray(jax.tree_util.tree_leaves(carry[2])[0])
    assert np.abs(p1 - p0).sum() > 0


def test_ppo_heterogeneous_agents_and_comm():
    """Per-agent obs widths, action widths and communication dims
    (speaker: comm-only; listener: movement-only) all train through the
    padded + masked stacked path."""
    cfg = PPOConfig(rollout_steps=8, epochs=1, minibatches=2, hidden=16)
    for scenario in ("simple_adversary", "simple_speaker_listener"):
        env, train_step, carry = init_training(
            scenario, num_envs=8, cfg=cfg
        )
        carry, metrics = train_step(carry)
        assert np.isfinite(float(metrics["loss"])), scenario
        assert np.isfinite(float(metrics["mean_reward"])), scenario


def test_ppo_discrete_actions():
    """continuous_actions=False trains through the categorical head,
    including a heterogeneous comm scenario."""
    cfg = PPOConfig(rollout_steps=8, epochs=1, minibatches=2, hidden=16)
    for scenario in ("dispersion", "simple_speaker_listener"):
        env, train_step, carry = init_training(
            scenario, num_envs=8, cfg=cfg, continuous_actions=False
        )
        p0 = np.asarray(jax.tree_util.tree_leaves(carry[2])[0]).copy()
        carry, metrics = train_step(carry)
        assert np.isfinite(float(metrics["loss"])), scenario
        p1 = np.asarray(jax.tree_util.tree_leaves(carry[2])[0])
        assert np.abs(p1 - p0).sum() > 0


def test_ppo_data_parallel_over_mesh():
    """The whole train iteration runs sharded over an 8-device 'envs'
    mesh (conftest provisions virtual CPU devices); the env state stays
    sharded across iterations."""
    import numpy as onp
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(onp.asarray(devices[:8]), ("envs",))
    cfg = PPOConfig(rollout_steps=8, epochs=1, minibatches=2, hidden=16)
    env, train_step, carry = init_training(
        "dispersion", num_envs=16, cfg=cfg, mesh=mesh
    )
    carry, metrics = train_step(carry)
    assert np.isfinite(float(metrics["loss"]))
    assert "envs" in str(carry[0].pos.sharding.spec)
    assert "envs" in str(carry[1].sharding.spec)


def test_ppo_improves_on_shaped_reward():
    """navigation's dense pos-shaping reward must actually increase:
    the mean of the last 3 iterations beats the mean of the first 3
    (single-iteration rewards are noisy at toy scale; the run is
    deterministic, measured margin ~6e-3 against iteration noise
    ~4e-3)."""
    cfg = PPOConfig(rollout_steps=32, epochs=2, minibatches=2, hidden=32)
    env, train_step, carry = init_training(
        "navigation", num_envs=64, cfg=cfg, n_agents=2
    )
    rewards = []
    for _ in range(14):
        carry, metrics = train_step(carry)
        r = float(metrics["mean_reward"])
        assert np.isfinite(r)
        rewards.append(r)
    assert np.mean(rewards[-3:]) > np.mean(rewards[:3]), rewards
