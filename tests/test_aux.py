"""Aux subsystems: checkpoint/resume, scan rollouts, sharding, profiling."""
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt
from vectorizedmultiagentsimulator_tpu.parallel import (
    make_mesh,
    rollout,
    shard_environment,
)
from vectorizedmultiagentsimulator_tpu.utils import checkpoint


def test_checkpoint_roundtrip(tmp_path):
    env = vmt.make_env("transport", num_envs=4, seed=0)
    for _ in range(3):
        env.step(env.get_random_actions())
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_env(path, env)
    mid_pos = np.asarray(env.state.pos)

    # Continue stepping, then restore and replay — trajectories must match.
    acts = env.get_random_actions()
    obs_after, *_ = env.step(acts)
    env2 = vmt.make_env("transport", num_envs=4, seed=0)
    checkpoint.restore_env(path, env2)
    np.testing.assert_allclose(np.asarray(env2.state.pos), mid_pos)
    obs_replay, *_ = env2.step(acts)
    for a, b in zip(obs_after, obs_replay):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_scan_rollout(num_envs=4, n_steps=5):
    env = vmt.make_env("dispersion", num_envs=num_envs, seed=0)
    state, traj = rollout(env, n_steps=n_steps)
    assert traj["rews"][0].shape == (n_steps, num_envs)
    assert traj["dones"].shape == (n_steps, num_envs)
    assert np.isfinite(np.asarray(traj["rews"][0])).all()


def test_sharded_env_matches_unsharded(num_envs=8, n_steps=3):
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices (run with "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    env_a = vmt.make_env("transport", num_envs=num_envs, seed=0)
    env_b = vmt.make_env("transport", num_envs=num_envs, seed=0)
    mesh = make_mesh(min(len(jax.devices()), 8) // 2 * 2)
    shard_environment(env_b, mesh)
    for _ in range(n_steps):
        acts = env_a.get_random_actions()
        obs_a, *_ = env_a.step(acts)
        obs_b, *_ = env_b.step(acts)
    for a, b in zip(obs_a, obs_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_benchmark_harness(num_envs=4):
    from vectorizedmultiagentsimulator_tpu.utils.profiling import (
        benchmark_step,
    )

    env = vmt.make_env("dispersion", num_envs=num_envs, seed=0)
    result = benchmark_step(env, n_steps=3, n_repeats=1)
    assert result["env_steps_per_s"] > 0
