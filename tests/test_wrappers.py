"""Wrapper conformance tests (reference tests/test_wrappers/)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt

TEST_SCENARIOS = ["transport", "simple_spread", "passage"]


@pytest.mark.parametrize("scenario", TEST_SCENARIOS)
@pytest.mark.parametrize("continuous", [True, False])
def test_gymnasium_wrapper(scenario, continuous):
    gym = pytest.importorskip("gymnasium")
    env = vmt.make_env(
        scenario,
        num_envs=1,
        seed=0,
        continuous_actions=continuous,
        terminated_truncated=True,
        max_steps=5,
        wrapper="gymnasium",
    )
    assert isinstance(env.observation_space, gym.spaces.Tuple)
    assert isinstance(env.action_space, gym.spaces.Tuple)
    obs, info = env.reset(seed=0)
    n_agents = env.unwrapped.n_agents
    assert len(obs) == n_agents
    for _ in range(6):
        acts = [
            np.asarray(env.unwrapped.get_random_action(a))[0]
            for a in env.unwrapped.agents
        ]
        obs, rews, terminated, truncated, info = env.step(acts)
        assert isinstance(obs[0], np.ndarray)
        assert isinstance(rews[0], float)
        assert isinstance(terminated, bool)
        assert isinstance(truncated, bool)
        if terminated or truncated:
            break
    assert truncated or terminated


@pytest.mark.parametrize("scenario", TEST_SCENARIOS)
def test_gymnasium_vec_wrapper(scenario, num_envs=3):
    gym = pytest.importorskip("gymnasium")
    env = vmt.make_env(
        scenario,
        num_envs=num_envs,
        seed=0,
        terminated_truncated=True,
        max_steps=5,
        wrapper="gymnasium_vec",
    )
    obs, info = env.reset()
    assert obs[0].shape[0] == num_envs
    acts = [
        np.asarray(env.unwrapped.get_random_action(a))
        for a in env.unwrapped.agents
    ]
    obs, rews, terminated, truncated, info = env.step(acts)
    assert obs[0].shape[0] == num_envs
    assert rews[0].shape == (num_envs,)
    assert terminated.shape == (num_envs,)
    assert truncated.shape == (num_envs,)


@pytest.mark.parametrize("scenario", TEST_SCENARIOS)
def test_gym_wrapper(scenario):
    env = vmt.make_env(
        scenario, num_envs=1, seed=0, max_steps=5, wrapper="gym"
    )
    obs = env.reset()
    assert len(obs) == env.unwrapped.n_agents
    for _ in range(6):
        acts = [
            np.asarray(env.unwrapped.get_random_action(a))[0]
            for a in env.unwrapped.agents
        ]
        obs, rews, done, info = env.step(acts)
        assert isinstance(done, bool)
        if done:
            break
    assert done


def test_rllib_wrapper(scenario="simple_spread", num_envs=3):
    env = vmt.make_env(scenario, num_envs=num_envs, seed=0, wrapper="rllib")
    obs = env.vector_reset()
    assert len(obs) == num_envs
    n_agents = env.env.n_agents
    acts = [
        [np.zeros(env.env.get_agent_action_size(a)) for a in env.env.agents]
        for _ in range(num_envs)
    ]
    obs, rews, dones, infos = env.vector_step(acts)
    assert len(obs) == num_envs and len(rews) == num_envs
    assert all(isinstance(r, float) for r in rews)
    assert all("rewards" in i and len(i["rewards"]) == n_agents for i in infos)
    single = env.reset_at(1)
    assert len(single) == n_agents
