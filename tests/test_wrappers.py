"""Wrapper conformance tests (reference tests/test_wrappers/).

Matrix breadth mirrors the reference: the same 9-scenario list
(test_gym_wrapper.py:15-25) crossed with {continuous, discrete} actions,
{tuple, dict} spaces and the numpy-conversion toggle.  ``return_numpy`` is
paired ``= (continuous == dict_space)`` so all four (return_numpy,
dict_space) combinations occur across each scenario's four cases without
doubling the matrix.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt

# Reference TEST_SCENARIOS (test_wrappers/test_gym_wrapper.py:15-25).
TEST_SCENARIOS = [
    "balance",
    "discovery",
    "give_way",
    "joint_passage",
    "navigation",
    "passage",
    "transport",
    "waterfall",
    "simple_world_comm",
]

# Small-world overrides to bound compile time (same code paths).
_KWARGS = {
    "discovery": dict(n_agents=3, n_targets=3),
    "navigation": dict(n_agents=3),
}


def _is_np(x):
    return isinstance(x, np.ndarray)


def _check_obs(obss, obs_shapes, dict_space, return_numpy):
    """Reference _check_obs_type (test_gym_wrapper.py:28-59): container
    type, per-agent shapes, numpy-vs-device-array element types."""
    if dict_space:
        assert isinstance(obss, dict), f"expected dict, got {type(obss)}"
        items = [(obss[k], obs_shapes[k]) for k in obs_shapes]
    else:
        assert isinstance(obss, (list, tuple)), (
            f"expected list, got {type(obss)}"
        )
        items = list(zip(obss, obs_shapes))
    for obs, shape in items:
        assert tuple(obs.shape) == tuple(shape), (
            f"expected shape {shape}, got {obs.shape}"
        )
        assert _is_np(obs) == return_numpy, (
            f"return_numpy={return_numpy} but obs type is {type(obs)}"
        )


def _rews_values(rews, dict_space):
    if dict_space:
        assert isinstance(rews, dict)
        return list(rews.values())
    assert isinstance(rews, (list, tuple))
    return list(rews)


@pytest.mark.parametrize("scenario", TEST_SCENARIOS)
@pytest.mark.parametrize("continuous", [True, False])
@pytest.mark.parametrize("dict_space", [True, False])
def test_gymnasium_vec_matrix(scenario, continuous, dict_space, num_envs=3):
    gym = pytest.importorskip("gymnasium")
    return_numpy = continuous == dict_space
    max_steps = 5
    env = vmt.make_env(
        scenario,
        num_envs=num_envs,
        seed=0,
        continuous_actions=continuous,
        dict_spaces=dict_space,
        terminated_truncated=True,
        max_steps=max_steps,
        wrapper="gymnasium_vec",
        wrapper_kwargs={"return_numpy": return_numpy},
        **_KWARGS.get(scenario, {}),
    )
    n_agents = env.unwrapped.n_agents
    assert len(env.observation_space) == n_agents
    assert len(env.action_space) == n_agents
    if dict_space:
        assert isinstance(env.observation_space, gym.spaces.Dict)
        assert isinstance(env.action_space, gym.spaces.Dict)
        obs_shapes = {
            k: s.shape for k, s in env.observation_space.spaces.items()
        }
    else:
        assert isinstance(env.observation_space, gym.spaces.Tuple)
        assert isinstance(env.action_space, gym.spaces.Tuple)
        obs_shapes = [s.shape for s in env.observation_space.spaces]

    obss, info = env.reset()
    _check_obs(obss, obs_shapes, dict_space, return_numpy)
    assert isinstance(info, dict)

    for _ in range(max_steps):
        if dict_space:
            actions = {
                a.name: np.asarray(env.unwrapped.get_random_action(a))
                for a in env.unwrapped.agents
            }
        else:
            actions = [
                np.asarray(env.unwrapped.get_random_action(a))
                for a in env.unwrapped.agents
            ]
        obss, rews, terminated, truncated, info = env.step(actions)
        _check_obs(obss, obs_shapes, dict_space, return_numpy)
        rew_values = _rews_values(rews, dict_space)
        assert len(rew_values) == n_agents
        for r in rew_values:
            assert _is_np(r) == return_numpy
            assert r.shape == (num_envs,)
        assert _is_np(terminated) == return_numpy
        assert _is_np(truncated) == return_numpy
        assert tuple(terminated.shape) == (num_envs,)
        assert tuple(truncated.shape) == (num_envs,)
        assert isinstance(info, dict)
    assert all(np.asarray(truncated)), (
        "expected truncation at max_steps"
    )


@pytest.mark.parametrize("scenario", TEST_SCENARIOS)
@pytest.mark.parametrize("continuous", [True, False])
def test_gymnasium_wrapper(scenario, continuous):
    gym = pytest.importorskip("gymnasium")
    dict_space = not continuous  # cover both container kinds
    env = vmt.make_env(
        scenario,
        num_envs=1,
        seed=0,
        continuous_actions=continuous,
        dict_spaces=dict_space,
        terminated_truncated=True,
        max_steps=5,
        wrapper="gymnasium",
        **_KWARGS.get(scenario, {}),
    )
    space_cls = gym.spaces.Dict if dict_space else gym.spaces.Tuple
    assert isinstance(env.observation_space, space_cls)
    assert isinstance(env.action_space, space_cls)
    obs, info = env.reset(seed=0)
    n_agents = env.unwrapped.n_agents
    assert len(obs) == n_agents
    for _ in range(6):
        # Reference tests pass LIST actions even in dict-space mode
        # (test_gymnasium_wrapper.py:72-75).
        acts = [
            np.asarray(env.unwrapped.get_random_action(a))[0]
            for a in env.unwrapped.agents
        ]
        obs, rews, terminated, truncated, info = env.step(acts)
        rew_values = _rews_values(rews, dict_space)
        assert isinstance(obs[0] if not dict_space else next(iter(obs.values())), np.ndarray)
        assert isinstance(rew_values[0], float)
        assert isinstance(terminated, bool)
        assert isinstance(truncated, bool)
        if terminated or truncated:
            break
    assert truncated or terminated


@pytest.mark.parametrize("scenario", TEST_SCENARIOS)
def test_gym_wrapper(scenario):
    env = vmt.make_env(
        scenario,
        num_envs=1,
        seed=0,
        max_steps=5,
        wrapper="gym",
        **_KWARGS.get(scenario, {}),
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
