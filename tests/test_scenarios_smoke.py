"""All-scenario smoke tests (reference tests/test_vmas.py:43-63).

Every registered scenario is built, stepped with random actions in both
continuous and discrete modes, partially reset, and rendered to rgb_array.
"""
import importlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt

scenarios_module = importlib.import_module(
    "vectorizedmultiagentsimulator_tpu.scenarios"
)

# Small-world overrides to keep smoke compile time bounded.
_KWARGS = {
    "football": dict(n_blue_agents=2, n_red_agents=2),
    "pollock": dict(n_agents=3, n_lines=2, n_boxes=2),
    "discovery": dict(n_agents=3, n_targets=3),
    "navigation": dict(n_agents=3),
    "flocking": dict(n_agents=3, n_obstacles=2),
    "road_traffic": dict(n_agents=4),
}


def scenario_names():
    return scenarios_module.names()


def test_registry_complete():
    """Every reference scenario name is registered (test_vmas.py:35-40)."""
    assert len(scenarios_module.names()) == 41
    assert set(vmt.scenarios + vmt.debug_scenarios + vmt.mpe_scenarios) == set(
        scenarios_module.names()
    )


@pytest.mark.parametrize("continuous", [True, False])
@pytest.mark.parametrize("scenario", scenario_names())
def test_scenario_smoke(scenario, continuous, num_envs=4, n_steps=3):
    env = vmt.make_env(
        scenario,
        num_envs=num_envs,
        seed=0,
        continuous_actions=continuous,
        max_steps=n_steps + 1,
        **_KWARGS.get(scenario, {}),
    )
    obs = env.reset()
    assert len(obs) == env.n_agents
    for _ in range(n_steps):
        obs, rews, dones, infos = env.step(env.get_random_actions())
        assert len(obs) == env.n_agents
        assert len(rews) == env.n_agents
        for r in rews:
            assert r.shape == (num_envs,)
        assert dones.shape == (num_envs,)
        assert dones.dtype == bool
    env.reset_at(1)


@pytest.mark.parametrize("scenario", ["transport", "simple_spread", "balance"])
def test_scenario_render(scenario):
    env = vmt.make_env(scenario, num_envs=2, seed=0)
    env.step(env.get_random_actions())
    frame = env.render(mode="rgb_array", env_index=0)
    assert frame.shape[-1] == 3 and frame.dtype == np.uint8
    assert (frame < 250).any(), "render produced a blank frame"


@pytest.mark.parametrize("scenario", ["transport", "dispersion"])
def test_dict_spaces(scenario, num_envs=4):
    env = vmt.make_env(scenario, num_envs=num_envs, seed=0, dict_spaces=True)
    obs = env.reset()
    assert isinstance(obs, dict)
    actions = {
        agent.name: env.get_random_action(agent) for agent in env.agents
    }
    obs, rews, dones, infos = env.step(actions)
    assert set(obs) == {a.name for a in env.agents}
    assert set(rews) == {a.name for a in env.agents}
