"""Discrete-action decoding semantics (reference tests/test_vmas.py:66-233).

Checks the closed-form discrete->continuous mapping (including the odd-n
"first action is zero" remap), Discrete <-> MultiDiscrete equivalence, and
random-action space membership.
"""
import math
import os
import random
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt


def _full_nvec(agent, world):
    return list(agent.discrete_action_nvec) + (
        [world.dim_c] if not agent.silent and world.dim_c != 0 else []
    )


@pytest.mark.parametrize("multidiscrete", [True, False])
def test_discrete_action_nvec(multidiscrete, num_envs=6, n_steps=3):
    env = vmt.make_env(
        "transport",
        num_envs=num_envs,
        seed=0,
        multidiscrete_actions=multidiscrete,
        continuous_actions=False,
    )
    random.seed(0)
    for agent in env.world.agents:
        agent.discrete_action_nvec = [
            random.randint(2, 6) for _ in range(agent.action_size)
        ]
    env.action_space = env.get_action_space()

    def to_multidiscrete(action, nvec):
        action_multi = []
        for i in range(len(nvec)):
            n = math.prod(nvec[i + 1 :])
            action_multi.append(action // n)
            action = action % n
        return jnp.stack(action_multi, axis=-1)

    for _ in range(n_steps):
        actions = env.get_random_actions()
        for a_batch, s in zip(actions, env.action_space.spaces):
            for a in np.asarray(a_batch):
                assert s.contains(a)
        env.step(actions)
        if not multidiscrete:
            actions = [
                to_multidiscrete(
                    jnp.asarray(a).reshape(-1), _full_nvec(agent, env.world)
                )
                for a, agent in zip(actions, env.world.policy_agents)
            ]
        for i_a, agent in enumerate(env.world.policy_agents):
            for i, n in enumerate(agent.discrete_action_nvec):
                a = np.asarray(actions[i_a][:, i])
                u = np.asarray(agent.action.u[:, i])
                U = float(agent.action.u_range_tensor[i])
                k = float(agent.action.u_multiplier_tensor[i])
                for aj, uj in zip(a, u):
                    assert 0 <= aj < n
                    if n % 2 != 0:
                        assert aj != 0 or np.isclose(uj, 0), (aj, uj, n)
                        if 1 <= aj <= n // 2:
                            assert np.isclose(
                                uj / k, (2 * U * (aj - 1)) / (n - 1) - U,
                                atol=1e-6,
                            ), (aj, uj, n, U, k)
                        if aj > n // 2:
                            assert np.isclose(
                                uj / k, 2 * U * (aj / (n - 1)) - U, atol=1e-6
                            ), (aj, uj, n, U, k)
                    else:
                        assert np.isclose(
                            uj / k, 2 * U * (aj / (n - 1)) - U, atol=1e-6
                        ), (aj, uj, n, U, k)


def test_discrete_equals_multidiscrete(num_envs=6, n_steps=3):
    kwargs = dict(num_envs=num_envs, seed=0, continuous_actions=False)
    env = vmt.make_env("transport", multidiscrete_actions=False, **kwargs)
    env_multi = vmt.make_env("transport", multidiscrete_actions=True, **kwargs)

    for _ in range(n_steps):
        actions_multi = env_multi.get_random_actions()
        actions = []
        for a_multi, agent in zip(actions_multi, env.world.policy_agents):
            nvec = _full_nvec(agent, env.world)
            prods = jnp.asarray(
                [math.prod(nvec[i + 1 :]) for i in range(len(nvec))]
            )
            actions.append(jnp.sum(a_multi * prods, axis=1))
        env_multi.step(actions_multi)
        env.step(actions)
        for agent, agent_multi in zip(
            env.world.policy_agents, env_multi.world.policy_agents
        ):
            np.testing.assert_allclose(
                np.asarray(agent.action.u),
                np.asarray(agent_multi.action.u),
                atol=1e-6,
            )


def test_continuous_action_clamp(num_envs=4):
    env = vmt.make_env(
        "dispersion", num_envs=num_envs, seed=0, clamp_actions=True
    )
    big = [jnp.full((num_envs, a.action_size), 10.0) for a in env.agents]
    env.step(big)
    for agent in env.agents:
        u = np.asarray(agent.action.u)
        U = np.asarray(agent.action.u_range_tensor) * np.asarray(
            agent.action.u_multiplier_tensor
        )
        assert (np.abs(u) <= U + 1e-6).all()


def test_action_noise(num_envs=32):
    from vectorizedmultiagentsimulator_tpu.core import Agent, Sphere, World
    from vectorizedmultiagentsimulator_tpu.environment import Environment
    from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario

    class NoisyScenario(BaseScenario):
        def make_world(self, batch_dim, device=None, **kwargs):
            world = World(batch_dim)
            world.add_agent(
                Agent(name="a", shape=Sphere(0.05), u_noise=0.5)
            )
            return world

        def reset_world_at(self, env_index=None):
            pass

        def observation(self, agent):
            return jnp.concatenate(
                [agent.state.pos, agent.state.vel], axis=-1
            )

        def reward(self, agent):
            return jnp.zeros((self.world.batch_dim,))

    env = Environment(NoisyScenario(), num_envs=num_envs, seed=0)
    zero = [jnp.zeros((num_envs, a.action_size)) for a in env.agents]
    env.step(zero)
    u = np.asarray(env.agents[0].action.u)
    assert np.abs(u).sum() > 0, "u_noise should perturb zero actions"
