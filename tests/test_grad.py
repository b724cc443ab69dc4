"""Differentiability tests (reference tests/test_vmas.py:278-305).

``jax.grad`` of a rollout loss with respect to the first action must be
finite and non-trivially nonzero — the soft-contact physics is smooth by
construction.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt


@pytest.mark.parametrize(
    "scenario", ["dispersion", "transport", "balance", "simple_spread"]
)
def test_grad_through_rollout(scenario, num_envs=2, n_steps=3):
    env = vmt.make_env(
        scenario, num_envs=num_envs, seed=0, grad_enabled=True
    )
    state0 = env.state
    action_sizes = [a.action_size for a in env.agents]

    def loss(first_action):
        actions = []
        idx = 0
        for size in action_sizes:
            actions.append(first_action[:, idx : idx + size])
            idx += size
        state = state0
        total = 0.0
        for t in range(n_steps):
            state, (obs, rews, dones, infos) = env.step_fn(
                state, tuple(actions)
            )
            # Reference loss: obs.mean() + rews.mean()
            # (tests/test_vmas.py:304)
            total = total + sum(jnp.mean(o) for o in obs) + sum(
                jnp.mean(r) for r in rews
            )
        return total

    first_action = jnp.full(
        (num_envs, sum(action_sizes)), 0.1, jnp.float32
    )
    grad = jax.grad(loss)(first_action)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).sum() > 0


def test_grad_disabled_stops_gradient(num_envs=2):
    env = vmt.make_env(
        "dispersion", num_envs=num_envs, seed=0, grad_enabled=False
    )
    state0 = env.state

    def loss(action):
        state, (obs, rews, dones, infos) = env.step_fn(
            state0, (action,) * len(env.agents)
        )
        return sum(jnp.sum(r) for r in rews)

    action = jnp.full((num_envs, 2), 0.1, jnp.float32)
    grad = jax.grad(loss)(action)
    np.testing.assert_allclose(np.asarray(grad), 0.0)
