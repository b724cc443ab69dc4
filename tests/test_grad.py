"""Differentiability tests (reference tests/test_vmas.py:278-305).

``jax.grad`` of a rollout loss with respect to the first action must be
finite and non-trivially nonzero — the soft-contact physics is smooth by
construction.  Mirrors the reference's coverage: EVERY scenario except
football / simple_crypto / road_traffic (the same three the reference
excludes, tests/test_vmas.py:281-285).  The Pallas custom-VJP paths
(ops/physics_pallas.py, ops/raycast_pallas.py) are additionally
gradient-checked against the jnp path.
"""
import importlib
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt

scenarios_module = importlib.import_module(
    "vectorizedmultiagentsimulator_tpu.scenarios"
)

# Reference exclusions (tests/test_vmas.py:281-285): football and
# road_traffic for scale/scripted AI, simple_crypto for its discrete
# key-mixing observations.
_EXCLUDED = {"football", "simple_crypto", "road_traffic"}

# Small-world overrides to keep grad-rollout compile time bounded.
_KWARGS = {
    # lidar on: pollock's default obs/reward are constant zeros (its
    # gradient w.r.t. actions is correctly identically zero); with LIDAR
    # the loss differentiates through the ray-cast path instead.
    "pollock": dict(n_agents=3, n_lines=2, n_boxes=2, lidar=True),
    "discovery": dict(n_agents=3, n_targets=3),
    "navigation": dict(n_agents=3),
    "flocking": dict(n_agents=3, n_obstacles=2),
}


def _grad_scenarios():
    return [n for n in scenarios_module.names() if n not in _EXCLUDED]


def _rollout_grad(scenario, num_envs=2, n_steps=3, **kwargs):
    env = vmt.make_env(
        scenario, num_envs=num_envs, seed=0, grad_enabled=True, **kwargs
    )
    state0 = env.state
    # Full env action width (physical + comm dims for non-silent agents
    # in dim_c worlds, e.g. simple_reference).
    action_sizes = [env.get_agent_action_size(a) for a in env.agents]

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
    return jax.grad(loss)(first_action)


@pytest.mark.parametrize("scenario", _grad_scenarios())
def test_grad_through_rollout(scenario):
    grad = _rollout_grad(scenario, **_KWARGS.get(scenario, {}))
    assert np.isfinite(np.asarray(grad)).all(), (
        f"{scenario}: NaN/inf gradient"
    )
    assert np.abs(np.asarray(grad)).sum() > 0, (
        f"{scenario}: gradient is identically zero"
    )


@pytest.mark.parametrize(
    "scenario,kwargs",
    [
        ("transport", {}),  # box-sphere narrowphase + shaping rewards
        ("balance", {}),  # gravity + line/box narrowphase + joints-free
        ("discovery", dict(n_agents=3, n_targets=3)),  # LIDAR custom VJP
    ],
)
def test_grad_pallas_matches_jnp(scenario, kwargs, monkeypatch):
    """The fused Pallas step/LIDAR custom VJPs must produce the same
    gradients as the jnp path (interpret mode on CPU)."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VMT_PALLAS_STEP", "0")
    monkeypatch.setenv("VMT_PALLAS_LIDAR", "0")
    g_jnp = _rollout_grad(scenario, n_steps=2, **kwargs)
    monkeypatch.setenv("VMT_PALLAS_STEP", "1")
    monkeypatch.setenv("VMT_PALLAS_LIDAR", "1")
    g_pallas = _rollout_grad(scenario, n_steps=2, **kwargs)
    np.testing.assert_allclose(
        np.asarray(g_pallas),
        np.asarray(g_jnp),
        atol=1e-5,
        rtol=1e-4,
        err_msg=f"{scenario}: pallas grad != jnp grad",
    )
    assert np.abs(np.asarray(g_pallas)).sum() > 0


def test_grad_road_traffic_beyond_reference():
    """road_traffic gradients — BEYOND the reference, which excludes the
    scenario from its differentiability tests (tests/test_vmas.py:281-285).
    The polyline-distance pipeline and the mutual-distance matrix are
    NaN-guarded (safe_norm / guarded sqrt), so grads through obs+rewards
    are finite here."""
    grad = _rollout_grad(
        "road_traffic", n_steps=2, n_agents=4, map_type="1"
    )
    g = np.asarray(grad)
    assert np.isfinite(g).all(), "road_traffic: NaN/inf gradient"
    assert np.abs(g).sum() > 0, "road_traffic: gradient identically zero"


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
