"""Scripted-policy behavior invariants (reference tests/test_scenarios/).

Re-expressions of the reference's strongest per-scenario assertions that
are not plain heuristic-progress checks (those live in
test_heuristics.py): dropout's energy trade-off
(test_dropout.py:78-128), dispersion's exact eaten-reward accounting in
both reward modes (test_dispersion.py:34-111), give_way's scripted
crossing (test_give_way.py:25-50), passage's switch-at-the-passage
navigation (test_passage.py:30-68), and reverse_transport's
push-from-inside completion (test_reverse_transport.py:32-55).

All loops are bounded (the reference loops `while not done`); hitting the
bound fails the test.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt
from vectorizedmultiagentsimulator_tpu.scenarios.dropout import (
    DEFAULT_ENERGY_COEFF,
)

N_ENVS = 4


def _clamp(x, u):
    return np.clip(np.asarray(x), -u, u)


# ---------------------------------------------------------------- dropout


def _dropout_env(n_agents, energy_coeff=DEFAULT_ENERGY_COEFF):
    return vmt.make_env(
        "dropout",
        num_envs=N_ENVS,
        seed=0,
        n_agents=n_agents,
        energy_coeff=energy_coeff,
    )


@pytest.mark.parametrize("n_agents", [1, 4])
def test_dropout_closest_agent_alone_reaches_goal(n_agents):
    """One agent (the closest) acting alone finishes with positive total
    reward, and the reward is shared identically across agents
    (test_dropout.py:38-72: obs[-3:-1] is the vector to the goal)."""
    env = _dropout_env(n_agents)
    obs = env.reset()
    u = env.agents[0].u_range
    # pick the agent closest to the goal in env 0 (reference does the same)
    dists = [
        float(np.linalg.norm(np.asarray(o)[0, -3:-1])) for o in obs
    ]
    best = int(np.argmin(dists))
    total = np.zeros(N_ENVS)
    for _ in range(300):
        actions = [
            _clamp(np.asarray(obs[i])[:, -3:-1], u)
            if i == best
            else np.zeros((N_ENVS, 2), np.float32)
            for i in range(n_agents)
        ]
        obs, rews, dones, _ = env.step(actions)
        rews = [np.asarray(r) for r in rews]
        for r in rews[1:]:
            np.testing.assert_array_equal(rews[0], r)
        total += rews[0]
        dones = np.asarray(dones)
        assert (total[dones] > 0).all()
        if dones.any():
            return
    pytest.fail("no env finished within 300 steps")


def test_dropout_energy_tradeoff(n_agents=5, n_steps=100):
    """All 5 agents moving at once: net reward is NEGATIVE under the
    default energy penalty but POSITIVE with the penalty off
    (test_dropout.py:113-128)."""

    def all_agents_total(energy_coeff):
        env = _dropout_env(n_agents, energy_coeff=energy_coeff)
        obs = env.reset()
        u = env.agents[0].u_range
        total = np.zeros(N_ENVS)
        for _ in range(n_steps):
            actions = [
                _clamp(np.asarray(o)[:, -3:-1], u) for o in obs
            ]
            obs, rews, dones, _ = env.step(actions)
            total += np.asarray(rews[0])
            for i in np.nonzero(np.asarray(dones))[0]:
                env.reset_at(int(i))
        return float(total.mean())

    assert all_agents_total(DEFAULT_ENERGY_COEFF) < 0
    assert all_agents_total(0.0) > 0


# ------------------------------------------------------------- dispersion


@pytest.mark.parametrize("share_reward", [False, True])
def test_dispersion_exact_food_accounting(share_reward, n_agents=4):
    """Agent i greedily eats food i; at done, the eaten-reward totals are
    exact: sum over agents == n_agents (individual rewards) or every
    agent's total == n_agents (shared) — test_dispersion.py:34-111.
    Food i's relative position sits at obs[:, 4+3i : 4+3i+2]."""
    env = vmt.make_env(
        "dispersion",
        num_envs=N_ENVS,
        seed=0,
        n_agents=n_agents,
        share_reward=share_reward,
        penalise_by_time=False,
    )
    obs = env.reset()
    u = env.agents[0].u_range
    total = np.zeros((N_ENVS, n_agents))
    all_done = np.zeros(N_ENVS, bool)
    for _ in range(400):
        actions = [
            _clamp(np.asarray(obs[i])[:, 4 + 3 * i : 6 + 3 * i], u)
            for i in range(n_agents)
        ]
        obs, rews, dones, _ = env.step(actions)
        total += np.stack([np.asarray(r) for r in rews], axis=1)
        dones = np.asarray(dones)
        if dones.any():
            if share_reward:
                np.testing.assert_array_equal(
                    total[dones], float(n_agents)
                )
            else:
                np.testing.assert_array_equal(
                    total[dones].sum(-1).astype(np.int64), n_agents
                )
            total[dones] = 0
            all_done |= dones
            for i in np.nonzero(dones)[0]:
                env.reset_at(int(i))
        if all_done.all():
            return
    pytest.fail("not all envs finished within 400 steps")


# --------------------------------------------------------------- give_way


def test_give_way_scripted_crossing(threshold=17.0):
    """The reference's scripted maneuver (agent 1 hugs the wall while
    agent 2 drives straight through) accumulates > 17 total shaping
    reward in every env (test_give_way.py:25-50)."""
    env = vmt.make_env(
        "give_way", num_envs=N_ENVS, seed=0, mirror_passage=False
    )
    obs = env.reset()
    u = env.agents[0].u_range
    total = np.zeros(N_ENVS)
    for _ in range(600):
        # agent 1: forward at half speed, duck down while agent 2 is
        # still left of center, back up after
        duck = (np.asarray(obs[1])[:, 0] < 0).all()
        a1 = np.tile(
            np.asarray([u / 2, -u if duck else u], np.float32), (N_ENVS, 1)
        )
        a2 = np.tile(np.asarray([-u / 3, 0.0], np.float32), (N_ENVS, 1))
        obs, rews, dones, _ = env.step([a1, a2])
        total += sum(np.asarray(r) for r in rews)
        for i in np.nonzero(np.asarray(dones))[0]:
            env.reset_at(int(i))
        if (total > threshold).all():
            return
    pytest.fail(f"total reward {total} never exceeded {threshold}")


# ---------------------------------------------------------------- passage


def test_passage_switch_at_passage(n_agents=5):
    """Each agent heads for the passage gap, then switches to its goal
    once through — every env terminates (test_passage.py:30-68;
    obs[:, 4:6] is the goal vector, obs[:, 6:8] the gap vector)."""
    env = vmt.make_env(
        "passage", num_envs=N_ENVS, seed=0, n_passages=1, shared_reward=True
    )
    obs = env.reset()
    u = env.agents[0].u_range
    switched = np.zeros((n_agents, N_ENVS), bool)
    all_done = np.zeros(N_ENVS, bool)
    for _ in range(500):
        actions = []
        for i in range(n_agents):
            o = np.asarray(obs[i])
            to_goal, to_gap = o[:, 4:6], o[:, 6:8]
            switched[i] |= np.linalg.norm(to_gap, axis=1) <= 0.025
            act = np.where(
                switched[i][:, None],
                _clamp(2 * to_goal, u),
                _clamp(2 * to_gap, u),
            )
            actions.append(act.astype(np.float32))
        obs, rews, dones, _ = env.step(actions)
        dones = np.asarray(dones)
        if dones.any():
            all_done |= dones
            switched[:, dones] = False
            for i in np.nonzero(dones)[0]:
                env.reset_at(int(i))
        if all_done.all():
            return
    pytest.fail("not all envs completed the passage within 500 steps")


# ------------------------------------------------------ reverse_transport


def test_reverse_transport_push_from_inside(n_agents=5):
    """Agents inside the hollow box push along goal - package
    (action = -obs[:, -2:]) until the package reaches the goal in every
    env (test_reverse_transport.py:32-55)."""
    env = vmt.make_env(
        "reverse_transport", num_envs=N_ENVS, seed=0, n_agents=n_agents
    )
    obs = env.reset()
    u = env.agents[0].u_range
    all_done = np.zeros(N_ENVS, bool)
    # the hollow box is heavy and drag-limited: all 4 envs finish in
    # ~1200 steps (the reference loops unbounded)
    for _ in range(2000):
        actions = [
            _clamp(-np.asarray(o)[:, -2:], u) for o in obs
        ]
        obs, rews, dones, _ = env.step(actions)
        dones = np.asarray(dones)
        if dones.any():
            all_done |= dones
            for i in np.nonzero(dones)[0]:
                env.reset_at(int(i))
        if all_done.all():
            return
    pytest.fail("package never reached the goal in some env")
