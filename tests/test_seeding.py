"""Seeding / RNG isolation tests (reference tests/test_vmas.py:308-323).

The explicit PRNG-key chain in the state pytree gives the ``local_seed``
sandbox semantics by construction: same seed -> identical streams, and
external numpy/python RNG activity cannot perturb the env stream.
"""
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt


def _tree_equal(a, b):
    return all(
        np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b)
    )


def test_same_seed_same_reset(scenario="dispersion", num_envs=6):
    e1 = vmt.make_env(scenario, num_envs=num_envs, seed=5)
    e2 = vmt.make_env(scenario, num_envs=num_envs, seed=5)
    assert _tree_equal(e1.reset(seed=5), e2.reset(seed=5))


def test_different_seed_different_reset(scenario="dispersion", num_envs=6):
    env = vmt.make_env(scenario, num_envs=num_envs, seed=5)
    o1 = env.reset(seed=5)
    o2 = env.reset(seed=6)
    assert not _tree_equal(o1, o2)


def test_external_rng_does_not_perturb(scenario="dispersion", num_envs=6):
    """External numpy/python RNG calls between env ops must not change the
    env stream (the analogue of the reference's local_seed sandbox)."""
    e1 = vmt.make_env(scenario, num_envs=num_envs, seed=5)
    o1 = e1.reset(seed=7)
    a1 = e1.get_random_actions()
    s1 = e1.step(a1)

    e2 = vmt.make_env(scenario, num_envs=num_envs, seed=5)
    o2 = e2.reset(seed=7)
    np.random.seed(123)
    np.random.rand(100)
    random.seed(55)
    random.random()
    a2 = e2.get_random_actions()
    s2 = e2.step(a2)

    assert _tree_equal(o1, o2)
    assert _tree_equal(a1, a2)
    assert _tree_equal(s1[0], s2[0])


def test_rollout_deterministic(scenario="simple_tag", num_envs=4, n_steps=4):
    outs = []
    for _ in range(2):
        env = vmt.make_env(scenario, num_envs=num_envs, seed=3)
        env.reset(seed=3)
        traj = []
        for _ in range(n_steps):
            obs, rews, dones, infos = env.step(env.get_random_actions())
            traj.append(obs[0])
        outs.append(traj)
    assert _tree_equal(outs[0], outs[1])


def test_reset_at_only_affects_index(scenario="dispersion", num_envs=6):
    env = vmt.make_env(scenario, num_envs=num_envs, seed=1)
    env.reset(seed=1)
    for _ in range(3):
        env.step(env.get_random_actions())
    pos_before = np.asarray(env.world.state.pos)
    env.reset_at(2)
    pos_after = np.asarray(env.world.state.pos)
    mask = np.ones(num_envs, dtype=bool)
    mask[2] = False
    np.testing.assert_allclose(pos_before[mask], pos_after[mask])
    assert not np.allclose(pos_before[2], pos_after[2])
    assert int(env.steps[2]) == 0
    assert (np.asarray(env.steps)[mask] == 3).all()
