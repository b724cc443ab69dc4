"""LIDAR vectorization consistency (reference tests/test_lidar.py:11-29).

Vectorized and per-ray LIDAR paths must agree on the pollock stress scene.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt


def test_lidar_vectorized_consistency(num_envs=4, n_steps=3):
    env_vec = vmt.make_env(
        "pollock",
        num_envs=num_envs,
        seed=0,
        lidar=True,
        vectorized_lidar=True,
        n_agents=3,
        n_lines=2,
        n_boxes=2,
    )
    env_loop = vmt.make_env(
        "pollock",
        num_envs=num_envs,
        seed=0,
        lidar=True,
        vectorized_lidar=False,
        n_agents=3,
        n_lines=2,
        n_boxes=2,
    )
    obs_vec = env_vec.reset(seed=0)
    obs_loop = env_loop.reset(seed=0)
    for o_v, o_l in zip(obs_vec, obs_loop):
        np.testing.assert_allclose(
            np.asarray(o_v), np.asarray(o_l), atol=1e-5
        )
    for _ in range(n_steps):
        actions = env_vec.get_random_actions()
        obs_vec = env_vec.step(actions)[0]
        obs_loop = env_loop.step(actions)[0]
        for o_v, o_l in zip(obs_vec, obs_loop):
            np.testing.assert_allclose(
                np.asarray(o_v), np.asarray(o_l), atol=1e-5
            )


def test_lidar_detects_entity(num_envs=2):
    """A sphere straight ahead must shorten the corresponding rays."""
    import jax.numpy as jnp

    from vectorizedmultiagentsimulator_tpu.core import (
        Agent,
        Landmark,
        Sphere,
        World,
    )
    from vectorizedmultiagentsimulator_tpu.sensors import Lidar

    world = World(num_envs)
    agent = Agent(name="a", shape=Sphere(0.05))
    world.add_agent(agent)
    target = Landmark(name="t", shape=Sphere(0.1), collide=True)
    world.add_landmark(target)
    lidar = Lidar(world, n_rays=8, max_range=2.0)
    lidar.agent = agent
    world.finalize()
    agent.set_pos(jnp.zeros((num_envs, 2)))
    target.set_pos(jnp.broadcast_to(jnp.asarray([1.0, 0.0]), (num_envs, 2)))
    meas = np.asarray(lidar.measure())
    assert np.allclose(meas[:, 0], 0.9, atol=1e-3)  # ray at angle 0 hits
    assert np.allclose(meas[:, 4], 2.0)  # ray pointing away misses
