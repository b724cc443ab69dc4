"""Per-env dynamic mass (extras-backed, the dynamic analogue of
dyn_gravity): physics must honor per-env mass overrides, and het_mass must
resample masses at every reset (reference het_mass.py:50-54)."""
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt


def test_dyn_mass_scales_acceleration():
    env = vmt.make_env("het_mass", num_envs=4, seed=0)
    agent = env.world.agents[0]
    # Same force, masses 1 vs 2 vs 4 vs 8 -> accelerations 1 : 1/2 : 1/4.
    agent.mass = jnp.asarray([1.0, 2.0, 4.0, 8.0]).reshape(4, 1)
    env.world.agents[1].mass = jnp.ones((4, 1))
    for a in env.world.agents:
        a.set_pos(jnp.zeros((4, 2)), batch_index=None)
        a.set_vel(jnp.zeros((4, 2)), batch_index=None)
    acts = [jnp.tile(jnp.asarray([[1.0, 0.0]]), (4, 1)) for _ in env.agents]
    env.step(acts)
    vx = np.asarray(agent.state.vel)[:, 0]
    np.testing.assert_allclose(vx[0] / vx[1], 2.0, rtol=1e-5)
    np.testing.assert_allclose(vx[0] / vx[2], 4.0, rtol=1e-5)
    np.testing.assert_allclose(vx[0] / vx[3], 8.0, rtol=1e-5)


def test_het_mass_resamples_on_reset():
    env = vmt.make_env("het_mass", num_envs=4, seed=0)
    m0 = np.asarray(env.world.agents[0].mass).copy()
    assert m0.shape == (4, 1)
    assert len(np.unique(m0.round(6))) > 1, "per-env masses should differ"
    env.reset_at(1)
    m1 = np.asarray(env.world.agents[0].mass)
    assert m1[1, 0] != m0[1, 0], "reset_at(1) must resample env 1's mass"
    np.testing.assert_array_equal(
        np.delete(m1, 1, axis=0), np.delete(m0, 1, axis=0)
    ), "other envs' masses must be untouched"
    env.reset()
    m2 = np.asarray(env.world.agents[0].mass)
    assert (m2 != m1).all(), "full reset must resample every env's mass"
