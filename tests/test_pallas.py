"""Pallas kernels vs jnp reference paths (run in interpret mode on CPU;
the same kernels run compiled on TPU)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt


@pytest.fixture()
def pallas_interpret(monkeypatch):
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VMT_PALLAS_STEP", "1")
    monkeypatch.setenv("VMT_PALLAS_LIDAR", "1")
    yield
    # monkeypatch restores


def _compare(scenario, n_steps=3, num_envs=4, **kw):
    os.environ["VMT_PALLAS_STEP"] = "0"
    os.environ["VMT_PALLAS_LIDAR"] = "0"
    np.random.seed(0)  # some scenarios draw construction params from np RNG
    env_j = vmt.make_env(scenario, num_envs=num_envs, seed=0, **kw)
    os.environ["VMT_PALLAS_STEP"] = "1"
    os.environ["VMT_PALLAS_LIDAR"] = "1"
    np.random.seed(0)
    env_p = vmt.make_env(scenario, num_envs=num_envs, seed=0, **kw)
    env_j.reset(seed=0)
    env_p.reset(seed=0)
    for t in range(n_steps):
        acts = env_j.get_random_actions()
        env_p.get_random_actions()  # keep the PRNG keys in lockstep:
        # scenario obs-noise / scripted policies draw from the state key
        oj = env_j.step(acts)
        op = env_p.step(acts)
        for a, b in zip(op[0], oj[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5,
                err_msg=f"{scenario} obs diverged at step {t}",
            )


def test_fused_step_matches_jnp(pallas_interpret):
    from vectorizedmultiagentsimulator_tpu.ops import physics_pallas

    env = vmt.make_env("transport", num_envs=4, seed=0)
    assert physics_pallas.step_supported(env.world)
    _compare("transport")


def test_fused_step_substeps_and_clamps(pallas_interpret):
    # simple_tag: substeps=10, collidable landmarks, max_speed clamps
    _compare("simple_tag")


def test_fused_step_line_sphere(pallas_interpret):
    # wheel: line-sphere narrowphase + a rotating line
    _compare("wheel", n_steps=2)


def test_fused_step_box_line_hollow(pallas_interpret):
    # balance: line-sphere + box-sphere + box-line with walls
    _compare("balance", n_steps=2, num_envs=2)


def test_fused_step_box_box(pallas_interpret):
    # kinematic_bicycle: the box-box narrowphase (8-candidate min)
    _compare("kinematic_bicycle", n_steps=2, num_envs=2)


def test_fused_step_joints(pallas_interpret):
    # asym_joint: 3 rotating joints with anchor deltas + obs noise
    # (exercises the PRNG-lockstep in _compare too)
    _compare("asym_joint", n_steps=2, num_envs=2)


def test_fused_step_friction(pallas_interpret):
    # give_way: linear friction + line-sphere contacts
    _compare("give_way", n_steps=2, num_envs=2)


def test_fused_step_dyn_gravity(pallas_interpret):
    # wind_flocking: per-env dynamic gravity ("wind") from extras
    _compare("wind_flocking", n_steps=2, num_envs=2)


def test_fused_lidar_matches_jnp(pallas_interpret):
    _compare("discovery", n_agents=3, n_targets=3)


def test_fused_step_partitions_under_gspmd(pallas_interpret):
    """The custom_partitioning rule must keep the sharded step free of
    collectives (GSPMD cannot partition a raw pallas_call: without the
    rule this compiles with 18 all-gathers + 196 collective-permutes)."""
    import jax
    import jax.numpy as jnp

    from vectorizedmultiagentsimulator_tpu.parallel import (
        make_mesh,
        shard_environment,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    env = vmt.make_env("transport", num_envs=16, seed=0)
    mesh = make_mesh()
    shard_environment(env, mesh)
    acts = tuple(
        jnp.zeros((env.num_envs, a.action_size)) for a in env.agents
    )
    txt = jax.jit(env.step_fn).lower(env.state, acts).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute"):
        assert txt.count(coll) == 0, f"sharded fused step emits {coll}"

    # And the sharded step must execute + match the unsharded jnp path.
    env2 = vmt.make_env("transport", num_envs=16, seed=0)
    shard_environment(env2, mesh)
    env2.reset(seed=0)
    o1 = env2.step(list(acts))
    os.environ["VMT_PALLAS_STEP"] = "0"
    env3 = vmt.make_env("transport", num_envs=16, seed=0)
    env3.reset(seed=0)
    o2 = env3.step(list(acts))
    for a, b in zip(o1[0], o2[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _all_scenarios():
    from vectorizedmultiagentsimulator_tpu.scenarios import _REGISTRY

    return sorted(_REGISTRY)


_SWEEP_KW = {
    "road_traffic": dict(n_agents=4),
    "football": dict(n_blue_agents=2, n_red_agents=2),
    "pollock": dict(n_agents=3, n_lines=2, n_boxes=2),
    "discovery": dict(n_agents=3, n_targets=3),
    "navigation": dict(n_agents=3),
    "flocking": dict(n_agents=3, n_obstacles=2),
}


@pytest.mark.parametrize("name", _all_scenarios())
def test_fused_step_scenario_sweep(pallas_interpret, name):
    """Every scenario whose world config takes the fused Pallas step is
    A/B'd against the jnp path on every run (tiny config, interpret mode).
    Unsupported configs (pollock/waterfall fall back — see
    test_unsupported_configs_fall_back) just assert the fallback."""
    from vectorizedmultiagentsimulator_tpu.ops import physics_pallas

    kw = _SWEEP_KW.get(name, {})
    env = vmt.make_env(name, num_envs=2, seed=0, **kw)
    if not physics_pallas.step_supported(env.world):
        # Fallback path: still steps (jnp), nothing to A/B.
        env.step(env.get_random_actions())
        return
    del env
    _compare(name, n_steps=2, num_envs=2, **kw)


def test_unsupported_configs_fall_back(pallas_interpret):
    from vectorizedmultiagentsimulator_tpu.ops import physics_pallas

    env = vmt.make_env("pollock", num_envs=2, seed=0)  # all-pairs: too big
    assert not physics_pallas.step_supported(env.world)
    env = vmt.make_env("waterfall", num_envs=2, seed=0)  # joints
    assert not physics_pallas.step_supported(env.world)
    # ...and they still run
    env.step(env.get_random_actions())
