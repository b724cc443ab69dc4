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


def test_pallas_choice_pinned_at_construction(pallas_interpret):
    """The VMT_PALLAS_* flags are read ONCE per world (at construction /
    Environment freeze): an env built with the fused step disabled must
    stay on the jnp path even if the flag flips before its first step —
    otherwise A/B comparisons like _compare silently compare Pallas
    against itself."""
    from vectorizedmultiagentsimulator_tpu.ops import physics_pallas

    os.environ["VMT_PALLAS_STEP"] = "0"
    env_j = vmt.make_env("transport", num_envs=4, seed=0)
    os.environ["VMT_PALLAS_STEP"] = "1"
    env_p = vmt.make_env("transport", num_envs=4, seed=0)
    assert env_j.world._pallas_choices["step"] is False
    assert env_p.world._pallas_choices["step"] is True
    assert env_j.state.phys_pack is None
    assert env_p.state.phys_pack is not None

    called = []
    orig = physics_pallas.fused_step
    orig_packed = physics_pallas.fused_step_packed

    def spy(*a, **k):
        called.append(1)
        return orig(*a, **k)

    def spy_packed(*a, **k):
        called.append(1)
        return orig_packed(*a, **k)

    physics_pallas.fused_step = spy
    physics_pallas.fused_step_packed = spy_packed
    try:
        env_j.step(env_j.get_random_actions())
        assert not called, "jnp-pinned env took the fused kernel"
        env_p.step(env_p.get_random_actions())
        assert called, "pallas-pinned env skipped the fused kernel"
    finally:
        physics_pallas.fused_step = orig
        physics_pallas.fused_step_packed = orig_packed


def test_phys_pack_mirror_coherence(pallas_interpret):
    """state.phys_pack must stay bitwise equal to the native
    pos/vel/rot/ang_vel through steps, partial resets and scenario
    set_pos writes (discovery respawns targets mid-step)."""
    import jax.numpy as jnp

    from vectorizedmultiagentsimulator_tpu.ops import physics_pallas as pp

    def assert_mirror(env):
        s = env.state
        R = pp.pack_R(s.pos.shape[0])
        N = s.pos.shape[1]
        for packed, native, shape in (
            (s.phys_pack[0], s.pos, (N, 2)),
            (s.phys_pack[1], s.vel, (N, 2)),
            (s.phys_pack[2], s.rot, (N, 1)),
            (s.phys_pack[3], s.ang_vel, (N, 1)),
        ):
            np.testing.assert_array_equal(
                np.asarray(pp.unpack_rows(packed, shape, R)),
                np.asarray(native),
            )

    env = vmt.make_env(
        "discovery", num_envs=4, seed=0, n_agents=3, n_targets=3
    )
    assert env.state.phys_pack is not None
    assert_mirror(env)
    for _ in range(3):
        env.step(env.get_random_actions())
        assert_mirror(env)
    env.reset_at(2)
    assert_mirror(env)

    # Hand-built states: replacing natives with phys_pack=None is the
    # sanctioned edit pattern — the step takes the native-interface
    # kernel and must produce the same physics as a coherent mirror.
    s = env.state
    moved = s.replace(pos=s.pos + 0.25, phys_pack=None)
    env2 = vmt.make_env(
        "discovery", num_envs=4, seed=0, n_agents=3, n_targets=3
    )
    state_out, _ = env2.step_fn(moved, env2.get_random_actions())
    ref_in = s.replace(pos=s.pos + 0.25)
    ref_in = ref_in.replace(
        phys_pack=pp.pack_state(ref_in.pos, ref_in.vel, ref_in.rot,
                                ref_in.ang_vel)
    )
    env3 = vmt.make_env(
        "discovery", num_envs=4, seed=0, n_agents=3, n_targets=3
    )
    state_ref, _ = env3.step_fn(ref_in, env3.get_random_actions())
    assert state_ref.phys_pack is not None
    np.testing.assert_array_equal(
        np.asarray(state_out.pos), np.asarray(state_ref.pos)
    )


def test_phys_pack_sharding(pallas_interpret):
    """The packed mirror shards on dim 1 when the mesh divides B/R
    (num_envs=64, R=8 -> BT=8 over 8 devices), keeping the
    zero-collective sharded step; an incompatible mesh (num_envs=16 ->
    BT=2) strips the mirror and falls back to the native-interface
    kernel — both must match the unsharded jnp path exactly."""
    import jax
    import jax.numpy as jnp

    from vectorizedmultiagentsimulator_tpu.parallel import (
        make_mesh,
        shard_environment,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh()

    for B, keeps_pack in ((64, True), (16, False)):
        env = vmt.make_env("transport", num_envs=B, seed=0)
        assert env.state.phys_pack is not None
        shard_environment(env, mesh)
        assert (env.state.phys_pack is not None) == keeps_pack, B
        acts = tuple(
            jnp.zeros((B, a.action_size)) for a in env.agents
        )
        if keeps_pack:
            assert "envs" in str(env.state.phys_pack[0].sharding.spec)
            txt = (
                jax.jit(env.step_fn)
                .lower(env.state, acts)
                .compile()
                .as_text()
            )
            for coll in ("all-gather", "all-reduce", "collective-permute"):
                assert txt.count(coll) == 0, f"packed sharded step: {coll}"

        os.environ["VMT_PALLAS_STEP"] = "0"
        env_ref = vmt.make_env("transport", num_envs=B, seed=0)
        os.environ["VMT_PALLAS_STEP"] = "1"

        # Step IMMEDIATELY after shard_environment, no reset in between
        # (the jax_ppo mesh flow).  shard_state must rebuild the packed
        # mirror shard-locally: device_put-ing the eagerly built GLOBAL
        # pack paired each shard with other envs' columns (regression:
        # round-4 advisor finding, obs diverged by ~3 at B=64/8dev).
        for _ in range(2):
            o_noreset = env.step(list(acts))
            o_noreset_ref = env_ref.step(list(acts))
            for a, b in zip(o_noreset[0], o_noreset_ref[0]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        env.reset(seed=0)
        o_sharded = env.step(list(acts))

        env_ref.reset(seed=0)
        o_ref = env_ref.step(list(acts))
        for a, b in zip(o_sharded[0], o_ref[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
