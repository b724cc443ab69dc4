"""road_traffic map types 2/3, testing mode and per-agent resets.

Covers the reference's initial-state-buffer machinery
(road_traffic.py:852-866, 947-967, 2302-2310), sub-map training
(road_traffic.py:1057-1093, 2332-2345) and testing-mode per-agent resets
(road_traffic.py:2313-2330) in their jit-native form.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import vectorizedmultiagentsimulator_tpu as vmt


def _make(**kw):
    kw.setdefault("num_envs", 2)
    kw.setdefault("n_agents", 4)
    kw.setdefault("seed", 0)
    return vmt.make_env("road_traffic", **kw)


def _step_zero(env):
    acts = [
        jnp.zeros((env.num_envs, a.action_size), jnp.float32)
        for a in env.agents
    ]
    return env.step(acts)


def _force_overlap(env, env_i=0):
    """Plant agents 0 and 1 of one env crossing each other (guaranteed
    strict interX agent-agent collision at the next step; coincident
    rectangles would NOT register — interX tests strict crossings)."""
    B = env.num_envs
    target = jnp.asarray([2.25, 2.0], jnp.float32)
    for k, a in enumerate((env.agents[0], env.agents[1])):
        off = jnp.asarray([0.01 * k, 0.005 * k], jnp.float32)
        a.set_pos(
            jnp.broadcast_to(target + off, (B, 2)), batch_index=env_i
        )
        a.set_rot(
            jnp.full((B, 1), 0.8 * k, jnp.float32), batch_index=env_i
        )
        a.set_vel(jnp.zeros((B, 2)), batch_index=env_i)


def test_n_observed_steps_accepted():
    env = _make(n_observed_steps=3)
    obs = env.reset()
    # Parity: the reference stores n_observed_steps but its observation
    # assembly always reads the latest step only, so the obs width is
    # unchanged.
    ref = _make()
    assert obs[0].shape == ref.reset()[0].shape


def test_n_observed_steps_validated():
    with pytest.raises(AssertionError):
        _make(n_observed_steps=0)
    with pytest.raises(AssertionError):
        _make(n_observed_steps=99)


def test_map_type_3_paths_within_group():
    env = _make(map_type="3", num_envs=8)
    env.reset()
    sc = env.scenario
    sid = np.asarray(sc.scenario_id)
    assert set(np.unique(sid)) <= {1, 2, 3}
    # Default scenario_probabilities=[1,0,0] -> all intersection
    assert (sid == 1).all()
    pid = np.asarray(sc.path_id)
    lo = sc.group_offsets[sid - 1]
    hi = lo + sc.group_sizes[sid - 1]
    assert (pid >= lo[:, None]).all() and (pid < hi[:, None]).all()


def test_map_type_3_scenario_probabilities():
    env = _make(
        map_type="3",
        n_agents=3,
        num_envs=32,
        scenario_probabilities=[0.0, 1.0, 0.0],
    )
    env.reset()
    sc = env.scenario
    assert (np.asarray(sc.scenario_id) == 2).all()
    pid = np.asarray(sc.path_id)
    lo, hi = sc.group_offsets[1], sc.group_offsets[1] + sc.group_sizes[1]
    assert (pid >= lo).all() and (pid < hi).all()


def test_map_type_3_agent_cap():
    with pytest.raises(ValueError):
        _make(map_type="3", n_agents=11)
    with pytest.raises(ValueError):
        _make(
            map_type="3",
            n_agents=6,
            scenario_probabilities=[0.0, 0.5, 0.5],
        )


def test_testing_mode_never_done_and_replaces_colliders():
    env = _make(is_testing_mode=True)
    env.reset()
    sc = env.scenario
    min_dist = sc.reset_agent_min_distance
    _force_overlap(env, env_i=0)
    obs, rews, dones, infos = _step_zero(env)
    assert not bool(jnp.any(dones)), "testing mode must never terminate"
    # The two colliding agents of env 0 were re-placed with the
    # guaranteed minimum mutual separation; one physics step alone could
    # not have separated two overlapping, non-colliding boxes.
    p0 = env.agents[0].state.pos[0]
    p1 = env.agents[1].state.pos[0]
    assert float(jnp.linalg.norm(p0 - p1)) >= min_dist * 0.99
    # Collision flags for the reset env were cleared
    assert not bool(jnp.any(sc.collide_agents[0]))


def test_map2_records_and_replays():
    env = _make(
        map_type="2",
        probability_use_recording=1.0,
        max_steps=None,
    )
    env.reset()
    sc = env.scenario
    for _ in range(3):
        _step_zero(env)
    assert int(sc.isb_len[0]) == 0
    _force_overlap(env, env_i=0)
    obs, rews, dones, infos = _step_zero(env)
    assert bool(dones[0]), "agent-agent collision must terminate env 0"
    assert int(sc.isb_len[0]) == 1, "collision must record into the buffer"
    recorded = np.asarray(sc.isb_buf[0, 0])  # [A, 8]
    # Replay: probability_use_recording=1 -> reset restores the recorded
    # poses and path ids
    env.reset_at(0)
    for i, a in enumerate(env.agents):
        np.testing.assert_allclose(
            np.asarray(a.state.pos[0]), recorded[i, 0:2], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(a.state.rot[0, 0]), recorded[i, 2], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(a.state.vel[0]), recorded[i, 3:5], atol=1e-6
        )
    assert (np.asarray(sc.path_id[0]) == recorded[:, 6].astype(int)).all()
    # Env 1 did not collide: nothing recorded there
    assert int(sc.isb_len[1]) == 0


def test_per_agent_reset_api():
    env = _make()
    env.reset()
    sc = env.scenario
    before = np.asarray(
        jnp.stack([a.state.pos for a in env.agents], axis=1)
    )  # [B, A, 2]
    sc.reset_world_at(env_index=0, agent_index=2)
    after = np.asarray(jnp.stack([a.state.pos for a in env.agents], axis=1))
    # Only (env 0, agent 2) moved
    moved = np.linalg.norm(after - before, axis=-1) > 1e-9
    expected = np.zeros_like(moved)
    expected[0, 2] = True
    assert (moved == expected).all()
    # Re-placement respects the minimum mutual distance
    d = np.linalg.norm(after[0, 2] - np.delete(after[0], 2, axis=0), axis=-1)
    assert (d >= sc.reset_agent_min_distance * 0.99).all()


def test_done_side_effects_gated_on_reset_path():
    """Reset-path done() queries must not record initial-state-buffer rows
    or re-place agents — those are per-step semantics (reference runs them
    in done() after world.step, road_traffic.py:2302-2345)."""
    import jax.numpy as jnp

    env = _make(map_type="2", jit_compile=False)
    sc = env.scenario
    sc.probability_record = 1.0
    env.step(env.get_random_actions())
    sc.collide_agents = jnp.ones_like(sc.collide_agents)
    l0 = np.asarray(sc.isb_len).copy()
    sc.done_query(in_reset=True)
    assert (np.asarray(sc.isb_len) == l0).all(), "gated done() recorded"
    sc.done()
    assert (np.asarray(sc.isb_len) > l0).all(), "step-path done() must record"


def test_onehot_selections_exact():
    """The one-hot einsum path/point lookups must select exactly (they
    replaced take_along_axis gathers; precision=HIGHEST guards against
    TPU's default bf16 matmul truncation of the f32 data operand)."""
    import jax
    import jax.numpy as jnp
    from vectorizedmultiagentsimulator_tpu.scenarios.road_traffic import (
        get_short_term_reference_path,
    )

    key = jax.random.PRNGKey(0)
    B, A, P = 16, 3, 37
    poly = jax.random.normal(key, (B, A, P, 2))
    idx = jax.random.randint(jax.random.fold_in(key, 1), (B, A), 0, P - 20)
    n_pts = jnp.full((B, A), P)
    is_loop = jnp.zeros((B, A), bool)
    pts, future = get_short_term_reference_path(
        poly, idx, 4, is_loop, n_pts, sample_interval=2, n_points_shift=1
    )
    ref = jnp.take_along_axis(
        poly, future[..., None].repeat(2, axis=-1), axis=-2
    )
    assert np.array_equal(np.asarray(pts), np.asarray(ref)), (
        "one-hot selection is not exact"
    )
