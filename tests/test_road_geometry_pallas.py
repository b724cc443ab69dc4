"""Fused road_traffic geometry kernel vs the jnp bundle (interpret mode
on CPU; the same kernel runs compiled on TPU)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

import vectorizedmultiagentsimulator_tpu as vmt
from vectorizedmultiagentsimulator_tpu.ops import road_geometry_pallas as rgp


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """Serializing this module's huge road_traffic step executable for
    the persistent cache has segfaulted mid-suite (XLA:CPU
    put_executable_and_time, 2026-08-17); keep the cache off for these
    tests only."""
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


@pytest.fixture()
def geom_interpret(monkeypatch):
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    yield


def _bundle_pair(map_type, num_envs=5, jitter=True, **kw):
    os.environ["VMT_PALLAS_GEOM"] = "0"
    np.random.seed(0)
    env = vmt.make_env(
        "road_traffic", num_envs=num_envs, map_type=map_type, seed=0, **kw
    )
    s = env.scenario
    pos = jnp.stack([a.state.pos for a in env.world.agents], axis=1)
    rot = jnp.stack([a.state.rot[:, 0] for a in env.world.agents], axis=1)
    if jitter:
        rng = np.random.RandomState(1)
        pos = pos + jnp.asarray(
            rng.uniform(-0.1, 0.1, pos.shape).astype(np.float32)
        )
        rot = rot + jnp.asarray(
            rng.uniform(-0.5, 0.5, rot.shape).astype(np.float32)
        )
    return s, pos, rot


NAMES = [
    "ref", "left_all", "right_all", "boundaries", "short_term",
    "vertices", "lanelets", "entry", "exit", "agents",
]


@pytest.mark.parametrize(
    "map_type,kw",
    [("1", {}), ("3", {"n_agents": 4})],
    ids=["map1", "map3"],
)
@pytest.mark.parametrize("with_collisions", [False, True])
def test_fused_geometry_matches_jnp(
    geom_interpret, map_type, kw, with_collisions
):
    s, pos, rot = _bundle_pair(map_type, **kw)
    ref = s._bundle_jnp_pure(pos, rot, s.path_id, with_collisions)
    fused = rgp.fused_geometry(
        s, with_collisions, pos, rot, s.path_id.astype(jnp.float32)
    )
    for name, r, f in zip(NAMES, ref, fused):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), atol=2e-5, rtol=1e-5,
            err_msg=f"map{map_type} wc={with_collisions} {name}",
        )


def test_fused_geometry_exact_on_reset_poses(geom_interpret):
    """Agents spawn exactly on polyline vertices — the adjacent segments
    tie; the EPS-tolerant index rule must keep the DISCRETE outputs
    (closest-index selection -> short_term, and the exactly-zero ref
    distance) bit-equal across paths.  Continuous boundary distances may
    differ by FMA/fusion ulps between separately compiled programs."""
    s, pos, rot = _bundle_pair("1", num_envs=16, jitter=False)
    ref = s._bundle_jnp_pure(pos, rot, s.path_id, False)
    fused = rgp.fused_geometry(
        s, False, pos, rot, s.path_id.astype(jnp.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(fused[4]), np.asarray(ref[4]), err_msg="short_term"
    )
    np.testing.assert_array_equal(
        np.asarray(fused[0]), np.asarray(ref[0]), err_msg="ref"
    )
    for name, r, f in zip(NAMES[1:4], ref[1:4], fused[1:4]):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), atol=1e-6, err_msg=name
        )


def _rollout(map_type, geom, steps=3, **kw):
    os.environ["VMT_PALLAS_GEOM"] = geom
    os.environ["VMT_PALLAS_STEP"] = "0"
    np.random.seed(0)
    env = vmt.make_env(
        "road_traffic", num_envs=3, map_type=map_type, seed=0, **kw
    )
    env.reset(seed=0)
    out = []
    for _ in range(steps):
        acts = env.get_random_actions()
        out.append(env.step(acts))
    return out


@pytest.mark.parametrize(
    "map_type,kw",
    [
        ("1", {}),
        ("3", {"n_agents": 4}),
        ("1", {"is_testing_mode": True, "n_agents": 4}),
    ],
    ids=["map1", "map3", "testing"],
)
def test_fused_geometry_env_rollout(geom_interpret, map_type, kw):
    ref = _rollout(map_type, "0", **kw)
    fused = _rollout(map_type, "1", **kw)
    for t, ((oj, rj, dj, _), (op, rp, dp, _)) in enumerate(
        zip(ref, fused)
    ):
        for a, b in zip(op, oj):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5,
                err_msg=f"obs diverged at step {t}",
            )
        for a, b in zip(rp, rj):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5,
                err_msg=f"reward diverged at step {t}",
            )
        np.testing.assert_array_equal(np.asarray(dp), np.asarray(dj))


def test_fused_neighbor_obs_matches_jnp(geom_interpret):
    """The top-k neighbor-observation kernel vs its jnp mirror: values to
    reduction-order ulps, identical first-min selection, finite nonzero
    grads through the custom VJP."""
    A, k = 6, 2
    half_l, half_w = 0.08, 0.05
    rng = np.random.RandomState(0)
    B = 64
    pos = jnp.asarray(rng.randn(B, A, 2).astype(np.float32))
    rot = jnp.asarray(rng.uniform(-3, 3, (B, A)).astype(np.float32))
    vel = jnp.asarray(rng.randn(B, A, 2).astype(np.float32))
    d = jnp.linalg.norm(pos[:, :, None] - pos[:, None], axis=-1)
    big = jnp.max(d, axis=(-2, -1), keepdims=True) + 1
    d = jnp.where(jnp.eye(A, dtype=bool)[None], big, d)

    class S:
        n_agents = A
        n_nearing_agents_observed = k
        l_f = half_l
        l_r = half_l
        agent_width = 2 * half_w

    scn = S()
    out_k = rgp.fused_neighbor_obs(scn, pos, rot, vel, d)
    out_j = rgp._neighbor_obs_jnp(A, k, half_l, half_w, pos, rot, vel, d)
    names = ["nd", "pos_ego", "rot_rel", "vel_ego", "vert_ego"]
    for n, a, b in zip(names, out_k, out_j):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=n
        )
    # selection (nd) must be bit-equal: same first-min tie rule
    np.testing.assert_array_equal(np.asarray(out_k[0]), np.asarray(out_j[0]))

    def loss(p, r, v):
        o = rgp.fused_neighbor_obs(scn, p, r, v, d)
        return sum(jnp.sum(x) for x in o)

    g = jax.grad(loss, argnums=(0, 1, 2))(pos, rot, vel)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert all(np.abs(np.asarray(x)).max() > 0 for x in g)


def test_fused_geometry_grads(geom_interpret):
    """The custom-VJP backward (jnp recompute) is finite and matches the
    jnp path's gradients, including at exactly-on-path spawn poses."""
    os.environ["VMT_PALLAS_GEOM"] = "1"
    s, pos, rot = _bundle_pair("1", num_envs=2, jitter=False)

    def loss_fused(p, r):
        out = rgp.fused_geometry(
            s, False, p, r, s.path_id.astype(jnp.float32)
        )
        return sum(jnp.sum(o) for o in out)

    def loss_jnp(p, r):
        out = s._bundle_jnp_pure(p, r, s.path_id, False)
        return sum(jnp.sum(o) for o in out)

    g = jax.grad(loss_fused, argnums=(0, 1))(pos, rot)
    gj = jax.grad(loss_jnp, argnums=(0, 1))(pos, rot)
    for a, b in zip(g, gj):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    assert sum(np.abs(np.asarray(a)).sum() for a in g) > 0
