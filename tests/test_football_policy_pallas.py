"""Fused football scripted-AI planner kernel vs its jnp mirror.

The kernel is deterministic given its operands (samples are drawn
outside), so kernel-vs-mirror is directly comparable; values differ only
by ulp-level reassociation (the kernel collapses the wall-displacement
norms to |mag|), so best-position agreement is checked with a tolerance
plus an exact-match count on the candidate selection.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vectorizedmultiagentsimulator_tpu.ops import football_policy_pallas as fpp


@pytest.fixture()
def pallas_interpret(monkeypatch):
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    yield


def _params(T, S=2, has_noise=False):
    return fpp.PlannerParams(
        T=T,
        S=S,
        clamp_y=0.725,
        clamp_x=1.475,
        goal_y=0.15,
        goal_x=0.1,
        wall_w2=0.75,
        wall_l2=1.5,
        margin0=0.0 if not has_noise else 0.3,
        has_noise=has_noise,
    )


def _inputs(key, B, T, S, has_noise):
    ks = jax.random.split(key, 7)
    u = lambda k, shape, s: jax.random.uniform(k, shape, minval=-s, maxval=s)
    agents = u(ks[0], (B, T, 2), 1.2)
    target = u(ks[1], (B, T, 2), 1.2)
    samples = jax.random.normal(ks[2], (B, T, S, 2)) * 0.5
    ball = u(ks[3], (B, 2), 1.2)
    tnet = jnp.tile(jnp.asarray([[1.55, 0.0]]), (B, 1))
    onet = jnp.tile(jnp.asarray([[-1.55, 0.0]]), (B, 1))
    vn = (
        jax.random.normal(ks[4], (B, T, S + 1)) * 0.1 if has_noise else None
    )
    return agents, target, samples, ball, tnet, onet, vn


@pytest.mark.parametrize("T,has_noise", [(1, False), (3, False), (5, True)])
def test_kernel_matches_mirror(pallas_interpret, T, has_noise):
    p = _params(T, has_noise=has_noise)
    B = 67  # non-multiple of the lane tile: exercises grid padding
    args = _inputs(jax.random.PRNGKey(0), B, T, p.S, has_noise)
    got = np.asarray(fpp.fused_best_positions(p, *args))
    want = np.asarray(fpp.best_positions_jnp(p, *args))
    # Each output row is one of S+1 candidate positions; ulp-level value
    # differences can only flip the selection on near-ties, so nearly
    # every row must match the mirror exactly.
    exact = np.all(got == want, axis=-1)
    assert exact.mean() > 0.99, f"selection agreement {exact.mean():.4f}"
    # and the non-exact rows must still be valid clamped candidates
    assert np.isfinite(got).all()
    assert np.abs(got[..., 1]).max() <= p.clamp_y + 1e-6
    assert np.abs(got[..., 0]).max() <= p.clamp_x + p.goal_x + 1e-6


def test_backward_is_mirror_vjp(pallas_interpret):
    p = _params(3)
    B = 16
    args = _inputs(jax.random.PRNGKey(1), B, 3, p.S, False)

    def loss_kernel(agents, target):
        out = fpp.fused_best_positions(p, agents, target, *args[2:])
        return jnp.sum(out**2)

    def loss_mirror(agents, target):
        out = fpp.best_positions_jnp(p, agents, target, *args[2:])
        return jnp.sum(out**2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1))(args[0], args[1])
    g2 = jax.grad(loss_mirror, argnums=(0, 1))(args[0], args[1])
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_football_step_gate_consistency(pallas_interpret):
    """A full football env step with the planner kernel ON vs OFF: both
    paths consume the same keys, so trajectories agree to fp tolerance
    (selection flips on value near-ties are possible in principle; with
    2 envs x 2 red agents x 2 steps they do not occur at this seed)."""
    import vectorizedmultiagentsimulator_tpu as vmt

    def rollout(enable):
        os.environ["VMT_PALLAS_POLICY"] = "1" if enable else "0"
        try:
            env = vmt.make_env(
                "football", num_envs=2, seed=0,
                n_blue_agents=2, n_red_agents=2,
            )
            env.reset(seed=0)
            outs = []
            for _ in range(2):
                acts = env.get_random_actions()
                obs, rew, done, info = env.step(acts)
                outs.append(np.asarray(obs[0]))
            return np.stack(outs)
        finally:
            del os.environ["VMT_PALLAS_POLICY"]

    np.testing.assert_allclose(rollout(True), rollout(False), atol=1e-5)
