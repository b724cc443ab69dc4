"""Scenario-level dynamics parity against the REFERENCE implementation.

``tools/gen_scenario_golden.py`` runs the reference VMAS (torch CPU) per
scenario and records every entity's state trajectory under deterministic
actions.  Here the same actions are replayed through this framework from
the same injected t=0 state; the state trajectories must track within
fp32-chaos tolerances.  This exercises, per scenario: the world
configuration, action decoding, scenario ``process_action`` (controllers,
scripted agents), every dynamics model, and the full physics pipeline.
"""
import ast
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import vectorizedmultiagentsimulator_tpu as vmt

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

SCENARIOS = sorted(
    f[len("scenario_") : -len(".npz")]
    for f in os.listdir(GOLDEN)
    if f.startswith("scenario_")
) if os.path.isdir(GOLDEN) else []

# Stiff joint systems (10-15 substeps/step with constraint forces ~1e3)
# amplify fp32 reassociation noise roughly x2 per substep: pointwise
# trajectory comparison is only meaningful for the first few steps, with a
# looser base tolerance.  (step-1 max diffs are ~1e-4..1e-3; see
# CLAUDE.md.)
_STIFF = {
    "asym_joint": dict(base=3e-3, growth=2.2, max_steps=4, max_frac=0.5),
    # 15 substeps/step with joint_force 900: the stiffest config — only the
    # first two steps are pointwise comparable.
    "ball_trajectory": dict(base=3e-3, growth=2.2, max_steps=2, max_frac=0.5),
    "buzz_wire": dict(base=3e-3, growth=2.2, max_steps=4, max_frac=0.5),
}
_DEFAULT = dict(base=5e-4, growth=1.6, max_steps=10**9, max_frac=0.25)


@pytest.mark.parametrize("scenario", SCENARIOS)
def test_scenario_dynamics_parity(scenario):
    data = np.load(
        os.path.join(GOLDEN, f"scenario_{scenario}.npz"), allow_pickle=True
    )
    kwargs = ast.literal_eval(str(data["kwargs_json"]))
    # Golden variants (e.g. football_1v1ai) store the real scenario name.
    scenario_name = (
        str(data["scenario_name"]) if "scenario_name" in data else scenario
    )
    B = data["pos"].shape[2]
    n_steps = data["actions"].shape[0]

    env = vmt.make_env(scenario_name, num_envs=B, seed=0, **kwargs)
    env.reset(seed=0)

    if "entity_mass" in data:
        # Inject the reference's reset-sampled masses (het_mass) through
        # the dynamic per-env mass mechanism.
        for i, n in enumerate([str(x) for x in data["entity_names"]]):
            ref_mass = float(data["entity_mass"][i])
            e = {x.name: x for x in env.world.entities}[n]
            e.mass = jnp.full((B, 1), ref_mass, jnp.float32)

    if "rt_path_id" in data:
        # road_traffic: inject the reference's internal path-selection
        # state (within-scenario ids) alongside the poses below.
        env.scenario.inject_reference_ids(
            np.asarray(data["rt_scenario_id"]),
            np.asarray(data["rt_path_id"]),
            np.asarray(data["rt_point_id"]),
        )

    names = [str(n) for n in data["entity_names"]]
    mine_by_name = {e.name: e for e in env.world.entities}
    assert set(names) == set(mine_by_name), (
        f"entity sets differ: {sorted(names)} vs {sorted(mine_by_name)}"
    )

    # Inject the recorded t=0 state: agents first so joint observers fire
    # before joint landmarks receive their recorded pose.
    agent_names = {a.name for a in env.world.agents}
    ordered = [n for n in names if n in agent_names] + [
        n for n in names if n not in agent_names
    ]
    idx_of = {n: i for i, n in enumerate(names)}
    for n in ordered:
        e = mine_by_name[n]
        i = idx_of[n]
        e.set_pos(jnp.asarray(data["pos"][0, i]), batch_index=None)
        e.set_rot(jnp.asarray(data["rot"][0, i]), batch_index=None)
        e.set_vel(jnp.asarray(data["vel"][0, i]), batch_index=None)
        e.set_ang_vel(jnp.asarray(data["ang_vel"][0, i]), batch_index=None)

    for i, n in enumerate(names):
        e = mine_by_name[n]
        np.testing.assert_allclose(
            np.asarray(e.state.pos), data["pos"][0, i], atol=1e-6,
            err_msg=f"{scenario}: {n} t=0 pos",
        )

    action_sizes = [int(s) for s in data["action_sizes"]]
    assert action_sizes == [
        env.get_agent_action_size(a) for a in env.agents
    ], f"{scenario}: action sizes differ"

    tol = _STIFF.get(scenario, _DEFAULT)
    diverged_envs = np.zeros((B,), dtype=bool)
    for t in range(n_steps):
        flat = data["actions"][t]  # [B, sum(sizes)]
        actions, ofs = [], 0
        for size in action_sizes:
            actions.append(jnp.asarray(flat[:, ofs : ofs + size]))
            ofs += size
        obs, rews, _dones, _infos = env.step(actions)

        if t >= tol["max_steps"]:
            continue
        atol = min(tol["base"] * (tol["growth"] ** t), 0.05)
        if "obs" in data:
            # Observation parity (e.g. discovery's LIDAR measurements);
            # same pointwise tolerance + divergence accounting as states.
            ref_obs = data["obs"][t + 1]  # [n_agents, B, obs_dim]
            for ai in range(ref_obs.shape[0]):
                mine_obs = np.asarray(obs[ai])
                diff = np.abs(mine_obs - ref_obs[ai])
                bound = atol + 2e-3 * np.abs(ref_obs[ai])
                diverged_envs |= (diff > bound).any(axis=-1)
        if "rew" in data and t >= 1:
            # t=0 is skipped: shaping-reward baselines (e.g. football's
            # pos_shaping) were computed at OUR reset spawn, while the
            # reference's were computed at the injected (reference) spawn;
            # from t=1 both sides' baselines come from the shared
            # trajectory.
            ref_rew = data["rew"][t]  # [n_agents, B]
            for ai in range(ref_rew.shape[0]):
                mine_rew = np.asarray(rews[ai]).reshape(-1)
                diff = np.abs(mine_rew - ref_rew[ai])
                bound = atol + 2e-3 * np.abs(ref_rew[ai])
                diverged_envs |= diff > bound
        for i, n in enumerate(names):
            e = mine_by_name[n]
            for field, ref in (
                ("pos", data["pos"]),
                ("vel", data["vel"]),
                ("rot", data["rot"]),
                ("ang_vel", data["ang_vel"]),
            ):
                mine = np.asarray(getattr(e.state, field))
                target = ref[t + 1, i]
                diff = np.abs(mine - target)
                bound = atol + 2e-3 * np.abs(target)
                diverged_envs |= (diff > bound).any(axis=-1)
        # Grazing contacts bifurcate discretely at fp32 (see
        # test_golden_physics); allow isolated bifurcations.
        assert diverged_envs.mean() <= tol["max_frac"] + 1e-9, (
            f"{scenario}: {diverged_envs.sum()}/{B} envs diverged from the"
            f" reference trajectory by step {t}"
        )
