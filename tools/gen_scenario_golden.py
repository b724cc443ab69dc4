"""Generate scenario-level parity goldens by RUNNING the reference VMAS.

For each scenario: build the reference env (torch CPU), reset it, then roll
K steps with deterministic in-range actions while recording every entity's
full state trajectory.  ``tests/test_scenario_parity.py`` replays the same
actions through this framework from the same injected t=0 state and
compares the state trajectories — an end-to-end dynamics parity check per
scenario (process_action + controllers + dynamics + physics under each
scenario's world configuration).

Requires the reference at /root/reference and a ``gym`` shim:
    mkdir -p /tmp/gym_shim/gym
    echo "from gymnasium import Env, spaces" > /tmp/gym_shim/gym/__init__.py
    PYTHONPATH=/root/reference:/tmp/gym_shim python tools/gen_scenario_golden.py
"""
import math
import os
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

import vmas  # noqa: E402

B = 4
N_STEPS = 10
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

# Scenario -> kwargs. Excluded: football/road_traffic (scripted AI / map
# scale), discovery (reward-time RNG respawns targets), het_mass (random
# masses at reset).
SCENARIOS = {
    "dispersion": {},
    "transport": {},
    "reverse_transport": {},
    "balance": {},
    "wheel": {},
    "dropout": {},
    "passage": {},
    "flocking": dict(n_agents=3, n_obstacles=2),
    "navigation": dict(n_agents=3),
    "give_way": {},
    "multi_give_way": {},
    "wind_flocking": {},
    "ball_passage": {},
    "ball_trajectory": {},
    "buzz_wire": {},
    "joint_passage": {},
    "joint_passage_size": {},
    "sampling": {},
    "waterfall": {},
    "asym_joint": {},
    "circle_trajectory": {},
    "line_trajectory": {},
    "vel_control": {},
    "goal": {},
    "kinematic_bicycle": {},
    "diff_drive": {},
    "pollock": dict(n_agents=3, n_lines=2, n_boxes=2),
    "simple": {},
    "simple_adversary": {},
    "simple_push": {},
    "simple_reference": {},
    "simple_speaker_listener": {},
    "simple_spread": {},
    "simple_tag": {},
    "simple_world_comm": {},
    "simple_crypto": {},
}


# Extra goldens: filename suffix -> (scenario, make_env kwargs, options).
# These close the round-1 parity gap (VERDICT.md item 2): the scripted
# football AI (1v1: a single red AI agent always has possession, so the
# stochastic `check_better_positions` branch runs on an empty mask and the
# policy is fully deterministic), the physically-different football
# classes, discovery with LIDAR obs recorded (targets_respawn=False and
# the generator asserts no target is covered, so no reward-time RNG
# fires), the stateful Drone dynamics, and road_traffic map types '1'/'3'
# (the reference's internal scenario/path/point ids are recorded so the
# replay can inject them).
EXTRA = {
    "football_1v1ai": (
        "football",
        dict(
            n_blue_agents=2,
            n_red_agents=1,
            ai_red_agents=True,
            ai_blue_agents=False,
        ),
        dict(record_obs=True, record_rew=True),
    ),
    "football_diff": (
        "football",
        dict(
            n_blue_agents=5,
            n_red_agents=5,
            ai_red_agents=False,
            ai_blue_agents=False,
            physically_different=True,
        ),
        dict(record_obs=True, record_rew=True),
    ),
    "discovery": (
        "discovery",
        dict(n_agents=3, n_targets=2, targets_respawn=False),
        dict(record_obs=True, record_rew=True, assert_no_coverage=True),
    ),
    "drone": ("drone", {}, dict(record_obs=True, record_rew=True)),
    "het_mass": (
        "het_mass",
        {},
        dict(record_obs=True, record_rew=True, record_masses=True),
    ),
    "road_traffic_map1": (
        "road_traffic",
        dict(map_type="1", n_agents=4, is_add_noise=False),
        dict(record_rt_ids=True, record_obs=True, record_rew=True),
    ),
    "road_traffic_map3": (
        "road_traffic",
        dict(map_type="3", n_agents=4, is_add_noise=False),
        dict(record_rt_ids=True, record_obs=True, record_rew=True),
    ),
}


def deterministic_actions(env, t):
    """In-range, smooth actions: u_i = 0.5 * u_range * sin(t + k)."""
    actions = []
    k = 0
    for agent in env.agents:
        size = env.get_agent_action_size(agent)
        cols = []
        u_range = np.asarray(
            agent.action.u_range_tensor.cpu()
            if torch.is_tensor(agent.action.u_range_tensor)
            else agent.action.u_range_tensor
        ).reshape(-1)
        n_phys = agent.action.action_size
        for j in range(size):
            if j < n_phys:
                ur = u_range[j] if j < len(u_range) else 1.0
                col = 0.5 * ur * np.sin(
                    0.7 * t + k + np.arange(B) * 0.3
                ).astype(np.float32)
            else:
                # Trailing comm dims must be in [0, 1]
                col = (
                    0.25
                    + 0.25 * np.sin(0.7 * t + k + np.arange(B) * 0.3)
                ).astype(np.float32)
            cols.append(col)
            k += 1
        actions.append(np.stack(cols, axis=1))
    return actions


def record(scenario, kwargs, out_name=None, opts=None):
    opts = opts or {}
    env = vmas.make_env(
        scenario=scenario, num_envs=B, seed=0, wrapper=None, **kwargs
    )
    reset_obs = env.reset(seed=0)
    world = env.world
    entities = world.entities
    names = [e.name for e in entities]
    N = len(entities)

    pos = np.zeros((N_STEPS + 1, N, B, 2), np.float32)
    vel = np.zeros_like(pos)
    rot = np.zeros((N_STEPS + 1, N, B, 1), np.float32)
    ang_vel = np.zeros_like(rot)
    acts_rec = []
    obs_rec = [] if opts.get("record_obs") else None
    rew_rec = [] if opts.get("record_rew") else None

    def snap(t):
        for i, e in enumerate(entities):
            pos[t, i] = e.state.pos.cpu().numpy()
            vel[t, i] = e.state.vel.cpu().numpy()
            rot[t, i] = e.state.rot.cpu().numpy()
            ang_vel[t, i] = e.state.ang_vel.cpu().numpy()

    def snap_obs(obs):
        if obs_rec is not None:
            obs_rec.append(
                np.stack([o.cpu().numpy() for o in obs], axis=0)
            )  # [n_agents, B, obs_dim]

    snap(0)
    snap_obs(reset_obs)
    for t in range(N_STEPS):
        actions = deterministic_actions(env, t)
        acts_rec.append(np.concatenate([a.reshape(B, -1) for a in actions], axis=1))
        obs, rews, _dones, _infos = env.step(
            [torch.as_tensor(a) for a in actions]
        )
        snap(t + 1)
        snap_obs(obs)
        if rew_rec is not None:
            rew_rec.append(
                np.stack([r.cpu().numpy() for r in rews], axis=0)
            )  # [n_agents, B]
        if opts.get("assert_no_coverage"):
            covered = env.scenario.covered_targets
            assert not bool(covered.any()), (
                f"{scenario}: a target was covered at step {t} — the golden"
                " would consume reward-time RNG; choose a different"
                " seed/actions"
            )

    extra_fields = {}
    if obs_rec is not None:
        extra_fields["obs"] = np.stack(obs_rec)  # [T+1, n_agents, B, obs_dim]
    if rew_rec is not None:
        extra_fields["rew"] = np.stack(rew_rec)  # [T, n_agents, B]
    if opts.get("record_masses"):
        extra_fields["entity_mass"] = np.asarray(
            [float(e.mass) for e in entities], np.float32
        )
    if opts.get("record_rt_ids"):
        rel = env.scenario.ref_paths_agent_related
        extra_fields["rt_scenario_id"] = (
            rel.scenario_id.cpu().numpy().astype(np.int32)
        )
        extra_fields["rt_path_id"] = rel.path_id.cpu().numpy().astype(np.int32)
        extra_fields["rt_point_id"] = (
            rel.point_id.cpu().numpy().astype(np.int32)
        )

    action_sizes = [env.get_agent_action_size(a) for a in env.agents]
    np.savez_compressed(
        os.path.join(OUT, f"scenario_{out_name or scenario}.npz"),
        scenario_name=np.asarray(scenario),
        entity_names=np.asarray(names, dtype=object),
        agent_names=np.asarray([a.name for a in env.agents], dtype=object),
        action_sizes=np.asarray(action_sizes, np.int32),
        kwargs_json=np.asarray(repr(kwargs)),
        pos=pos,
        vel=vel,
        rot=rot,
        ang_vel=ang_vel,
        actions=np.stack(acts_rec),  # [T, B, sum(action_sizes)]
        **extra_fields,
    )
    print(f"{scenario} -> {out_name or scenario}: recorded {N} entities x {N_STEPS} steps")


def main():
    os.makedirs(OUT, exist_ok=True)
    only = sys.argv[1:] or None
    for scenario, kwargs in SCENARIOS.items():
        if only and scenario not in only:
            continue
        try:
            record(scenario, kwargs)
        except Exception as e:  # noqa: BLE001
            print(f"{scenario}: FAILED to record ({type(e).__name__}: {e})")
    for out_name, (scenario, kwargs, opts) in EXTRA.items():
        if only and out_name not in only:
            continue
        try:
            record(scenario, kwargs, out_name=out_name, opts=opts)
        except Exception as e:  # noqa: BLE001
            print(f"{out_name}: FAILED to record ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
