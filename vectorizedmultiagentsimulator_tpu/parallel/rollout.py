"""On-device rollouts via ``lax.scan``.

The reference steps its env from python one step at a time
(``examples/use_vmas_env.py``); here whole trajectories compile into one
XLA program — the step never returns to the host.  Combine with
:mod:`.sharding` to run the scan over a multi-chip mesh.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def rollout(
    env,
    policy: Optional[Callable] = None,
    n_steps: int = 100,
    key=None,
    collect=("obs", "rews", "dones"),
):
    """Roll ``env`` forward ``n_steps`` fully on-device.

    ``policy(obs_list, key) -> actions_tuple`` maps per-agent observations
    to per-agent actions inside the scan; defaults to uniform random
    actions in each agent's range.

    Returns ``(final_state, traj)`` where ``traj`` is a dict of stacked
    outputs with a leading time axis.  ``env.state`` is updated to the
    final state.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    u_ranges = [
        jnp.asarray(a.action.u_range_tensor) for a in env.agents
    ]
    action_sizes = [a.action_size for a in env.agents]
    num_envs = env.num_envs
    step_fn = env.step_fn

    def default_policy(obs, k):
        keys = jax.random.split(k, len(action_sizes))
        return tuple(
            jax.random.uniform(
                keys[i],
                (num_envs, action_sizes[i]),
                minval=-u_ranges[i],
                maxval=u_ranges[i],
            )
            for i in range(len(action_sizes))
        )

    policy_fn = policy if policy is not None else default_policy

    def body(carry, _):
        state, obs, k = carry
        k, sub = jax.random.split(k)
        actions = policy_fn(obs, sub)
        state, outs = step_fn(state, tuple(actions))
        if env.terminated_truncated:
            new_obs, rews, term, trunc, infos = outs
            out = {
                "obs": new_obs,
                "rews": rews,
                "terminated": term,
                "truncated": trunc,
            }
        else:
            new_obs, rews, dones, infos = outs
            out = {"obs": new_obs, "rews": rews, "dones": dones}
        collected = {k2: v for k2, v in out.items() if k2 in collect}
        return (state, tuple(new_obs), k), collected

    # One eager step to obtain the initial obs structure
    state0 = env.state
    obs0 = env._get_from_scenario(
        get_observations=True,
        get_rewards=False,
        get_infos=False,
        get_dones=False,
        dict_agent_names=False,
    )[0]

    @jax.jit
    def scan_rollout(state, obs, k):
        return jax.lax.scan(
            body, (state, tuple(obs), k), None, length=n_steps
        )

    (state, _, _), traj = scan_rollout(state0, obs0, key)
    env.state = state
    return state, traj
