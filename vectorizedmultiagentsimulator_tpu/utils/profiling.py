"""Profiling / timing harness (SURVEY.md §5.1 — the reference only has
wall-clock prints in examples; here: a proper ``block_until_ready`` timing
loop plus ``jax.profiler`` trace capture for TPU performance work).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


def benchmark_step(
    env,
    n_steps: int = 100,
    n_repeats: int = 3,
    actions=None,
    warmup: bool = True,
):
    """Measure steady-state env-steps/sec of ``env`` with a scan rollout.

    Returns a dict with wall time, env-steps/s and agent-steps/s.
    """
    import jax.numpy as jnp

    if actions is None:
        key = jax.random.PRNGKey(0)
        actions = tuple(
            jax.random.uniform(
                jax.random.fold_in(key, i),
                (env.num_envs, agent.action_size),
                minval=-1.0,
                maxval=1.0,
            )
            for i, agent in enumerate(env.agents)
        )

    step_fn = env.step_fn

    def body(state, _):
        state, outs = step_fn(state, actions)
        obs = outs[0]
        rews = outs[1]
        sink = sum(jnp.sum(o[:, 0]) for o in obs) + sum(
            jnp.sum(r) for r in rews
        )
        return state, sink

    @jax.jit
    def rollout(state):
        return jax.lax.scan(body, state, None, length=n_steps)

    state = env.state
    if warmup:
        state, sink = rollout(state)
        jax.block_until_ready(sink)

    times = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        state, sink = rollout(state)
        jax.block_until_ready(sink)
        times.append(time.perf_counter() - t0)
    # Validate by fetching the sink values: a failed async execution can
    # make block_until_ready return immediately without surfacing the
    # error (seen with remote-device plugins under memory pressure) —
    # the host transfer re-raises it and the finite check catches NaNs.
    import numpy as np

    sink_host = np.asarray(sink)
    if not np.isfinite(sink_host).all():
        raise FloatingPointError(
            "benchmark_step: non-finite values in rollout outputs"
        )
    best = min(times)
    if best * 1e3 < 1.0 and n_steps * env.num_envs > 1_000_000:
        raise RuntimeError(
            f"benchmark_step: implausible wall time {best:.6f}s for "
            f"{n_steps} steps x {env.num_envs} envs — execution likely "
            "failed asynchronously; re-run this config in a fresh process"
        )
    eps = n_steps * env.num_envs / best
    return {
        "wall_s": best,
        "env_steps_per_s": eps,
        "agent_steps_per_s": eps * env.n_agents,
        "times": times,
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vmt_profile", host_tracer_level: int = 2):
    """Capture a ``jax.profiler`` trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def profile_step(env, n_steps: int = 20, log_dir: str = "/tmp/vmt_profile"):
    """Run a short traced rollout for kernel-level inspection."""
    with trace(log_dir):
        benchmark_step(env, n_steps=n_steps, n_repeats=1, warmup=True)
    return log_dir
