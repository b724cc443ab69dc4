"""Benchmark: transport @ 30k parallel envs, full environment steps.

Measures steady-state env-steps/sec of the complete pipeline — action
decode, dynamics, physics (box-sphere narrowphase, shaping), observations,
rewards, dones — with rollouts driven by ``lax.scan`` fully on-device.

Baseline (BASELINE.md): the reference does 100 steps x 30k envs of
simple_spread in 10.15 s on an RTX 2080 Ti => ~296k env-steps/s.
``vs_baseline`` is measured-throughput / 296k (we run the heavier transport
workload, per the north-star config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

def _cpu_fingerprint() -> str:
    """Key the compile cache by host CPU features: XLA:CPU AOT entries
    from a host with different features crash (SIGILL) when loaded
    after a VM migration."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nofp"


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser(f"~/.cache/vmt_jax_{_cpu_fingerprint()}"),
)

import jax
import jax.numpy as jnp

import vectorizedmultiagentsimulator_tpu as vmt
from vectorizedmultiagentsimulator_tpu.utils.backend_probe import (
    ensure_reachable_backend,
)

# The remote-TPU tunnel can be down; jax backend init then hangs forever.
# Probe it in a subprocess and degrade to a CPU run (reduced steps) rather
# than hang the whole bench.
_PLATFORM = ensure_reachable_backend()
_CPU_FALLBACK = _PLATFORM == "cpu" and "axon" in os.environ.get(
    "JAX_PLATFORMS", ""
)

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 30_000))
# 4000 steps per scan: the remote-TPU tunnel adds a fixed ~30 ms to every
# program invocation; at 1000 steps that still inflated transport@30k
# (~56 us/step on-device) by ~35% wall.  4000 steps amortizes it to <15%
# (measured 370M -> 481M env-steps/s with no code change); heavy all-pairs
# scenarios stay chunked below to dodge the tunnel watchdog.
N_STEPS = int(os.environ.get("BENCH_STEPS", 4000))
if _CPU_FALLBACK:
    # Keep the fallback bounded: fewer envs/steps, still a valid
    # steady-state throughput measurement of the same pipeline.
    NUM_ENVS = int(os.environ.get("BENCH_CPU_FALLBACK_ENVS", 8192))
    N_STEPS = int(os.environ.get("BENCH_CPU_FALLBACK_STEPS", 100))
REFERENCE_EPS = 296_000.0  # simple_spread 30k envs on RTX 2080 Ti

# All-pairs stress scenes: long single-program scans at large batch trip
# the remote-TPU tunnel watchdog (CLAUDE.md: pollock scan(20+)@4096
# faults; short scans pass).  Chunk their rollouts; the per-invocation
# overhead stays amortized across the chunk.
HEAVY_SCENARIOS = {"pollock": 10, "waterfall": 50}


def main():
    scenario = os.environ.get("BENCH_SCENARIO", "transport")
    env = vmt.make_env(scenario, num_envs=NUM_ENVS, seed=0)
    key = jax.random.PRNGKey(0)
    actions = tuple(
        jax.random.uniform(
            jax.random.fold_in(key, i),
            (NUM_ENVS, agent.action_size),
            minval=-1.0,
            maxval=1.0,
        )
        for i, agent in enumerate(env.agents)
    )

    step_fn = env.step_fn

    def body(state, _):
        state, outs = step_fn(state, actions)
        # Consume the outputs (obs/rews/dones) with a cheap reduction so the
        # full per-step pipeline is computed but not stacked in memory.
        if env.terminated_truncated:
            obs, rews, term, trunc, infos = outs
        else:
            obs, rews, dones, infos = outs
        sink = sum(jnp.sum(o[:, 0]) for o in obs) + sum(
            jnp.sum(r) for r in rews
        )
        return state, sink

    chunk = int(
        os.environ.get("BENCH_CHUNK", HEAVY_SCENARIOS.get(scenario, N_STEPS))
    )
    chunk = min(chunk, N_STEPS)
    n_chunks = max(1, N_STEPS // chunk)
    total_steps = n_chunks * chunk

    @jax.jit
    def rollout(state):
        return jax.lax.scan(body, state, None, length=chunk)

    # Warmup/compile
    state, sink = rollout(env.state)
    jax.block_until_ready(sink)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, sink = rollout(state)
        jax.block_until_ready(sink)
        times.append(time.perf_counter() - t0)
    # Fetch the sink to surface silently-failed async executions (a
    # failed run can make block_until_ready return immediately).
    import numpy as np

    sink_host = np.asarray(sink)
    if not np.isfinite(sink_host).all():
        raise FloatingPointError("bench: non-finite rollout outputs")
    best = min(times)
    eps = total_steps * NUM_ENVS / best
    print(
        json.dumps(
            {
                "metric": f"{scenario}_env_steps_per_sec_{NUM_ENVS}envs"
                + ("_cpu_fallback" if _CPU_FALLBACK else ""),
                "value": round(eps),
                "unit": "env-steps/s",
                "vs_baseline": round(eps / REFERENCE_EPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
