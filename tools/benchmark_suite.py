"""Benchmark sweep (parity artifact for the reference's
``mpe_comparison/mpe_performance_comparison.py``: 100 steps of
simple_spread sweeping 1 -> 30k envs, plus the BASELINE.md config suite).

Writes one JSON line per (scenario, num_envs) with wall time and
env-steps/s, and a markdown table at the end.

Usage:  python tools/benchmark_suite.py [--quick]
"""
import argparse
import json
import sys
import time

import jax

sys.path.insert(0, ".")

import vectorizedmultiagentsimulator_tpu as vmt
from vectorizedmultiagentsimulator_tpu.utils.profiling import benchmark_step

REFERENCE_SIMPLE_SPREAD_EPS = 296_000.0  # RTX 2080 Ti, BASELINE.md

SUITE = [
    # (scenario, num_envs, kwargs) — BASELINE.md configs
    ("simple_spread", 1_000, {}),
    ("simple_spread", 10_000, {}),
    ("simple_spread", 30_000, {}),
    ("dispersion", 32, {}),
    ("transport", 1_000, {}),
    ("transport", 30_000, {}),
    ("balance", 4_000, {}),
    ("navigation", 10_000, {}),
    ("discovery", 10_000, {}),
    ("football", 30_000, dict(n_blue_agents=5, n_red_agents=5)),
    ("road_traffic", 1_000, {}),
]

QUICK = [
    ("simple_spread", 1_000, {}),
    ("transport", 1_000, {}),
]

# The reference's exact headline artifact: 100 steps of simple_spread
# (3 agents) at each env count from 1 to 30k
# (mpe_comparison/mpe_performance_comparison.py:134 run_comparison; its
# tikz data sweeps 1,5,10,50,...,30000).  At tiny env counts the remote
# TPU's fixed dispatch latency dominates wall time — the scan harness
# amortizes it over `--steps` device steps, same as the reference's
# python loop amortizes CUDA launch overhead over its 100 steps.
SWEEP = [
    ("simple_spread", n, {})
    for n in (1, 10, 100, 1_000, 3_000, 10_000, 30_000)
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument(
        "--sweep",
        action="store_true",
        help="reference-parity env-count sweep (simple_spread 1 -> 30k)",
    )
    parser.add_argument("--steps", type=int, default=100)
    args = parser.parse_args()

    suite = QUICK if args.quick else SWEEP if args.sweep else SUITE
    rows = []
    for scenario, num_envs, kwargs in suite:
        try:
            t0 = time.time()
            env = vmt.make_env(scenario, num_envs=num_envs, seed=0, **kwargs)
            build_s = time.time() - t0
            result = benchmark_step(env, n_steps=args.steps, n_repeats=2)
            row = {
                "scenario": scenario,
                "num_envs": num_envs,
                "n_agents": env.n_agents,
                "steps": args.steps,
                "wall_s": round(result["wall_s"], 4),
                "env_steps_per_s": round(result["env_steps_per_s"]),
                "agent_steps_per_s": round(result["agent_steps_per_s"]),
                "build_and_compile_s": round(build_s, 1),
            }
            print(json.dumps(row), flush=True)
            rows.append(row)
            # Release this config's device buffers before the next one:
            # stale 30k-env states from prior iterations can push a later
            # config into a silent async failure on remote devices.
            env.world._state = None
            del env, result
            import gc

            gc.collect()
        except Exception as e:  # noqa: BLE001
            print(
                json.dumps(
                    {"scenario": scenario, "num_envs": num_envs,
                     "error": f"{type(e).__name__}: {e}"}
                ),
                flush=True,
            )

    print("\n| scenario | envs | agents | env-steps/s | vs baseline* |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['scenario']} | {r['num_envs']} | {r['n_agents']} |"
            f" {r['env_steps_per_s']:,} |"
            f" {r['env_steps_per_s'] / REFERENCE_SIMPLE_SPREAD_EPS:.1f}x |"
        )
    print(
        "\n*baseline: reference simple_spread @30k envs on RTX 2080 Ti"
        " (296k env-steps/s)"
    )


if __name__ == "__main__":
    main()
