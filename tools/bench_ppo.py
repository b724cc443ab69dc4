"""PPO training-throughput benchmark (net-new vs the reference, which
trains through external torch stacks — RLlib example at
/root/reference/vmas/examples/rllib.py).  Measures end-to-end TRAINING
env-steps/s of the fully-jitted PPO iteration in
``examples/jax_ppo.py``: on-device rollout + GAE + all epochs/minibatches
in one XLA program.

Usage: python tools/bench_ppo.py [scenario] [num_envs] [iters]
Prints one JSON line per config.
"""
import json
import sys
import time

import jax

sys.path.insert(0, ".")

from vectorizedmultiagentsimulator_tpu.examples.jax_ppo import (
    PPOConfig,
    init_training,
)


def bench(scenario, num_envs, iters=20, cfg=PPOConfig(), mode="continuous"):
    kw = {}
    if mode in ("discrete", "multidiscrete"):
        kw["continuous_actions"] = False
    if mode == "multidiscrete":
        kw["multidiscrete_actions"] = True
    t0 = time.time()
    env, train_step, carry = init_training(scenario, num_envs, cfg=cfg, **kw)
    # warmup: compile + first execution
    carry, metrics = train_step(carry)
    jax.block_until_ready(metrics["loss"])
    build_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        carry, metrics = train_step(carry)
    jax.block_until_ready(metrics["loss"])
    wall = time.time() - t0
    # validate the async execution actually succeeded (tunnel footgun:
    # block_until_ready can return on a failed execution)
    loss = float(metrics["loss"])
    assert loss == loss, "NaN loss — failed execution?"

    env_steps = iters * cfg.rollout_steps * num_envs
    row = {
        "bench": "ppo_training",
        "scenario": scenario,
        "mode": mode,
        "num_envs": num_envs,
        "rollout_steps": cfg.rollout_steps,
        "iters": iters,
        "wall_s": round(wall, 4),
        "train_env_steps_per_s": round(env_steps / wall),
        "final_loss": round(loss, 4),
        "build_and_compile_s": round(build_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    # Usage: bench_ppo.py [scenario] [num_envs] [iters] [mode]
    # mode: continuous (default) | discrete | multidiscrete
    if len(sys.argv) > 1:
        scenario = sys.argv[1]
        num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
        iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
        mode = sys.argv[4] if len(sys.argv) > 4 else "continuous"
        bench(scenario, num_envs, iters, mode=mode)
        return
    for scenario, num_envs in [
        ("simple_spread", 4096),
        ("transport", 4096),
        ("simple_spread", 16384),
    ]:
        bench(scenario, num_envs)


if __name__ == "__main__":
    main()
