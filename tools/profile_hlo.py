"""Op-level TPU profile of a scenario step: trace a cached-compile scan
rollout, convert with xprof, print top self-time ops and per-source-line
aggregation.

Usage: python tools/profile_hlo.py <scenario> <num_envs> [n_steps] [--json OUT]
"""
import collections
import glob
import json
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import vectorizedmultiagentsimulator_tpu as vmt
from vectorizedmultiagentsimulator_tpu.utils import profiling


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kwargs = {}
    for a in list(args):
        if "=" in a:  # scenario kwargs: key=val (int/float/bool literals)
            args.remove(a)
            k, v = a.split("=", 1)
            try:
                kwargs[k] = json.loads(v)
            except ValueError:
                kwargs[k] = v
    scenario, B = args[0], int(args[1])
    n_steps = int(args[2]) if len(args) > 2 else 40
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    env = vmt.make_env(scenario, num_envs=B, seed=0, **kwargs)
    key = jax.random.PRNGKey(0)
    actions = tuple(
        jax.random.uniform(
            jax.random.fold_in(key, i),
            (B, a.action_size),
            minval=-1,
            maxval=1,
        )
        for i, a in enumerate(env.agents)
    )
    state0 = env.state

    def body(state, _):
        state, (obs, rews, dones, infos) = env.step_fn(state, actions)
        sink = sum(jnp.sum(o[:, 0]) for o in obs) + sum(
            jnp.sum(r) for r in rews
        )
        return state, sink

    fn = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n_steps))
    r, _ = fn(state0)
    jax.block_until_ready(r)

    trace_dir = f"/tmp/vmt_prof_{scenario}_{B}"
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        r, s = fn(state0)
        jax.block_until_ready((r, s))
    print("trace dir", trace_dir, flush=True)

    from xprof.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb")
    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    d = json.loads(data) if isinstance(data, (str, bytes)) else data
    if out_json:
        with open(out_json, "w") as f:
            json.dump(d, f)

    rows = d["rows"]

    def val(r_, i):
        c = r_["c"][i]
        return c["v"] if c else None

    tot = sum(float(val(r_, 9) or 0) for r_ in rows)
    print(f"total self time: {tot / 1e6:.3f}s / {n_steps} steps "
          f"-> {tot / 1e3 / n_steps:.2f}ms/step, "
          f"{B * n_steps / (tot / 1e6):,.0f} env-steps/s (device-time bound)")

    by_src = collections.Counter()
    for r_ in rows:
        src = re.sub(r"<[^>]+>", "", val(r_, 25) or "?")
        by_src[src] += float(val(r_, 9) or 0)
    print("--- by source line ---")
    for k, v in by_src.most_common(25):
        print(f"{v / tot * 100:5.1f}% {v / 1e3:8.1f}ms  {k}")

    rows.sort(key=lambda r_: -float(val(r_, 9) or 0))
    print("--- top ops ---")
    for r_ in rows[:20]:
        self_us = float(val(r_, 9) or 0)
        print(
            f"{self_us / tot * 100:5.1f}% {self_us / 1e3:8.1f}ms "
            f"x{val(r_, 6)} [{val(r_, 21)}] bw={val(r_, 17)} "
            f"{(val(r_, 4) or '')[:130]}"
        )


if __name__ == "__main__":
    main()
