"""Multi-host (multi-process) smoke: the same sharding code that
partitions the env batch over a single-host mesh must run over a
``jax.distributed`` multi-process mesh (the DCN story of SURVEY.md §2.9 /
§5.8, which the reference does not have at all).

Two coordinator-connected CPU processes x 4 virtual devices each form an
8-device global mesh; each process builds the identical env (same seed),
shards the state over the GLOBAL mesh, runs one jitted step, and checks
its addressable output shards against an unsharded single-process
rollout.  Cross-process collectives (Gloo) are exercised by a final
replicated global reduction.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import vectorizedmultiagentsimulator_tpu as vmt
    from vectorizedmultiagentsimulator_tpu.parallel import shard_environment

    assert jax.process_count() == 2 and len(jax.devices()) == 8

    B = 8
    env = vmt.make_env("dispersion", num_envs=B, seed=0)
    ref_env = vmt.make_env("dispersion", num_envs=B, seed=0)
    mesh = Mesh(np.asarray(jax.devices()), ("envs",))
    shard_environment(env, mesh)

    def act_cb(a):
        return lambda idx: np.full(
            (1, a.action_size), 0.1, np.float32
        )

    acts = [
        jax.make_array_from_callback(
            (B, a.action_size), NamedSharding(mesh, P("envs")), act_cb(a)
        )
        for a in env.agents
    ]
    obs, rews, dones, infos = env.step(acts)

    acts_local = [
        jnp.full((B, a.action_size), 0.1, jnp.float32)
        for a in ref_env.agents
    ]
    obs_ref, _, _, _ = ref_env.step(acts_local)

    for o, o_ref in zip(obs, obs_ref):
        ref = np.asarray(o_ref)
        for sh in o.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(sh.data), ref[sh.index], atol=1e-6, rtol=1e-6
            )

    # Cross-process collective: replicated global mean of a sharded array
    # (rides Gloo between the two processes).
    mean = jax.jit(
        lambda x: x.mean(), out_shardings=NamedSharding(mesh, P())
    )(obs[0])
    ref_mean = float(np.asarray(obs_ref[0]).mean())
    assert abs(float(mean) - ref_mean) < 1e-6
    print(f"MULTIHOST_OK p{pid}", flush=True)
    """
)


@pytest.mark.skipif(
    os.environ.get("VMT_SKIP_MULTIHOST") == "1",
    reason="multi-process smoke disabled",
)
def test_two_process_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = env.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vmt"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(i)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK p{i}" in out
