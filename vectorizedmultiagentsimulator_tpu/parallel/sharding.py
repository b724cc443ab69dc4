"""Multi-chip execution: shard the env batch over a device mesh.

The reference has **no** distributed runtime — its parallelism is
single-device batching (SURVEY.md §2.9).  The TPU-native scaling story is
data-parallelism over the ``envs`` axis: every array in the state pytree
has the env batch leading, environments are fully independent, so sharding
that axis over a ``jax.sharding.Mesh`` partitions the entire step with
**zero cross-chip collectives** — XLA GSPMD propagates the sharding from
the inputs through the whole jitted step.  Collectives would only appear
for cross-env reductions (e.g. fleet-wide metrics), which ride ICI.

Multi-host: initialize ``jax.distributed`` before building the mesh and the
same code runs over DCN-connected pods.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "envs"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = ENV_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_state(state, mesh: Mesh, batch_dim: int, axis_name: str = ENV_AXIS):
    """Place every batch-leading leaf of the state pytree with the env axis
    sharded across the mesh; everything else (PRNG key) replicated.

    Works on multi-host (DCN) meshes too: when the mesh spans devices of
    other processes, leaves are routed through the host (every process
    holds the full value after the eager init reset, so the global array
    is assembled from identical per-process copies)."""
    batch_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    process = jax.process_index()
    mesh_is_local = all(
        d.process_index == process for d in mesh.devices.flat
    )

    def place(x, sharding=None):
        if sharding is None:
            sharding = (
                batch_sharding
                if hasattr(x, "ndim")
                and x.ndim >= 1
                and x.shape[0] == batch_dim
                else replicated
            )
        if not mesh_is_local:
            x = np.asarray(x)
        return jax.device_put(x, sharding)

    phys_pack = getattr(state, "phys_pack", None)
    if phys_pack is not None:
        n = int(mesh.devices.size)
        stripped = state.replace(phys_pack=None)
        if phys_pack[0].shape[1] % n != 0:
            # The mirror's packing factor R doesn't divide the
            # per-shard batch (needs (B/R) % n_devices == 0): drop it —
            # the step falls back to the native-interface kernel with a
            # per-shard R, identical semantics.
            return jax.tree.map(place, stripped)
        rest = jax.tree.map(place, stripped)
        # Rebuild the mirror FROM THE SHARDED NATIVES rather than
        # device_put-ing the eagerly built one: the eager mirror is the
        # GLOBAL pack (column l holds env s*BT+l), while every
        # shard-local producer/consumer (the partitioned pack/unpack
        # ops and the fused kernel's partition rule) treats each
        # device's columns as the pack of its own contiguous env
        # block — for n_devices > 1 those layouts differ, and pairing
        # them mixed env states across columns on the first post-shard
        # steps.  Jitting pack_state over the sharded pos/vel/rot/
        # ang_vel lowers the custom-partitioned pack op shard-locally,
        # yielding exactly the per-shard layout the kernel consumes.
        from vectorizedmultiagentsimulator_tpu.ops.physics_pallas import (
            pack_state,
        )

        packed = jax.jit(pack_state)(rest.pos, rest.vel, rest.rot, rest.ang_vel)
        return rest.replace(phys_pack=tuple(packed))
    return jax.tree.map(place, state)


def shard_environment(env, mesh: Optional[Mesh] = None, axis_name: str = ENV_AXIS):
    """Shard a live Environment's state across the mesh.  Subsequent jitted
    steps/resets follow the data placement (GSPMD)."""
    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    n = mesh.devices.size
    assert env.num_envs % n == 0, (
        f"num_envs ({env.num_envs}) must be divisible by the number of mesh"
        f" devices ({n})"
    )
    env.state = shard_state(env.state, mesh, env.num_envs, axis_name)
    return env
