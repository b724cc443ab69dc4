"""The world state pytree.

This is the central TPU-first design move: the reference keeps per-entity
``EntityState`` objects holding separate ``[B, .]`` tensors plus ad-hoc
python buffers scattered over entities and scenarios
(``vmas/simulator/core.py:206-410``); here the *entire* simulation state is
one immutable pytree of stacked arrays with the env batch as the leading
axis.  ``jit``/``grad``/``lax.scan``/``shard_map`` all operate on it
directly, and a checkpoint is just this pytree.

Layout (N = entities, A = agents, entities are ordered landmarks-then-agents
to mirror ``World.entities`` in the reference core.py:1220-1222):

  pos      [B, N, 2]   vel     [B, N, 2]
  rot      [B, N, 1]   ang_vel [B, N, 1]
  force    [B, A, 2]   torque  [B, A, 1]   (agent action force/torque)
  c        [B, A, C]   comm state          (C = dim_c, 0-width allowed)
  u        [B, A, U]   physical actions, U = max agent action_size
           (ragged sizes are right-padded; views slice [:, i, :a_i].
           One stacked array instead of a per-agent tuple: XLA lays out
           [B, A, U] with the batch on the 128-lane dimension, while
           per-agent [B, 2] arrays got batch-on-sublanes layouts whose
           loop-carry copies alone cost ~94 us/step at 30k envs)
  action_c [B, A, C]   comm actions
  extras   dict[str, Array]  scenario/dynamics/controller buffers
  key      PRNG key    steps  [B] int32
  phys_pack  None, or 4 arrays [F*R, B/R] — the (pos, vel, rot, ang_vel)
           mirror in the fused Pallas physics kernel's packed layout
           (ops/physics_pallas.py pack_rows).  Maintained by World so
           consecutive fused steps feed each other without the
           native<->kernel relayout in the hot loop (the relayouts were
           ~20% of transport@30k step time); always equal to
           pack_rows(pos/vel/rot/ang_vel).  Worlds on the jnp path keep
           it None.  If you hand-build a state with modified
           pos/vel/rot/ang_vel, pass ``phys_pack=None`` in the same
           ``replace`` call — the next step repacks from the natives.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vectorizedmultiagentsimulator_tpu.utils import Array


@struct.dataclass
class WorldState:
    pos: Array
    vel: Array
    rot: Array
    ang_vel: Array
    force: Array
    torque: Array
    c: Array
    u: Tuple[Array, ...]
    action_c: Array
    extras: Dict[str, Any]
    key: Array
    steps: Array
    phys_pack: Optional[Tuple[Array, Array, Array, Array]] = None

    @staticmethod
    def zeros(
        batch_dim: int,
        n_entities: int,
        n_agents: int,
        action_sizes,
        dim_c: int,
        key: Array,
        dtype=jnp.float32,
    ) -> "WorldState":
        B, N, A = batch_dim, n_entities, n_agents
        return WorldState(
            pos=jnp.zeros((B, N, 2), dtype),
            vel=jnp.zeros((B, N, 2), dtype),
            rot=jnp.zeros((B, N, 1), dtype),
            ang_vel=jnp.zeros((B, N, 1), dtype),
            force=jnp.zeros((B, A, 2), dtype),
            torque=jnp.zeros((B, A, 1), dtype),
            c=jnp.zeros((B, A, dim_c), dtype),
            u=jnp.zeros(
                (B, A, max(action_sizes) if action_sizes else 0), dtype
            ),
            action_c=jnp.zeros((B, A, dim_c), dtype),
            extras={},
            key=key,
            steps=jnp.zeros((B,), jnp.int32),
        )
