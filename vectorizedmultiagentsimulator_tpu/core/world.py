"""The vectorized world: builder, state owner, and physics stepper.

TPU-native redesign of ``vmas/simulator/core.py:1090-2919``.  The reference
runs a python O(N^2) pair loop, per-entity dicts of ``[B,.]`` force tensors
and per-entity integration every substep; here the *entire* step is a pure
function over stacked ``[B, N, ...]`` arrays:

  * collision pair lists are compiled **once** at finalize into static index
    tables per shape-pair class (the reference recomputes them per substep,
    core.py:2104-2174) — the data-dependent broadphase ``.any()`` gate
    (core.py:2797-2801) is dropped in favor of always-computed masked
    forces, which is exactly equivalent because ``_get_constraint_forces``
    zeroes non-contacts (core.py:2834-2838);
  * per-pair forces are scattered back through a precomputed 0/1 incidence
    matrix with one einsum — a dense MXU-friendly segment-sum instead of a
    scatter-add;
  * integration is one fused vectorized update (core.py:2860-2908).

Everything is traced under ``jax.jit`` by the Environment; entity objects
are pure trace-time views (see ``entities.py``).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core import shapes as shp
from vectorizedmultiagentsimulator_tpu.core.entities import Agent, Entity, Landmark
from vectorizedmultiagentsimulator_tpu.core.joints import Joint, JointConstraint
from vectorizedmultiagentsimulator_tpu.core.state import WorldState
from vectorizedmultiagentsimulator_tpu.ops import geometry as geo
from vectorizedmultiagentsimulator_tpu.ops import raycast as rc
from vectorizedmultiagentsimulator_tpu.utils import (
    ANGULAR_FRICTION,
    Array,
    COLLISION_FORCE,
    DRAG,
    JOINT_FORCE,
    JaxUtils,
    LINEAR_FRICTION,
    LINE_MIN_DIST,
    TORQUE_CONSTRAINT_FORCE,
    X,
    Y,
    env_index_to_mask,
)


class World:
    def __init__(
        self,
        batch_dim: int,
        device=None,  # accepted for API parity with the reference; unused
        dt: float = 0.1,
        substeps: int = 1,
        drag: float = DRAG,
        linear_friction: float = LINEAR_FRICTION,
        angular_friction: float = ANGULAR_FRICTION,
        x_semidim: Optional[float] = None,
        y_semidim: Optional[float] = None,
        dim_c: int = 0,
        collision_force: float = COLLISION_FORCE,
        joint_force: float = JOINT_FORCE,
        torque_constraint_force: float = TORQUE_CONSTRAINT_FORCE,
        contact_margin: float = 1e-3,
        gravity: Tuple[float, float] = (0.0, 0.0),
    ):
        assert batch_dim > 0, f"Batch dim must be greater than 0, got {batch_dim}"
        self._batch_dim = batch_dim
        self._agents: List[Agent] = []
        self._landmarks: List[Landmark] = []
        self._x_semidim = x_semidim
        self._y_semidim = y_semidim
        self._dim_p = 2
        self._dim_c = dim_c
        self._dt = dt
        self._substeps = substeps
        self._sub_dt = dt / substeps
        self._drag = drag
        self._gravity = np.asarray(gravity, dtype=np.float32)
        self._linear_friction = linear_friction
        self._angular_friction = angular_friction
        self._collision_force = collision_force
        self._joint_force = joint_force
        self._contact_margin = contact_margin
        self._torque_constraint_force = torque_constraint_force
        self._joints: Dict[frozenset, JointConstraint] = {}
        self._joint_objects: List[Joint] = []

        self._finalized = False
        self._state: Optional[WorldState] = None
        self._allow_new_extras = True
        self._pallas_choices: Dict[str, bool] = {}
        # Trace-time subkey pool (see begin_key_block).  None = inactive.
        self._key_pool: Optional[List[Array]] = None

    def _pallas_choice(self, name: str, fn) -> bool:
        """Pin a Pallas on/off decision per world at first consultation.

        The ``VMT_PALLAS_*`` environment flags are otherwise read at
        trace time, so an env constructed with a kernel disabled would
        silently switch paths if the flag changed before its first
        step/retrace (A/B comparisons construct a jnp env and a Pallas
        env side by side and step them interleaved — both would end up
        on whichever path the flag named last).  ``Environment._freeze``
        consults the step decision eagerly so every world is pinned by
        the flags in force at construction."""
        d = self._pallas_choices
        if name not in d:
            d[name] = bool(fn())
        return d[name]

    # ------------------------------------------------------------------ #
    # Builder API
    # ------------------------------------------------------------------ #
    def add_agent(self, agent: Agent):
        """Only way to add agents to the world (core.py:1152)."""
        assert not self._finalized, "Cannot add entities after finalize"
        agent._world = self
        self._agents.append(agent)

    def add_landmark(self, landmark: Landmark):
        assert not self._finalized, "Cannot add entities after finalize"
        landmark._world = self
        self._landmarks.append(landmark)

    def add_joint(self, joint: Joint):
        assert self._substeps > 1, "For joints, world substeps needs to be more than 1"
        if joint.landmark is not None:
            self.add_landmark(joint.landmark)
        self._joint_objects.append(joint)
        for constraint in joint.joint_constraints:
            self._joints[
                frozenset({constraint.entity_a.name, constraint.entity_b.name})
            ] = constraint

    # ------------------------------------------------------------------ #
    # Properties (API parity, core.py:1187-1232)
    # ------------------------------------------------------------------ #
    @property
    def batch_dim(self):
        return self._batch_dim

    @property
    def device(self):
        return None

    @property
    def agents(self) -> List[Agent]:
        return self._agents

    @property
    def landmarks(self) -> List[Landmark]:
        return self._landmarks

    @property
    def entities(self) -> List[Entity]:
        return self._landmarks + self._agents

    @property
    def policy_agents(self) -> List[Agent]:
        return [a for a in self._agents if a.action_script is None]

    @property
    def scripted_agents(self) -> List[Agent]:
        return [a for a in self._agents if a.action_script is not None]

    @property
    def x_semidim(self):
        return self._x_semidim

    @property
    def y_semidim(self):
        return self._y_semidim

    @property
    def dt(self):
        return self._dt

    @property
    def dim_p(self):
        return self._dim_p

    @property
    def dim_c(self):
        return self._dim_c

    @property
    def substeps(self):
        return self._substeps

    @property
    def joints(self):
        return self._joints.values()

    @property
    def is_finalized(self):
        return self._finalized

    @property
    def entity_index_map(self):
        return {e: i for i, e in enumerate(self.entities)}

    def to(self, device):  # API parity; placement is managed by jax/sharding
        return self

    # ------------------------------------------------------------------ #
    # Finalize: compile static spec tables + allocate state
    # ------------------------------------------------------------------ #
    def finalize(self, key: Optional[Array] = None):
        assert not self._finalized, "World already finalized"
        ents = self.entities
        N = len(ents)
        A = len(self._agents)
        n_landmarks = len(self._landmarks)
        for i, e in enumerate(ents):
            e.index = i
        for j, a in enumerate(self._agents):
            a.agent_index = j
        self._n_entities = N
        self._n_landmarks = n_landmarks

        names = [e.name for e in ents]
        assert len(set(names)) == len(names), f"Duplicate entity names: {names}"

        inf = np.inf
        self._movable = np.array([e.movable for e in ents])
        self._rotatable = np.array([e.rotatable for e in ents])
        self._mass = np.array([e.mass for e in ents], dtype=np.float32)
        self._moment = np.array(
            [e.moment_of_inertia for e in ents], dtype=np.float32
        )
        self._drag_coef = np.array(
            [e.drag if e.drag is not None else self._drag for e in ents],
            dtype=np.float32,
        )
        self._lin_friction = np.array(
            [
                e.linear_friction
                if e.linear_friction is not None
                else self._linear_friction
                for e in ents
            ],
            dtype=np.float32,
        )
        self._ang_friction = np.array(
            [
                e.angular_friction
                if e.angular_friction is not None
                else self._angular_friction
                for e in ents
            ],
            dtype=np.float32,
        )
        # Per-entity gravity: scalar/2-vector overrides are baked into the
        # static table; batched ``[B, 2]`` overrides (e.g. wind fields that
        # scenarios modulate per step, wind_flocking.py:142-149,318-335)
        # live in ``extras["<name>.dyn_gravity"]`` and are added in step().
        grav_rows = []
        self._dyn_gravity_names: List[str] = []
        for e in ents:
            g = e._gravity
            if g is not None and np.ndim(g) == 2:
                self._dyn_gravity_names.append(e.name)
                grav_rows.append(self._gravity + 0.0)
            else:
                grav_rows.append(
                    self._gravity + (g if g is not None else 0.0)
                )
        self._gravity_vec = np.stack(grav_rows).astype(np.float32)
        self._max_speed = np.array(
            [e.max_speed if e.max_speed is not None else inf for e in ents],
            dtype=np.float32,
        )
        self._v_range = np.array(
            [e.v_range if e.v_range is not None else inf for e in ents],
            dtype=np.float32,
        )
        # Agent force/torque clamps [A]
        self._max_f = np.array(
            [a.max_f if a.max_f is not None else inf for a in self._agents],
            dtype=np.float32,
        )
        self._f_range = np.array(
            [a.f_range if a.f_range is not None else inf for a in self._agents],
            dtype=np.float32,
        )
        self._max_t = np.array(
            [a.max_t if a.max_t is not None else inf for a in self._agents],
            dtype=np.float32,
        )
        self._t_range = np.array(
            [a.t_range if a.t_range is not None else inf for a in self._agents],
            dtype=np.float32,
        )
        self._agent_movable = np.array([a.movable for a in self._agents])
        self._agent_rotatable = np.array([a.rotatable for a in self._agents])
        self._silent = np.array([a.silent for a in self._agents])

        # Shape parameter tables
        self._radius = np.array(
            [e.shape.radius if isinstance(e.shape, shp.Sphere) else 0.0 for e in ents],
            dtype=np.float32,
        )
        self._length = np.array(
            [
                e.shape.length if isinstance(e.shape, (shp.Box, shp.Line)) else 0.0
                for e in ents
            ],
            dtype=np.float32,
        )
        self._width = np.array(
            [e.shape.width if isinstance(e.shape, shp.Box) else 0.0 for e in ents],
            dtype=np.float32,
        )
        self._hollow = np.array(
            [isinstance(e.shape, shp.Box) and e.shape.hollow for e in ents]
        )

        self._build_pair_tables()
        self._build_joint_tables()
        self._build_incidence()

        if key is None:
            key = jax.random.PRNGKey(0)
        # Per-agent u capacity: scenarios may write a u wider than
        # action_size as long as the dynamics model consumes it
        # (e.g. debug/drone prepends a thrust column; the reference only
        # checks width >= dynamics.needed_action_size, common.py:38-44).
        self._u_widths = [a.action_size for a in self._agents]
        u_caps = [
            max(a.action_size, a.dynamics.needed_action_size)
            for a in self._agents
        ]
        self._state = WorldState.zeros(
            self._batch_dim,
            N,
            A,
            u_caps,
            self._dim_c,
            key,
        )
        self._finalized = True
        for name in self._dyn_gravity_names:
            e = next(ent for ent in ents if ent.name == name)
            self.set_extra(
                f"{name}.dyn_gravity",
                jnp.broadcast_to(
                    jnp.asarray(e._gravity, jnp.float32),
                    (self._batch_dim, 2),
                ),
            )

    def _build_pair_tables(self):
        """Static narrowphase pair classification (core.py:2104-2174 done once
        instead of per substep)."""
        ents = self.entities
        ss, ls, ll, bs, bl, bb = [], [], [], [], [], []
        joint_pairs = []
        for a, ea in enumerate(ents):
            for b in range(a + 1, len(ents)):
                eb = ents[b]
                constraint = self._joints.get(frozenset({ea.name, eb.name}))
                if constraint is not None:
                    joint_pairs.append(constraint)
                    if constraint.dist == 0:
                        continue
                if not self._static_collides(ea, eb):
                    continue
                sa, sb = ea.shape, eb.shape
                if isinstance(sa, shp.Sphere) and isinstance(sb, shp.Sphere):
                    ss.append((a, b))
                elif isinstance(sa, shp.Line) and isinstance(sb, shp.Sphere):
                    ls.append((a, b))
                elif isinstance(sb, shp.Line) and isinstance(sa, shp.Sphere):
                    ls.append((b, a))
                elif isinstance(sa, shp.Line) and isinstance(sb, shp.Line):
                    ll.append((a, b))
                elif isinstance(sa, shp.Box) and isinstance(sb, shp.Sphere):
                    bs.append((a, b))
                elif isinstance(sb, shp.Box) and isinstance(sa, shp.Sphere):
                    bs.append((b, a))
                elif isinstance(sa, shp.Box) and isinstance(sb, shp.Line):
                    bl.append((a, b))
                elif isinstance(sb, shp.Box) and isinstance(sa, shp.Line):
                    bl.append((b, a))
                elif isinstance(sa, shp.Box) and isinstance(sb, shp.Box):
                    bb.append((a, b))
                else:
                    raise AssertionError()
        self._pairs = {
            "ss": np.array(ss, dtype=np.int32).reshape(-1, 2),
            "ls": np.array(ls, dtype=np.int32).reshape(-1, 2),
            "ll": np.array(ll, dtype=np.int32).reshape(-1, 2),
            "bs": np.array(bs, dtype=np.int32).reshape(-1, 2),
            "bl": np.array(bl, dtype=np.int32).reshape(-1, 2),
            "bb": np.array(bb, dtype=np.int32).reshape(-1, 2),
        }
        self._ordered_constraints = joint_pairs

    def collides(self, a: Entity, b: Entity) -> bool:
        """Public static collidability query (reference core.py:2788-2803
        minus the per-step broadphase distance test, which the TPU build
        replaces with masked dense computation)."""
        return self._static_collides(a, b)

    def _static_collides(self, a: Entity, b: Entity) -> bool:
        """Static part of core.py:2788-2803 (the per-step broadphase distance
        test is replaced by masked dense computation)."""
        if a is b:
            return False
        if (not a.collides(b)) or (not b.collides(a)):
            return False
        if not a.movable and not a.rotatable and not b.movable and not b.rotatable:
            return False
        return True

    def _build_joint_tables(self):
        cons = self._ordered_constraints
        J = len(cons)
        self._joint_ia = np.zeros((J,), dtype=np.int32)
        self._joint_ib = np.zeros((J,), dtype=np.int32)
        self._joint_delta_a = np.zeros((J, 2), dtype=np.float32)
        self._joint_delta_b = np.zeros((J, 2), dtype=np.float32)
        self._joint_dist = np.zeros((J,), dtype=np.float32)
        self._joint_rotate = np.zeros((J,), dtype=bool)
        index_map = {e.name: i for i, e in enumerate(self.entities)}
        for i, c in enumerate(cons):
            self._joint_ia[i] = index_map[c.entity_a.name]
            self._joint_ib[i] = index_map[c.entity_b.name]
            self._joint_delta_a[i] = c.entity_a.shape.get_delta_from_anchor(
                c.anchor_a
            )
            self._joint_delta_b[i] = c.entity_b.shape.get_delta_from_anchor(
                c.anchor_b
            )
            self._joint_dist[i] = c.dist
            self._joint_rotate[i] = c.rotate
            # fixed_rotation may become a per-env array at reset
            # (joints.py:139-144) -> route through extras.
            if not c.rotate and c._fixed_rotation is None:
                c._extras_key = f"joint_fixed_rotation.{i}"

    def _build_incidence(self):
        """Precompute the [K, N] incidence matrices turning concatenated
        per-pair force/torque contributions into per-entity sums with one
        einsum (a dense segment-sum that maps onto the MXU)."""
        order: List[int] = []
        J = len(self._ordered_constraints)
        if J:
            order += list(self._joint_ia) + list(self._joint_ib)
        for cls in ("ss", "ls", "ll", "bs", "bl", "bb"):
            p = self._pairs[cls]
            if len(p):
                order += list(p[:, 0]) + list(p[:, 1])
        self._contrib_count = len(order)
        if not order:
            self._incidence_f = None
            self._incidence_t = None
            return
        K, N = len(order), self._n_entities
        inc = np.zeros((K, N), dtype=np.float32)
        inc[np.arange(K), np.array(order)] = 1.0
        self._incidence_f = inc * self._movable[None, :].astype(np.float32)
        self._incidence_t = inc * self._rotatable[None, :].astype(np.float32)

    # ------------------------------------------------------------------ #
    # State plumbing
    # ------------------------------------------------------------------ #
    @property
    def state(self) -> WorldState:
        return self._state

    def bind(self, state: WorldState):
        self._state = state
        return self

    # How many subkeys each batched refill derives.  One threefry over
    # [KEY_BLOCK+1, 2] words costs the same ~1us as a single scalar
    # split on TPU, so any block size >= the per-step demand collapses
    # the whole per-step key chain into one op; 16 covers every scenario
    # in the library (max observed demand: football 5v5 resets, ~12).
    KEY_BLOCK = 16

    def begin_key_block(self):
        """Switch ``next_key`` to batched derivation for the duration of
        one traced step/reset.

        The reference consumes torch global RNG imperatively; this
        framework routes every draw through ``state.key``.  A sequential
        ``split`` chain is semantically clean but each link is a scalar
        [2]-word threefry that XLA cannot fuse or batch — profiling
        showed ~15% of a PPO rollout iteration spent in these ~1us
        scalar ops (6+ per masked auto-reset).  Inside a key block, one
        ``jax.random.split(key, KEY_BLOCK+1)`` derives a pool of
        subkeys in a single batched threefry and ``next_key`` hands them
        out with static (trace-time) indices, refilling in blocks if
        demand exceeds the pool.  Streams differ from the sequential
        chain, but every draw is still a unique fold of the seed, so
        same-seed determinism and independence are preserved.

        The pool is trace-time Python state: it must be scoped strictly
        to one trace (pool entries are tracers) — callers pair this with
        ``end_key_block`` in a finally block.  ``Environment._freeze``'s
        ``_functional`` wrapper does this for step/reset; eager callers
        (``get_random_actions``) fall back to the sequential chain.
        """
        self._key_pool = []

    def end_key_block(self):
        self._key_pool = None

    def _refill_key_pool(self):
        keys = jax.random.split(self._state.key, self.KEY_BLOCK + 1)
        self._state = self._state.replace(key=keys[0])
        # Hand out in derivation order; list is reversed so pop() is O(1).
        self._key_pool = [keys[i] for i in range(self.KEY_BLOCK, 0, -1)]

    def next_key(self) -> Array:
        pool = self._key_pool
        if pool is not None:
            if not pool:
                self._refill_key_pool()
                pool = self._key_pool
            return pool.pop()
        key, sub = jax.random.split(self._state.key)
        self._state = self._state.replace(key=key)
        return sub

    def has_extra(self, key: str) -> bool:
        return key in self._state.extras

    def get_extra(self, key: str) -> Array:
        return self._state.extras[key]

    def set_extra(self, key: str, value: Array):
        if key not in self._state.extras and not self._allow_new_extras:
            raise RuntimeError(
                f"Cannot create new state buffer '{key}' inside a compiled "
                "step/reset: initialize all scenario buffers during reset "
                "before the first step (the pytree structure is frozen after "
                "the first environment step)."
            )
        extras = dict(self._state.extras)
        extras[key] = value
        self._state = self._state.replace(extras=extras)

    def _write_state(self, **updates):
        """Every write to pos/vel/rot/ang_vel funnels through here so the
        packed physics mirror (``state.phys_pack``, the fused Pallas
        kernel's layout) stays equal to the natives.  Repacks are pure
        reshapes; under jit every mirror overwritten by a later write in
        the same trace is dead code, so only the final pack per array
        survives — and the physics step supplies its own mirror, keeping
        the steady-state hot loop relayout-free."""
        s = self._state
        pk = s.phys_pack
        if pk is not None and "phys_pack" not in updates and any(
            k in updates for k in ("pos", "vel", "rot", "ang_vel")
        ):
            from vectorizedmultiagentsimulator_tpu.ops import (
                physics_pallas as pp,
            )

            R = pp.pack_R(self._batch_dim)
            names = ("pos", "vel", "rot", "ang_vel")
            updates["phys_pack"] = tuple(
                pp.pack_rows(updates[n], R) if n in updates else pk[i]
                for i, n in enumerate(names)
            )
        self._state = s.replace(**updates)

    def _init_phys_pack(self):
        """Materialize the packed mirror for fused-Pallas worlds (called
        once at Environment freeze, keeping the state treedef stable for
        scan carries)."""
        from vectorizedmultiagentsimulator_tpu.ops import physics_pallas as pp

        s = self._state
        self._state = s.replace(
            phys_pack=pp.pack_state(s.pos, s.vel, s.rot, s.ang_vel)
        )

    def _set_entity_array(self, field: str, idx: int, value):
        arr = getattr(self._state, field)
        value = jnp.asarray(value, dtype=arr.dtype)
        self._write_state(
            **{field: arr.at[:, idx].set(jnp.broadcast_to(value, arr[:, idx].shape))}
        )

    def _set_agent_array(self, field: str, agent_idx: int, value):
        arr = getattr(self._state, field)
        value = jnp.asarray(value, dtype=arr.dtype)
        self._state = self._state.replace(
            **{field: arr.at[:, agent_idx].set(value)}
        )

    def _set_action_u(self, agent_idx: int, value):
        value = jnp.asarray(value, dtype=self._state.u.dtype)
        w = value.shape[1]
        u = self._state.u
        if w > u.shape[2]:
            # Rare fallback for writes beyond the preallocated capacity:
            # widen the stacked storage (changes the pytree leaf shape —
            # one retrace, exactly like the previous per-agent tuple form).
            u = jnp.concatenate(
                [u, jnp.zeros(u.shape[:2] + (w - u.shape[2],), u.dtype)],
                axis=2,
            )
        self._u_widths[agent_idx] = w
        self._state = self._state.replace(u=u.at[:, agent_idx, :w].set(value))

    def _masked_entity_write(self, field: str, idx: int, value, batch_index):
        """Reference ``set_pos``-style write (core.py:733-761): None index
        broadcasts/sets all envs, int or mask updates selected envs."""
        arr = getattr(self._state, field)
        row = arr[:, idx]  # [B, d]
        value = jnp.asarray(value, dtype=arr.dtype)
        if value.ndim == row.ndim and value.shape[0] == 1:
            value = value[0]
        value = jnp.broadcast_to(value, row.shape)
        if batch_index is None:
            new = value
        else:
            mask = env_index_to_mask(batch_index, self._batch_dim)
            new = jnp.where(mask[:, None], value, row)
        self._write_state(**{field: arr.at[:, idx].set(new)})

    def _reset_entity(self, entity: Entity, env_index=None):
        mask = env_index_to_mask(env_index, self._batch_dim)
        m2 = mask[:, None]
        s = self._state
        i = entity.index
        updates = dict(
            pos=s.pos.at[:, i].set(jnp.where(m2, 0.0, s.pos[:, i])),
            vel=s.vel.at[:, i].set(jnp.where(m2, 0.0, s.vel[:, i])),
            rot=s.rot.at[:, i].set(jnp.where(m2, 0.0, s.rot[:, i])),
            ang_vel=s.ang_vel.at[:, i].set(jnp.where(m2, 0.0, s.ang_vel[:, i])),
        )
        if isinstance(entity, Agent):
            j = entity.agent_index
            updates.update(
                force=s.force.at[:, j].set(jnp.where(m2, 0.0, s.force[:, j])),
                torque=s.torque.at[:, j].set(jnp.where(m2, 0.0, s.torque[:, j])),
                c=s.c.at[:, j].set(jnp.where(m2, 0.0, s.c[:, j])),
                action_c=s.action_c.at[:, j].set(
                    jnp.where(m2, 0.0, s.action_c[:, j])
                ),
                u=s.u.at[:, j].set(jnp.where(m2, 0.0, s.u[:, j])),
            )
        self._write_state(**updates)
        if isinstance(entity, Agent):
            entity.dynamics.reset(env_index)

    def reset(self, env_index=None):
        """Zero all entity states (core.py:1179-1181) as one masked update."""
        mask = env_index_to_mask(env_index, self._batch_dim)
        m = mask[:, None, None]
        s = self._state
        self._write_state(
            pos=jnp.where(m, 0.0, s.pos),
            vel=jnp.where(m, 0.0, s.vel),
            rot=jnp.where(m, 0.0, s.rot),
            ang_vel=jnp.where(m, 0.0, s.ang_vel),
            force=jnp.where(m, 0.0, s.force),
            torque=jnp.where(m, 0.0, s.torque),
            c=jnp.where(m, 0.0, s.c),
            action_c=jnp.where(m, 0.0, s.action_c),
            u=jnp.where(m, 0.0, s.u),
        )
        for agent in self._agents:
            agent.dynamics.reset(env_index)

    def zero_grad(self):  # API parity
        pass

    # ------------------------------------------------------------------ #
    # Physics step (core.py:1972-2015 redesigned as fused dense updates)
    # ------------------------------------------------------------------ #
    def step(self):
        s = self._state
        A = len(self._agents)

        # Clamp agent action force/torque once (idempotent; the reference
        # re-clamps each substep, core.py:2018-2041) and write back.
        force_a = s.force
        torque_a = s.torque
        if A:
            # Clamps that are all-inf are static no-ops: skipping them saves
            # work and avoids inf-valued unselected branches.
            force_clamped = force_a
            if np.isfinite(self._max_f).any():
                force_clamped = JaxUtils.clamp_with_norm(
                    force_clamped, jnp.asarray(self._max_f)[None, :, None]
                )
            if np.isfinite(self._f_range).any():
                fr = jnp.asarray(self._f_range)[None, :, None]
                force_clamped = jnp.clip(force_clamped, -fr, fr)
            if force_clamped is not force_a:
                am = jnp.asarray(self._agent_movable)[None, :, None]
                force_a = jnp.where(am, force_clamped, force_a)

            torque_clamped = torque_a
            if np.isfinite(self._max_t).any():
                torque_clamped = JaxUtils.clamp_with_norm(
                    torque_clamped, jnp.asarray(self._max_t)[None, :, None]
                )
            if np.isfinite(self._t_range).any():
                tr = jnp.asarray(self._t_range)[None, :, None]
                torque_clamped = jnp.clip(torque_clamped, -tr, tr)
            if torque_clamped is not torque_a:
                ar = jnp.asarray(self._agent_rotatable)[None, :, None]
                torque_a = jnp.where(ar, torque_clamped, torque_a)

        if self._pallas_step_ok():
            from vectorizedmultiagentsimulator_tpu.ops import physics_pallas

            dyn_g = physics_pallas.stacked_dyn_gravity(
                self, s.extras, s.pos.shape[0]
            )
            cache = s.phys_pack
            if cache is not None:
                # Fast path: state rides in the kernel's packed layout
                # across steps — zero relayout in the hot loop.
                (pos, vel, rot, ang_vel, *new_pack) = (
                    physics_pallas.fused_step_packed(
                        self, *cache, force_a, torque_a, dyn_g
                    )
                )
                extra_updates = dict(phys_pack=tuple(new_pack))
            else:
                # Hand-built state, direct World use, or a mesh whose
                # per-shard batch cannot hold the global packing factor
                # (shard_environment strips the mirror then): native
                # interface, per-step local pack/unpack.
                pos, vel, rot, ang_vel = physics_pallas.fused_step(
                    self, s.pos, s.vel, s.rot, s.ang_vel, force_a,
                    torque_a, dyn_g,
                )
                extra_updates = {}
        else:
            pos, vel, rot, ang_vel = self._step_core(
                s.pos, s.vel, s.rot, s.ang_vel, force_a, torque_a, s.extras
            )
            extra_updates = {}

        updates = dict(pos=pos, vel=vel, rot=rot, ang_vel=ang_vel,
                       force=force_a, torque=torque_a, **extra_updates)
        # Comm state update (core.py:2910-2913)
        if self._dim_c > 0 and A:
            silent = jnp.asarray(self._silent)[None, :, None]
            updates["c"] = jnp.where(silent, s.c, s.action_c)
        self._write_state(**updates)

    def _pallas_step_ok(self) -> bool:
        """Whether this world's step runs the fused Pallas kernel
        (ops/physics_pallas.py); unsupported configs fall back to the
        jnp path with identical semantics.  Pinned per world on first
        consultation (see ``_pallas_choice``)."""
        from vectorizedmultiagentsimulator_tpu.ops import physics_pallas

        return self._pallas_choice(
            "step", lambda: physics_pallas.step_supported(self)
        )

    def _step_core(self, pos, vel, rot, ang_vel, force_a, torque_a, extras):
        """Pure physics core: action/gravity/friction forces, pair
        narrowphase, and substepped semi-implicit Euler integration
        (core.py:1972-2010, 2860-2908)."""
        B, N = pos.shape[0], pos.shape[1]
        nl = self._n_landmarks
        A = len(self._agents)
        movable = jnp.asarray(self._movable)
        rotatable = jnp.asarray(self._rotatable)
        mass = jnp.asarray(self._mass)
        moment = jnp.asarray(self._moment)

        # Effective per-entity mass/moment [1|B, N, 1]: static tables, with
        # per-env overrides from ``extras["<name>.dyn_mass"]`` (the dynamic
        # analogue of dyn_gravity; shape moments are linear in mass so the
        # override rescales the static moment).
        mass_e = mass[None, :, None]
        moment_e = moment[None, :, None]
        if any(f"{e.name}.dyn_mass" in extras for e in self.entities):
            mass_e = jnp.broadcast_to(mass_e, (B, N, 1))
            moment_e = jnp.broadcast_to(moment_e, (B, N, 1))
            for i, e in enumerate(self.entities):
                mkey = f"{e.name}.dyn_mass"
                if mkey in extras:
                    m = extras[mkey].reshape(B, 1)
                    mass_e = mass_e.at[:, i].set(m)
                    moment_e = moment_e.at[:, i].set(
                        m * (self._moment[i] / self._mass[i])
                    )

        # Static per-entity action force layout: landmarks get zeros.
        zeros_land_f = jnp.zeros((B, nl, 2), pos.dtype)
        zeros_land_t = jnp.zeros((B, nl, 1), pos.dtype)
        action_force = jnp.concatenate(
            [zeros_land_f, force_a * jnp.asarray(self._agent_movable)[None, :, None]],
            axis=1,
        ) if A else jnp.zeros((B, N, 2), pos.dtype)
        action_torque = jnp.concatenate(
            [
                zeros_land_t,
                torque_a * jnp.asarray(self._agent_rotatable)[None, :, None],
            ],
            axis=1,
        ) if A else jnp.zeros((B, N, 1), pos.dtype)

        if np.any(self._gravity_vec != 0):
            gravity_force = (
                jnp.asarray(self._gravity_vec)[None]
                * mass_e
                * movable[None, :, None]
            )
        else:
            gravity_force = jnp.zeros((1, N, 2), pos.dtype)
        # Batched per-env gravity overrides (see finalize).
        if any(
            f"{e.name}.dyn_gravity" in extras for e in self.entities
        ):
            gravity_force = jnp.broadcast_to(gravity_force, (B, N, 2))
            for i, e in enumerate(self.entities):
                dkey = f"{e.name}.dyn_gravity"
                if dkey in extras:
                    gravity_force = gravity_force.at[:, i].add(
                        extras[dkey]
                        * mass_e[..., i, :]
                        * float(self._movable[i])
                    )

        has_lin_friction = bool(np.any(self._lin_friction > 0))
        has_ang_friction = bool(np.any(self._ang_friction > 0))

        has_gravity = bool(np.any(self._gravity_vec != 0)) or bool(
            self._dyn_gravity_names
        )
        for substep in range(self._substeps):
            forces = (
                action_force + gravity_force
                if has_gravity
                else action_force
            )
            torques = action_torque

            if has_lin_friction:
                forces = forces + self._friction_force(
                    vel, jnp.asarray(self._lin_friction), mass_e
                )
            if has_ang_friction:
                torques = torques + self._friction_force(
                    ang_vel, jnp.asarray(self._ang_friction), moment_e
                )

            pair_f, pair_t = self._environment_forces(pos, rot)
            if pair_f is not None:
                forces = forces + pair_f
                torques = torques + pair_t

            # ---- integrate (core.py:2860-2908, semi-implicit Euler) ---- #
            if substep == 0:
                drag = jnp.asarray(self._drag_coef)[None, :, None]
                vel = jnp.where(movable[None, :, None], vel * (1 - drag), vel)
                ang_vel = jnp.where(
                    rotatable[None, :, None], ang_vel * (1 - drag), ang_vel
                )
            accel = forces / mass_e
            new_vel = vel + accel * self._sub_dt
            if np.isfinite(self._max_speed).any():
                new_vel = JaxUtils.clamp_with_norm(
                    new_vel, jnp.asarray(self._max_speed)[None, :, None]
                )
            if np.isfinite(self._v_range).any():
                vr = jnp.asarray(self._v_range)[None, :, None]
                new_vel = jnp.clip(new_vel, -vr, vr)
            vel = jnp.where(movable[None, :, None], new_vel, vel)
            new_pos = pos + vel * self._sub_dt
            if self._x_semidim is not None or self._y_semidim is not None:
                nx = new_pos[..., X]
                ny = new_pos[..., Y]
                if self._x_semidim is not None:
                    nx = jnp.clip(nx, -self._x_semidim, self._x_semidim)
                if self._y_semidim is not None:
                    ny = jnp.clip(ny, -self._y_semidim, self._y_semidim)
                new_pos = jnp.stack([nx, ny], axis=-1)
            pos = jnp.where(movable[None, :, None], new_pos, pos)

            new_ang_vel = ang_vel + (torques / moment_e) * self._sub_dt
            ang_vel = jnp.where(rotatable[None, :, None], new_ang_vel, ang_vel)
            rot = jnp.where(
                rotatable[None, :, None], rot + ang_vel * self._sub_dt, rot
            )

        return pos, vel, rot, ang_vel

    def _friction_force(self, vel: Array, coeff: Array, mass_like: Array) -> Array:
        """Static/kinetic friction (core.py:2054-2073).  ``vel`` is
        [B,N,d]; ``coeff`` is [N]; ``mass_like`` is [1|B, N, 1] (batched
        when per-env dynamic mass overrides are active)."""
        speed = JaxUtils.safe_norm(vel, axis=-1)  # [B, N]
        static = speed == 0
        friction_const = coeff[None, :, None] * mass_like
        direction = vel / jnp.where(static, 1e-8, speed)[..., None]
        friction = -direction * jnp.minimum(
            friction_const, jnp.abs(vel) / self._sub_dt * mass_like
        )
        return jnp.where(static[..., None], 0.0, friction)

    # ------------------------------------------------------------------ #
    # Pairwise environment forces
    # ------------------------------------------------------------------ #
    def _environment_forces(self, pos: Array, rot: Array):
        """All joint-constraint and collision pair forces, concatenated and
        scattered through the static incidence matrix."""
        if self._incidence_f is None:
            return None, None
        B = pos.shape[0]
        f_parts: List[Array] = []
        t_parts: List[Array] = []

        def emit(fa, ta, fb, tb):
            f_parts.append(fa)
            f_parts.append(fb)
            P = fa.shape[1]
            if not isinstance(ta, jax.Array):
                ta = jnp.zeros((B, P, 1), pos.dtype)
            if not isinstance(tb, jax.Array):
                tb = jnp.zeros((B, P, 1), pos.dtype)
            t_parts.append(ta)
            t_parts.append(tb)

        J = len(self._ordered_constraints)
        if J:
            emit(*self._joint_forces(pos, rot))
        for cls, fn in (
            ("ss", self._sphere_sphere),
            ("ls", self._sphere_line),
            ("ll", self._line_line),
            ("bs", self._box_sphere),
            ("bl", self._box_line),
            ("bb", self._box_box),
        ):
            p = self._pairs[cls]
            if len(p):
                emit(*fn(pos, rot, p[:, 0], p[:, 1]))

        F = jnp.concatenate(f_parts, axis=1)  # [B, K, 2]
        T = jnp.concatenate(t_parts, axis=1)  # [B, K, 1]
        # The incidence matmul is a segment-sum: it must run in full f32
        # (default TPU matmul precision is bf16, which visibly perturbs
        # contact forces).
        forces = jnp.einsum(
            "bkc,kn->bnc",
            F,
            jnp.asarray(self._incidence_f),
            precision=jax.lax.Precision.HIGHEST,
        )
        torques = jnp.einsum(
            "bkc,kn->bnc",
            T,
            jnp.asarray(self._incidence_t),
            precision=jax.lax.Precision.HIGHEST,
        )
        return forces, torques

    def _constraint_forces(
        self,
        pos_a: Array,
        pos_b: Array,
        dist_min,
        force_multiplier: float,
        attractive: bool = False,
    ) -> Tuple[Array, Array]:
        """Soft (differentiable) contact force (core.py:2805-2839)."""
        min_dist = 1e-6
        delta_pos = pos_a - pos_b
        dist = JaxUtils.safe_norm(delta_pos, axis=-1)
        sign = -1 if attractive else 1
        k = self._contact_margin
        penetration = (
            jnp.logaddexp(0.0, (dist_min - dist) * sign / k) * k
        )
        force = (
            sign
            * force_multiplier
            * delta_pos
            / jnp.where(dist > 0, dist, 1e-8)[..., None]
            * penetration[..., None]
        )
        force = jnp.where((dist < min_dist)[..., None], 0.0, force)
        if not attractive:
            force = jnp.where((dist > dist_min)[..., None], 0.0, force)
        else:
            force = jnp.where((dist < dist_min)[..., None], 0.0, force)
        return force, -force

    def _constraint_torques(
        self, rot_a: Array, rot_b: Array, force_multiplier: float
    ) -> Tuple[Array, Array]:
        """Soft fixed-rotation constraint torque (core.py:2841-2858)."""
        min_delta_rot = 1e-9
        delta_rot = rot_a - rot_b
        abs_delta_rot = JaxUtils.safe_norm(delta_rot, axis=-1, keepdims=True)
        penetration = jnp.exp(abs_delta_rot) - 1
        torque = force_multiplier * jnp.sign(delta_rot) * penetration
        torque = jnp.where(abs_delta_rot < min_delta_rot, 0.0, torque)
        return -torque, torque

    def _joint_forces(self, pos, rot):
        """Vectorized joint constraint solve (core.py:2201-2292)."""
        B = pos.shape[0]
        ia = jnp.asarray(self._joint_ia)
        ib = jnp.asarray(self._joint_ib)
        rot_a = rot[:, self._joint_ia]  # [B, J, 1]
        rot_b = rot[:, self._joint_ib]
        pos_a = pos[:, self._joint_ia]
        pos_b = pos[:, self._joint_ib]
        delta_a = JaxUtils.rotate_vector(
            jnp.broadcast_to(jnp.asarray(self._joint_delta_a)[None], pos_a.shape),
            rot_a,
        )
        delta_b = JaxUtils.rotate_vector(
            jnp.broadcast_to(jnp.asarray(self._joint_delta_b)[None], pos_b.shape),
            rot_b,
        )
        pos_joint_a = pos_a + delta_a
        pos_joint_b = pos_b + delta_b
        dist = jnp.asarray(self._joint_dist)[None]  # [1, J]

        fa_attr, fb_attr = self._constraint_forces(
            pos_joint_a, pos_joint_b, dist, self._joint_force, attractive=True
        )
        fa_rep, fb_rep = self._constraint_forces(
            pos_joint_a, pos_joint_b, dist, self._joint_force, attractive=False
        )
        force_a = fa_attr + fa_rep
        force_b = fb_attr + fb_rep

        torque_a_rot = JaxUtils.compute_torque(force_a, pos_joint_a - pos_a)
        torque_b_rot = JaxUtils.compute_torque(force_b, pos_joint_b - pos_b)

        # Assemble fixed_rotation [B, J, 1] from static floats / extras.
        fixed = []
        for i, c in enumerate(self._ordered_constraints):
            fr = c.fixed_rotation
            if isinstance(fr, (int, float)):
                fixed.append(jnp.full((B, 1), float(fr)))
            elif fr is None:
                fixed.append(jnp.zeros((B, 1)))
            else:
                fixed.append(jnp.asarray(fr).reshape(B, 1))
        joint_rot = jnp.stack(fixed, axis=1)  # [B, J, 1]

        t_fixed_a, t_fixed_b = self._constraint_torques(
            rot_a, rot_b + joint_rot, self._torque_constraint_force
        )
        rotate = jnp.asarray(self._joint_rotate)[None, :, None]
        torque_a = jnp.where(rotate, torque_a_rot, torque_a_rot + t_fixed_a)
        torque_b = jnp.where(rotate, torque_b_rot, torque_b_rot + t_fixed_b)
        return force_a, torque_a, force_b, torque_b

    def _sphere_sphere(self, pos, rot, ia, ib):
        """core.py:2294-2339"""
        pa = pos[:, ia]
        pb = pos[:, ib]
        dist_min = (jnp.asarray(self._radius)[ia] + jnp.asarray(self._radius)[ib])[
            None
        ]
        fa, fb = self._constraint_forces(pa, pb, dist_min, self._collision_force)
        return fa, 0, fb, 0

    def _sphere_line(self, pos, rot, il, isph):
        """core.py:2341-2392 (pair order: line, sphere)."""
        pos_l = pos[:, il]
        pos_s = pos[:, isph]
        rot_l = rot[:, il, 0]
        length_l = jnp.asarray(self._length)[il][None]
        radius_s = jnp.asarray(self._radius)[isph][None]
        closest = geo.closest_point_line(pos_l, rot_l, length_l, pos_s)
        force_sphere, force_line = self._constraint_forces(
            pos_s, closest, radius_s + LINE_MIN_DIST, self._collision_force
        )
        torque_line = JaxUtils.compute_torque(force_line, closest - pos_l)
        return force_line, torque_line, force_sphere, 0

    def _line_line(self, pos, rot, ia, ib):
        """core.py:2394-2457"""
        pa, pb = pos[:, ia], pos[:, ib]
        ra, rb = rot[:, ia, 0], rot[:, ib, 0]
        la = jnp.asarray(self._length)[ia][None]
        lb = jnp.asarray(self._length)[ib][None]
        point_a, point_b = geo.closest_points_line_line(pa, ra, la, pb, rb, lb)
        fa, fb = self._constraint_forces(
            point_a, point_b, LINE_MIN_DIST, self._collision_force
        )
        ta = JaxUtils.compute_torque(fa, point_a - pa)
        tb = JaxUtils.compute_torque(fb, point_b - pb)
        return fa, ta, fb, tb

    def _box_sphere(self, pos, rot, ibox, isph):
        """core.py:2459-2552 (pair order: box, sphere)."""
        pos_box, pos_s = pos[:, ibox], pos[:, isph]
        rot_box = rot[:, ibox, 0]
        length_box = jnp.asarray(self._length)[ibox][None]
        width_box = jnp.asarray(self._width)[ibox][None]
        radius_s = jnp.asarray(self._radius)[isph][None]
        not_hollow = ~np.asarray(self._hollow)[np.asarray(ibox)]

        closest = geo.closest_point_box(
            pos_box, rot_box, width_box, length_box, pos_s
        )
        inner_point = closest
        d = jnp.zeros_like(closest[..., 0])
        if np.any(not_hollow):
            inner_h, d_h = geo.inner_point_box(pos_s, closest, pos_box)
            nh = jnp.asarray(not_hollow)[None, :, None]
            inner_point = jnp.where(nh, inner_h, inner_point)
            d = jnp.where(nh[..., 0], d_h, d)
        force_sphere, force_box = self._constraint_forces(
            pos_s,
            inner_point,
            radius_s + LINE_MIN_DIST + d,
            self._collision_force,
        )
        torque_box = JaxUtils.compute_torque(force_box, closest - pos_box)
        return force_box, torque_box, force_sphere, 0

    def _box_line(self, pos, rot, ibox, iline):
        """core.py:2554-2653 (pair order: box, line)."""
        pos_box, pos_line = pos[:, ibox], pos[:, iline]
        rot_box, rot_line = rot[:, ibox, 0], rot[:, iline, 0]
        length_box = jnp.asarray(self._length)[ibox][None]
        width_box = jnp.asarray(self._width)[ibox][None]
        length_line = jnp.asarray(self._length)[iline][None]
        not_hollow = ~np.asarray(self._hollow)[np.asarray(ibox)]

        point_box, point_line = geo.closest_line_box(
            pos_box, rot_box, width_box, length_box,
            pos_line, rot_line, length_line,
        )
        inner_point = point_box
        d = jnp.zeros_like(point_box[..., 0])
        if np.any(not_hollow):
            inner_h, d_h = geo.inner_point_box(point_line, point_box, pos_box)
            nh = jnp.asarray(not_hollow)[None, :, None]
            inner_point = jnp.where(nh, inner_h, inner_point)
            d = jnp.where(nh[..., 0], d_h, d)
        force_box, force_line = self._constraint_forces(
            inner_point, point_line, LINE_MIN_DIST + d, self._collision_force
        )
        torque_box = JaxUtils.compute_torque(force_box, point_box - pos_box)
        torque_line = JaxUtils.compute_torque(force_line, point_line - pos_line)
        return force_box, torque_box, force_line, torque_line

    def _box_box(self, pos, rot, ia, ib):
        """core.py:2655-2786"""
        pa, pb = pos[:, ia], pos[:, ib]
        ra, rb = rot[:, ia, 0], rot[:, ib, 0]
        la = jnp.asarray(self._length)[ia][None]
        wa = jnp.asarray(self._width)[ia][None]
        lb = jnp.asarray(self._length)[ib][None]
        wb = jnp.asarray(self._width)[ib][None]
        not_hollow_a = ~np.asarray(self._hollow)[np.asarray(ia)]
        not_hollow_b = ~np.asarray(self._hollow)[np.asarray(ib)]

        point_a, point_b = geo.closest_box_box(pa, ra, wa, la, pb, rb, wb, lb)
        inner_a = point_a
        d_a = jnp.zeros_like(point_a[..., 0])
        if np.any(not_hollow_a):
            inner_h, d_h = geo.inner_point_box(point_b, point_a, pa)
            nh = jnp.asarray(not_hollow_a)[None, :, None]
            inner_a = jnp.where(nh, inner_h, inner_a)
            d_a = jnp.where(nh[..., 0], d_h, d_a)
        inner_b = point_b
        d_b = jnp.zeros_like(point_b[..., 0])
        if np.any(not_hollow_b):
            inner_h, d_h = geo.inner_point_box(point_a, point_b, pb)
            nh = jnp.asarray(not_hollow_b)[None, :, None]
            inner_b = jnp.where(nh, inner_h, inner_b)
            d_b = jnp.where(nh[..., 0], d_h, d_b)
        fa, fb = self._constraint_forces(
            inner_a, inner_b, d_a + d_b + LINE_MIN_DIST, self._collision_force
        )
        ta = JaxUtils.compute_torque(fa, point_a - pa)
        tb = JaxUtils.compute_torque(fb, point_b - pb)
        return fa, ta, fb, tb

    # ------------------------------------------------------------------ #
    # Ray casting (core.py:1628-1786)
    # ------------------------------------------------------------------ #
    def cast_rays(
        self,
        entity: Entity,
        angles: Array,
        max_range: float,
        entity_filter: Callable[[Entity], bool] = lambda _: False,
    ) -> Array:
        """angles [B, R] -> distances [B, R]."""
        pos = entity.state.pos
        s = self._state
        boxes, spheres, lines = [], [], []
        for e in self.entities:
            if entity is e or not entity_filter(e):
                continue
            assert e.collides(entity) and entity.collides(
                e
            ), "Rays are only casted among collidables"
            if isinstance(e.shape, shp.Box):
                boxes.append(e.index)
            elif isinstance(e.shape, shp.Sphere):
                spheres.append(e.index)
            elif isinstance(e.shape, shp.Line):
                lines.append(e.index)
            else:
                raise RuntimeError(
                    f"Shape {e.shape} currently not handled by cast_ray"
                )
        from vectorizedmultiagentsimulator_tpu.ops import raycast_pallas as rcp

        if self._pallas_choice("lidar", rcp.pallas_lidar_enabled):
            B = pos.shape[0]

            def flat_pos(idx, width):
                if idx:
                    return s.pos[:, np.asarray(idx)].reshape(B, -1)
                return jnp.zeros((B, width), pos.dtype)

            def flat_rot(idx, width):
                if idx:
                    return s.rot[:, np.asarray(idx), 0]
                return jnp.zeros((B, width), pos.dtype)

            return rcp.fused_cast_rays(
                pos,
                angles,
                flat_pos(spheres, 2),
                flat_pos(boxes, 2),
                flat_rot(boxes, 1),
                flat_pos(lines, 2),
                flat_rot(lines, 1),
                tuple(float(r) for r in self._radius[np.asarray(spheres, int)]),
                tuple(float(l) for l in self._length[np.asarray(boxes, int)]),
                tuple(float(w) for w in self._width[np.asarray(boxes, int)]),
                tuple(float(l) for l in self._length[np.asarray(lines, int)]),
                float(max_range),
            )

        dists = [jnp.full_like(angles, max_range)[..., None]]  # [B, R, 1]
        if boxes:
            idx = np.asarray(boxes)
            d = rc.cast_rays_to_box(
                s.pos[:, idx],
                s.rot[:, idx, 0],
                jnp.asarray(self._length[idx]),
                jnp.asarray(self._width[idx]),
                pos,
                angles,
                max_range,
            )
            dists.append(jnp.moveaxis(d, 1, -1))  # [B, R, E]
        if spheres:
            idx = np.asarray(spheres)
            d = rc.cast_rays_to_sphere(
                s.pos[:, idx], jnp.asarray(self._radius[idx]), pos, angles, max_range
            )
            dists.append(jnp.moveaxis(d, 1, -1))
        if lines:
            idx = np.asarray(lines)
            d = rc.cast_rays_to_line(
                s.pos[:, idx],
                s.rot[:, idx, 0],
                jnp.asarray(self._length[idx]),
                pos,
                angles,
                max_range,
            )
            dists.append(jnp.moveaxis(d, 1, -1))
        return jnp.min(jnp.concatenate(dists, axis=-1), axis=-1)

    def cast_ray(
        self,
        entity: Entity,
        angles: Array,
        max_range: float,
        entity_filter: Callable[[Entity], bool] = lambda _: False,
    ) -> Array:
        """angles [B] -> distances [B] (legacy single-angle API,
        core.py:1628-1660; implemented on the vectorized kernels)."""
        return self.cast_rays(entity, angles[:, None], max_range, entity_filter)[
            :, 0
        ]

    # ------------------------------------------------------------------ #
    # Distance / overlap queries (core.py:1788-1969)
    # ------------------------------------------------------------------ #
    def get_distance_from_point(
        self, entity: Entity, test_point_pos: Array, env_index: Optional[int] = None
    ):
        with geo.fused_select():
            return self._get_distance_from_point(
                entity, test_point_pos, env_index
            )

    def _get_distance_from_point(
        self, entity: Entity, test_point_pos: Array, env_index: Optional[int] = None
    ):
        shape = entity.shape
        pos = entity.state.pos
        if isinstance(shape, shp.Sphere):
            dist = jnp.linalg.norm(pos - test_point_pos, axis=-1)
            return_value = dist - shape.radius
        elif isinstance(shape, shp.Box):
            # Component form keeps the whole query 1D-batch-shaped (full
            # VPU tiles) — see geo.closest_point_box_xy.
            gx, gy = geo.closest_point_box_xy(
                pos,
                entity.state.rot[..., 0],
                shape.width,
                shape.length,
                test_point_pos,
            )
            return_value = (
                geo.safe_norm_xy(
                    test_point_pos[..., 0] - gx, test_point_pos[..., 1] - gy
                )
                - LINE_MIN_DIST
            )
        elif isinstance(shape, shp.Line):
            closest = geo.closest_point_line(
                pos, entity.state.rot[..., 0], shape.length, test_point_pos
            )
            return_value = (
                jnp.linalg.norm(test_point_pos - closest, axis=-1) - LINE_MIN_DIST
            )
        else:
            raise RuntimeError("Distance not computable for given entity")
        if env_index is not None:
            return_value = return_value[env_index]
        return return_value

    def get_distance(
        self, entity_a: Entity, entity_b: Entity, env_index: Optional[int] = None
    ):
        # Scenario-facing query: gather-free candidate selection (same
        # semantics, fuses into one XLA kernel; see geometry.fused_select).
        with geo.fused_select():
            return self._get_distance(entity_a, entity_b, env_index)

    def _get_distance(
        self, entity_a: Entity, entity_b: Entity, env_index: Optional[int] = None
    ):
        sa, sb = entity_a.shape, entity_b.shape
        if isinstance(sa, shp.Sphere) and isinstance(sb, shp.Sphere):
            dist = self.get_distance_from_point(entity_a, entity_b.state.pos)
            return_value = dist - sb.radius
        elif {type(sa), type(sb)} == {shp.Box, shp.Sphere}:
            box, sphere = (
                (entity_a, entity_b)
                if isinstance(sb, shp.Sphere)
                else (entity_b, entity_a)
            )
            dist = self.get_distance_from_point(box, sphere.state.pos)
            return_value = dist - sphere.shape.radius
            is_overlapping = self.is_overlapping(entity_a, entity_b)
            return_value = jnp.where(is_overlapping, -1.0, return_value)
        elif {type(sa), type(sb)} == {shp.Line, shp.Sphere}:
            line, sphere = (
                (entity_a, entity_b)
                if isinstance(sb, shp.Sphere)
                else (entity_b, entity_a)
            )
            dist = self.get_distance_from_point(line, sphere.state.pos)
            return_value = dist - sphere.shape.radius
        elif isinstance(sa, shp.Line) and isinstance(sb, shp.Line):
            point_a, point_b = geo.closest_points_line_line(
                entity_a.state.pos,
                entity_a.state.rot[..., 0],
                sa.length,
                entity_b.state.pos,
                entity_b.state.rot[..., 0],
                sb.length,
            )
            return_value = (
                jnp.linalg.norm(point_a - point_b, axis=-1) - LINE_MIN_DIST
            )
        elif {type(sa), type(sb)} == {shp.Box, shp.Line}:
            box, line = (
                (entity_a, entity_b) if isinstance(sb, shp.Line) else (entity_b, entity_a)
            )
            point_box, point_line = geo.closest_line_box(
                box.state.pos,
                box.state.rot[..., 0],
                box.shape.width,
                box.shape.length,
                line.state.pos,
                line.state.rot[..., 0],
                line.shape.length,
            )
            return_value = (
                jnp.linalg.norm(point_box - point_line, axis=-1) - LINE_MIN_DIST
            )
        elif isinstance(sa, shp.Box) and isinstance(sb, shp.Box):
            point_a, point_b = geo.closest_box_box(
                entity_a.state.pos,
                entity_a.state.rot[..., 0],
                sa.width,
                sa.length,
                entity_b.state.pos,
                entity_b.state.rot[..., 0],
                sb.width,
                sb.length,
            )
            return_value = (
                jnp.linalg.norm(point_a - point_b, axis=-1) - LINE_MIN_DIST
            )
        else:
            raise RuntimeError("Distance not computable for given entities")
        if env_index is not None:
            return_value = return_value[env_index]
        return return_value

    def is_overlapping(
        self, entity_a: Entity, entity_b: Entity, env_index: Optional[int] = None
    ):
        with geo.fused_select():
            return self._is_overlapping(entity_a, entity_b, env_index)

    def _is_overlapping(
        self, entity_a: Entity, entity_b: Entity, env_index: Optional[int] = None
    ):
        sa, sb = entity_a.shape, entity_b.shape
        if {type(sa), type(sb)} == {shp.Box, shp.Sphere}:
            box, sphere = (
                (entity_a, entity_b)
                if isinstance(sb, shp.Sphere)
                else (entity_b, entity_a)
            )
            # Component form keeps the whole query 1D-batch-shaped (full
            # VPU tiles) — see geo.closest_point_box_xy.
            spx = sphere.state.pos[..., 0]
            spy = sphere.state.pos[..., 1]
            bpx = box.state.pos[..., 0]
            bpy = box.state.pos[..., 1]
            gx, gy = geo.closest_point_box_xy(
                box.state.pos,
                box.state.rot[..., 0],
                box.shape.width,
                box.shape.length,
                sphere.state.pos,
            )
            dist_sphere_closest = geo.safe_norm_xy(spx - gx, spy - gy)
            dist_sphere_box = geo.safe_norm_xy(spx - bpx, spy - bpy)
            dist_closest_box = geo.safe_norm_xy(bpx - gx, bpy - gy)
            dist_min = sphere.shape.radius + LINE_MIN_DIST
            return_value = (dist_sphere_box < dist_closest_box) | (
                dist_sphere_closest < dist_min
            )
        else:
            return_value = self.get_distance(entity_a, entity_b) < 0
        if env_index is not None:
            return_value = return_value[env_index]
        return return_value
