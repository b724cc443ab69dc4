"""Constants, math helpers and scenario utilities.

TPU-native re-design of the reference utility layer
(``vmas/simulator/utils.py:22-35`` constants, ``TorchUtils`` 166-236,
``ScenarioUtils`` 239-330).  Everything here is pure ``jax.numpy`` and
shape-polymorphic over arbitrary leading batch dimensions so the same
helpers serve ``[B,2]``, ``[B,P,2]`` and ``[B,E,R,2]`` call-sites.
"""
from __future__ import annotations

from enum import Enum
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

X = 0
Y = 1
Z = 2
ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
VIEWER_DEFAULT_ZOOM = 1.2
INITIAL_VIEWER_SIZE = (700, 700)
LINE_MIN_DIST = 4 / 6e2
COLLISION_FORCE = 100.0
JOINT_FORCE = 130.0
TORQUE_CONSTRAINT_FORCE = 1.0

DRAG = 0.25
LINEAR_FRICTION = 0.0
ANGULAR_FRICTION = 0.0

Array = jax.Array

AGENT_OBS_TYPE = Union[Array, Dict[str, Array]]
AGENT_INFO_TYPE = Dict[str, Array]
AGENT_REWARD_TYPE = Array

OBS_TYPE = Union[List[AGENT_OBS_TYPE], Dict[str, AGENT_OBS_TYPE]]
INFO_TYPE = Union[List[AGENT_INFO_TYPE], Dict[str, AGENT_INFO_TYPE]]
REWARD_TYPE = Union[List[AGENT_REWARD_TYPE], Dict[str, AGENT_REWARD_TYPE]]
DONE_TYPE = Array


class Color(Enum):
    RED = (0.75, 0.25, 0.25)
    GREEN = (0.25, 0.75, 0.25)
    BLUE = (0.25, 0.25, 0.75)
    LIGHT_GREEN = (0.45, 0.95, 0.45)
    WHITE = (0.75, 0.75, 0.75)
    GRAY = (0.25, 0.25, 0.25)
    BLACK = (0.15, 0.15, 0.15)
    ORANGE = (1.00, 0.50, 0)
    PINK = (0.97, 0.51, 0.75)
    PURPLE = (0.60, 0.31, 0.64)
    YELLOW = (0.87, 0.87, 0)


def override(cls):
    """Decorator documenting method overrides (mirrors utils.py:64)."""

    def check_override(method):
        if method.__name__ not in dir(cls):
            raise NameError(f"{method} does not override any method of {cls}")
        return method

    return check_override


class Observer:
    """Observer ABC (reference utils.py:95-103): subscribers to an
    :class:`Observable` implement ``notify``."""

    def notify(self, observable, *args, **kwargs):
        raise NotImplementedError


class Observable:
    """Tiny observer registry used by joints to track entity pose writes
    (reference utils.py:85-103).  Purely trace-time bookkeeping."""

    def __init__(self):
        self._observers = []

    def subscribe(self, observer):
        self._observers.append(observer)

    def notify_observers(self, *args, **kwargs):
        for obs in self._observers:
            obs.notify(self, *args, **kwargs)

    def unsubscribe(self, observer):
        self._observers.remove(observer)


class JaxUtils:
    """JAX analogue of the reference ``TorchUtils`` (utils.py:166-236)."""

    @staticmethod
    def safe_norm(v: Array, axis=-1, keepdims: bool = False) -> Array:
        """L2 norm whose gradient at exactly-zero vectors is 0 (matching
        torch's subgradient convention) instead of NaN — jnp.linalg.norm
        has a NaN vjp at 0 which poisons backward passes even through
        unselected ``where`` branches (0 * NaN = NaN)."""
        sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
        safe = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        return jnp.where(sq > 0, safe, 0.0)

    @staticmethod
    def clamp_with_norm(tensor: Array, max_norm) -> Array:
        norm = JaxUtils.safe_norm(tensor, axis=-1, keepdims=True)
        # Guards keep grads NaN-free through the unselected branch: a safe
        # divisor avoids 0-division, and an inf max_norm (meaning "no
        # clamp") is replaced by 0 in the never-selected scaled branch —
        # otherwise its inf forward value turns the zero cotangent into
        # 0 * inf = NaN in the vjp.
        max_norm = jnp.asarray(max_norm, tensor.dtype)
        finite_max = jnp.where(jnp.isfinite(max_norm), max_norm, 0.0)
        scaled = tensor / jnp.maximum(norm, 1e-12) * finite_max
        return jnp.where(norm > max_norm, scaled, tensor)

    @staticmethod
    def rotate_vector(vector: Array, angle: Array) -> Array:
        if angle.ndim == vector.ndim:
            angle = angle.squeeze(-1)
        cos = jnp.cos(angle)
        sin = jnp.sin(angle)
        return jnp.stack(
            [
                vector[..., X] * cos - vector[..., Y] * sin,
                vector[..., X] * sin + vector[..., Y] * cos,
            ],
            axis=-1,
        )

    @staticmethod
    def cross(a: Array, b: Array) -> Array:
        return (a[..., X] * b[..., Y] - a[..., Y] * b[..., X])[..., None]

    @staticmethod
    def compute_torque(f: Array, r: Array) -> Array:
        return JaxUtils.cross(r, f)

    @staticmethod
    def to_numpy(data):
        if isinstance(data, (jax.Array, np.ndarray)):
            return np.asarray(data)
        if isinstance(data, Dict):
            return {k: JaxUtils.to_numpy(v) for k, v in data.items()}
        if isinstance(data, Sequence):
            return [JaxUtils.to_numpy(v) for v in data]
        raise NotImplementedError(f"Invalid type of data {data}")

    @staticmethod
    def recursive_clone(value):
        """Structure-preserving copy (reference utils.py:215-220).

        JAX arrays are immutable, so "cloning" only needs to rebuild the
        container structure; the leaves can be shared safely. Provided
        for drop-in migration of code that cloned obs/info dicts.
        """
        if isinstance(value, Dict):
            return {k: JaxUtils.recursive_clone(v) for k, v in value.items()}
        if isinstance(value, (list, tuple)):
            return type(value)(JaxUtils.recursive_clone(v) for v in value)
        return value

    @staticmethod
    def recursive_require_grad_(value):
        """Migration shim for reference utils.py:222-231.

        Torch needs ``requires_grad_()`` flipped on leaf tensors before
        autograd tracks them; JAX differentiates any function of its
        inputs via ``jax.grad`` with no per-array flag (the Environment's
        ``grad_enabled`` gates ``stop_gradient`` instead). Returns the
        input unchanged so ported call sites keep working.
        """
        return value

    @staticmethod
    def select_by_index(stacked: Array, idx: Array) -> Array:
        """``stacked[b, idx[b]]`` for ``stacked [B, K, ...]``, ``idx [B]``,
        as an unrolled where-fold over the (small, static) K axis.

        On TPU this fuses into neighbouring elementwise work, where the
        equivalent ``take_along_axis`` compiles to a gather that forces a
        relayout of the stacked operand (profiled at ~95us + a 32us copy
        per call at B=30k in football's policy before the same rewrite).
        """
        out = stacked[:, 0]
        extra = (1,) * (stacked.ndim - 2)
        for k in range(1, stacked.shape[1]):
            sel = (idx == k).reshape(idx.shape[0], *extra)
            out = jnp.where(sel, stacked[:, k], out)
        return out

    @staticmethod
    def where_from_index(env_index, new_value, old_value: Array) -> Array:
        """Masked single-env overwrite (reference utils.py:233).

        ``env_index`` may be an int, an int array, or a boolean mask over the
        leading batch axis; ``None`` overwrites everywhere.
        """
        mask = env_index_to_mask(env_index, old_value.shape[0])
        mask = mask.reshape(mask.shape + (1,) * (old_value.ndim - 1))
        return jnp.where(mask, new_value, old_value)


def env_index_to_mask(env_index, batch_dim: int) -> Array:
    """Normalize an env index spec (None | int | int array | bool mask) to a
    boolean mask of shape ``[batch_dim]``."""
    if env_index is None:
        return jnp.ones((batch_dim,), dtype=bool)
    if isinstance(env_index, (int, np.integer)):
        return jnp.zeros((batch_dim,), dtype=bool).at[env_index].set(True)
    env_index = jnp.asarray(env_index)
    if env_index.dtype == bool:
        return env_index
    return jnp.zeros((batch_dim,), dtype=bool).at[env_index].set(True)


class ScenarioUtils:
    """Random-spawn helpers (reference utils.py:239-330) rebuilt as masked,
    statically-bounded resampling compatible with jit tracing."""

    MAX_SPAWN_TRIES = 1000
    SPAWN_PROPOSALS_PER_ROUND = 16

    @staticmethod
    def spawn_entities_randomly(
        entities,
        world,
        env_index,
        min_dist_between_entities: float,
        x_bounds: Tuple[float, float],
        y_bounds: Tuple[float, float],
        occupied_positions: Optional[Array] = None,
        disable_warn: bool = False,
    ):
        """Sequentially place ``entities`` at random non-overlapping positions.

        Mirrors utils.py:241-269 but replaces the unbounded rejection loop with
        ``MAX_SPAWN_TRIES`` masked resampling rounds (utils.py:313 warns after
        50k tries; we simply accept the last proposal).
        """
        batch_dim = world.batch_dim
        if occupied_positions is None:
            occupied_positions = jnp.zeros((batch_dim, 0, world.dim_p))

        entities = list(entities)
        new_pos = ScenarioUtils.find_random_positions_for_entities(
            occupied_positions,
            len(entities),
            world,
            min_dist_between_entities,
            x_bounds,
            y_bounds,
        )
        for i, entity in enumerate(entities):
            entity.set_pos(new_pos[:, i], batch_index=env_index)

    @staticmethod
    def find_random_pos_for_entity(
        occupied_positions: Array,
        env_index,
        world,
        min_dist_between_entities: float,
        x_bounds: Tuple[float, float],
        y_bounds: Tuple[float, float],
        disable_warn: bool = False,
    ) -> Array:
        """Single new position ``[B, 1, 2]`` clear of ``occupied_positions``
        (reference utils.py:271-319)."""
        return ScenarioUtils.find_random_positions_for_entities(
            occupied_positions,
            1,
            world,
            min_dist_between_entities,
            x_bounds,
            y_bounds,
        )

    @staticmethod
    def find_random_positions_for_entities(
        occupied_positions: Array,
        n_new: int,
        world,
        min_dist_between_entities: float,
        x_bounds: Tuple[float, float],
        y_bounds: Tuple[float, float],
        current_positions: Optional[Array] = None,
        replace_mask: Optional[Array] = None,
        proposals_per_round: Optional[int] = None,
    ) -> Array:
        """Place ``n_new`` entities at once: ``[B, n_new, 2]`` positions,
        each ``>= min_dist`` from ``occupied_positions`` [B, O, 2] and from
        one another.

        One ``lax.while_loop`` places *all* entities (the reference runs a
        python rejection loop per entity, utils.py:241-319): each round
        draws ``K`` iid proposals per entity and keeps, per entity, the
        first proposal clear of the occupied set, entities placed earlier
        in the fold, and — when ``current_positions`` is given — the
        not-yet-replaced entities' current positions.  Identical
        distribution to sequential rejection sampling (iid draws, first
        valid kept); after ``MAX_SPAWN_TRIES`` draws the last proposal is
        accepted (the reference warns at 50k tries and keeps looping).

        ``current_positions``/``replace_mask`` serve per-step respawns
        (e.g. discovery target coverage): rows where ``replace_mask`` is
        False keep their current position and still block others.

        ``proposals_per_round`` (default ``SPAWN_PROPOSALS_PER_ROUND``) is a
        pure performance knob: accepted samples are "first valid of an iid
        proposal stream" regardless of how the stream is chunked into
        rounds, so the distribution is unchanged.  Per-step respawn paths
        (where usually at most one entity per env needs a position) should
        pass a small value — every round costs O(M·K·(O+M)) distance
        checks, all wasted on envs with nothing to place.
        """
        # Random placement is gradient-free data (the reference's python
        # rejection loop never participates in autograd); cutting the
        # tangents here also keeps the rejection ``lax.while_loop`` out of
        # reverse-mode AD (which cannot transpose while_loop).
        occupied_positions = jax.lax.stop_gradient(occupied_positions)
        if current_positions is not None:
            current_positions = jax.lax.stop_gradient(current_positions)

        batch_dim = occupied_positions.shape[0]
        M = int(n_new)
        O = occupied_positions.shape[1]
        lo = jnp.asarray([x_bounds[0], y_bounds[0]], dtype=jnp.float32)
        hi = jnp.asarray([x_bounds[1], y_bounds[1]], dtype=jnp.float32)
        K = int(
            proposals_per_round
            if proposals_per_round is not None
            else ScenarioUtils.SPAWN_PROPOSALS_PER_ROUND
        )
        assert K >= 1
        has_current = current_positions is not None
        min_d = min_dist_between_entities

        key = world.next_key()
        # Carry the M entity slots as tuples of [B,2]/[B] arrays rather than
        # one [B,M,2] array: the per-entity fold then updates loop-carried
        # values directly instead of emitting M dynamic-update-slices per
        # round (each a full-array copy on TPU).
        if has_current:
            cur = jnp.asarray(current_positions, jnp.float32)
            eff0 = tuple(cur[:, i] for i in range(M))
            if replace_mask is not None:
                rm = jnp.asarray(replace_mask, bool)
                ok0 = tuple(~rm[:, i] for i in range(M))
            else:
                ok0 = tuple(
                    jnp.zeros((batch_dim,), bool) for _ in range(M)
                )
        else:
            eff0 = tuple(
                jnp.zeros((batch_dim, 2), jnp.float32) for _ in range(M)
            )
            ok0 = tuple(jnp.zeros((batch_dim,), bool) for _ in range(M))

        # Respawn path (positive min_dist): all entities scan ONE shared
        # candidate stream.  Whenever an earlier entity accepts a
        # candidate, that candidate goes within ``min_d`` of the accepted
        # position and is therefore invalid for every later entity, so
        # "first valid of the shared stream" has exactly the joint law of
        # independent streams — while drawing M× fewer random bits and
        # checking the occupied set once instead of per entity.  (With
        # min_d == 0 the self-blocking vanishes and sharing would collapse
        # all placements onto one point, hence the guard.)
        share = has_current and min_d > 0 and M > 1

        def round_(carry):
            key, eff, ok, tries = carry
            key, sub = jax.random.split(key)
            cands = jax.random.uniform(
                sub,
                (batch_dim, 1 if share else M, K, 2),
                minval=lo,
                maxval=hi,
            )
            if share and O:
                d_occ_shared = jnp.linalg.norm(
                    occupied_positions[:, None] - cands[:, 0, :, None],
                    axis=-1,
                )  # [B, K, O]
                valid_shared = jnp.all(d_occ_shared >= min_d, axis=-1)
            new_eff, new_ok = list(eff), list(ok)
            for i in range(M):
                cand = cands[:, 0 if share else i]  # [B, K, 2]
                if share and O:
                    valid = valid_shared
                elif O:
                    d_occ = jnp.linalg.norm(
                        occupied_positions[:, None] - cand[:, :, None],
                        axis=-1,
                    )  # [B, K, O]
                    valid = jnp.all(d_occ >= min_d, axis=-1)  # [B, K]
                else:
                    valid = jnp.ones((batch_dim, K), bool)
                for j in range(M):
                    if j == i:
                        continue
                    # entities earlier in this round's fold see the round's
                    # updates; later ones their pre-round positions
                    src_eff_j, src_ok_j = (
                        (new_eff[j], new_ok[j]) if j < i else (eff[j], ok[j])
                    )
                    # present: already placed, or holding a current position
                    present = (
                        jnp.ones((batch_dim,), bool)
                        if has_current
                        else src_ok_j
                    )
                    d_j = jnp.linalg.norm(
                        src_eff_j[:, None] - cand, axis=-1
                    )  # [B, K]
                    valid = valid & ((d_j >= min_d) | ~present[:, None])
                chosen = cand[:, 0]
                found = valid[:, 0]
                for k in range(1, K):
                    take = (~found) & valid[:, k]
                    chosen = jnp.where(take[:, None], cand[:, k], chosen)
                    found = found | valid[:, k]
                # Give-up value after MAX_SPAWN_TRIES: per-entity distinct
                # index so shared-stream entities never collapse onto the
                # same fallback point.
                chosen = jnp.where(
                    found[:, None], chosen, cand[:, (K - 1 - i) % K]
                )
                upd = ~new_ok[i]
                new_eff[i] = jnp.where(upd[:, None], chosen, new_eff[i])
                new_ok[i] = new_ok[i] | found
            return key, tuple(new_eff), tuple(new_ok), tries + K

        def cond(carry):
            _, _, ok, tries = carry
            any_missing = ok[0]
            for o in ok[1:]:
                any_missing = any_missing & o
            return jnp.any(~any_missing) & (
                tries < ScenarioUtils.MAX_SPAWN_TRIES
            )

        _, eff, _, _ = jax.lax.while_loop(
            cond, round_, (key, eff0, ok0, jnp.int32(0))
        )
        return jnp.stack(eff, axis=1)

    @staticmethod
    def plot_entity_rotation(entity, env_index: int, length: float = 0.15):
        """Heading indicator line geom (reference utils.py:332-345)."""
        from vectorizedmultiagentsimulator_tpu.render import Line, Transform

        color = entity.color
        line = Line(start=(0.0, 0.0), end=(length, 0.0), width=0.01)
        xform = Transform(
            translation=tuple(np.asarray(entity.state.pos)[env_index]),
            rotation=float(np.asarray(entity.state.rot)[env_index, 0]),
        )
        line.add_attr(xform)
        line.set_color(*color[:3])
        return line

    @staticmethod
    def render_agent_indices(
        scenario, env_index: int, start_from: int = 0, exclude=None
    ):
        """Screen-space index labels over agents (reference utils.py:333-364).

        Returns one ``TextLine`` per (non-excluded) agent, positioned by
        projecting the agent's world position through the scenario's
        viewer size/zoom exactly like the reference.
        """
        from vectorizedmultiagentsimulator_tpu.render import TextLine

        aspect_r = scenario.viewer_size[X] / scenario.viewer_size[Y]
        if aspect_r > 1:
            dimensional_ratio = (aspect_r, 1)
        else:
            dimensional_ratio = (1, 1 / aspect_r)

        geoms = []
        for i, entity in enumerate(scenario.world.agents):
            if exclude is not None and entity in exclude:
                continue
            pos = np.asarray(entity.state.pos)[env_index]
            zoom_sq = scenario.viewer_zoom**2
            geoms.append(
                TextLine(
                    text=str(i + start_from),
                    font_size=15,
                    x=(
                        pos[X] * scenario.viewer_size[X]
                        / (zoom_sq * dimensional_ratio[X] * 2)
                        + scenario.viewer_size[X] / 2
                    ),
                    y=(
                        pos[Y] * scenario.viewer_size[Y]
                        / (zoom_sq * dimensional_ratio[Y] * 2)
                        + scenario.viewer_size[Y] / 2
                    ),
                )
            )
        return geoms

    @staticmethod
    def uniform_in_bounds(world, lo, hi, shape: Optional[Tuple[int, ...]] = None):
        """Uniform random positions ``[B, dim_p]`` (or ``[B, *shape]``) in
        ``[lo, hi]`` drawn from the world's PRNG stream — the jit-safe
        analogue of the reference's ``torch.zeros(...).uniform_(lo, hi)``
        spawn idiom used throughout the MPE scenarios."""
        if shape is None:
            shape = (world.dim_p,)
        return jax.random.uniform(
            world.next_key(),
            (world.batch_dim,) + tuple(shape),
            minval=lo,
            maxval=hi,
        )

    @staticmethod
    def check_kwargs_consumed(kwargs: Dict, warn: bool = True):
        if len(kwargs) > 0:
            message = (
                f"Scenario kwargs: {kwargs} passed but not used by the scenario."
            )
            if warn:
                import warnings

                warnings.warn(message)
            else:
                raise ValueError(message)


def save_video(name: str, frame_list, fps: int):
    """Save a list of rgb frames (reference utils.py:106).  No video codecs
    ship in the TPU image, so frames are stored as a compressed ``.npz``
    stack (plus a ``.gif`` when PIL is available)."""
    frames = np.stack([np.asarray(f) for f in frame_list])
    np.savez_compressed(f"{name}.npz", frames=frames, fps=fps)
    try:
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            f"{name}.gif",
            save_all=True,
            append_images=imgs[1:],
            duration=int(1000 / max(fps, 1)),
            loop=0,
        )
    except Exception:
        pass


def x_to_rgb_colormap(
    x,
    low: float = None,
    high: float = None,
    alpha: float = 1.0,
    cmap_name: str = "viridis",
    cmap_res: int = 10,
):
    """Map scalars to RGBA via a discretized colormap with linear
    interpolation between bins (reference utils.py:127-152).

    Uses matplotlib's colormaps when available, otherwise a built-in
    blue→red ramp (the TPU image may ship without matplotlib).
    """
    x = np.asarray(x, dtype=np.float64)
    try:
        from matplotlib import cm

        colormap = cm.get_cmap(cmap_name, cmap_res)(range(cmap_res))[:, :-1]
    except Exception:
        t = np.linspace(0.0, 1.0, cmap_res)
        colormap = np.stack([t, 0.5 * np.ones_like(t), 1 - t], axis=-1)
    if low is None:
        low = np.min(x)
    if high is None:
        high = np.max(x)
    x = np.clip(x, low, high)
    if high - low > 1e-5:
        x = (x - low) / (high - low) * (cmap_res - 1)
    x_c0_idx = np.floor(x).astype(int)
    x_c1_idx = np.ceil(x).astype(int)
    x_c0 = colormap[x_c0_idx, :]
    x_c1 = colormap[x_c1_idx, :]
    t = x - x_c0_idx
    rgb = t[:, None] * x_c1 + (1 - t)[:, None] * x_c0
    return np.concatenate([rgb, alpha * np.ones((rgb.shape[0], 1))], axis=-1)


def extract_nested_with_index(data, index: int):
    if isinstance(data, dict):
        return {k: extract_nested_with_index(v, index) for k, v in data.items()}
    return data[index]
