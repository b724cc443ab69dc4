"""Checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5.4) — its state lives in
scattered mutable tensors.  Here the *entire* simulation (physics state,
comm, scenario buffers, controller integrators, PRNG key, step counters)
is one pytree, so a checkpoint is a single save/restore of that pytree.

Two backends:
  * ``save`` / ``load``         — dependency-free ``.npz`` flat-leaf format;
  * ``save_orbax`` / ``load_orbax`` — orbax-checkpoint, for async /
    multi-host checkpointing at scale (orbax is in the base image).
"""
from __future__ import annotations

import numpy as np

import jax


def _flatten_with_paths(state):
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(state)
    keys = [jax.tree_util.keystr(path) for path, _ in leaves_with_paths]
    leaves = [leaf for _, leaf in leaves_with_paths]
    return keys, leaves, treedef


def save(path: str, state) -> None:
    """Save a state pytree to ``path`` (.npz)."""
    keys, leaves, _ = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__keys__"] = np.asarray(keys, dtype=object)
    np.savez_compressed(path, **arrays, allow_pickle=True)


def load(path: str, like_state):
    """Load a state pytree saved with :func:`save`.

    ``like_state`` provides the pytree structure (e.g. ``env.state``); leaf
    order and key paths are validated against the file.
    """
    data = np.load(path, allow_pickle=True)
    keys, leaves, treedef = _flatten_with_paths(like_state)
    saved_keys = list(data["__keys__"])
    assert saved_keys == keys, (
        "Checkpoint structure mismatch:"
        f" saved={saved_keys[:5]}... live={keys[:5]}..."
    )
    new_leaves = [
        jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_env(path: str, env) -> None:
    """Checkpoint a live Environment (its full state pytree)."""
    save(path, env.state)


def restore_env(path: str, env):
    """Restore a live Environment from a checkpoint created on an env with
    the same scenario/config."""
    env.state = load(path, env.state)
    return env


def save_orbax(path: str, state) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like_state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like_state)
