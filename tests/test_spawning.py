"""Batched rejection spawner (`ScenarioUtils.find_random_positions_for_entities`).

Reference semantics: utils.py:241-319 — sequential per-entity rejection
loops keeping the first non-overlapping uniform proposal. Here all
entities are placed by one bounded ``lax.while_loop`` drawing K proposals
per entity per round; these tests pin the separation invariants for the
fresh-spawn mode (scenario resets) and the masked-respawn mode (discovery
per-step target respawns).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorizedmultiagentsimulator_tpu as vmt
from vectorizedmultiagentsimulator_tpu.utils import ScenarioUtils

MIN_DIST = 0.2
BOUNDS = (-1.0, 1.0)


@pytest.fixture(scope="module")
def world():
    return vmt.make_env("dispersion", num_envs=64, seed=0).world


def _pairwise_ok(new, occ, i, min_dist):
    d_occ = np.linalg.norm(occ - new[i], axis=-1).min() if len(occ) else np.inf
    d_oth = min(
        np.linalg.norm(new[j] - new[i])
        for j in range(len(new))
        if j != i
    )
    return min(d_occ, d_oth) >= min_dist - 1e-6


def test_fresh_spawn_separation(world):
    B, O, M = 64, 5, 6
    key = jax.random.PRNGKey(0)
    occupied = jax.random.uniform(key, (B, O, 2), minval=-1.0, maxval=1.0)
    pos = ScenarioUtils.find_random_positions_for_entities(
        occupied, M, world, MIN_DIST, BOUNDS, BOUNDS
    )
    pos, occ = np.asarray(pos), np.asarray(occupied)
    assert pos.shape == (B, M, 2)
    assert (np.abs(pos) <= 1.0).all()
    for b in range(B):
        for i in range(M):
            assert _pairwise_ok(pos[b], occ[b], i, MIN_DIST), (b, i)


def test_masked_respawn_keeps_unreplaced_rows(world):
    B, O, M = 64, 4, 5
    key = jax.random.PRNGKey(1)
    occupied = jax.random.uniform(key, (B, O, 2), minval=-1.0, maxval=1.0)
    current = jax.random.uniform(
        jax.random.fold_in(key, 1), (B, M, 2), minval=-1.0, maxval=1.0
    )
    mask = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5, (B, M))
    new = ScenarioUtils.find_random_positions_for_entities(
        occupied,
        M,
        world,
        MIN_DIST,
        BOUNDS,
        BOUNDS,
        current_positions=current,
        replace_mask=mask,
    )
    new, cur, m = np.asarray(new), np.asarray(current), np.asarray(mask)
    occ = np.asarray(occupied)
    assert np.allclose(new[~m], cur[~m]), "rows outside the mask moved"
    for b in range(B):
        for i in range(M):
            if m[b, i]:
                assert _pairwise_ok(new[b], occ[b], i, MIN_DIST), (b, i)


def test_single_entity_wrapper(world):
    B, O = 64, 6
    occupied = jax.random.uniform(
        jax.random.PRNGKey(2), (B, O, 2), minval=-1.0, maxval=1.0
    )
    pos = ScenarioUtils.find_random_pos_for_entity(
        occupied, None, world, MIN_DIST, BOUNDS, BOUNDS
    )
    pos, occ = np.asarray(pos), np.asarray(occupied)
    assert pos.shape == (B, 1, 2)
    d = np.linalg.norm(occ - pos, axis=-1)
    assert (d.min(axis=1) >= MIN_DIST - 1e-6).all()
