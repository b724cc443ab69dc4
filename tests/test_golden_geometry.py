"""Golden-parity tests for the closest-point geometry kernels and the
ray-cast kernels against recorded reference outputs."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from vectorizedmultiagentsimulator_tpu.ops import geometry as geo
from vectorizedmultiagentsimulator_tpu.ops import raycast as rc

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"golden file {name} missing (run tools/gen_golden.py)")
    return np.load(path)


@pytest.fixture(scope="module")
def g():
    return _load("geometry.npz")


def _j(x):
    return jnp.asarray(x, dtype=jnp.float32)


def test_closest_point_line(g):
    out = geo.closest_point_line(
        _j(g["pos1"]), _j(g["rot1"])[..., 0], _j(g["l1"]), _j(g["point"])
    )
    np.testing.assert_allclose(np.asarray(out), g["cpl"], atol=1e-5)


def test_closest_points_line_line(g):
    a, b = geo.closest_points_line_line(
        _j(g["pos1"]),
        _j(g["rot1"])[..., 0],
        _j(g["l1"]),
        _j(g["pos2"]),
        _j(g["rot2"])[..., 0],
        _j(g["l2"]),
    )
    np.testing.assert_allclose(np.asarray(a), g["cpll_a"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), g["cpll_b"], atol=1e-5)


def test_closest_point_box(g):
    out = geo.closest_point_box(
        _j(g["pos1"]), _j(g["rot1"])[..., 0], _j(g["w1"]), _j(g["l1"]), _j(g["point"])
    )
    np.testing.assert_allclose(np.asarray(out), g["cpb"], atol=1e-5)


def test_closest_line_box(g):
    a, b = geo.closest_line_box(
        _j(g["pos1"]),
        _j(g["rot1"])[..., 0],
        _j(g["w1"]),
        _j(g["l1"]),
        _j(g["pos2"]),
        _j(g["rot2"])[..., 0],
        _j(g["l2"]),
    )
    np.testing.assert_allclose(np.asarray(a), g["clb_a"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), g["clb_b"], atol=1e-5)


def test_closest_box_box(g):
    a, b = geo.closest_box_box(
        _j(g["pos1"]),
        _j(g["rot1"])[..., 0],
        _j(g["w1"]),
        _j(g["l1"]),
        _j(g["pos2"]),
        _j(g["rot2"])[..., 0],
        _j(g["w2"]),
        _j(g["l2"]),
    )
    np.testing.assert_allclose(np.asarray(a), g["cbb_a"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), g["cbb_b"], atol=1e-4)


def test_inner_point_box(g):
    a, d = geo.inner_point_box(_j(g["point"]), _j(g["pos2"]), _j(g["pos1"]))
    np.testing.assert_allclose(np.asarray(a), g["ipb"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), g["ipb_d"], atol=1e-5)


def test_raycast_parity():
    data = _load("raycast.npz")
    from helpers import build_world
    from vectorizedmultiagentsimulator_tpu.core import (
        Agent,
        Box,
        Landmark,
        Line,
        Sphere,
        World,
    )

    B = data["angles"].shape[0]
    world = World(B)
    agent = Agent(name="a", shape=Sphere(radius=0.03))
    world.add_agent(agent)
    landmarks = [
        Landmark("b0", shape=Box(length=0.4, width=0.2)),
        Landmark("b1", shape=Box(length=0.3, width=0.3)),
        Landmark("s0", shape=Sphere(radius=0.15)),
        Landmark("s1", shape=Sphere(radius=0.25)),
        Landmark("li0", shape=Line(length=0.6)),
        Landmark("li1", shape=Line(length=0.9)),
    ]
    for l in landmarks:
        world.add_landmark(l)
    world.finalize()
    for e in world.entities:
        e.state.pos = jnp.asarray(data[f"{e.name}_0"])
        e.state.rot = jnp.asarray(data[f"{e.name}_1"])
    dists = world.cast_rays(
        agent, jnp.asarray(data["angles"]), max_range=1.5,
        entity_filter=lambda e: True,
    )
    np.testing.assert_allclose(np.asarray(dists), data["dists"], atol=1e-5)
