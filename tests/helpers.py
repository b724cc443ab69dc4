"""Shared helpers to build framework worlds from physics_configs specs."""
import jax
import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core import (
    Agent,
    Box,
    Joint,
    Landmark,
    Line,
    Sphere,
    World,
)


def make_shape(spec):
    if spec[0] == "sphere":
        return Sphere(radius=spec[1])
    if spec[0] == "box":
        return Box(length=spec[1], width=spec[2], hollow=spec[3])
    if spec[0] == "line":
        return Line(length=spec[1])
    raise ValueError(spec)


def build_world(cfg, batch):
    wkw = dict(cfg.get("world", {}))
    wkw.update(cfg.get("world_bounds", {}))
    world = World(batch, **wkw)
    entities = {}
    for spec in cfg.get("agents", []):
        spec = dict(spec)
        name = spec.pop("name")
        shape = make_shape(spec.pop("shape"))
        a = Agent(name=name, shape=shape, **spec)
        world.add_agent(a)
        entities[name] = a
    for spec in cfg.get("landmarks", []):
        spec = dict(spec)
        name = spec.pop("name")
        shape = make_shape(spec.pop("shape"))
        l = Landmark(name=name, shape=shape, **spec)
        world.add_landmark(l)
        entities[name] = l
    for jspec in cfg.get("joints", []):
        joint = Joint(
            entities[jspec["a"]],
            entities[jspec["b"]],
            anchor_a=tuple(jspec.get("anchor_a", (0, 0))),
            anchor_b=tuple(jspec.get("anchor_b", (0, 0))),
            dist=jspec.get("dist", 0.0),
            rotate_a=jspec.get("rotate_a", True),
            rotate_b=jspec.get("rotate_b", True),
            collidable=jspec.get("collidable", False),
            width=jspec.get("width", 0.0),
        )
        world.add_joint(joint)
    return world, entities
