"""Generate golden-parity data by running the *reference* simulator.

Usage:  python tools/gen_golden.py
Writes .npz files under tests/golden/.

The reference is imported from /root/reference with stub ``gym``/``pyglet``
modules (the runtime image ships gymnasium, not gym, and no pyglet).
Only the reference's public behavior is exercised — no code is copied.
"""
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")
REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")


def _install_stubs():
    import gymnasium

    gym_stub = types.ModuleType("gym")
    gym_stub.spaces = gymnasium.spaces
    gym_stub.Env = gymnasium.Env
    gym_stub.vector = gymnasium.vector
    sys.modules.setdefault("gym", gym_stub)
    pyglet_stub = types.ModuleType("pyglet")
    window_stub = types.ModuleType("pyglet.window")
    key_stub = types.ModuleType("pyglet.window.key")
    window_stub.key = key_stub
    pyglet_stub.window = window_stub
    sys.modules.setdefault("pyglet", pyglet_stub)
    sys.modules.setdefault("pyglet.window", window_stub)
    sys.modules.setdefault("pyglet.window.key", key_stub)


def build_reference_world(cfg, batch):
    import torch
    from vmas.simulator.core import Agent, Box, Landmark, Line, Sphere, World
    from vmas.simulator.joints import Joint

    def make_shape(spec):
        if spec[0] == "sphere":
            return Sphere(radius=spec[1])
        if spec[0] == "box":
            return Box(length=spec[1], width=spec[2], hollow=spec[3])
        if spec[0] == "line":
            return Line(length=spec[1])
        raise ValueError(spec)

    wkw = dict(cfg.get("world", {}))
    wkw.update(cfg.get("world_bounds", {}))
    world = World(batch, "cpu", **wkw)
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


def initial_state(cfg, batch, rng):
    """Deterministic initial conditions, shared with the jax test."""
    spread = cfg.get("spread", 0.3)
    init = {}
    names = [s["name"] for s in cfg.get("agents", [])] + [
        s["name"] for s in cfg.get("landmarks", [])
    ]
    n = len(names)
    # Deterministically scatter on a jittered grid to get interesting
    # contacts at the chosen spread.
    for i, name in enumerate(names):
        base = np.stack(
            [
                (np.arange(batch) % 3 - 1) * spread,
                (np.arange(batch) // 3 % 3 - 1) * spread,
            ],
            axis=-1,
        )
        init[name] = dict(
            pos=(
                base * 0.0
                + rng.uniform(-spread, spread, size=(batch, 2))
                + np.array([(i % 3 - 1) * spread, (i // 3 - 1) * spread])
            ).astype(np.float32),
            rot=rng.uniform(-np.pi, np.pi, size=(batch, 1)).astype(np.float32),
            vel=rng.uniform(-0.3, 0.3, size=(batch, 2)).astype(np.float32),
            ang_vel=rng.uniform(-0.5, 0.5, size=(batch, 1)).astype(np.float32),
        )
    return init


def main():
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    _install_stubs()
    import torch

    from physics_configs import BATCH, CONFIGS, N_STEPS, SEED

    torch.set_default_dtype(torch.float32)
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    for cfg_name, cfg in CONFIGS.items():
        rng = np.random.default_rng(SEED)
        world, entities = build_reference_world(cfg, BATCH)
        init = initial_state(cfg, BATCH, rng)
        # Apply in deterministic order so Joint observers fire identically.
        for name, st in init.items():
            e = entities[name]
            if e.is_joint:
                continue
            e.set_pos(torch.tensor(st["pos"]), batch_index=None)
            e.set_rot(torch.tensor(st["rot"]), batch_index=None)
            e.state.vel = torch.tensor(st["vel"])
            e.state.ang_vel = torch.tensor(st["ang_vel"])

        agent_names = [s["name"] for s in cfg.get("agents", [])]
        forces = rng.uniform(
            -1.0, 1.0, size=(N_STEPS, len(agent_names), BATCH, 2)
        ).astype(np.float32)
        torques = rng.uniform(
            -0.2, 0.2, size=(N_STEPS, len(agent_names), BATCH, 1)
        ).astype(np.float32)

        all_names = [e.name for e in world.entities]
        traj_pos = np.zeros((N_STEPS + 1, len(all_names), BATCH, 2), np.float32)
        traj_vel = np.zeros_like(traj_pos)
        traj_rot = np.zeros((N_STEPS + 1, len(all_names), BATCH, 1), np.float32)
        traj_ang = np.zeros_like(traj_rot)

        def record(t):
            for i, e in enumerate(world.entities):
                traj_pos[t, i] = e.state.pos.numpy()
                traj_vel[t, i] = e.state.vel.numpy()
                traj_rot[t, i] = e.state.rot.numpy()
                traj_ang[t, i] = e.state.ang_vel.numpy()

        record(0)
        for t in range(N_STEPS):
            for k, name in enumerate(agent_names):
                entities[name].state.force = torch.tensor(forces[t, k])
                entities[name].state.torque = torch.tensor(torques[t, k])
            world.step()
            record(t + 1)

        np.savez(
            os.path.join(GOLDEN_DIR, f"physics_{cfg_name}.npz"),
            entity_names=np.array(all_names),
            pos=traj_pos,
            vel=traj_vel,
            rot=traj_rot,
            ang_vel=traj_ang,
            forces=forces,
            torques=torques,
        )
        print(f"wrote physics_{cfg_name}.npz  entities={all_names}")

    gen_geometry_golden(rng=np.random.default_rng(SEED + 1))
    gen_raycast_golden(rng=np.random.default_rng(SEED + 2))


def gen_geometry_golden(rng):
    import torch
    from vmas.simulator.physics import (
        _get_closest_box_box,
        _get_closest_line_box,
        _get_closest_point_box,
        _get_closest_point_line,
        _get_closest_points_line_line,
        _get_inner_point_box,
    )

    B = 256
    t = lambda x: torch.tensor(x.astype(np.float32))
    pos1 = rng.uniform(-1, 1, (B, 2))
    pos2 = rng.uniform(-1, 1, (B, 2))
    rot1 = rng.uniform(-np.pi, np.pi, (B, 1))
    rot2 = rng.uniform(-np.pi, np.pi, (B, 1))
    l1 = rng.uniform(0.1, 0.8, (B,))
    l2 = rng.uniform(0.1, 0.8, (B,))
    w1 = rng.uniform(0.05, 0.5, (B,))
    w2 = rng.uniform(0.05, 0.5, (B,))
    point = rng.uniform(-1, 1, (B, 2))

    out = {}
    out["cpl"] = _get_closest_point_line(t(pos1), t(rot1), t(l1), t(point)).numpy()
    a, b = _get_closest_points_line_line(
        t(pos1), t(rot1), t(l1), t(pos2), t(rot2), t(l2)
    )
    out["cpll_a"], out["cpll_b"] = a.numpy(), b.numpy()
    out["cpb"] = _get_closest_point_box(
        t(pos1), t(rot1), t(w1), t(l1), t(point)
    ).numpy()
    a, b = _get_closest_line_box(
        t(pos1), t(rot1), t(w1), t(l1), t(pos2), t(rot2), t(l2)
    )
    out["clb_a"], out["clb_b"] = a.numpy(), b.numpy()
    a, b = _get_closest_box_box(
        t(pos1), t(rot1), t(w1), t(l1), t(pos2), t(rot2), t(w2), t(l2)
    )
    out["cbb_a"], out["cbb_b"] = a.numpy(), b.numpy()
    a, d = _get_inner_point_box(t(point), t(pos2), t(pos1))
    out["ipb"], out["ipb_d"] = a.numpy(), d.numpy()

    np.savez(
        os.path.join(GOLDEN_DIR, "geometry.npz"),
        pos1=pos1,
        pos2=pos2,
        rot1=rot1,
        rot2=rot2,
        l1=l1,
        l2=l2,
        w1=w1,
        w2=w2,
        point=point,
        **out,
    )
    print("wrote geometry.npz")


def gen_raycast_golden(rng):
    import torch
    from vmas.simulator.core import Agent, Box, Landmark, Line, Sphere, World

    B, R = 16, 12
    world = World(B, "cpu")
    agent = Agent(name="a", shape=Sphere(radius=0.03))
    world.add_agent(agent)
    shapes = [
        Landmark("b0", shape=Box(length=0.4, width=0.2)),
        Landmark("b1", shape=Box(length=0.3, width=0.3)),
        Landmark("s0", shape=Sphere(radius=0.15)),
        Landmark("s1", shape=Sphere(radius=0.25)),
        Landmark("li0", shape=Line(length=0.6)),
        Landmark("li1", shape=Line(length=0.9)),
    ]
    for l in shapes:
        world.add_landmark(l)
    poss = {}
    for e in world.entities:
        p = rng.uniform(-0.8, 0.8, (B, 2)).astype(np.float32)
        r = rng.uniform(-np.pi, np.pi, (B, 1)).astype(np.float32)
        e.state.pos = torch.tensor(p)
        e.state.rot = torch.tensor(r)
        poss[e.name] = (p, r)
    angles = rng.uniform(0, 2 * np.pi, (B, R)).astype(np.float32)
    dists = world.cast_rays(
        agent, torch.tensor(angles), max_range=1.5, entity_filter=lambda e: True
    )
    np.savez(
        os.path.join(GOLDEN_DIR, "raycast.npz"),
        angles=angles,
        dists=dists.numpy(),
        **{
            f"{k}_{i}": v
            for k, (p, r) in poss.items()
            for i, v in enumerate((p, r))
        },
    )
    print("wrote raycast.npz")


if __name__ == "__main__":
    main()
