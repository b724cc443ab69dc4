"""Shared world configurations for golden-parity physics tests.

These configs are interpreted twice: by ``tools/gen_golden.py`` against the
*reference* simulator (torch) to record golden trajectories, and by
``tests/test_golden_physics.py`` against this framework.  They are designed
to cover every narrowphase pair class, hollow boxes, joints (plain, with
connecting landmark, fixed-rotation), friction, gravity, drag overrides and
force/velocity clamps.
"""

CONFIGS = {
    "spheres": dict(
        world=dict(substeps=1, dt=0.1),
        agents=[
            dict(name="a0", shape=("sphere", 0.08)),
            dict(name="a1", shape=("sphere", 0.12), mass=2.0),
            dict(name="a2", shape=("sphere", 0.06), max_speed=0.3),
            dict(name="a3", shape=("sphere", 0.1), f_range=0.5),
        ],
        landmarks=[
            dict(name="l0", shape=("sphere", 0.15), movable=True, mass=3.0),
            dict(name="l1", shape=("sphere", 0.2)),
        ],
        spread=0.25,
    ),
    "boxes_lines": dict(
        world=dict(substeps=2, dt=0.1),
        agents=[
            dict(name="a0", shape=("sphere", 0.08)),
            dict(
                name="a1",
                shape=("box", 0.3, 0.15, False),
                rotatable=True,
            ),
            dict(name="a2", shape=("line", 0.4), rotatable=True),
        ],
        landmarks=[
            dict(
                name="l0",
                shape=("box", 0.25, 0.12, False),
                movable=True,
                rotatable=True,
                mass=2.0,
            ),
            dict(name="l1", shape=("line", 0.5), movable=True, rotatable=True),
            dict(name="l2", shape=("box", 0.4, 0.3, False)),
            dict(name="l3", shape=("line", 0.6)),
        ],
        spread=0.3,
    ),
    "hollow_box": dict(
        world=dict(substeps=2, dt=0.1),
        agents=[
            dict(name="a0", shape=("sphere", 0.06)),
            dict(name="a1", shape=("sphere", 0.06)),
        ],
        landmarks=[
            dict(
                name="box",
                shape=("box", 0.5, 0.5, True),
                movable=True,
                rotatable=True,
                mass=2.0,
            ),
        ],
        spread=0.12,
    ),
    "joints": dict(
        world=dict(substeps=5, dt=0.1),
        agents=[
            dict(name="a0", shape=("sphere", 0.05)),
            dict(name="a1", shape=("sphere", 0.05)),
            dict(name="a2", shape=("sphere", 0.05)),
        ],
        landmarks=[
            dict(name="l0", shape=("line", 0.3), movable=True, rotatable=True),
        ],
        joints=[
            dict(
                a="a0",
                b="l0",
                anchor_a=(0, 0),
                anchor_b=(-1, 0),
                dist=0.2,
                rotate_a=True,
                rotate_b=True,
            ),
            dict(
                a="a1",
                b="a2",
                anchor_a=(0, 0),
                anchor_b=(0, 0),
                dist=0.0,
                rotate_a=True,
                rotate_b=True,
            ),
        ],
        spread=0.6,
    ),
    "joints_fixed_rotation": dict(
        world=dict(substeps=4, dt=0.1),
        agents=[
            dict(name="a0", shape=("sphere", 0.05)),
            dict(name="a1", shape=("box", 0.2, 0.1, False), rotatable=True),
        ],
        joints=[
            dict(
                a="a0",
                b="a1",
                anchor_a=(0, 0),
                anchor_b=(1, 0),
                dist=0.15,
                rotate_a=True,
                rotate_b=False,
            ),
        ],
        spread=0.5,
    ),
    "gravity_friction": dict(
        world=dict(
            substeps=1,
            dt=0.1,
            gravity=(0.0, -0.05),
            linear_friction=0.02,
            angular_friction=0.01,
            drag=0.1,
        ),
        agents=[
            dict(name="a0", shape=("sphere", 0.08)),
            dict(
                name="a1",
                shape=("box", 0.2, 0.1, False),
                rotatable=True,
                drag=0.4,
                linear_friction=0.1,
            ),
            dict(name="a2", shape=("sphere", 0.05), gravity=(0.02, 0.01)),
        ],
        landmarks=[
            dict(name="floor", shape=("line", 3.0)),
        ],
        spread=0.4,
    ),
    "clamps": dict(
        world=dict(substeps=1, dt=0.1),
        agents=[
            dict(name="a0", shape=("sphere", 0.05), max_f=0.3),
            dict(name="a1", shape=("sphere", 0.05), f_range=0.2, v_range=0.1),
            dict(
                name="a2",
                shape=("box", 0.2, 0.1, False),
                rotatable=True,
                max_t=0.05,
                t_range=0.03,
            ),
        ],
        world_bounds=dict(x_semidim=0.5, y_semidim=0.4),
        spread=0.3,
    ),
}

BATCH = 8
N_STEPS = 20
SEED = 1234


def iter_entities(cfg):
    for a in cfg.get("agents", []):
        yield ("agent", a)
    for l in cfg.get("landmarks", []):
        yield ("landmark", l)
