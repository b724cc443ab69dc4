"""Scenario registry and loader.

The reference walks its scenario directory and execs files by name
(``vmas/scenarios/__init__.py:11-24``); here scenarios are ordinary
importable modules registered in :data:`_REGISTRY`, and ``load(name)``
returns the module (exposing ``.Scenario``) for API parity.
"""
from __future__ import annotations

import importlib
from typing import Union

_REGISTRY = {}


def _register(name: str, module_path: str):
    _REGISTRY[name] = module_path


# Main scenarios
for _name in [
    "ball_passage",
    "ball_trajectory",
    "balance",
    "buzz_wire",
    "discovery",
    "dispersion",
    "dropout",
    "flocking",
    "football",
    "give_way",
    "joint_passage",
    "joint_passage_size",
    "multi_give_way",
    "navigation",
    "passage",
    "reverse_transport",
    "road_traffic",
    "sampling",
    "transport",
    "wheel",
    "wind_flocking",
]:
    _register(_name, f"vectorizedmultiagentsimulator_tpu.scenarios.{_name}")

# Debug scenarios
for _name in [
    "asym_joint",
    "circle_trajectory",
    "diff_drive",
    "drone",
    "goal",
    "het_mass",
    "kinematic_bicycle",
    "line_trajectory",
    "pollock",
    "vel_control",
    "waterfall",
]:
    _register(_name, f"vectorizedmultiagentsimulator_tpu.scenarios.debug.{_name}")

# MPE scenarios
for _name in [
    "simple",
    "simple_adversary",
    "simple_crypto",
    "simple_push",
    "simple_reference",
    "simple_speaker_listener",
    "simple_spread",
    "simple_tag",
    "simple_world_comm",
]:
    _register(_name, f"vectorizedmultiagentsimulator_tpu.scenarios.mpe.{_name}")


def names():
    return sorted(_REGISTRY)


def load(name: str):
    """Load a scenario module by name (``.py`` suffix tolerated, like the
    reference loader)."""
    if name.endswith(".py"):
        name = name[: -len(".py")]
    name = name.split("/")[-1]
    if name not in _REGISTRY:
        raise AssertionError(f"{name} scenario not found.")
    return importlib.import_module(_REGISTRY[name])
