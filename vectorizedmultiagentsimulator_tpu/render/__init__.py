"""Rendering package.

The reference renders through pyglet/OpenGL (``vmas/simulator/rendering.py``);
that stack is unavailable in TPU pods, so this package provides a
dependency-free numpy software rasterizer producing ``rgb_array`` frames,
plus optional matplotlib display for ``human`` mode.  Geometry helpers used
by entities/sensors/joints live in ``rasterizer.py``.
"""
from vectorizedmultiagentsimulator_tpu.render.rasterizer import (
    Geom,
    Circle,
    Grid,
    Image,
    Line,
    Polygon,
    Segment,
    TextLine,
    Transform,
    Viewer,
    entity_geoms,
    joint_geoms,
    lidar_geoms,
    make_circle,
    make_ellipse,
    make_line,
    make_polygon,
    render_function_util,
)

__all__ = [
    "Geom",
    "Circle",
    "Grid",
    "Image",
    "Line",
    "Polygon",
    "Segment",
    "TextLine",
    "Transform",
    "Viewer",
    "entity_geoms",
    "joint_geoms",
    "lidar_geoms",
    "make_circle",
    "make_ellipse",
    "make_line",
    "make_polygon",
    "render_function_util",
]
