"""Sensors (reference ``vmas/simulator/sensors.py``).

``Lidar`` delegates to the dense ``World.cast_rays`` kernels; its last
measurement is cached on the python object for rendering only (not part of
the state pytree — it is recomputed every ``measure()``).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable, Tuple, Union

import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.utils import Array, Color


class Sensor(ABC):
    def __init__(self, world):
        self._world = world
        self._agent = None

    @property
    def agent(self):
        return self._agent

    @agent.setter
    def agent(self, agent):
        self._agent = agent

    @abstractmethod
    def measure(self):
        raise NotImplementedError

    @abstractmethod
    def render(self, env_index: int = 0) -> list:
        raise NotImplementedError

    def to(self, device):
        return self


class Lidar(Sensor):
    def __init__(
        self,
        world,
        angle_start: float = 0.0,
        angle_end: float = 2 * np.pi,
        n_rays: int = 8,
        max_range: float = 1.0,
        entity_filter: Callable = lambda _: True,
        render_color: Union[Color, Tuple[float, float, float]] = Color.GRAY,
        alpha: float = 1.0,
        render: bool = True,
    ):
        super().__init__(world)
        # Drop the duplicated endpoint on full circles (sensors.py:61-68).
        if (angle_start - angle_end) % (np.pi * 2) < 1e-5:
            angles = np.linspace(angle_start, angle_end, n_rays + 1)[:n_rays]
        else:
            angles = np.linspace(angle_start, angle_end, n_rays)
        self._angles = jnp.asarray(angles, dtype=jnp.float32)  # [R]
        self._max_range = max_range
        self._last_measurement = None
        self._render = render
        self._entity_filter = entity_filter
        self._render_color = render_color
        self._alpha = alpha

    def to(self, device):
        return self

    @property
    def entity_filter(self):
        return self._entity_filter

    @entity_filter.setter
    def entity_filter(self, entity_filter: Callable):
        self._entity_filter = entity_filter

    @property
    def render_color(self):
        if isinstance(self._render_color, Color):
            return self._render_color.value
        return self._render_color

    @property
    def alpha(self):
        return self._alpha

    def measure(self, vectorized: bool = True) -> Array:
        agent = self.agent
        angles = self._angles[None, :] + agent.state.rot  # [B, R]
        if not vectorized:
            dists = [
                self._world.cast_ray(
                    agent,
                    angles[:, i],
                    max_range=self._max_range,
                    entity_filter=self.entity_filter,
                )
                for i in range(angles.shape[1])
            ]
            measurement = jnp.stack(dists, axis=1)
        else:
            measurement = self._world.cast_rays(
                agent,
                angles,
                max_range=self._max_range,
                entity_filter=self.entity_filter,
            )
        self._last_measurement = measurement
        return measurement

    def set_render(self, render: bool):
        self._render = render

    def render(self, env_index: int = 0) -> list:
        if not self._render or self._last_measurement is None:
            return []
        from vectorizedmultiagentsimulator_tpu.render import lidar_geoms

        return lidar_geoms(self, env_index)
