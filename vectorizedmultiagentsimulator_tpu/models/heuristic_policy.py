"""Heuristic policy interfaces (reference
``vmas/simulator/heuristic_policy.py``).

Per-scenario heuristic policies live next to their scenarios; they are pure
jnp maps ``observation [B, obs] -> action [B, act]`` usable inside jit and
``lax.scan`` rollouts.
"""
from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.utils import Array


class BaseHeuristicPolicy(ABC):
    def __init__(self, continuous_action: bool = True):
        self.continuous_actions = continuous_action

    @abstractmethod
    def compute_action(self, observation: Array, u_range: float) -> Array:
        raise NotImplementedError


class RandomPolicy(BaseHeuristicPolicy):
    def __init__(self, continuous_action: bool = True, key=None):
        super().__init__(continuous_action)
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def compute_action(self, observation: Array, u_range: float) -> Array:
        self._key, sub = jax.random.split(self._key)
        n_envs = observation.shape[0]
        return jnp.clip(
            jax.random.normal(sub, (n_envs, 2)), -u_range, u_range
        )
