"""Base wrapper utilities (reference
``vmas/simulator/environment/gym/base.py``).

Converts jitted jax outputs into the numpy / de-vectorized conventions of
the external RL APIs.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from collections import namedtuple
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.environment.environment import (
    Environment,
)
from vectorizedmultiagentsimulator_tpu.utils import (
    JaxUtils,
    extract_nested_with_index,
)

EnvData = namedtuple(
    "EnvData", ["obs", "rews", "terminated", "truncated", "done", "info"]
)


class BaseGymWrapper(ABC):
    def __init__(self, env: Environment, return_numpy: bool, vectorized: bool):
        self._env = env
        self.return_numpy = return_numpy
        self.dict_spaces = env.dict_spaces
        self.vectorized = vectorized

    @property
    def env(self):
        return self._env

    def _maybe_to_numpy(self, data):
        return JaxUtils.to_numpy(data) if self.return_numpy else data

    def _convert_output(self, data, item: bool = False):
        if not self.vectorized:
            data = extract_nested_with_index(data, index=0)
            if item:
                return data.item()
        return self._maybe_to_numpy(data)

    def _compress_infos(self, infos):
        if isinstance(infos, dict):
            return infos
        if isinstance(infos, list):
            return {
                self._env.agents[i].name: info for i, info in enumerate(infos)
            }
        raise ValueError(
            f"Expected list or dictionary for infos but got {type(infos)}"
        )

    def _convert_env_data(
        self,
        obs=None,
        rews=None,
        info=None,
        terminated=None,
        truncated=None,
        done=None,
    ):
        if self.dict_spaces:
            for agent in list(obs.keys() if obs is not None else []):
                obs[agent] = self._convert_output(obs[agent])
            for agent in list(info.keys() if info is not None else []):
                info[agent] = self._convert_output(info[agent])
            for agent in list(rews.keys() if rews is not None else []):
                rews[agent] = self._convert_output(rews[agent], item=True)
        else:
            for i in range(self._env.n_agents):
                if obs is not None:
                    obs[i] = self._convert_output(obs[i])
                if info is not None:
                    info[i] = self._convert_output(info[i])
                if rews is not None:
                    rews[i] = self._convert_output(rews[i], item=True)
        terminated = (
            self._convert_output(terminated, item=True)
            if terminated is not None
            else None
        )
        truncated = (
            self._convert_output(truncated, item=True)
            if truncated is not None
            else None
        )
        done = (
            self._convert_output(done, item=True) if done is not None else None
        )
        info = self._compress_infos(info) if info is not None else None
        return EnvData(
            obs=obs,
            rews=rews,
            terminated=terminated,
            truncated=truncated,
            done=done,
            info=info,
        )

    def _action_list_to_tensor(self, list_in: List) -> List:
        if isinstance(list_in, dict):
            # Dict-space convenience: actions keyed by agent name
            # (the underlying Environment.step also accepts this form).
            list_in = [list_in[agent.name] for agent in self._env.agents]
        assert len(list_in) == self._env.n_agents, (
            f"Expecting actions for {self._env.n_agents} agents,"
            f" got {len(list_in)} actions"
        )
        dtype = (
            jnp.float32 if self._env.continuous_actions else jnp.int32
        )
        return [
            jnp.asarray(act, dtype=dtype).reshape(
                self._env.num_envs, self._env.get_agent_action_size(agent)
            )
            for agent, act in zip(self._env.agents, list_in)
        ]

    @abstractmethod
    def step(self, action):
        raise NotImplementedError

    @abstractmethod
    def reset(
        self, *, seed: Optional[int] = None, options: Optional[dict] = None
    ):
        raise NotImplementedError

    @abstractmethod
    def render(
        self,
        agent_index_focus: Optional[int] = None,
        visualize_when_rgb: bool = False,
        **kwargs,
    ) -> Optional[np.ndarray]:
        raise NotImplementedError
