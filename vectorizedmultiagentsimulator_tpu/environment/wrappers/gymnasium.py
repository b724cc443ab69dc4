"""Gymnasium API wrapper (reference
``vmas/simulator/environment/gym/gymnasium.py``).

Spaces are converted with the built-in ``to_gymnasium_space`` (the
reference uses shimmy's ``_convert_space``).
"""
from __future__ import annotations

import importlib.util
from typing import Optional

import numpy as np

from vectorizedmultiagentsimulator_tpu.environment import spaces as vmt_spaces
from vectorizedmultiagentsimulator_tpu.environment.environment import (
    Environment,
)
from vectorizedmultiagentsimulator_tpu.environment.wrappers.base import (
    BaseGymWrapper,
)

if importlib.util.find_spec("gymnasium") is not None:
    import gymnasium as gym
else:
    raise ImportError(
        "Gymnasium is not installed. Please install it with"
        " `pip install gymnasium`."
    )


class GymnasiumWrapper(gym.Env, BaseGymWrapper):
    metadata = Environment.metadata

    def __init__(
        self,
        env: Environment,
        return_numpy: bool = True,
        render_mode: str = "human",
    ):
        BaseGymWrapper.__init__(
            self, env, return_numpy=return_numpy, vectorized=False
        )
        assert env.num_envs == 1, (
            "GymnasiumEnv wrapper only supports singleton environments!"
            " For vectorized environments, use wrapper=gymnasium_vec."
        )
        assert self._env.terminated_truncated, (
            "GymnasiumWrapper is only compatible with termination and"
            " truncation flags. Please set `terminated_truncated=True`."
        )
        self.observation_space = vmt_spaces.to_gymnasium_space(
            self._env.observation_space
        )
        self.action_space = vmt_spaces.to_gymnasium_space(
            self._env.action_space
        )
        self.render_mode = render_mode

    @property
    def unwrapped(self) -> Environment:
        return self._env

    def step(self, action):
        action = self._action_list_to_tensor(action)
        obs, rews, terminated, truncated, info = self._env.step(action)
        env_data = self._convert_env_data(
            obs=obs,
            rews=rews,
            info=info,
            terminated=terminated,
            truncated=truncated,
        )
        return (
            env_data.obs,
            env_data.rews,
            env_data.terminated,
            env_data.truncated,
            env_data.info,
        )

    def reset(
        self, *, seed: Optional[int] = None, options: Optional[dict] = None
    ):
        if seed is not None:
            self._env.seed(seed)
        obs, info = self._env.reset_at(index=0, return_info=True)
        env_data = self._convert_env_data(obs=obs, info=info)
        return env_data.obs, env_data.info

    def render(
        self,
        agent_index_focus: Optional[int] = None,
        visualize_when_rgb: bool = False,
        **kwargs,
    ) -> Optional[np.ndarray]:
        return self._env.render(
            mode=self.render_mode,
            env_index=0,
            agent_index_focus=agent_index_focus,
            visualize_when_rgb=visualize_when_rgb,
            **kwargs,
        )
