"""RL Environment front-end.

Rebuild of ``vmas/simulator/environment/environment.py`` for the
jit-compiled functional core:

 * the reference's global-RNG sandbox (``local_seed``, environment.py:31-47)
   is replaced by an explicit ``jax.random`` key carried in the state
   pytree — same isolation semantics, zero global state;
 * ``step`` / ``reset`` / ``reset_at`` are jit-compiled pure functions over
   the :class:`WorldState`; the stateful ``env.step(actions)`` facade simply
   threads the pytree through them.  The pure functions are also exposed
   (``step_fn`` / ``reset_fn``) for ``lax.scan`` rollouts, ``jax.grad``
   differentiation and ``shard_map`` multi-chip execution;
 * per-index resets (environment.py:132) become masked batched updates;
 * discrete->continuous action decoding (environment.py:616-749) is
   re-expressed with ``where`` masks, including the odd-n "first action is
   zero" remap.

The scenario/extras pytree structure is discovered during the eager reset
in ``__init__`` and then frozen; scenarios must initialize every persistent
buffer during reset (a clear error is raised otherwise).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vectorizedmultiagentsimulator_tpu.core.entities import Agent
from vectorizedmultiagentsimulator_tpu.core.state import WorldState
from vectorizedmultiagentsimulator_tpu.environment import spaces
from vectorizedmultiagentsimulator_tpu.scenario import BaseScenario
from vectorizedmultiagentsimulator_tpu.utils import (
    AGENT_OBS_TYPE,
    ALPHABET,
    Array,
    JaxUtils,
    X,
    Y,
    env_index_to_mask,
)


class Environment:
    metadata = {
        "render.modes": ["human", "rgb_array"],
        "runtime.vectorized": True,
    }

    def __init__(
        self,
        scenario: BaseScenario,
        num_envs: int = 32,
        device=None,
        max_steps: Optional[int] = None,
        continuous_actions: bool = True,
        seed: Optional[int] = None,
        dict_spaces: bool = False,
        multidiscrete_actions: bool = False,
        clamp_actions: bool = False,
        grad_enabled: bool = False,
        terminated_truncated: bool = False,
        jit_compile: bool = True,
        **kwargs,
    ):
        if multidiscrete_actions:
            assert not continuous_actions, (
                "When asking for multidiscrete_actions, make sure"
                " continuous_actions=False"
            )
        self.scenario = scenario
        self.num_envs = num_envs
        self.batch_dim = num_envs
        self.device = device
        self.world = scenario.env_make_world(num_envs, device, **kwargs)
        self.world.finalize(
            key=jax.random.PRNGKey(seed if seed is not None else 0)
        )

        self.agents = self.world.policy_agents
        self.n_agents = len(self.agents)
        self.max_steps = max_steps
        self.continuous_actions = continuous_actions
        self.dict_spaces = dict_spaces
        self.clamp_action = clamp_actions
        self.grad_enabled = grad_enabled
        self.terminated_truncated = terminated_truncated
        self.multidiscrete_actions = multidiscrete_actions
        self._jit_compile = jit_compile

        # Eager first reset: discovers the extras pytree structure, then the
        # structure is frozen and all entry points are jit compiled.
        self._frozen = False
        observations = self._reset_eager(seed=seed)
        self._freeze()

        self.action_space = self.get_action_space()
        self.observation_space = self.get_observation_space(observations)

        # rendering
        self.viewer = None
        self.text_lines = None
        self.headless = None
        self.visible_display = None

    # ------------------------------------------------------------------ #
    # State plumbing
    # ------------------------------------------------------------------ #
    @property
    def state(self) -> WorldState:
        """The full simulation state pytree (checkpoint = save this)."""
        return self.world.state

    @state.setter
    def state(self, value: WorldState):
        self.world.bind(value)

    @property
    def steps(self) -> Array:
        return self.world.state.steps

    def _freeze(self):
        self._frozen = True
        self.world._allow_new_extras = False
        # Pin the fused-step on/off decision now, while the VMT_PALLAS_*
        # flags in force at construction still apply (the LIDAR/road
        # decisions pin themselves during the eager init reset's
        # observation pass).  See World._pallas_choice.
        if (
            self.world._pallas_step_ok()
            and self.world.state.phys_pack is None
        ):
            # Materialize the packed physics mirror once so the state
            # treedef is stable for scan carries; thereafter the fused
            # kernel feeds itself and the hot loop never repacks.
            self.world._init_phys_pack()
        maybe_jit = jax.jit if self._jit_compile else (lambda f, **kw: f)

        def _functional(impl):
            """Run ``impl`` against ``state`` bound into the world, then
            restore whatever state the world held before the call.  The
            bound state is only needed DURING the (traced) call; leaving
            it behind would strand tracers in ``world._state`` whenever
            the fn runs under an outer trace (scan rollouts, grad), and
            the next ``env.state`` read would leak them into a fresh
            jit (UnexpectedTracerError at check_eval_args)."""

            def wrapped(state: WorldState, *rest):
                prev = self.world._state
                prev_pool = self.world._key_pool
                self.world.bind(state)
                # Batch per-call subkey derivation for this trace (one
                # threefry per KEY_BLOCK draws instead of a scalar-op
                # chain); pool entries are tracers, so the pool must die
                # with the trace — restore in the same finally that
                # restores the state.
                self.world.begin_key_block()
                try:
                    outs = impl(*rest)
                    return self.world.state, outs
                finally:
                    self.world._state = prev
                    self.world._key_pool = prev_pool

            return wrapped

        step_fn = _functional(lambda actions: self._step_impl(list(actions)))
        reset_all_fn = _functional(lambda: self._reset_impl(None))
        reset_mask_fn = _functional(lambda mask: self._reset_impl(mask))

        self.step_fn = step_fn
        self.reset_fn = reset_all_fn
        self.reset_at_fn = reset_mask_fn
        self._jit_step = maybe_jit(step_fn, donate_argnums=0)
        self._jit_reset_all = maybe_jit(reset_all_fn, donate_argnums=0)
        self._jit_reset_mask = maybe_jit(reset_mask_fn, donate_argnums=0)

    # ------------------------------------------------------------------ #
    # Public API (reference environment.py:113-202,325-405)
    # ------------------------------------------------------------------ #
    def reset(
        self,
        seed: Optional[int] = None,
        return_observations: bool = True,
        return_info: bool = False,
        return_dones: bool = False,
    ):
        if seed is not None:
            self._seed(seed)
        new_state, outs = self._jit_reset_all(self.world.state)
        self.world.bind(new_state)
        return self._select_reset_outputs(
            outs, return_observations, return_info, return_dones
        )

    def reset_at(
        self,
        index: int,
        return_observations: bool = True,
        return_info: bool = False,
        return_dones: bool = False,
    ):
        self._check_batch_index(index)
        mask = env_index_to_mask(index, self.num_envs)
        new_state, outs = self._jit_reset_mask(self.world.state, mask)
        self.world.bind(new_state)
        return self._select_reset_outputs(
            outs, return_observations, return_info, return_dones
        )

    def step(self, actions: Union[List, Dict]):
        """Vectorized step over all envs.

        ``actions``: list of len ``n_agents`` of ``[num_envs, action_size]``
        arrays, or a dict keyed by agent name.
        """
        actions = self._normalize_actions(actions)
        new_state, outs = self._jit_step(self.world.state, tuple(actions))
        self.world.bind(new_state)
        return list(outs)

    def done(self):
        result = self._done_impl()
        return result

    def seed(self, seed=None):
        return self._seed(seed)

    def _seed(self, seed=None):
        if seed is None:
            seed = 0
        self.world.bind(
            self.world.state.replace(key=jax.random.PRNGKey(seed))
        )
        return [seed]

    def to(self, device):
        return self

    def get_from_scenario(
        self,
        get_observations: bool,
        get_rewards: bool,
        get_infos: bool,
        get_dones: bool,
        dict_agent_names: Optional[bool] = None,
    ):
        return self._get_from_scenario(
            get_observations=get_observations,
            get_rewards=get_rewards,
            get_infos=get_infos,
            get_dones=get_dones,
            dict_agent_names=dict_agent_names,
        )

    # ------------------------------------------------------------------ #
    # Internals
    # ------------------------------------------------------------------ #
    def _check_batch_index(self, batch_index):
        if batch_index is not None and isinstance(batch_index, (int, np.integer)):
            assert 0 <= batch_index < self.num_envs, (
                f"Index must be between 0 and {self.num_envs}, got {batch_index}"
            )

    def _reset_eager(self, seed: Optional[int] = None):
        outs = self._reset_impl(None)
        return outs[0]

    def _reset_impl(self, env_index):
        """reset world (+ scenario hook) and gather obs/info/done."""
        self.scenario.env_reset_world_at(env_index)
        mask = env_index_to_mask(env_index, self.num_envs)
        s = self.world.state
        self.world.bind(
            s.replace(steps=jnp.where(mask, 0, s.steps))
        )
        # done() is queried here only to report the post-reset flags;
        # scenarios whose done() has per-step side effects (e.g.
        # road_traffic's collision recording / agent re-placement) gate
        # them on the explicit in_reset parameter (done_query) so a reset
        # never re-runs them on stale per-step state.
        obs = self._get_from_scenario(
            get_observations=True,
            get_rewards=False,
            get_infos=True,
            get_dones=True,
            in_reset=True,
        )
        return tuple(obs)

    def _select_reset_outputs(
        self, outs, return_observations, return_info, return_dones
    ):
        """Filter jitted reset outputs to the requested subset, preserving
        the reference's ordering (environment.py:204-252: obs, dones,
        infos)."""
        if self.terminated_truncated:
            obs, terminated, truncated, infos = outs
            result = [
                obs if return_observations else None,
                terminated if return_dones else None,
                truncated if return_dones else None,
                infos if return_info else None,
            ]
        else:
            obs, dones, infos = outs
            result = [
                obs if return_observations else None,
                dones if return_dones else None,
                infos if return_info else None,
            ]
        result = [r for r in result if r is not None]
        if not result:
            return None
        return result[0] if len(result) == 1 else result

    def _normalize_actions(self, actions) -> List[Array]:
        if isinstance(actions, Dict):
            actions_dict = actions
            actions = []
            for agent in self.agents:
                try:
                    actions.append(actions_dict[agent.name])
                except KeyError:
                    raise AssertionError(
                        f"Agent '{agent.name}' not contained in action dict"
                    )
            assert len(actions_dict) == self.n_agents, (
                f"Expecting actions for {self.n_agents},"
                f" got {len(actions_dict)} actions"
            )
        assert len(actions) == self.n_agents, (
            f"Expecting actions for {self.n_agents}, got {len(actions)} actions"
        )
        norm = []
        for i, action in enumerate(actions):
            action = jnp.asarray(action)
            if action.ndim == 1:
                action = action[:, None]
            assert action.shape[0] == self.num_envs, (
                f"Actions used in input of env must be of len {self.num_envs},"
                f" got {action.shape[0]}"
            )
            assert action.shape[1] == self.get_agent_action_size(self.agents[i]), (
                f"Action for agent {self.agents[i].name} has shape"
                f" {action.shape[1]}, but should have shape"
                f" {self.get_agent_action_size(self.agents[i])}"
            )
            norm.append(action)
        return norm

    def _step_impl(self, actions: List[Array]):
        for i, agent in enumerate(self.agents):
            self._set_action(actions[i], agent)
        for agent in self.world.agents:
            self.scenario.env_process_action(agent)
        self.scenario.pre_step()
        self.world.step()
        self.scenario.post_step()
        s = self.world.state
        self.world.bind(s.replace(steps=s.steps + 1))
        return tuple(
            self._get_from_scenario(
                get_observations=True,
                get_infos=True,
                get_rewards=True,
                get_dones=True,
            )
        )

    def _get_from_scenario(
        self,
        get_observations: bool,
        get_rewards: bool,
        get_infos: bool,
        get_dones: bool,
        dict_agent_names: Optional[bool] = None,
        in_reset: bool = False,
    ):
        if not any((get_observations, get_rewards, get_infos, get_dones)):
            return
        if dict_agent_names is None:
            dict_agent_names = self.dict_spaces
        obs = rewards = infos = terminated = truncated = dones = None
        if get_observations:
            obs = {} if dict_agent_names else []
        if get_rewards:
            rewards = {} if dict_agent_names else []
        if get_infos:
            infos = {} if dict_agent_names else []

        if get_rewards:
            for agent in self.agents:
                reward = self.scenario.reward(agent)
                if dict_agent_names:
                    rewards.update({agent.name: reward})
                else:
                    rewards.append(reward)
        if get_observations:
            for agent in self.agents:
                observation = self.scenario.observation(agent)
                if dict_agent_names:
                    obs.update({agent.name: observation})
                else:
                    obs.append(observation)
        if get_infos:
            for agent in self.agents:
                info = self.scenario.info(agent)
                if dict_agent_names:
                    infos.update({agent.name: info})
                else:
                    infos.append(info)

        if self.terminated_truncated:
            if get_dones:
                terminated, truncated = self._done_impl(in_reset=in_reset)
            result = [obs, rewards, terminated, truncated, infos]
        else:
            if get_dones:
                dones = self._done_impl(in_reset=in_reset)
            result = [obs, rewards, dones, infos]
        return [data for data in result if data is not None]

    def _done_impl(self, in_reset: bool = False):
        terminated = self.scenario.done_query(in_reset=in_reset)
        if self.max_steps is not None:
            truncated = self.world.state.steps >= self.max_steps
        else:
            truncated = None
        if self.terminated_truncated:
            if truncated is None:
                truncated = jnp.zeros_like(terminated)
            return terminated, truncated
        if truncated is None:
            return terminated
        return terminated | truncated

    # ------------------------------------------------------------------ #
    # Spaces (environment.py:431-523)
    # ------------------------------------------------------------------ #
    def get_action_space(self):
        if not self.dict_spaces:
            return spaces.Tuple(
                [self.get_agent_action_space(agent) for agent in self.agents]
            )
        return spaces.Dict(
            {
                agent.name: self.get_agent_action_space(agent)
                for agent in self.agents
            }
        )

    def get_observation_space(self, observations):
        if not self.dict_spaces:
            return spaces.Tuple(
                [
                    self.get_agent_observation_space(agent, observations[i])
                    for i, agent in enumerate(self.agents)
                ]
            )
        return spaces.Dict(
            {
                agent.name: self.get_agent_observation_space(
                    agent, observations[agent.name]
                )
                for agent in self.agents
            }
        )

    def get_agent_action_size(self, agent: Agent):
        if self.continuous_actions:
            return agent.action.action_size + (
                self.world.dim_c if not agent.silent else 0
            )
        elif self.multidiscrete_actions:
            return agent.action_size + (
                1 if not agent.silent and self.world.dim_c != 0 else 0
            )
        return 1

    def get_agent_action_space(self, agent: Agent):
        if self.continuous_actions:
            return spaces.Box(
                low=np.array(
                    (-agent.action.u_range_tensor).tolist()
                    + [0.0] * (self.world.dim_c if not agent.silent else 0),
                    dtype=np.float32,
                ),
                high=np.array(
                    np.asarray(agent.action.u_range_tensor).tolist()
                    + [1.0] * (self.world.dim_c if not agent.silent else 0),
                    dtype=np.float32,
                ),
            )
        elif self.multidiscrete_actions:
            nvec = agent.discrete_action_nvec + (
                [self.world.dim_c]
                if not agent.silent and self.world.dim_c != 0
                else []
            )
            return spaces.MultiDiscrete(nvec)
        return spaces.Discrete(
            math.prod(agent.discrete_action_nvec)
            * (
                self.world.dim_c
                if not agent.silent and self.world.dim_c != 0
                else 1
            )
        )

    def get_agent_observation_space(self, agent: Agent, obs: AGENT_OBS_TYPE):
        if isinstance(obs, (jax.Array, np.ndarray)):
            return spaces.Box(
                low=-np.float32("inf"),
                high=np.float32("inf"),
                shape=tuple(obs.shape[1:]),
            )
        elif isinstance(obs, Dict):
            return spaces.Dict(
                {
                    key: self.get_agent_observation_space(agent, value)
                    for key, value in obs.items()
                }
            )
        raise NotImplementedError(
            f"Invalid type of observation {obs} for agent {agent.name}"
        )

    # ------------------------------------------------------------------ #
    # Random actions (environment.py:525-607)
    # ------------------------------------------------------------------ #
    def get_random_action(self, agent: Agent) -> Array:
        key = self.world.next_key()
        if self.continuous_actions:
            u_range = np.asarray(agent.action.u_range_tensor)
            keys = jax.random.split(key, agent.action_size + self.world.dim_c)
            actions = [
                jax.random.uniform(
                    keys[i],
                    (self.num_envs,),
                    minval=-u_range[i],
                    maxval=u_range[i],
                )
                for i in range(agent.action_size)
            ]
            if self.world.dim_c != 0 and not agent.silent:
                for j in range(self.world.dim_c):
                    actions.append(
                        jax.random.uniform(
                            keys[agent.action_size + j], (self.num_envs,)
                        )
                    )
            return jnp.stack(actions, axis=-1)
        action_space = self.get_agent_action_space(agent)
        if self.multidiscrete_actions:
            keys = jax.random.split(key, len(action_space.nvec))
            actions = [
                jax.random.randint(
                    keys[i], (self.num_envs,), 0, int(action_space.nvec[i])
                )
                for i in range(len(action_space.nvec))
            ]
            return jnp.stack(actions, axis=-1)
        return jax.random.randint(key, (self.num_envs,), 0, action_space.n)

    def get_random_actions(self) -> Sequence[Array]:
        return [self.get_random_action(agent) for agent in self.agents]

    # ------------------------------------------------------------------ #
    # Action decoding (environment.py:609-749)
    # ------------------------------------------------------------------ #
    def _set_action(self, action, agent: Agent):
        action = jnp.asarray(action, dtype=jnp.float32)
        if not self.grad_enabled:
            action = jax.lax.stop_gradient(action)

        if self.clamp_action and self.continuous_actions:
            physical_action = action[..., : agent.action_size]
            a_range = agent.action.u_range_tensor[None]
            physical_action = jnp.clip(physical_action, -a_range, a_range)
            if self.world.dim_c > 0 and not agent.silent:
                comm_action = action[..., agent.action_size :]
                action = jnp.concatenate(
                    [physical_action, jnp.clip(comm_action, 0, 1)], axis=-1
                )
            else:
                action = physical_action

        action_index = 0
        if self.continuous_actions:
            u = action[:, : agent.action_size].astype(jnp.float32)
            action_index += agent.action_size
        else:
            if not self.multidiscrete_actions:
                # Flat Discrete -> multidiscrete unflatten
                # (environment.py:658-678).
                flat_action = action[:, 0]
                acts = []
                nvec = list(agent.discrete_action_nvec) + (
                    [self.world.dim_c]
                    if not agent.silent and self.world.dim_c != 0
                    else []
                )
                for i in range(len(nvec)):
                    n = math.prod(nvec[i + 1 :])
                    acts.append(jnp.floor_divide(flat_action, n))
                    flat_action = jnp.mod(flat_action, n)
                action = jnp.stack(acts, axis=-1)

            # Per-dim discrete -> continuous mapping with odd-n zero-first
            # remap (environment.py:681-705).
            u_cols = []
            for j, n in enumerate(agent.discrete_action_nvec):
                physical_action = action[:, action_index]
                u_max = agent.action.u_range_tensor[j]
                if n % 2 != 0:
                    stay = physical_action == 0
                    decrement = (physical_action > 0) & (
                        physical_action <= n // 2
                    )
                    physical_action = jnp.where(stay, n // 2, physical_action)
                    physical_action = jnp.where(
                        decrement, physical_action - 1, physical_action
                    )
                u_cols.append((physical_action / (n - 1)) * (2 * u_max) - u_max)
                action_index += 1
            u = jnp.stack(u_cols, axis=-1)

        u = u * agent.action.u_multiplier_tensor[None]

        if np.any(np.asarray(agent.action._to_array(agent.u_noise)) > 0):
            noise = (
                jax.random.normal(self.world.next_key(), u.shape)
                * agent.action.u_noise_tensor[None]
            )
            u = u + noise
        agent.action.u = u

        if self.world.dim_c > 0 and not agent.silent:
            if not self.continuous_actions:
                comm_action = action[:, action_index:].astype(jnp.int32)
                c = jax.nn.one_hot(
                    comm_action[:, 0], self.world.dim_c, dtype=jnp.float32
                )
            else:
                c = action[:, action_index:]
            if agent.c_noise > 0:
                noise = (
                    jax.random.normal(self.world.next_key(), c.shape)
                    * agent.c_noise
                )
                c = c + noise
            agent.action.c = c

    # ------------------------------------------------------------------ #
    # Rendering (environment.py:751-1015, numpy rasterizer backend)
    # ------------------------------------------------------------------ #
    def render(
        self,
        mode: str = "human",
        env_index: int = 0,
        agent_index_focus: Optional[int] = None,
        visualize_when_rgb: bool = False,
        plot_position_function: Optional[Callable] = None,
        plot_position_function_precision: float = 0.01,
        plot_position_function_range=None,
        plot_position_function_cmap_range=None,
        plot_position_function_cmap_alpha: float = 1.0,
        plot_position_function_cmap_name: str = "viridis",
    ):
        self._check_batch_index(env_index)
        assert mode in self.metadata["render.modes"]
        if agent_index_focus is not None:
            assert 0 <= agent_index_focus < self.n_agents

        from vectorizedmultiagentsimulator_tpu.render import (
            Segment,
            Viewer,
            render_function_util,
        )

        if self.viewer is None:
            self.viewer = Viewer(*self.scenario.viewer_size)
            self._init_text_lines()
        self._set_agent_comm_messages(env_index)

        if self.scenario.viewer_zoom <= 0:
            raise ValueError("Scenario viewer zoom must be > 0")
        zoom = self.scenario.viewer_zoom
        aspect = self.scenario.viewer_size[X] / self.scenario.viewer_size[Y]
        if aspect < 1:
            cam_range = np.array([zoom, zoom / aspect])
        else:
            cam_range = np.array([zoom * aspect, zoom])

        if agent_index_focus is None:
            all_poses = np.stack(
                [
                    np.asarray(agent.state.pos)[env_index]
                    for agent in self.world.agents
                ]
            )
            max_agent_radius = max(
                agent.shape.circumscribed_radius()
                for agent in self.world.agents
            )
            origin = np.asarray(self.scenario.render_origin)
            viewer_size_fit = (
                np.array(
                    [
                        np.max(np.abs(all_poses[:, X] - origin[X])),
                        np.max(np.abs(all_poses[:, Y] - origin[Y])),
                    ]
                )
                + 2 * max_agent_radius
            )
            viewer_size = np.maximum(viewer_size_fit / cam_range, zoom)
            cam_range = cam_range * np.max(viewer_size)
            self.viewer.set_bounds(
                -cam_range[X] + origin[X],
                cam_range[X] + origin[X],
                -cam_range[Y] + origin[Y],
                cam_range[Y] + origin[Y],
            )
        else:
            pos = np.asarray(
                self.agents[agent_index_focus].state.pos
            )[env_index]
            self.viewer.set_bounds(
                pos[X] - cam_range[X],
                pos[X] + cam_range[X],
                pos[Y] - cam_range[Y],
                pos[Y] + cam_range[Y],
            )

        if self.scenario.visualize_semidims:
            self._plot_boundary()
        if self.scenario.plot_grid:
            self._plot_grid()
        if plot_position_function is not None:
            prange = plot_position_function_range
            if prange is None:
                xmin, xmax, ymin, ymax = self.viewer.bounds
                prange = ((xmin, xmax), (ymin, ymax))
            elif isinstance(prange, (int, float)):
                prange = ((-prange, prange), (-prange, prange))
            elif isinstance(prange[0], (int, float)):
                prange = (
                    (-prange[0], prange[0]),
                    (-prange[1], prange[1]),
                )
            self.viewer.add_onetime(
                render_function_util(
                    plot_position_function,
                    plot_position_function_precision,
                    prange,
                    plot_position_function_cmap_range,
                    plot_position_function_cmap_alpha,
                    plot_position_function_cmap_name,
                )
            )
        self.viewer.add_onetime_list(self.scenario.extra_render(env_index))
        for entity in self.world.entities:
            self.viewer.add_onetime_list(entity.render(env_index=env_index))
        return self.viewer.render(return_rgb_array=mode == "rgb_array")

    def plot_function(
        self, f, precision, plot_range, cmap_range, cmap_alpha, cmap_name
    ):
        """Build (and return) a heatmap geom of ``f`` over ``plot_range``
        (reference environment.py:990-1014).  With ``plot_range=None``
        the current viewer bounds are used; add the returned geom via
        ``env.viewer.add_onetime(geom)`` or use the
        ``plot_position_function`` kwargs of :meth:`render`, which do
        this per frame."""
        from vectorizedmultiagentsimulator_tpu.render import (
            render_function_util,
        )

        if plot_range is None:
            assert (
                self.viewer is not None and self.viewer.bounds is not None
            ), "Set viewer bounds before plotting"
            x_min, x_max, y_min, y_max = self.viewer.bounds
            plot_range = (
                [x_min - precision, x_max - precision],
                [y_min - precision, y_max + precision],
            )
        return render_function_util(
            f, precision, plot_range, cmap_range, cmap_alpha, cmap_name
        )

    def _init_text_lines(self):
        """One screen-space text line per speaking agent for comm-message
        overlays (reference environment.py:1023-1031)."""
        from vectorizedmultiagentsimulator_tpu.render import TextLine

        self.text_lines = []
        if self.world.dim_c > 0:
            idx = 0
            for agent in self.world.agents:
                if not agent.silent:
                    text_line = TextLine(y=idx * 40)
                    self.viewer.geoms.append(text_line)
                    self.text_lines.append(text_line)
                    idx += 1

    def _set_agent_comm_messages(self, env_index: int):
        """Render comm utterances as text (reference
        environment.py:1033-1055)."""
        if self.world.dim_c == 0 or not self.text_lines:
            return
        from vectorizedmultiagentsimulator_tpu.utils import ALPHABET

        idx = 0
        for agent in self.world.agents:
            if agent.silent:
                continue
            c = np.asarray(agent.state.c)[env_index]
            if self.continuous_actions:
                word = "[" + ",".join(f"{comm:.2f}" for comm in c) + "]"
            else:
                word = ALPHABET[int(np.argmax(c))]
            self.text_lines[idx].set_text(f"{agent.name} sends {word}   ")
            idx += 1

    def _plot_grid(self):
        """Background grid (reference rendering.py Grid, environment.py
        plot_grid path)."""
        from vectorizedmultiagentsimulator_tpu.render import Segment

        xmin, xmax, ymin, ymax = self.viewer.bounds or (-1.2, 1.2, -1.2, 1.2)
        spacing = float(self.scenario.grid_spacing) or 0.1
        x = math.floor(xmin / spacing) * spacing
        while x <= xmax:
            seg = Segment(start=(x, ymin), end=(x, ymax), width=0.002)
            seg.set_color(0.8, 0.8, 0.8)
            self.viewer.add_onetime(seg)
            x += spacing
        y = math.floor(ymin / spacing) * spacing
        while y <= ymax:
            seg = Segment(start=(xmin, y), end=(xmax, y), width=0.002)
            seg.set_color(0.8, 0.8, 0.8)
            self.viewer.add_onetime(seg)
            y += spacing

    def _plot_boundary(self):
        from vectorizedmultiagentsimulator_tpu.render import Segment

        if self.world.x_semidim is not None or self.world.y_semidim is not None:
            infinite = 100
            x_semi = (
                self.world.x_semidim
                if self.world.x_semidim is not None
                else infinite
            )
            y_semi = (
                self.world.y_semidim
                if self.world.y_semidim is not None
                else infinite
            )
            corners = [
                (-x_semi, y_semi),
                (x_semi, y_semi),
                (x_semi, -y_semi),
                (-x_semi, -y_semi),
            ]
            for i in range(4):
                seg = Segment(
                    start=corners[i], end=corners[(i + 1) % 4], width=0.005
                )
                seg.set_color(0.25, 0.25, 0.25)
                self.viewer.add_onetime(seg)
