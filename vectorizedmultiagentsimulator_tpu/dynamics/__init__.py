"""Action-to-force dynamics models.

Rebuild of ``vmas/simulator/dynamics/`` (abstract base common.py:12-57;
holonomic.py, holonomic_with_rot.py, forward.py, roatation.py [sic],
static.py, diff_drive.py, kinematic_bicycle.py, drone.py).  All models are
pure jnp maps from the agent's action slice to force/torque writes on the
state pytree.  The only stateful model, :class:`Drone`, keeps its 12-dim
internal state inside ``state.extras`` so it rides through jit/scan.
"""
from __future__ import annotations

import abc
from abc import ABC
from typing import Optional, Union

import jax.numpy as jnp

from vectorizedmultiagentsimulator_tpu.utils import (
    Array,
    JaxUtils,
    X,
    Y,
    env_index_to_mask,
)


class Dynamics(ABC):
    def __init__(self):
        self._agent = None

    def reset(self, index=None):
        return

    def zero_grad(self):
        return

    @property
    def agent(self):
        if self._agent is None:
            raise ValueError(
                "You need to add the dynamics to an agent during construction"
                " before accessing its properties"
            )
        return self._agent

    @agent.setter
    def agent(self, value):
        if self._agent is not None:
            raise ValueError("Agent in dynamics has already been set")
        self._agent = value

    def check_and_process_action(self):
        action = self.agent.action.u
        if action.shape[1] < self.needed_action_size:
            raise ValueError(
                f"Agent action size {action.shape[1]} is less than the required"
                f" dynamics action size {self.needed_action_size}"
            )
        self.process_action()

    @property
    @abc.abstractmethod
    def needed_action_size(self) -> int:
        raise NotImplementedError

    @abc.abstractmethod
    def process_action(self):
        raise NotImplementedError


class Holonomic(Dynamics):
    """force = u (dynamics/holonomic.py)."""

    @property
    def needed_action_size(self) -> int:
        return 2

    def process_action(self):
        self.agent.state.force = self.agent.action.u[:, :2]


class HolonomicWithRotation(Dynamics):
    """force = u[:2], torque = u[2] (dynamics/holonomic_with_rot.py)."""

    @property
    def needed_action_size(self) -> int:
        return 3

    def process_action(self):
        self.agent.state.force = self.agent.action.u[:, :2]
        self.agent.state.torque = self.agent.action.u[:, 2:3]


class Forward(Dynamics):
    """force = rotate([u, 0], rot) (dynamics/forward.py)."""

    @property
    def needed_action_size(self) -> int:
        return 1

    def process_action(self):
        u = self.agent.action.u[:, 0]
        force = jnp.stack([u, jnp.zeros_like(u)], axis=-1)
        self.agent.state.force = JaxUtils.rotate_vector(
            force, self.agent.state.rot
        )


class Rotation(Dynamics):
    """torque = u (dynamics/roatation.py)."""

    @property
    def needed_action_size(self) -> int:
        return 1

    def process_action(self):
        self.agent.state.torque = self.agent.action.u[:, 0:1]


class Static(Dynamics):
    """no-op (dynamics/static.py)."""

    @property
    def needed_action_size(self) -> int:
        return 0

    def process_action(self):
        pass


class DiffDrive(Dynamics):
    """Unicycle ODE integrated over dt, converted to required force/torque
    (dynamics/diff_drive.py:28-84)."""

    def __init__(self, world, integration: str = "rk4"):
        super().__init__()
        assert integration in ("rk4", "euler")
        self.dt = world.dt
        self.integration = integration
        self.world = world

    def f(self, state, u_command, ang_vel_command):
        theta = state[:, 2]
        dx = u_command * jnp.cos(theta)
        dy = u_command * jnp.sin(theta)
        return jnp.stack((dx, dy, ang_vel_command), axis=-1)

    def euler(self, state, u_command, ang_vel_command):
        return self.dt * self.f(state, u_command, ang_vel_command)

    def runge_kutta(self, state, u_command, ang_vel_command):
        k1 = self.f(state, u_command, ang_vel_command)
        k2 = self.f(state + self.dt * k1 / 2, u_command, ang_vel_command)
        k3 = self.f(state + self.dt * k2 / 2, u_command, ang_vel_command)
        k4 = self.f(state + self.dt * k3, u_command, ang_vel_command)
        return (self.dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

    @property
    def needed_action_size(self) -> int:
        return 2

    def process_action(self):
        agent = self.agent
        u_command = agent.action.u[:, 0]
        ang_vel_command = agent.action.u[:, 1]
        state = jnp.concatenate((agent.state.pos, agent.state.rot), axis=1)
        v_cur = agent.state.vel
        w_cur = agent.state.ang_vel[:, 0]
        if self.integration == "euler":
            delta = self.euler(state, u_command, ang_vel_command)
        else:
            delta = self.runge_kutta(state, u_command, ang_vel_command)
        acc_x = (delta[:, 0] - v_cur[:, 0] * self.dt) / self.dt**2
        acc_y = (delta[:, 1] - v_cur[:, 1] * self.dt) / self.dt**2
        acc_w = (delta[:, 2] - w_cur * self.dt) / self.dt**2
        agent.state.force = jnp.stack(
            [agent.mass * acc_x, agent.mass * acc_y], axis=-1
        )
        agent.state.torque = (agent.moment_of_inertia * acc_w)[:, None]


class KinematicBicycle(Dynamics):
    """Polack et al. kinematic bicycle (dynamics/kinematic_bicycle.py)."""

    def __init__(
        self,
        world,
        width: float,
        l_f: float,
        l_r: float,
        max_steering_angle: float,
        integration: str = "rk4",
    ):
        super().__init__()
        assert integration in ("rk4", "euler")
        self.width = width
        self.l_f = l_f
        self.l_r = l_r
        self.max_steering_angle = max_steering_angle
        self.dt = world.dt
        self.integration = integration
        self.world = world

    def f(self, state, steering_command, v_command):
        theta = state[:, 2]
        beta = jnp.arctan2(
            jnp.tan(steering_command) * self.l_r / (self.l_f + self.l_r), 1.0
        )
        dx = v_command * jnp.cos(theta + beta)
        dy = v_command * jnp.sin(theta + beta)
        dtheta = (
            v_command
            / (self.l_f + self.l_r)
            * jnp.cos(beta)
            * jnp.tan(steering_command)
        )
        return jnp.stack((dx, dy, dtheta), axis=1)

    def euler(self, state, steering_command, v_command):
        return self.dt * self.f(state, steering_command, v_command)

    def runge_kutta(self, state, steering_command, v_command):
        """RK4 with the redundant evaluations removed, bitwise-equal to
        the naive 4-stage form (reference dynamics/kinematic_bicycle.py):
        ``f`` reads the state only through theta, and every stage's
        theta-derivative is the same state-independent expression, so
        k3 == k2 exactly and beta / tan(steering) / dtheta hoist out of
        the stages.  Transcendentals per call drop from
        (8 tan, 4 atan2, 8 cos, 4 sin) to (1, 1, 4, 3)."""
        lwb = self.l_f + self.l_r
        tan_s = jnp.tan(steering_command)
        beta = jnp.arctan2(tan_s * self.l_r / lwb, 1.0)
        dtheta = v_command / lwb * jnp.cos(beta) * tan_s
        theta = state[:, 2]

        def dxy(th):
            a = th + beta
            return v_command * jnp.cos(a), v_command * jnp.sin(a)

        x1, y1 = dxy(theta)
        x2, y2 = dxy(theta + self.dt * dtheta / 2)  # == k3 bitwise
        x4, y4 = dxy(theta + self.dt * dtheta)
        # Same left-associated fold as k1 + 2*k2 + 2*k3 + k4.
        dx = x1 + 2 * x2 + 2 * x2 + x4
        dy = y1 + 2 * y2 + 2 * y2 + y4
        dth = dtheta + 2 * dtheta + 2 * dtheta + dtheta
        return (self.dt / 6) * jnp.stack((dx, dy, dth), axis=1)

    @property
    def needed_action_size(self) -> int:
        return 2

    def process_action(self):
        agent = self.agent
        v_command = agent.action.u[:, 0]
        steering_command = jnp.clip(
            agent.action.u[:, 1], -self.max_steering_angle, self.max_steering_angle
        )
        state = jnp.concatenate((agent.state.pos, agent.state.rot), axis=1)
        v_cur = agent.state.vel
        w_cur = agent.state.ang_vel[:, 0]
        if self.integration == "euler":
            delta = self.euler(state, steering_command, v_command)
        else:
            delta = self.runge_kutta(state, steering_command, v_command)
        acc_x = (delta[:, 0] - v_cur[:, 0] * self.dt) / self.dt**2
        acc_y = (delta[:, 1] - v_cur[:, 1] * self.dt) / self.dt**2
        acc_w = (delta[:, 2] - w_cur * self.dt) / self.dt**2
        agent.state.force = jnp.stack(
            [agent.mass * acc_x, agent.mass * acc_y], axis=-1
        )
        agent.state.torque = (agent.moment_of_inertia * acc_w)[:, None]


class Drone(Dynamics):
    """12-state quadrotor projected to the 2D plane (dynamics/drone.py).

    The internal state (roll/pitch/yaw, body rates, 3D vel/pos) is carried
    across steps in ``state.extras["<agent>.drone_state"]``.
    """

    def __init__(
        self,
        world,
        I_xx: float = 8.1e-3,
        I_yy: float = 8.1e-3,
        I_zz: float = 14.2e-3,
        integration: str = "rk4",
    ):
        super().__init__()
        assert integration in ("rk4", "euler")
        self.integration = integration
        self.I_xx = I_xx
        self.I_yy = I_yy
        self.I_zz = I_zz
        self.world = world
        self.g = 9.81
        self.dt = world.dt

    @property
    def _key(self) -> str:
        return f"{self.agent.name}.drone_state"

    @property
    def drone_state(self) -> Array:
        world = self.world
        if not world.has_extra(self._key):
            world.set_extra(
                self._key, jnp.zeros((world.batch_dim, 12), jnp.float32)
            )
        return world.get_extra(self._key)

    @drone_state.setter
    def drone_state(self, value: Array):
        self.world.set_extra(self._key, value)

    def reset(self, index=None):
        if self.world.is_finalized:
            self.drone_state = JaxUtils.where_from_index(
                index, 0.0, self.drone_state
            )

    def f(self, state, thrust_command, torque_command):
        phi, theta, psi = state[:, 0], state[:, 1], state[:, 2]
        p, q, r = state[:, 3], state[:, 4], state[:, 5]
        x_dot, y_dot, z_dot = state[:, 6], state[:, 7], state[:, 8]
        c_phi, s_phi = jnp.cos(phi), jnp.sin(phi)
        c_theta, s_theta = jnp.cos(theta), jnp.sin(theta)
        c_psi, s_psi = jnp.cos(psi), jnp.sin(psi)
        m = self.agent.mass
        x_ddot = (c_phi * s_theta * c_psi + s_phi * s_psi) * thrust_command / m
        y_ddot = (c_phi * s_theta * s_psi - s_phi * c_psi) * thrust_command / m
        z_ddot = (c_phi * c_theta) * thrust_command / m - self.g
        p_dot = (torque_command[:, 0] - (self.I_yy - self.I_zz) * q * r) / self.I_xx
        q_dot = (torque_command[:, 1] - (self.I_zz - self.I_xx) * p * r) / self.I_yy
        r_dot = (torque_command[:, 2] - (self.I_xx - self.I_yy) * p * q) / self.I_zz
        return jnp.stack(
            [p, q, r, p_dot, q_dot, r_dot, x_ddot, y_ddot, z_ddot,
             x_dot, y_dot, z_dot],
            axis=-1,
        )

    def needs_reset(self) -> Array:
        """|roll|,|pitch| > 30 deg (drone.py:110-112)."""
        return jnp.any(
            jnp.abs(self.drone_state[:, :2]) > 30 * (jnp.pi / 180), axis=-1
        )

    def euler(self, state, thrust, torque):
        return self.dt * self.f(state, thrust, torque)

    def runge_kutta(self, state, thrust, torque):
        k1 = self.f(state, thrust, torque)
        k2 = self.f(state + self.dt * k1 / 2, thrust, torque)
        k3 = self.f(state + self.dt * k2 / 2, thrust, torque)
        k4 = self.f(state + self.dt * k3, thrust, torque)
        return (self.dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

    @property
    def needed_action_size(self) -> int:
        return 4

    def process_action(self):
        agent = self.agent
        u = agent.action.u
        thrust = u[:, 0] + agent.mass * self.g
        torque = u[:, 1:4]

        ds = self.drone_state
        ds = ds.at[:, 9].set(agent.state.pos[:, 0])
        ds = ds.at[:, 10].set(agent.state.pos[:, 1])
        ds = ds.at[:, 2].set(agent.state.rot[:, 0])

        if self.integration == "euler":
            delta = self.euler(ds, thrust, torque)
        else:
            delta = self.runge_kutta(ds, thrust, torque)
        self.drone_state = ds + delta

        v_cur = agent.state.vel
        w_cur = agent.state.ang_vel[:, 0]
        acc_x = (delta[:, 6] - v_cur[:, 0] * self.dt) / self.dt**2
        acc_y = (delta[:, 7] - v_cur[:, 1] * self.dt) / self.dt**2
        acc_w = (delta[:, 5] - w_cur * self.dt) / self.dt**2
        agent.state.force = jnp.stack(
            [agent.mass * acc_x, agent.mass * acc_y], axis=-1
        )
        agent.state.torque = (agent.moment_of_inertia * acc_w)[:, None]
