"""Kinematic bicycle dynamics (JAX), closed-form fused step.

TPU-native replacement for the reference's torchdiffeq Euler integration
(`sigmarl/dynamics.py:62-192`) and the command-level world step
(`sigmarl/helper_training.py:791-861`, `WorldCustom.step`): one explicit
Euler step is the exact semantics of the reference's
`odeint(..., method="euler")` over `linspace(0, dt, 2)`, so we fuse it into
a single elementwise update that `vmap`s over `[B, N]` and lets XLA fuse
into the surrounding step graph — no per-agent Python loop, no ODE-solver
framework.

State layout: `x = [x, y, yaw, speed, steering]`, input `u = [accel,
steering_rate]`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sigmarl_tpu.constants import AGENTS

Array = jax.Array


@dataclass(frozen=True)
class BicycleParams:
    """Static model parameters (defaults: CPM muCar, `constants.py:628-647`)."""

    l_f: float = AGENTS["l_f"]
    l_r: float = AGENTS["l_r"]
    max_speed: float = AGENTS["max_speed"]
    min_speed: float = AGENTS["min_speed"]
    max_steering: float = AGENTS["max_steering"]
    min_steering: float = AGENTS["min_steering"]
    max_acc: float = AGENTS["max_acc"]
    min_acc: float = AGENTS["min_acc"]
    max_steering_rate: float = AGENTS["max_steering_rate"]
    min_steering_rate: float = AGENTS["min_steering_rate"]

    @property
    def l_wb(self) -> float:
        return self.l_f + self.l_r


def ode(params: BicycleParams, x: Array, u: Array) -> Array:
    """Continuous-time dynamics dx/dt (reference `dynamics.py:62-118`).

    x: [..., 5]; u: [..., 2].
    """
    beta = jnp.arctan(params.l_r / params.l_wb * jnp.tan(x[..., 4]))
    return jnp.stack(
        [
            x[..., 3] * jnp.cos(x[..., 2] + beta),
            x[..., 3] * jnp.sin(x[..., 2] + beta),
            (x[..., 3] / params.l_wb) * jnp.tan(x[..., 4]) * jnp.cos(beta),
            u[..., 0],
            u[..., 1],
        ],
        axis=-1,
    )


def step(
    params: BicycleParams, x0: Array, u: Array, dt: float, tick_per_step: int = 1
) -> tuple[Array, Array, Array]:
    """Integrate one control period with explicit Euler sub-steps.

    Matches reference `dynamics.py:120-192`: steering wrapped to (-pi, pi],
    returns (state [..., 5], sideslip beta [...], velocity [..., 2]).
    """
    h = dt / tick_per_step
    x = x0
    for _ in range(tick_per_step):
        x = x + h * ode(params, x, u)
    steering = (x[..., 4] + jnp.pi) % (2 * jnp.pi) - jnp.pi
    x = x.at[..., 4].set(steering)
    beta = jnp.arctan(params.l_r / params.l_wb * jnp.tan(steering))
    course = x[..., 2] + beta
    vel = jnp.stack([x[..., 3] * jnp.cos(course), x[..., 3] * jnp.sin(course)], axis=-1)
    return x, beta, vel


def command_step(
    params: BicycleParams,
    pos: Array,
    rot: Array,
    speed: Array,
    steering: Array,
    action: Array,
    dt: float,
) -> tuple[Array, Array, Array, Array, Array, Array]:
    """World step from (speed, steering) targets, the reference's control
    interface (`WorldCustom.step`, `helper_training.py:797-861`):

    1. clamp the speed command to ±max_speed and the steering command to
       ±max_steering,
    2. convert to (accel, steering-rate) by finite difference over dt,
    3. clamp to actuator limits, integrate the bicycle ODE one Euler step.

    Args:
        pos: [..., 2]; rot/speed/steering: [...]; action: [..., 2]
        (speed target, steering target).

    Returns:
        (pos', rot', speed', steering', sideslip', vel') — all same leading
        shape.
    """
    v_cmd = jnp.clip(action[..., 0], -params.max_speed, params.max_speed)
    s_cmd = jnp.clip(action[..., 1], -params.max_steering, params.max_steering)
    u_acc = jnp.clip((v_cmd - speed) / dt, params.min_acc, params.max_acc)
    u_rate = jnp.clip(
        (s_cmd - steering) / dt, params.min_steering_rate, params.max_steering_rate
    )
    x0 = jnp.concatenate(
        [pos, rot[..., None], speed[..., None], steering[..., None]], axis=-1
    )
    u = jnp.stack([u_acc, u_rate], axis=-1)
    x1, beta, vel = step(params, x0, u, dt, tick_per_step=1)
    return x1[..., 0:2], x1[..., 2], x1[..., 3], x1[..., 4], beta, vel
