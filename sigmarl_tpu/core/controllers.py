"""Scripted nominal controllers (JAX, batched).

Capability parity with reference `sigmarl/controllers.py` (PID `:37`,
Constant `:129`, SimpleTargetFollowing `:152`) plus the CLF-style
heading/speed P-controller the CBF layer uses as its non-RL nominal
controller (`cbf_qp.py:442-459`). All controllers are pure functions over
`[..., ]`-batched states producing (speed, steering) targets compatible
with `RoadTrafficEnv.step`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sigmarl_tpu.core.geometry import angle_eliminate_two_pi

Array = jax.Array


@dataclass(frozen=True)
class PIDState:
    integral: Array
    prev_error: Array


def pid_init(shape) -> PIDState:
    return PIDState(jnp.zeros(shape), jnp.zeros(shape))


def pid_step(
    state: PIDState, error: Array, kp: float, ki: float, kd: float, dt: float
) -> tuple[Array, PIDState]:
    """Discrete PID update (reference `controllers.py:37-126`)."""
    integral = state.integral + error * dt
    derivative = (error - state.prev_error) / dt
    out = kp * error + ki * integral + kd * derivative
    return out, PIDState(integral, error)


def constant_controller(shape, speed: float, steering: float = 0.0) -> Array:
    """Constant (speed, steering) command (reference `controllers.py:129-149`)."""
    a = jnp.zeros(shape + (2,))
    return a.at[..., 0].set(speed).at[..., 1].set(steering)


def target_following(
    pos: Array,
    rot: Array,
    target: Array,
    speed_target: float,
    max_steering: float,
    k_heading: float = 2.0,
) -> Array:
    """Simple target-following: steer proportionally to the heading error
    toward `target`, drive at `speed_target`
    (reference `controllers.py:152-213`).

    pos: [..., 2]; rot: [...]; target: [..., 2]. Returns [..., 2].
    """
    vec = target - pos
    heading = jnp.arctan2(vec[..., 1], vec[..., 0])
    err = angle_eliminate_two_pi(heading - rot)
    steer = jnp.clip(k_heading * err, -max_steering, max_steering)
    speed = jnp.full_like(steer, speed_target)
    return jnp.stack([speed, steer], axis=-1)


def pure_pursuit_on_short_term(
    pos: Array,
    rot: Array,
    short_term: Array,
    speed_target: float,
    max_steering: float,
    lookahead_index: int = 1,
) -> Array:
    """Follow the short-term reference path: aim at its `lookahead_index`-th
    point. short_term: [..., S, 2]. Returns [..., 2] actions."""
    target = short_term[..., lookahead_index, :]
    return target_following(pos, rot, target, speed_target, max_steering)
