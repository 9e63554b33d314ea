"""Golden-value parity for the kinematic bicycle model vs the reference."""

import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.core.dynamics import BicycleParams, command_step, step


def test_bicycle_trajectory_matches_reference(golden):
    g = golden("dynamics")
    params = BicycleParams()
    x = jnp.asarray(g["x0"])
    u = jnp.asarray(g["u"])
    for k in range(g["xs"].shape[0]):
        x, beta, vel = step(params, x, u, dt=0.05, tick_per_step=1)
        np.testing.assert_allclose(np.asarray(x), g["xs"][k], atol=2e-5)
        np.testing.assert_allclose(np.asarray(beta), g["betas"][k], atol=2e-5)
        np.testing.assert_allclose(np.asarray(vel), g["vels"][k], atol=2e-5)


def test_command_step_limits():
    params = BicycleParams()
    pos = jnp.zeros((4, 2))
    rot = jnp.zeros(4)
    speed = jnp.zeros(4)
    steering = jnp.zeros(4)
    # Huge commands must be clamped: speed to ±max_speed then accel-limited.
    action = jnp.array([[100.0, 100.0]] * 4)
    p1, r1, v1, s1, beta, vel = command_step(params, pos, rot, speed, steering, action, dt=0.1)
    # accel limit 5 m/s^2 over 0.1 s -> max speed change 0.5
    np.testing.assert_allclose(np.asarray(v1), 0.5, atol=1e-6)
    # steering-rate limit pi/2 over 0.1 s
    np.testing.assert_allclose(np.asarray(s1), np.pi / 2 * 0.1, atol=1e-6)
    assert np.isfinite(np.asarray(p1)).all()


def test_straight_line_motion():
    params = BicycleParams()
    pos = jnp.zeros((1, 2))
    x = pos
    rot = jnp.zeros(1)
    speed = jnp.ones(1)
    steering = jnp.zeros(1)
    for _ in range(10):
        x, rot, speed, steering, _, _ = command_step(
            params, x, rot, speed, steering, jnp.array([[1.0, 0.0]]), dt=0.1
        )
    np.testing.assert_allclose(np.asarray(x), [[1.0, 0.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot), [0.0], atol=1e-6)
