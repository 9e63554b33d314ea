"""Control-affine second-order kinematics of the circle centers (batched).

The TTCBF constraints need the circle-center accelerations as affine
functions of the input u = [accel, steering_rate]. The reference recovers
the affine coefficients by probing the exact second derivatives at u = 0,
e1, e2 (`cbf_qp.py:2283-2335` using `compute_dstate_2nd_time:667-695` and
`compute_center_state_time_derivatives:697-727`, all scalar Python). Since
those second derivatives are *exactly* affine in u, we compute the
coefficients analytically in closed form — identical values, fully
vectorized over `[B, N, C]`.

State layout per agent: [x, y, psi, v, delta].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class CenterKinematics(NamedTuple):
    """Per-circle first derivatives and affine acceleration coefficients.

    All fields [..., C] or [..., C, 2]:
      ddx_c = c_ddx + a_ddx @ u,   ddy_c = c_ddy + a_ddy @ u
    """

    dx: Array  # [..., C] circle-center x velocity
    dy: Array  # [..., C]
    a_ddx: Array  # [..., C, 2]
    c_ddx: Array  # [..., C]
    a_ddy: Array  # [..., C, 2]
    c_ddy: Array  # [..., C]


def center_kinematics(
    psi: Array,  # [...]
    v: Array,  # [...]
    delta: Array,  # [...]
    centers_local: Array,  # [C, 2] circle offsets in the vehicle frame
    l_r: float,
    l_wb: float,
) -> CenterKinematics:
    """Closed-form affine coefficients of the circle-center accelerations."""
    k = l_r / l_wb
    tan_d = jnp.tan(delta)
    sec2 = 1.0 / jnp.cos(delta) ** 2
    beta = jnp.arctan(k * tan_d)
    cos_b = jnp.cos(beta)
    sin_b = jnp.sin(beta)
    phi = psi + beta
    cos_phi, sin_phi = jnp.cos(phi), jnp.sin(phi)

    dpsi = v / l_wb * tan_d * cos_b
    dx = v * cos_phi
    dy = v * sin_phi
    # dbeta = k_beta * u2
    k_beta = k * sec2 / (1.0 + (k * tan_d) ** 2)

    # Body-frame CG acceleration, affine in u:
    #   ddx = u1*cos(phi) - v*sin(phi)*(dpsi + k_beta*u2)
    a_x = jnp.stack([cos_phi, -v * sin_phi * k_beta], axis=-1)  # [..., 2]
    c_x = -v * sin_phi * dpsi
    a_y = jnp.stack([sin_phi, v * cos_phi * k_beta], axis=-1)
    c_y = v * cos_phi * dpsi
    # Yaw acceleration:
    #   ddpsi = (u1/l_wb) cos(beta) tan(delta)
    #         + (v/l_wb)(cos(beta) sec^2 - sin(beta) tan(delta) k_beta) u2
    a_psi = jnp.stack(
        [
            cos_b * tan_d / l_wb,
            (v / l_wb) * (cos_b * sec2 - sin_b * tan_d * k_beta),
        ],
        axis=-1,
    )
    # c_psi = 0

    # Chain rule to each circle center at local offset (ox, oy).
    ox = centers_local[..., 0]  # [C]
    oy = centers_local[..., 1]
    sin_p, cos_p = jnp.sin(psi), jnp.cos(psi)
    shape = psi.shape + (centers_local.shape[0],)

    def bc(x):  # broadcast agent-scalars over the circle axis
        return jnp.broadcast_to(x[..., None], shape)

    def bc2(x):  # [..., 2] -> [..., C, 2]
        return jnp.broadcast_to(x[..., None, :], shape + (2,))

    dpsi_c = bc(dpsi)
    dx_c = bc(dx) - ox * bc(sin_p) * dpsi_c - oy * bc(cos_p) * dpsi_c
    dy_c = bc(dy) + ox * bc(cos_p) * dpsi_c - oy * bc(sin_p) * dpsi_c

    # ddx_c = ddx - ox*(sin(psi)*ddpsi + cos(psi)*dpsi^2)
    #             - oy*(cos(psi)*ddpsi - sin(psi)*dpsi^2)
    dpsi2 = bc(dpsi * dpsi)
    a_ddx = (
        bc2(a_x)
        - (ox * bc(sin_p))[..., None] * bc2(a_psi)
        - (oy * bc(cos_p))[..., None] * bc2(a_psi)
    )
    c_ddx = bc(c_x) - ox * bc(cos_p) * dpsi2 + oy * bc(sin_p) * dpsi2
    a_ddy = (
        bc2(a_y)
        + (ox * bc(cos_p))[..., None] * bc2(a_psi)
        - (oy * bc(sin_p))[..., None] * bc2(a_psi)
    )
    c_ddy = bc(c_y) - ox * bc(sin_p) * dpsi2 - oy * bc(cos_p) * dpsi2

    return CenterKinematics(dx_c, dy_c, a_ddx, c_ddx, a_ddy, c_ddy)
