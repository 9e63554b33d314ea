"""Truncated-Taylor CBF vs standard HOCBF experiments (LCSS25).

Parity port of reference `sigmarl/hocbf_taylor.py`: a point-mass agent
avoiding a circular obstacle, with the control input at relative degree
1, 2 (acceleration), or 3 (jerk), comparing the cascaded HOCBF conditions
(psi_k with gains lambda_1..lambda_3) against the single-gain
Truncated-Taylor condition (Taylor expansion of h over dt).

TPU-native redesign: each per-step QP is 2-dimensional with ONE affine CBF
inequality, so it has a closed-form KKT solution — the whole simulation is
a `lax.scan`, and parameter sweeps (the reference fans out with
`multiprocessing`, `hocbf_taylor.py:824`) are a single `vmap` over the
(lambda, dt) grid.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class HOCBFConfig:
    """Experiment configuration (reference `HOCBF.__init__:35-91`)."""

    relative_degree: int = 2
    approach: str = "taylor"  # {"taylor", "hocbf"}
    num_steps: int = 200
    dt: float = 0.01
    is_virtual_control: bool = False
    lambda_1: float = 0.5
    lambda_2: float = 1.0
    lambda_3: float = 1.0
    # Scenario constants
    p_x0: float = -10.0
    p_y0: float = 0.0
    v_x0: float = 10.0
    v_y0: float = 0.0
    x_obs: float = 0.0
    y_obs: float = -2.2
    ra: float = 1.0
    ro: float = 2.0
    u_x_nominal: float = 5.0
    u_y_nominal: float = 0.0

    @property
    def radii_sqr(self) -> float:
        return (self.ra + self.ro) ** 2


def check_initial_conditions(cfg: HOCBFConfig) -> bool:
    """Feasibility of the initial state (reference `:93-144`)."""
    h0 = (cfg.p_x0 - cfg.x_obs) ** 2 + (cfg.p_y0 - cfg.y_obs) ** 2 - cfg.radii_sqr
    dh0 = 2 * (cfg.p_x0 - cfg.x_obs) * cfg.v_x0 + 2 * (cfg.p_y0 - cfg.y_obs) * cfg.v_y0
    if cfg.approach == "taylor":
        return h0 >= 0
    if cfg.relative_degree == 1:
        return h0 >= 0
    psi1 = dh0 + cfg.lambda_1 * h0
    if cfg.relative_degree == 2:
        return h0 >= 0 and psi1 >= 0
    ddh0 = 2 * cfg.v_x0**2 + 2 * cfg.v_y0**2  # zero initial acceleration
    psi2 = (ddh0 + cfg.lambda_1 * dh0) + cfg.lambda_2 * psi1
    return h0 >= 0 and psi1 >= 0 and psi2 >= 0


def _solve_single_constraint_qp(Q: Array, q: Array, g: Array, c: Array) -> Array:
    """Closed-form solve of min 1/2 u'Qu + q'u  s.t.  g.u + c >= 0 (2-D).

    KKT: unconstrained u* = -Q^-1 q; if infeasible, project along Q^-1 g.
    The argmin is invariant to jointly scaling (Q, q), so both are
    normalized first — at relative degree 3 the raw entries are O(dt^6) and
    would underflow an fp32 inverse.
    """
    s = 1.0 / jnp.maximum(jnp.abs(Q).max(), 1e-30)
    Q = Q * s
    q = q * s
    Qinv = jnp.linalg.inv(Q)
    u_free = -Qinv @ q
    r = g @ u_free + c
    mu = jnp.maximum(0.0, -r) / jnp.maximum(g @ Qinv @ g, 1e-12)
    return u_free + mu * (Qinv @ g)


def run_simulation(cfg: HOCBFConfig, lambda_1=None, lambda_2=None, dt=None) -> Dict[str, Array]:
    """Simulate one run; gains/dt may be traced arrays for vmapped sweeps.

    Returns trajectory dict with h values, min-h, collision flag, and the
    CBF-activation mask (reference `run_simulation:146` outputs).
    """
    lam1 = cfg.lambda_1 if lambda_1 is None else lambda_1
    lam2 = cfg.lambda_2 if lambda_2 is None else lambda_2
    dt_ = cfg.dt if dt is None else dt
    deg = cfg.relative_degree
    appr = cfg.approach.lower()
    lam3 = cfg.lambda_3

    def step(state, _):
        px, py, vx, vy, ax, ay = state
        rx, ry = px - cfg.x_obs, py - cfg.y_obs
        h = rx * rx + ry * ry - cfg.radii_sqr

        # Build the CBF condition as affine in u: cond = g . u + c.
        if deg == 1 and not cfg.is_virtual_control:
            # u is the velocity command.
            g = 2 * jnp.array([rx, ry])
            if appr == "hocbf":
                c = lam1 * h
            else:
                g = g * dt_
                c = lam1 * h
            # Cost: (u_x - vxt)^2 + (u_y - vyt)^2 + 1000 (py + u_y dt - pyt)^2
            Q = 2 * jnp.array(
                [[1.0, 0.0], [0.0, 1.0 + 1000.0 * dt_ * dt_]]
            )
            q = jnp.array(
                [
                    -2 * cfg.v_x0,
                    -2 * cfg.v_y0 + 2000.0 * dt_ * (py - 0.0),
                ]
            )
        elif deg == 1 and cfg.is_virtual_control or deg == 2:
            # u is the (virtual) acceleration.
            dh = 2 * (rx * vx + ry * vy)
            g_dd = 2 * jnp.array([rx, ry])  # dd_h = 2(vx^2 + vy^2) + g_dd . u
            c_dd = 2 * (vx * vx + vy * vy)
            if appr == "hocbf":
                g = g_dd
                c = c_dd + (lam1 + lam2) * dh + lam1 * lam2 * h
            else:
                g = 0.5 * dt_ * dt_ * g_dd
                c = lam1 * h + dh * dt_ + 0.5 * dt_ * dt_ * c_dd
            # Cost over predicted next speed / y position:
            #   (vx + ux dt - vxt)^2 + (vy + uy dt - vyt)^2
            # + 1000 (py + vy dt + 1/2 uy dt^2 - pyt)^2
            a = dt_
            b = 0.5 * dt_ * dt_
            Q = 2 * jnp.array(
                [[a * a, 0.0], [0.0, a * a + 1000.0 * b * b]]
            )
            q = jnp.array(
                [
                    2 * a * (vx - cfg.v_x0),
                    2 * a * (vy - cfg.v_y0) + 2000.0 * b * (py + vy * dt_),
                ]
            )
        else:  # deg == 3: u is the jerk
            dh = 2 * (rx * vx + ry * vy)
            ddh = 2 * (vx * vx + rx * ax) + 2 * (vy * vy + ry * ay)
            g_ddd = 2 * jnp.array([rx, ry])
            c_ddd = 2 * (3 * vx * ax) + 2 * (3 * vy * ay)
            if appr == "hocbf":
                g = g_ddd
                c = (
                    c_ddd
                    + (lam1 + lam2 + lam3) * ddh
                    + (lam1 * lam2 + lam1 * lam3 + lam2 * lam3) * dh
                    + lam1 * lam2 * lam3 * h
                )
            else:
                g = (dt_**3 / 6.0) * g_ddd
                c = lam1 * h + dh * dt_ + 0.5 * dt_ * dt_ * ddh + (dt_**3 / 6.0) * c_ddd
            a = 0.5 * dt_ * dt_
            b = 0.25 * dt_**3
            Q = 2 * jnp.array([[a * a, 0.0], [0.0, a * a + 1000.0 * b * b]])
            q = jnp.array(
                [
                    2 * a * (vx + ax * dt_ - cfg.v_x0),
                    2 * a * (vy + ay * dt_ - cfg.v_y0)
                    + 2000.0 * b * (py + vy * dt_ + 0.5 * ay * dt_ * dt_),
                ]
            )

        u = _solve_single_constraint_qp(Q, q, g, c)
        # Actuator boxes: the reference defines speed/accel/jerk limits but
        # leaves most commented out in the QP (`:45-51`, `:361-366`); we
        # enforce them post-hoc — without them the deadbeat cost gains
        # (~1/dt^2) make the degree-3 closed loop blow up.
        u_lim = {1: 20.0, 2: 1000.0, 3: 10.0}[deg]
        u = jnp.clip(u, -u_lim, u_lim)
        cond_val = g @ u + c
        active = jnp.abs(cond_val) <= 1e-6

        # State update (explicit integration as in the reference `:436-520`).
        if deg == 1 and not cfg.is_virtual_control:
            vx_n, vy_n = u[0], u[1]
            px_n, py_n = px + vx_n * dt_, py + vy_n * dt_
            ax_n, ay_n = 0.0, 0.0
        elif deg == 1 and cfg.is_virtual_control or deg == 2:
            ax_n, ay_n = u[0], u[1]
            vx_n, vy_n = vx + ax_n * dt_, vy + ay_n * dt_
            px_n = px + (vx + vx_n) / 2 * dt_
            py_n = py + (vy + vy_n) / 2 * dt_
        else:
            jx, jy = u[0], u[1]
            ax_n, ay_n = ax + jx * dt_, ay + jy * dt_
            vx_n, vy_n = vx + (ax + ax_n) / 2 * dt_, vy + (ay + ay_n) / 2 * dt_
            px_n = px + (vx + vx_n) / 2 * dt_
            py_n = py + (vy + vy_n) / 2 * dt_

        out = {"px": px, "py": py, "vx": vx, "vy": vy, "h": h, "active": active, "u": u}
        return (px_n, py_n, vx_n, vy_n, ax_n, ay_n), out

    init = (cfg.p_x0, cfg.p_y0, cfg.v_x0, cfg.v_y0, 0.0, 0.0)
    init = tuple(jnp.asarray(x, jnp.float32) for x in init)
    _, traj = jax.lax.scan(step, init, None, length=cfg.num_steps)
    traj["h_min"] = traj["h"].min()
    traj["collided"] = traj["h"].min() < 0
    traj["activation_rate"] = traj["active"].mean()
    return traj


def run_experiment_multi_parameters(
    cfg: HOCBFConfig, lambda_1_values: np.ndarray, dt_values: np.ndarray
) -> Dict[str, np.ndarray]:
    """Sweep (lambda_1 x dt) — one vmapped computation replacing the
    reference's multiprocessing fan-out (`run_experiment_multi_parameters:824`).

    Returns heatmap arrays [n_lambda, n_dt] of min-h and collision flags.
    """
    l1 = jnp.asarray(lambda_1_values, jnp.float32)
    dts = jnp.asarray(dt_values, jnp.float32)
    L1, DT = jnp.meshgrid(l1, dts, indexing="ij")

    def one(lam1, dt):
        t = run_simulation(cfg, lambda_1=lam1, dt=dt)
        return t["h_min"], t["collided"], t["activation_rate"]

    h_min, collided, act = jax.vmap(jax.vmap(one))(L1, DT)
    return {
        "lambda_1": np.asarray(L1),
        "dt": np.asarray(DT),
        "h_min": np.asarray(h_min),
        "collided": np.asarray(collided),
        "activation_rate": np.asarray(act),
    }


def plot_heatmap(result: Dict[str, np.ndarray], save_path: str = None):
    """Feasibility/safety heatmap over the (lambda, dt) grid
    (reference `:902` heatmaps)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.pcolormesh(
        result["dt"], result["lambda_1"], result["h_min"], shading="auto", cmap="RdYlGn"
    )
    fig.colorbar(im, label="min h over trajectory")
    ax.set_xlabel("dt [s]")
    ax.set_ylabel("lambda_1")
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
    return fig


if __name__ == "__main__":
    for appr in ("taylor", "hocbf"):
        cfg = HOCBFConfig(relative_degree=2, approach=appr, num_steps=300, dt=0.01)
        t = run_simulation(cfg)
        print(
            f"{appr}: min h = {float(t['h_min']):.3f}, collided = {bool(t['collided'])}, "
            f"activation = {float(t['activation_rate']):.2%}"
        )
