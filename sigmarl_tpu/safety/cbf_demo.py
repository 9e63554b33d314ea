"""Standalone two-agent CBF-QP demo (ECC25).

Compact TPU-native port of reference `sigmarl/cbf.py` (3027 LoC): two
kinematic-bicycle agents in an overtaking or bypassing scenario, where
agent i filters its nominal action through a degree-2 CBF-QP whose barrier
is a configurable safety margin between the vehicles:

- "c2c": center-to-center distance minus a conservative radius sum
  (`cbf.py:625`),
- "mtv": the learned MTV safety-margin network (`sm_predictor.py`), with
  first/second derivatives of the margin via JAX autodiff replacing the
  reference's torch.autograd chains (`cbf.py:711`, `:816-954`),
- "grid": the rectangle-outline distance — min distance from the other
  vehicle's sampled outline points (corners + side midpoints, in the ego
  frame) to the ego rectangle's outline polyline. The reference evaluates
  this on a 3x3x3 finite-difference grid over (x_rel, y_rel, psi_rel)
  (`compute_grid_based_gradient_hessian`, `cbf.py:1909-2018`, used at
  `:606-618`); here the exact distance is autodiffed directly.

The CBF condition is the second-order form psi2 = h:: + 2 alpha h: +
alpha^2 h >= 0 (`cbf.py:776-814`), affine in the ego input u = (accel,
steering rate); the per-step 2-D QP is solved in closed form.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.constants import AGENTS
from sigmarl_tpu.core.dynamics import BicycleParams, step as bicycle_step
from sigmarl_tpu.core.geometry import angle_eliminate_two_pi
from sigmarl_tpu.safety.hocbf_taylor import _solve_single_constraint_qp
from sigmarl_tpu.safety.sm_predictor import SafetyMarginEstimatorModule

Array = jax.Array


@dataclass(frozen=True)
class CBFDemoConfig:
    scenario: str = "overtaking"  # {"overtaking", "bypassing"}
    sm_type: str = "c2c"  # {"c2c", "mtv", "grid"}
    dt: float = 0.05
    num_steps: int = 200
    alpha: float = -1.0  # class-K gain; <0 selects the per-scenario default
    # (overtaking tolerates a late-intervening alpha=2; the head-on
    # bypassing scenario needs the earlier-intervening alpha=1 because only
    # the ego is filtered)
    length: float = 0.16
    width: float = 0.08
    # Nominal behavior
    ego_speed: float = 0.7
    other_speed: float = 0.3
    # Strict-separation buffer for the distance-based "grid" margin (a raw
    # outline distance is >= 0 by construction, so the barrier must hold
    # h = d - buffer > 0 to guarantee clearance).
    grid_safety_buffer: float = 0.01


def _make_initial_states(cfg: CBFDemoConfig):
    """Ego behind (overtaking) or facing (bypassing) the other agent
    (reference `initialize_params:102-424` scenario grids)."""
    if cfg.scenario == "overtaking":
        ego = jnp.asarray([0.0, 0.0, 0.0, cfg.ego_speed, 0.0])
        other = jnp.asarray([0.6, 0.0, 0.0, cfg.other_speed, 0.0])
    else:  # bypassing: other drives toward the ego
        ego = jnp.asarray([0.0, 0.0, 0.0, cfg.ego_speed, 0.0])
        other = jnp.asarray([2.0, 0.02, jnp.pi, cfg.other_speed, 0.0])
    return ego, other


def run_demo(
    cfg: CBFDemoConfig, sm_module: SafetyMarginEstimatorModule | None = None
) -> Dict[str, np.ndarray]:
    """Simulate the two-agent scenario with the ego's CBF-QP filter active."""
    bp = BicycleParams(
        l_f=cfg.length / 2 * 0.5, l_r=cfg.length / 2 * 0.5
    )
    dt = cfg.dt
    alpha = cfg.alpha
    if alpha <= 0:
        alpha = 2.0 if cfg.scenario == "overtaking" else 1.0
    r_sum = float(np.hypot(cfg.length, cfg.width))  # conservative c2c radius sum

    use_mtv = cfg.sm_type == "mtv" and sm_module is not None and sm_module.params is not None
    use_grid = cfg.sm_type == "grid"

    # Rectangle outline sample points (4 corners + 1 midpoint per side,
    # matching the reference's num_point_*_side=1, `cbf.py:606-618`) and the
    # ego outline as a closed polyline.
    lh, wh = cfg.length / 2, cfg.width / 2
    _outline_pts = jnp.asarray(
        [[lh, wh], [lh, -wh], [-lh, -wh], [-lh, wh],
         [lh, 0.0], [0.0, -wh], [-lh, 0.0], [0.0, wh]]
    )  # [8, 2]
    _ego_poly = jnp.asarray(
        [[lh, wh], [lh, -wh], [-lh, -wh], [-lh, wh], [lh, wh]]
    )  # [5, 2] closed

    def _rect_outline_distance(x_rel, y_rel, psi_rel):
        """Min distance from the other rectangle's outline points (at the
        relative pose) to the ego rectangle's outline polyline."""
        c, s = jnp.cos(psi_rel), jnp.sin(psi_rel)
        R = jnp.asarray([[c, -s], [s, c]])
        pts = _outline_pts @ R.T + jnp.asarray([x_rel, y_rel])  # [8, 2]
        starts = _ego_poly[:-1]  # [4, 2]
        vecs = _ego_poly[1:] - starts
        rel = pts[:, None, :] - starts[None]  # [8, 4, 2]
        len2 = jnp.sum(vecs * vecs, axis=-1)
        t = jnp.clip(jnp.sum(rel * vecs[None], -1) / len2, 0.0, 1.0)
        closest = starts[None] + vecs[None] * t[..., None]
        d = jnp.linalg.norm(pts[:, None, :] - closest, axis=-1)
        return d.min()

    def margin_fn(ego, other):
        """Safety margin h(ego_state, other_state) and its needed derivatives."""
        rel = other[0:2] - ego[0:2]
        if use_mtv or use_grid:
            # Relative pose in the ego frame (reference `:816-954`).
            c, s = jnp.cos(ego[2]), jnp.sin(ego[2])
            x_rel = c * rel[0] + s * rel[1]
            y_rel = -s * rel[0] + c * rel[1]
            psi_rel = angle_eliminate_two_pi(other[2] - ego[2])
            if use_grid:
                return (
                    _rect_outline_distance(x_rel, y_rel, psi_rel)
                    - cfg.grid_safety_buffer
                )
            return sm_module.predict(jnp.asarray([x_rel, y_rel, psi_rel]))
        return jnp.sum(rel * rel) - r_sum * r_sum

    def dyn(state, u):
        beta = jnp.arctan(bp.l_r / bp.l_wb * jnp.tan(state[4]))
        return jnp.asarray(
            [
                state[3] * jnp.cos(state[2] + beta),
                state[3] * jnp.sin(state[2] + beta),
                state[3] / bp.l_wb * jnp.tan(state[4]) * jnp.cos(beta),
                u[0],
                u[1],
            ]
        )

    def step(carry, _):
        ego, other = carry

        # Exact h, h_dot and the affine decomposition of h_ddot in u via
        # autodiff of the joint dynamics (other agent holds its input at 0).
        def h_of(ego_s, other_s):
            return margin_fn(ego_s, other_s)

        u0 = jnp.zeros(2)
        gh_e = jax.grad(h_of, argnums=0)(ego, other)
        gh_o = jax.grad(h_of, argnums=1)(ego, other)
        f_e = dyn(ego, u0)
        f_o = dyn(other, u0)
        h = h_of(ego, other)
        h_dot = gh_e @ f_e + gh_o @ f_o

        def h_dot_fn(ego_s, other_s):
            return (
                jax.grad(h_of, argnums=0)(ego_s, other_s) @ dyn(ego_s, u0)
                + jax.grad(h_of, argnums=1)(ego_s, other_s) @ dyn(other_s, u0)
            )

        # h_ddot = d(h_dot)/d(ego) . dyn(ego, u) + d(h_dot)/d(other) . f_o.
        # The control enters through dyn(ego, u) = f_e + B u (affine), so
        # h_ddot = c_ddh + (B^T hd_e) . u.
        hd_e = jax.grad(h_dot_fn, argnums=0)(ego, other)
        hd_o = jax.grad(h_dot_fn, argnums=1)(ego, other)
        B = jax.jacfwd(lambda u: dyn(ego, u))(u0)  # [5, 2]
        c_ddh = hd_e @ f_e + hd_o @ f_o
        g_ddh = B.T @ hd_e  # coefficient of u in h_ddot

        # psi2 = h_ddot + 2 alpha h_dot + alpha^2 h >= 0 (`cbf.py:776-814`).
        g = g_ddh
        c = c_ddh + 2 * alpha * h_dot + alpha * alpha * h

        # Nominal: track target speed along x, steer to y = 0.
        u_nom = jnp.asarray(
            [
                jnp.clip((cfg.ego_speed - ego[3]) / dt, -4.0, 4.0),
                jnp.clip(
                    (-2.0 * ego[1] - 2.0 * angle_eliminate_two_pi(ego[2]) - ego[4]) / dt,
                    -jnp.pi,
                    jnp.pi,
                ),
            ]
        )
        Q = 2 * jnp.eye(2) * jnp.asarray([10.0, 1.0])
        q = -Q @ u_nom
        u = _solve_single_constraint_qp(Q, q, g, c)
        u = jnp.clip(u, jnp.asarray([-4.0, -jnp.pi]), jnp.asarray([4.0, jnp.pi]))

        ego_n, _, _ = bicycle_step(bp, ego, u, dt)
        other_n, _, _ = bicycle_step(bp, other, jnp.zeros(2), dt)
        out = {
            "ego": ego,
            "other": other,
            "h": h,
            "u": u,
            "u_nom": u_nom,
        }
        return (ego_n, other_n), out

    init = _make_initial_states(cfg)
    _, traj = jax.lax.scan(step, init, None, length=cfg.num_steps)
    traj = {k: np.asarray(v) for k, v in traj.items()}
    traj["h_min"] = float(traj["h"].min())
    traj["collided"] = bool(traj["h"].min() < 0)
    return traj


def main(scenarios=("overtaking", "bypassing"), sm_types=("c2c", "grid")):
    """Run the scenario/sm-type grid (reference `evaluation_ecc25.py`)."""
    results = {}
    for scen in scenarios:
        for sm in sm_types:
            cfg = CBFDemoConfig(scenario=scen, sm_type=sm)
            t = run_demo(cfg)
            results[(scen, sm)] = t
            print(
                f"{scen}/{sm}: h_min={t['h_min']:.4f} collided={t['collided']}"
            )
    return results


if __name__ == "__main__":
    main()


def plot_demo(traj: Dict[str, np.ndarray], cfg: CBFDemoConfig, out_file: str):
    """Figure suite for one demo run (reference `cbf.py:2131-2974` distilled:
    trajectory footprints, barrier value h(t), and nominal-vs-filtered
    inputs — the panels the ECC25 paper reports)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ego = np.asarray(traj["ego"])  # [T, 5]
    other = np.asarray(traj["other"])
    h = np.asarray(traj["h"])
    u = np.asarray(traj["u"])
    u_nom = np.asarray(traj["u_nom"])
    T = ego.shape[0]
    t = np.arange(T) * cfg.dt

    fig, axes = plt.subplots(3, 1, figsize=(7, 8), dpi=120)

    ax = axes[0]
    lh, wh = cfg.length / 2, cfg.width / 2
    local = np.array([[lh, wh], [lh, -wh], [-lh, -wh], [-lh, wh]])
    for k in range(0, T, max(1, T // 20)):
        for state, color in ((ego[k], "tab:blue"), (other[k], "tab:red")):
            c, s = np.cos(state[2]), np.sin(state[2])
            R = np.array([[c, -s], [s, c]])
            poly = plt.Polygon(
                local @ R.T + state[0:2], closed=True, facecolor=color,
                alpha=0.1 + 0.5 * k / T, edgecolor="none",
            )
            ax.add_patch(poly)
    ax.plot(ego[:, 0], ego[:, 1], "tab:blue", lw=0.8, label="ego")
    ax.plot(other[:, 0], other[:, 1], "tab:red", lw=0.8, label="other")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=7)
    ax.set_title(f"{cfg.scenario} / {cfg.sm_type}")

    ax = axes[1]
    ax.plot(t, h, "k")
    ax.axhline(0.0, color="tab:red", lw=0.8, linestyle="--")
    ax.set_ylabel("h(t)")

    ax = axes[2]
    ax.plot(t, u_nom[:, 0], "tab:blue", linestyle="--", lw=0.8, label="a nominal")
    ax.plot(t, u[:, 0], "tab:blue", lw=1.0, label="a filtered")
    ax.plot(t, u_nom[:, 1], "tab:red", linestyle="--", lw=0.8, label="ddelta nominal")
    ax.plot(t, u[:, 1], "tab:red", lw=1.0, label="ddelta filtered")
    ax.legend(fontsize=7, ncol=2)
    ax.set_xlabel("t [s]")
    ax.set_ylabel("u")

    fig.tight_layout()
    fig.savefig(out_file)
    plt.close(fig)
    return out_file
