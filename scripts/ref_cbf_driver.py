"""Reference CBF-QP driver for the control-deviation parity harness.

Drives the REFERENCE implementation's own constraint-assembly code
(`/root/reference/sigmarl/cbf_qp.py`: `rl_action_to_u:461-497`,
`get_circle_centers:527-573`, `estimate_agent_2_lane_safety_margin:575-665`,
`linearized_center_kinematics_coeffs:2283-2335`,
`ttcbf_lane_affine_coeffs:2337-2398`, `ttcbf_pair_affine_coeffs:2400-2489`)
on given vehicle states, assembles the reference's centralized QP
(`build_centralized_cbf_qp:733-1017` in adaptive-lambda mode) explicitly in
float64, and solves it with the first-party C++ ADMM oracle
(`sigmarl_tpu/native/qp_oracle.cpp`) — the same ADMM scheme the reference's
OSQP uses, at tighter tolerance.

The reference's heavy deps (cvxpy, torchdiffeq, vmas, tensordict) are
absent from this image; they are stubbed below. None of the stubbed
functionality is exercised: the cvxpy path is bypassed entirely (we solve
the explicit QP ourselves) and the dynamics module only uses `.ode`.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _install_stubs() -> None:
    # torchdiffeq: the reference only uses odeint(method="euler").
    def _odeint(func, y0, t, rtol=None, atol=None, method="euler"):
        assert method == "euler"
        ys = [y0]
        y = y0
        for k in range(len(t) - 1):
            dt = t[k + 1] - t[k]
            y = y + dt * func(t[k], y)
            ys.append(y)
        return torch.stack(ys, dim=0)

    sys.modules.setdefault(
        "torchdiffeq", types.SimpleNamespace(odeint=_odeint)
    )

    # vmas: only base classes / utils are touched at import time.
    class _Passthrough:
        def __init__(self, *a, **k):
            pass

    def _override(cls):  # vmas.simulator.utils.override decorator factory
        def deco(fn):
            return fn

        return deco

    vm_common = types.ModuleType("vmas.simulator.dynamics.common")
    vm_common.Dynamics = _Passthrough
    vm_core = types.ModuleType("vmas.simulator.core")
    vm_core.AgentState = _Passthrough
    vm_core.Agent = _Passthrough
    vm_utils = types.ModuleType("vmas.simulator.utils")
    vm_utils.TorchUtils = _Passthrough
    vm_utils.override = _override
    sys.modules.setdefault("vmas", types.SimpleNamespace())
    sys.modules.setdefault("vmas.simulator", types.SimpleNamespace())
    sys.modules.setdefault("vmas.simulator.dynamics", types.SimpleNamespace())
    sys.modules.setdefault("vmas.simulator.dynamics.common", vm_common)
    sys.modules.setdefault("vmas.simulator.core", vm_core)
    sys.modules.setdefault("vmas.simulator.utils", vm_utils)

    # tensordict: helper_common imports TensorDict at module level only.
    td = types.ModuleType("tensordict")
    td.TensorDict = _Passthrough
    sys.modules.setdefault("tensordict", td)

    # cvxpy: imported as `cp` at module level of cbf_qp.py; the cvxpy
    # problem-building path is never called by this driver.
    cp = types.ModuleType("cvxpy")
    cp.Variable = _Passthrough
    cp.Parameter = _Passthrough
    cp.Problem = _Passthrough
    cp.Minimize = _Passthrough
    cp.SolverError = RuntimeError
    sys.modules.setdefault("cvxpy", cp)


_install_stubs()

from sigmarl.constants import AGENTS  # noqa: E402
from sigmarl.dynamics import KinematicBicycleModel  # noqa: E402
from sigmarl.map_manager import MapManager  # noqa: E402
from sigmarl.pseudo_distance import PseudoDistance  # noqa: E402
from sigmarl.rectangle_approximation import (  # noqa: E402
    RectangleCircleApproximation,
)
from sigmarl.cbf_qp import CBFQP  # noqa: E402


class _Params:
    """Minimal stand-in for the reference Parameters object."""

    def __init__(self, n_agents: int, n_circles: int):
        self.n_agents = n_agents
        self.n_circles_approximate_vehicle = n_circles


def make_reference_filter(
    n_agents: int, n_circles: int = 3, scenario: str = "cpm_entire", dt: float = 0.1
) -> CBFQP:
    """Construct a CBFQP shim exposing the reference's assembly methods
    without the env/cvxpy machinery (attribute set mirrors
    `initialize_params`, reference `cbf_qp.py:366-434`)."""
    qp = CBFQP.__new__(CBFQP)
    qp.parameters = _Params(n_agents, n_circles)
    qp.device = "cpu"
    qp.dt = dt
    qp.r = 2
    qp.dt_taylor = float(qp.r * dt)
    qp.dx = 0.02
    qp.dy = 0.02
    qp.adaptive_lambda = True  # is_solve_qp mode

    qp.length = AGENTS["length"]
    qp.width = AGENTS["width"]
    qp.l_wb = AGENTS["l_wb"]
    qp.l_f = AGENTS["l_f"]
    qp.l_r = AGENTS["l_r"]
    qp.v_max = torch.tensor(AGENTS["max_speed"], dtype=torch.float32)
    qp.v_min = torch.tensor(AGENTS["min_speed"], dtype=torch.float32)
    qp.steering_max = torch.tensor(AGENTS["max_steering"], dtype=torch.float32)
    qp.steering_min = torch.tensor(AGENTS["min_steering"], dtype=torch.float32)
    qp.a_max = AGENTS["max_acc"]
    qp.a_min = AGENTS["min_acc"]
    qp.steering_rate_max = AGENTS["max_steering_rate"]
    qp.steering_rate_min = AGENTS["min_steering_rate"]

    qp.is_obs_noise = False
    qp.obs_noise_level = 0.0
    qp.safety_buffer = 0
    qp.lambda_ttcbf = 0.5
    qp.u_placeholder = torch.tensor([0.0, 0.0], dtype=torch.float32)
    qp.nom_weight = 1 * np.diag([10, 1])
    qp.lane_slack_weight = 1e9
    qp.pair_slack_weight = 1e9
    qp.cross_slack_weight = 1e9
    qp.lambda_weight = 1e3

    qp.rec_cir_approx = RectangleCircleApproximation(
        qp.length, qp.width, n_circles
    )
    qp.circle_radius = qp.rec_cir_approx.radius
    qp.kbm = KinematicBicycleModel(
        l_f=qp.l_f, l_r=qp.l_r,
        max_speed=qp.v_max, min_speed=qp.v_min,
        max_steering=qp.steering_max, min_steering=qp.steering_min,
        max_acc=qp.a_max, min_acc=qp.a_min,
        max_steering_rate=qp.steering_rate_max,
        min_steering_rate=qp.steering_rate_min,
        device="cpu",
    )
    mm = MapManager(scenario_type=scenario, device="cpu")
    qp.map_pseudo_distance = PseudoDistance(scenario, mm)
    qp.time_pseudo_dis = 0.0
    return qp


def assemble_reference_qp(qp: CBFQP, states: np.ndarray, path_ids, rl_actions):
    """Replicate `update_centralized_cbf_qp:1019-1210` ("rl" nominal mode,
    adaptive lambda): returns the reference's per-step QP data in f64.

    states: [N, 5] (x, y, psi, v, steering) f32-accurate values;
    rl_actions: [N, 2] (speed, steering) targets.

    Returns dict with u_nom [N,2], lane blocks (A [N,C,2,2], b0, h [N,C,2]
    for side L/R stacked last), pair blocks keyed (i,j,ci,cj).
    """
    n = int(qp.parameters.n_agents)
    C = int(qp.parameters.n_circles_approximate_vehicle)

    states_t = [torch.tensor(states[i], dtype=torch.float32) for i in range(n)]
    circles = [qp.get_circle_centers(s) for s in states_t]

    u_nom = np.zeros((n, 2), dtype=np.float64)
    rl_clamped = np.zeros((n, 2), dtype=np.float64)
    for i in range(n):
        rl_i = torch.tensor(rl_actions[i], dtype=torch.float32).clone()
        rl_i, u_nom_i = qp.rl_action_to_u(
            rl_actions=rl_i, v=states_t[i][3], steering=states_t[i][4]
        )
        u_nom[i] = u_nom_i.squeeze(0).numpy()
        rl_clamped[i] = rl_i.squeeze(0).numpy()

    kins = [qp.linearized_center_kinematics_coeffs(states_t[i]) for i in range(n)]

    lane_A = np.zeros((n, C, 2, 2), dtype=np.float64)  # [..., side, u-coeff]
    lane_b0 = np.zeros((n, C, 2), dtype=np.float64)
    lane_h = np.zeros((n, C, 2), dtype=np.float64)
    for i in range(n):
        for ci in range(C):
            pos_c = circles[i][ci][0:2]
            smL, gL, HL, smR, gR, HR = qp.estimate_agent_2_lane_safety_margin(
                pos_c, int(path_ids[i])
            )
            A_L, b0_L, h_L = qp.ttcbf_lane_affine_coeffs(
                kins[i], ci, smL, gL, HL, qp.dt_taylor, None
            )
            A_R, b0_R, h_R = qp.ttcbf_lane_affine_coeffs(
                kins[i], ci, smR, gR, HR, qp.dt_taylor, None
            )
            lane_A[i, ci, 0] = A_L.reshape(2)
            lane_A[i, ci, 1] = A_R.reshape(2)
            lane_b0[i, ci, 0] = b0_L[0]
            lane_b0[i, ci, 1] = b0_R[0]
            lane_h[i, ci, 0] = h_L[0]
            lane_h[i, ci, 1] = h_R[0]

    d_safe = float(2.0 * qp.circle_radius + qp.safety_buffer)
    d_safe_sq = d_safe * d_safe
    pair = {}
    for i in range(n - 1):
        for j in range(i + 1, n):
            for ci in range(C):
                pi = circles[i][ci][0:2]
                for cj in range(C):
                    pj = circles[j][cj][0:2]
                    delta = pi - pj
                    A_i, A_j, b0, h = qp.ttcbf_pair_affine_coeffs(
                        kins[i], kins[j], ci, cj,
                        float(delta[0].item()), float(delta[1].item()),
                        d_safe_sq, qp.dt_taylor, None,
                    )
                    pair[(i, j, ci, cj)] = (
                        A_i.reshape(2), A_j.reshape(2), float(b0[0]), float(h[0])
                    )
    return dict(
        u_nom=u_nom, rl_clamped=rl_clamped,
        lane_A=lane_A, lane_b0=lane_b0, lane_h=lane_h, pair=pair,
        n=n, C=C,
    )


def solve_reference_qp(qp: CBFQP, data: dict) -> np.ndarray:
    """Pose the reference's centralized adaptive-lambda QP explicitly
    (variables x = [u, s_bound, s_pair, lambda_bound, lambda_pair], cost and
    constraints exactly as `build_centralized_cbf_qp:733-1017` in "rl"
    nominal mode, where the CLF rows are inactive no-ops) and solve in f64
    with the first-party ADMM oracle. Returns u* [N, 2]."""
    from sigmarl_tpu.native import solve_qp

    n, C = data["n"], data["C"]
    nu = 2 * n
    n_lane = 2 * n * C
    pairs = sorted(data["pair"].keys())
    n_pair = len(pairs)
    # x = [u (nu), s_lane (n_lane), s_pair (n_pair), lam_lane (n_lane),
    #      lam_pair (n_pair)]
    nx = nu + 2 * n_lane + 2 * n_pair
    o_sl = nu
    o_sp = nu + n_lane
    o_ll = nu + n_lane + n_pair
    o_lp = nu + 2 * n_lane + n_pair

    w_u = np.tile(np.array([100.0, 1.0]), n)  # (diag [10,1])^2
    P = np.zeros((nx, nx))
    P[np.arange(nu), np.arange(nu)] = 2.0 * w_u
    P[np.arange(o_sl, o_sl + n_lane), np.arange(o_sl, o_sl + n_lane)] = (
        2.0 * qp.lane_slack_weight
    )
    P[np.arange(o_sp, o_sp + n_pair), np.arange(o_sp, o_sp + n_pair)] = (
        2.0 * qp.pair_slack_weight
    )
    P[np.arange(o_ll, o_ll + n_lane), np.arange(o_ll, o_ll + n_lane)] = (
        2.0 * qp.lambda_weight
    )
    P[np.arange(o_lp, o_lp + n_pair), np.arange(o_lp, o_lp + n_pair)] = (
        2.0 * qp.lambda_weight
    )
    q = np.zeros(nx)
    q[:nu] = -2.0 * w_u * data["u_nom"].reshape(-1)

    INF = 1e30
    rows, lo, hi = [], [], []

    def add_row(coeffs: dict, l: float, u: float):
        r = np.zeros(nx)
        for k, v in coeffs.items():
            r[k] = v
        rows.append(r)
        lo.append(l)
        hi.append(u)

    # u box
    a_min, a_max = qp.a_min, qp.a_max
    r_min, r_max = qp.steering_rate_min, qp.steering_rate_max
    for i in range(n):
        add_row({2 * i: 1.0}, a_min, a_max)
        add_row({2 * i + 1: 1.0}, r_min, r_max)
    # s >= 0
    for k in range(n_lane):
        add_row({o_sl + k: 1.0}, 0.0, INF)
    for k in range(n_pair):
        add_row({o_sp + k: 1.0}, 0.0, INF)
    # 0 <= lambda <= 1
    for k in range(n_lane):
        add_row({o_ll + k: 1.0}, 0.0, 1.0)
    for k in range(n_pair):
        add_row({o_lp + k: 1.0}, 0.0, 1.0)

    # lane rows: A.u_i + b0 + h*lam + s >= 0
    # row index layout matches the reference idx_bound: 2*(i*C + ci) + side
    for i in range(n):
        for ci in range(C):
            for side in range(2):
                kidx = 2 * (i * C + ci) + side
                A = data["lane_A"][i, ci, side]
                add_row(
                    {
                        2 * i: A[0],
                        2 * i + 1: A[1],
                        o_ll + kidx: data["lane_h"][i, ci, side],
                        o_sl + kidx: 1.0,
                    },
                    -data["lane_b0"][i, ci, side],
                    INF,
                )
    # pair rows
    for kidx, key in enumerate(pairs):
        i, j, ci, cj = key
        A_i, A_j, b0, h = data["pair"][key]
        add_row(
            {
                2 * i: A_i[0], 2 * i + 1: A_i[1],
                2 * j: A_j[0], 2 * j + 1: A_j[1],
                o_lp + kidx: h,
                o_sp + kidx: 1.0,
            },
            -b0,
            INF,
        )

    A = np.stack(rows)
    # Jacobi variable scaling: the cost diagonal spans 2 .. 2e9 (slack
    # weights), which cripples plain ADMM. Substituting x = D x~ with
    # D = diag(P)^{-1/2} equilibrates the quadratic to unit diagonal (an
    # exact reformulation; the solution is recovered as x = D x~).
    D = 1.0 / np.sqrt(np.maximum(np.diag(P), 1.0))
    P_s = (D[:, None] * P) * D[None, :]
    q_s = D * q
    A_s = A * D[None, :]
    lo_a, hi_a = np.array(lo), np.array(hi)
    x = None
    for eps in (1e-10, 1e-9, 1e-8):
        xs, y, iters = solve_qp(
            P_s, q_s, A_s, lo_a, hi_a,
            max_iter=400000, eps_abs=eps, eps_rel=eps,
        )
        if iters >= 0:
            x = D * xs
            break
    if x is None:
        raise RuntimeError("reference QP oracle did not converge")
    return x[:nu].reshape(n, 2)


def reference_filtered_controls(qp, states, path_ids, rl_actions):
    """One-call helper: assemble + solve; returns (u_star [N,2],
    u_nom [N,2])."""
    data = assemble_reference_qp(qp, states, path_ids, rl_actions)
    u = solve_reference_qp(qp, data)
    return u, data["u_nom"]
