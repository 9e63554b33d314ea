"""Batched Truncated-Taylor CBF-QP safety filter.

TPU-native re-design of the reference production filter
(`sigmarl/cbf_qp.py`, 2804 LoC of per-env scalar Python + cvxpy/OSQP):
constraint assembly is fully vectorized over `[B, N, C]` (envs x agents x
circles) and the per-env QP is solved by the batched eliminated-variable
projected-Newton solver in `qp.py` — thousands of QPs per step in one XLA
program, no host round-trips.

Per step, per env (semantics of `update_centralized_cbf_qp:1019-1400`):
- vehicles are over-approximated by C circles (`circles.py`),
- lane barriers: h = pseudo-distance(circle center) - radius, with gradient
  (forward differences) and Hessian (central differences) over a 9-point
  stencil of the pseudo-distance field (`estimate_agent_2_lane_safety_margin`),
- pairwise barriers: h = |p_i - p_j|^2 - (2r + buffer)^2 per circle pair,
- both turned into control-affine Truncated-Taylor constraints over the
  horizon dt_taylor = 2*dt via the closed-form circle-center kinematics
  (`kinematics.py` == the reference's probing `:2283-2489`),
- nominal controller: the RL action converted to (accel, steering-rate), or
  a CLF P-controller on heading/speed with relaxed CLF rows in the QP,
- adaptive per-constraint class-K gain lambda in [0, 1] (a QP variable),
- solve: minimize ||u - u_nom||_W^2 + slack/lambda penalties, fall back to
  the nominal action on non-convergence; write the safe action back as
  (speed, steering) targets.

Margins-only mode (`is_solve_qp=False`, CBF-informed MARL): skip the solve
and convert constraint margins at the nominal action into shaping rewards
(`compute_nominal_cbf_constraint_margins:2562-2760` +
`compute_cbf_violation_rewards_from_margins:2762-2803`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.constants import AGENTS
from sigmarl_tpu.core.geometry import angle_eliminate_two_pi
from sigmarl_tpu.env.map_tables import MapTables
from sigmarl_tpu.env.structs import EnvConfig, WorldState
from sigmarl_tpu.safety.circles import CircleApproximation, circle_centers_world
from sigmarl_tpu.safety.kinematics import CenterKinematics, center_kinematics
from sigmarl_tpu.safety.pseudo_distance import pseudo_distance_to_polyline
from sigmarl_tpu.safety.qp import (
    ConstraintSet,
    StructuredConstraintSet,
    solve_boxed_penalty_qp,
    solve_structured_qp,
)

Array = jax.Array


@dataclass(frozen=True)
class CBFConfig:
    """Static CBF-filter configuration (reference `initialize_params:366-434`)."""

    n_agents: int
    n_circles: int = 3
    dt: float = 0.1
    taylor_order_steps: int = 2  # dt_taylor = r * dt
    dx: float = 0.02  # stencil step
    dy: float = 0.02
    lambda_ttcbf: float = 0.5
    safety_buffer: float = 0.0
    is_solve_qp: bool = True
    adaptive_lambda_cost: bool = False  # parameters.adaptive_lambda
    nom_controller_type: str = "rl"  # {"rl", "clf"}
    # CLF gains
    lam_clf: float = 2.0
    ref_speed: float = 1.0
    w_clf_relax: float = 1.0
    k_clf_heading: float = 1.0
    k_clf_speed: float = 1.0
    # Cost weights
    w_u_acc: float = 100.0  # (10)^2 from nom_weight diag [10, 1]
    w_u_steer: float = 1.0
    lane_slack_weight: float = 1e9
    pair_slack_weight: float = 1e9
    # Grouped mode: slack weight of single-sided cross-group rows and the
    # responsibility share each agent takes of a cross-group pair's
    # relaxation (reference `cross_slack_weight` `cbf_qp.py:430`,
    # `parameters.rs` `helper_common.py:126` — default 0.5: the pair's
    # responsibility splits evenly).
    cross_slack_weight: float = 1e9
    rs: float = 0.5
    lambda_weight: float = 1e3
    h_nom: float = 0.2  # margin normalizer for CBF-informed rewards
    is_obs_noise: bool = False
    obs_noise_level: float = 0.0
    newton_iters: int = 15
    # Stiffness-continuation prefix: newton_soft_iters relaxed Newton
    # iterations with slack stiffness capped at newton_soft_cap run BEFORE
    # the newton_iters full-stiffness iterations. On heavily-infeasible
    # pile-up instances (~5% of envs at B=1024/N=15 under a constant
    # max-accel stress rollout) the full-stiffness iteration creeps for
    # ~8-12 iterations; one relaxed iteration restores convergence within
    # the production budget (see safety/qp.py and PROFILE_r05.md).
    newton_soft_iters: int = 2
    newton_soft_cap: float = 10.0
    # Constraint-penetration threshold (raw residual units) above which a
    # converged solve is declared INFEASIBLE: the QP could not satisfy the
    # CBF constraints even with the penalty slacks. The reference's
    # "infeasibility rate" counts OSQP/CLARABEL/SCS solver failures
    # (`cbf_qp.py:1222-1260`, `evaluation_itsc25.py:565`) — its slacked QP
    # is always feasible, so failures there are numerical. Here `solved`
    # is the numerical-validity channel and `infeasible` the
    # constraints-unsatisfiable channel.
    infeasibility_tol: float = 1e-3
    # Solve through the fused Pallas whole-solve kernel (ops/qp_pallas.py)
    # when running on TPU: measured 1.4x over the XLA lowering at B=1024,
    # N=15 (3.70 vs 5.23 ms for the 8-iteration solve). Falls back to the
    # XLA path off-TPU or for single-agent problems.
    use_pallas_qp: bool = True
    # Reference-parity mode for the control-deviation harness: the reference
    # pseudo-distance rounds every distance to float16
    # (`/root/reference/sigmarl/pseudo_distance.py:118`) and its stencil
    # gradient/Hessian chain then runs in numpy float16 scalar arithmetic
    # (NEP-50). Production keeps full fp32 precision (strictly better); this
    # flag replicates the reference quantization so the parity test can
    # certify the remaining deviation <= 1e-3. fp16 rounding is monotone so
    # it commutes with the segment min — rounding after the min is exact.
    fp16_parity: bool = False
    # Windowed pseudo-distance: scan only `pd_window` boundary segments
    # around the agent's closest boundary vertex instead of the whole
    # polyline, gathered by flat index from the stacked table. CAUTION: on
    # self-overlapping loop paths (cpm_entire routes pass near other parts
    # of themselves) the winning segment can belong to a DIFFERENT branch
    # far away in index space — index windows then silently miss it
    # (measured ~5 mm sm error on cpm_entire). Only safe on maps whose
    # paths never self-approach; prefer pd_topk_chunks, which prunes by
    # geometric lower bound and covers all branches.
    use_windowed_pseudo_distance: bool = False
    pd_window: int = 32
    # Top-k chunk-pruned pseudo-distance: the stencil sweep runs over the
    # k=pd_topk_chunks 16-segment chunks with the smallest per-chunk
    # bounding-circle lower bound (a true bound: the pseudo projection
    # point lies ON the segment, see MapTables.left_chunk_cc). Coverage
    # guarantee: the result is EXACT whenever the true distance is below
    # every unselected chunk's lower bound — i.e. everywhere near the
    # boundary, where the constraint can activate. A miss requires the
    # true distance to exceed that bound (measured: 1 query in 2.5e6 over
    # random-action states at B=1024, at a 3.6 m true distance — h is
    # inactive at either value). tests/test_safety.py pins chunked == full
    # over rollout states. Measured 1.55 -> 0.90 ms/step at B=1024 N=15.
    # 0 disables (full scan, the reference-exact mode).
    pd_topk_chunks: int = 3

    @property
    def dt_taylor(self) -> float:
        return self.taylor_order_steps * self.dt

    @property
    def n_pairs(self) -> int:
        return self.n_agents * (self.n_agents - 1) // 2


class CBFStepInfo(NamedTuple):
    safe_actions: Array  # [B, N, 2] (speed, steering) targets
    nominal_actions: Array  # [B, N, 2] clamped nominal targets
    solved: Array  # [B] bool — numerical validity (finite solution)
    max_violation: Array  # [B] worst remaining constraint penetration
    rew_near_left_lane: Array  # [B, N]
    rew_near_right_lane: Array  # [B, N]
    rew_near_other_agents: Array  # [B, N]
    u_star: Array = None  # [B, N, 2] raw (accel, steering-rate) solution
    infeasible: Array = None  # [B] bool — penetration > infeasibility_tol


# Nine-point stencil (reference `estimate_agent_2_lane_safety_margin:575-600`).
_STENCIL = np.array(
    [
        [0, 0], [1, 0], [0, 1], [-1, 0], [0, -1],
        [1, 1], [1, -1], [-1, 1], [-1, -1],
    ],
    dtype=np.float32,
)


class CBFSafetyFilter:
    """Batched centralized CBF-QP filter over all envs at once.

    Decentralized filtering (one QP per agent, reference
    `mappo_cavs.py:598-604`) falls out of the same machinery by masking the
    pair rows of other agents' controls — see `decentralized` flag.
    """

    def __init__(
        self,
        cfg: CBFConfig,
        env_cfg: EnvConfig,
        tables: MapTables,
        decentralized: bool = False,
        max_group_size: int = 0,
    ):
        self.cfg = cfg
        self.env_cfg = env_cfg
        self.tables = tables
        self.decentralized = decentralized
        # Grouped mode (reference `build_grouped_cbf_qps:1562-1856`): pair
        # constraints couple both agents' controls only within a group;
        # cross-group pairs get two single-sided rows instead. Because the
        # QP cost is agent-separable, this one masked QP decomposes exactly
        # into the reference's per-group QPs.
        self.max_group_size = max_group_size
        self.grouped = max_group_size > 0
        self.approx = CircleApproximation(
            AGENTS["length"], AGENTS["width"], cfg.n_circles
        )
        self.v_min, self.v_max = AGENTS["min_speed"], AGENTS["max_speed"]
        self.steer_min, self.steer_max = AGENTS["min_steering"], AGENTS["max_steering"]
        self.a_min, self.a_max = AGENTS["min_acc"], AGENTS["max_acc"]
        self.rate_min, self.rate_max = (
            AGENTS["min_steering_rate"],
            AGENTS["max_steering_rate"],
        )
        self.l_r, self.l_wb = AGENTS["l_r"], AGENTS["l_wb"]
        # Static scatter maps for assembling the dense [M, 2N] constraint
        # matrix: row blocks are [lane(2NC) | pair(P*C*C) | clf(2N)].
        N, C = cfg.n_agents, cfg.n_circles
        pairs = [(i, j) for i in range(N - 1) for j in range(i + 1, N)]
        self._pair_i = np.array([p[0] for p in pairs], np.int32)
        self._pair_j = np.array([p[1] for p in pairs], np.int32)
        self.M_lane = 2 * N * C
        self.M_pair = len(pairs) * C * C
        self.M_clf = 2 * N
        self.M = self.M_lane + self.M_pair + self.M_clf

    # ------------------------------------------------------------ primitives
    def _wl_value(self) -> float:
        """The baseline (uniform) lambda penalty weight. `assemble` fills
        the per-row wl arrays from this single source (ADVICE r3); grouped
        mode overrides the cross-group rows (always
        lambda_weight-regularized). Both solver paths stream the arrays —
        the Pallas kernel takes wl per row since round 5."""
        cfg = self.cfg
        return cfg.lambda_weight if cfg.adaptive_lambda_cost else 1e-9

    def rl_action_to_u(self, rl_actions: Array, v: Array, steering: Array):
        """(speed, steering) targets -> clamped (accel, steering rate)
        (reference `rl_action_to_u:461-497`; note the asymmetric speed clamp
        to [min_speed, max_speed], unlike the world step's symmetric one)."""
        cfg = self.cfg
        tgt_v = jnp.clip(rl_actions[..., 0], self.v_min, self.v_max)
        tgt_s = jnp.clip(rl_actions[..., 1], self.steer_min, self.steer_max)
        u_acc = jnp.clip((tgt_v - v) / cfg.dt, self.a_min, self.a_max)
        u_rate = jnp.clip((tgt_s - steering) / cfg.dt, self.rate_min, self.rate_max)
        rl_clamped = jnp.stack([tgt_v, tgt_s], axis=-1)
        return rl_clamped, jnp.stack([u_acc, u_rate], axis=-1)

    def u_to_rl_action(self, u: Array, v: Array, steering: Array) -> Array:
        """(accel, steering rate) -> next-step (speed, steering) targets
        (reference `u_to_rl_action:499-525`)."""
        cfg = self.cfg
        v_new = jnp.clip(v + u[..., 0] * cfg.dt, self.v_min, self.v_max)
        s_new = (steering + u[..., 1] * cfg.dt + jnp.pi) % (2 * jnp.pi) - jnp.pi
        s_new = jnp.clip(s_new, self.steer_min, self.steer_max)
        return jnp.stack([v_new, s_new], axis=-1)

    def _lane_terms(self, centers: Array, path_id: Array, idx_left=None, idx_right=None):
        """Safety margin, gradient, Hessian of the pseudo-distance field at
        each circle center. centers: [B, N, C, 2]; returns per side
        (sm [B,N,C], grad [B,N,C,2], hess [B,N,C,2,2])."""
        cfg = self.cfg
        B, N, C = centers.shape[:3]
        offsets = jnp.asarray(_STENCIL) * jnp.asarray([cfg.dx, cfg.dy])
        q = centers[..., None, :] + offsets  # [B, N, C, 9, 2]
        q = q.reshape(B, N, C * 9, 2)

        from sigmarl_tpu.env.map_tables import lookup, path_onehot
        from sigmarl_tpu.safety.pseudo_distance import pseudo_distance_seg

        if cfg.pd_topk_chunks > 0:
            from sigmarl_tpu.safety.pseudo_distance import PD_CHUNK, topk_chunk_rows

            t = self.tables
            k_sel = min(cfg.pd_topk_chunks, t.left_seg.shape[1] // PD_CHUNK)
            oh = path_onehot(path_id, t.left_seg.shape[0])
            # Agent reference point + static reach covering every stencil
            # query: max circle-center offset from the centers' mean plus
            # the stencil diagonal.
            c_loc = np.asarray(self.approx.centers_local, np.float64)
            reach = float(
                np.abs(c_loc - c_loc.mean()).max()
                + np.hypot(cfg.dx, cfg.dy)
            )
            p_ref = centers.mean(axis=2)  # [B, N, 2]

            d_left = pseudo_distance_seg(
                q,
                topk_chunk_rows(
                    t.left_seg, t.left_chunk_cc, t.left_chunk_cr,
                    oh, path_id, p_ref, reach, k_sel,
                ),
            ).reshape(B, N, C, 9)
            d_right = pseudo_distance_seg(
                q,
                topk_chunk_rows(
                    t.right_seg, t.right_chunk_cc, t.right_chunk_cr,
                    oh, path_id, p_ref, reach, k_sel,
                ),
            ).reshape(B, N, C, 9)
        elif cfg.use_windowed_pseudo_distance and idx_left is not None:
            # Windowed flat-gather: slice `pd_window` segments around the
            # closest boundary vertex (tracked per step by update_geometry)
            # straight out of the stacked [K, S, 8] table — skipping the
            # one-hot materialization of the full per-agent boundary that
            # dominates the stencil's HBM traffic, and cutting the sweep
            # from S=176 to W segments per query.
            from sigmarl_tpu.safety.pseudo_distance import window_segment_rows

            t = self.tables
            lrows = window_segment_rows(
                t.left_seg, path_id, idx_left, cfg.pd_window,
                t.n_points_left_b - 1, t.is_loop,
            )  # [B, N, W, 8]
            rrows = window_segment_rows(
                t.right_seg, path_id, idx_right, cfg.pd_window,
                t.n_points_right_b - 1, t.is_loop,
            )
            d_left = pseudo_distance_seg(q, lrows).reshape(B, N, C, 9)
            d_right = pseudo_distance_seg(q, rrows).reshape(B, N, C, 9)
        else:
            oh = path_onehot(path_id, self.tables.left_boundary.shape[0])
            # Precomputed segment tables: per-agent gather (one-hot matmul)
            # of ready-made segment frames; the stencil scan is then pure
            # arithmetic — no per-step trigonometry over the boundary.
            # (The transform-sharing `pseudo_distance_stencil` variant is
            # 16% FEWER flops but its 5-D broadcast layout benches 14%
            # slower end-to-end — kept as a tested alternative only.)
            lseg = lookup(oh, self.tables.left_seg)  # [B, N, S, 8]
            rseg = lookup(oh, self.tables.right_seg)
            d_left = pseudo_distance_seg(q, lseg).reshape(B, N, C, 9)
            d_right = pseudo_distance_seg(q, rseg).reshape(B, N, C, 9)

        def grads(d):
            if cfg.fp16_parity:
                # Replicate the reference's float16 pipeline (see CBFConfig):
                # the whole finite-difference chain runs in fp16, promoted
                # back only at the end (as numpy NEP-50 scalar math does).
                d = d.astype(jnp.float16)
            d0 = d[..., 0]
            # Forward differences for the gradient, central for the Hessian
            # (matches the reference exactly, `:621-645`).
            gx = (d[..., 1] - d0) / cfg.dx
            gy = (d[..., 2] - d0) / cfg.dy
            hxx = (d[..., 1] - 2 * d0 + d[..., 3]) / cfg.dx**2
            hyy = (d[..., 2] - 2 * d0 + d[..., 4]) / cfg.dy**2
            hxy = (d[..., 5] - d[..., 6] - d[..., 7] + d[..., 8]) / (
                4 * cfg.dx * cfg.dy
            )
            grad = jnp.stack([gx, gy], axis=-1)
            hess = jnp.stack(
                [jnp.stack([hxx, hxy], -1), jnp.stack([hxy, hyy], -1)], axis=-2
            )
            if cfg.fp16_parity:
                # The reference's circle radius is an np.float64 scalar, so
                # its `sm = d - radius` PROMOTES out of fp16 (NEP-50 strong
                # scalar) — subtract after the upcast, don't round again.
                f = centers.dtype
                grad, hess = grad.astype(f), hess.astype(f)
                sm = d0.astype(f) - self.approx.radius
            else:
                sm = d0 - self.approx.radius
            return sm, grad, hess

        return grads(d_left), grads(d_right)

    def _lane_coeffs(self, kins: CenterKinematics, sm, grad, hess):
        """Affine TTCBF lane coefficients (reference
        `ttcbf_lane_affine_coeffs:2337-2398`). Shapes in: sm [B,N,C],
        grad [B,N,C,2], hess [B,N,C,2,2]. Out: A [B,N,C,2], b0, h [B,N,C]."""
        dt = self.cfg.dt_taylor
        gx, gy = grad[..., 0], grad[..., 1]
        A = 0.5 * dt * dt * (gx[..., None] * kins.a_ddx + gy[..., None] * kins.a_ddy)
        dot_h = gx * kins.dx + gy * kins.dy
        vel = jnp.stack([kins.dx, kins.dy], axis=-1)
        vHv = jnp.einsum("...i,...ij,...j->...", vel, hess, vel)
        const_dd = gx * kins.c_ddx + gy * kins.c_ddy + vHv
        b0 = dot_h * dt + 0.5 * dt * dt * const_dd
        h = sm - self.cfg.safety_buffer
        return A, b0, h

    def _pair_coeffs(self, centers: Array, kins: CenterKinematics):
        """Affine TTCBF pairwise coefficients for all (i<j, ci, cj)
        (reference `ttcbf_pair_affine_coeffs:2400-2489`).

        Returns A_i, A_j [B,P,C,C,2], b0, h [B,P,C,C]."""
        cfg = self.cfg
        dt = cfg.dt_taylor
        pi = centers[:, self._pair_i]  # [B, P, C, 2]
        pj = centers[:, self._pair_j]
        delta = pi[:, :, :, None, :] - pj[:, :, None, :, :]  # [B, P, Ci, Cj, 2]
        ddx, ddy = delta[..., 0], delta[..., 1]

        def sel(x, idx):
            return x[:, idx]

        vxi = sel(kins.dx, self._pair_i)[:, :, :, None]
        vyi = sel(kins.dy, self._pair_i)[:, :, :, None]
        vxj = sel(kins.dx, self._pair_j)[:, :, None, :]
        vyj = sel(kins.dy, self._pair_j)[:, :, None, :]
        vrel_x = vxi - vxj
        vrel_y = vyi - vyj

        aix = sel(kins.a_ddx, self._pair_i)[:, :, :, None, :]
        aiy = sel(kins.a_ddy, self._pair_i)[:, :, :, None, :]
        ajx = sel(kins.a_ddx, self._pair_j)[:, :, None, :, :]
        ajy = sel(kins.a_ddy, self._pair_j)[:, :, None, :, :]
        cix = sel(kins.c_ddx, self._pair_i)[:, :, :, None]
        ciy = sel(kins.c_ddy, self._pair_i)[:, :, :, None]
        cjx = sel(kins.c_ddx, self._pair_j)[:, :, None, :]
        cjy = sel(kins.c_ddy, self._pair_j)[:, :, None, :]

        d_safe = 2.0 * self.approx.radius + cfg.safety_buffer
        h = ddx * ddx + ddy * ddy - d_safe * d_safe
        dh = 2.0 * (ddx * vrel_x + ddy * vrel_y)
        A_i = 0.5 * dt * dt * 2.0 * (ddx[..., None] * aix + ddy[..., None] * aiy)
        A_j = 0.5 * dt * dt * -2.0 * (ddx[..., None] * ajx + ddy[..., None] * ajy)
        const_ddh = 2.0 * (vrel_x**2 + vrel_y**2) + 2.0 * (
            ddx * (cix - cjx) + ddy * (ciy - cjy)
        )
        b0 = dh * dt + 0.5 * dt * dt * const_ddh
        return A_i, A_j, b0, h

    # -------------------------------------------------------------- assembly
    def assemble(
        self,
        state: WorldState,
        rl_actions: Array,
        key: Array | None = None,
        group_id: Array | None = None,
    ) -> Tuple[StructuredConstraintSet, Array, Array, Dict[str, Array]]:
        """Build the batched constraint set (block-sparse form) and nominal
        input.

        Returns (structured constraints, u_nom [B,N,2], rl_clamped [B,N,2],
        aux dict with margins info). Row blocks per agent: 2C lane rows
        (circle x side) + 2 CLF rows; per pair: C^2 coupled rows (+ C^2
        j-sided rows in grouped mode).
        """
        cfg = self.cfg
        B, N = state.pos.shape[:2]
        C = cfg.n_circles
        v, steering = state.speed, state.steering
        psi = state.rot

        rl = rl_actions
        if cfg.is_obs_noise and key is not None:
            rl = rl + jax.random.uniform(key, rl.shape) * cfg.obs_noise_level

        if cfg.nom_controller_type == "rl":
            rl_clamped, u_nom = self.rl_action_to_u(rl, v, steering)
            e_head = jnp.zeros((B, N))
            e_speed = jnp.zeros((B, N))
        else:
            # CLF nominal controller: P-control on heading/speed toward the
            # 3rd short-term reference point (`ref[4:6]` in the reference's
            # flattened short-term path = point index 2).
            target = state.short_term[:, :, 2, :]
            desired = jnp.arctan2(
                target[..., 1] - state.pos[..., 1], target[..., 0] - state.pos[..., 0]
            )
            e_head = angle_eliminate_two_pi(desired - psi)
            e_speed = cfg.ref_speed - v
            u1 = jnp.clip(cfg.k_clf_speed * e_speed, self.a_min, self.a_max)
            u2 = jnp.clip(cfg.k_clf_heading * e_head, self.rate_min, self.rate_max)
            u_nom = jnp.stack([u1, u2], axis=-1)
            rl_clamped = jnp.stack([v + e_speed, e_head], axis=-1)

        centers = circle_centers_world(self.approx, state.pos, psi)  # [B,N,C,2]
        kins = center_kinematics(
            psi, v, steering, jnp.asarray(self.approx.centers_local), self.l_r, self.l_wb
        )

        (smL, gL, HL), (smR, gR, HR) = self._lane_terms(
            centers, state.path_id, state.idx_left, state.idx_right
        )
        A_L, b0_L, h_L = self._lane_coeffs(kins, smL, gL, HL)
        A_R, b0_R, h_R = self._lane_coeffs(kins, smR, gR, HR)
        A_pi, A_pj, b0_p, h_p = self._pair_coeffs(centers, kins)

        # ---- single-agent block: 2C lane rows + 2 CLF rows per agent.
        lane_A = jnp.stack([A_L, A_R], axis=3).reshape(B, N, 2 * C, 2)
        lane_b0 = jnp.stack([b0_L, b0_R], axis=3).reshape(B, N, 2 * C)
        lane_h = jnp.stack([h_L, h_R], axis=3).reshape(B, N, 2 * C)

        # CLF rows: residual r = e * u + (-v_const); heading row acts on the
        # steering-rate input, speed row on the acceleration input.
        zeros_bn = jnp.zeros((B, N))
        clf_A = jnp.stack(
            [
                jnp.stack([zeros_bn, e_head], axis=-1),  # heading row
                jnp.stack([e_speed, zeros_bn], axis=-1),  # speed row
            ],
            axis=2,
        )  # [B, N, 2, 2]
        clf_b = jnp.stack(
            [
                -cfg.lam_clf * 0.5 * e_head**2,
                -cfg.lam_clf * 0.5 * e_speed**2,
            ],
            axis=-1,
        )  # [B, N, 2]
        use_clf = cfg.nom_controller_type == "clf"

        Ks = 2 * C + 2
        A_s = jnp.concatenate([lane_A, clf_A], axis=2)  # [B, N, Ks, 2]
        b0_s = jnp.concatenate([lane_b0, clf_b], axis=2)
        h_s = jnp.concatenate([lane_h, jnp.zeros((B, N, 2))], axis=2)
        ws_s = jnp.concatenate(
            [
                jnp.full((B, N, 2 * C), cfg.lane_slack_weight),
                jnp.full((B, N, 2), cfg.w_clf_relax),
            ],
            axis=2,
        )
        valid_s = jnp.concatenate(
            [jnp.ones((B, N, 2 * C), bool), jnp.full((B, N, 2), use_clf)], axis=2
        )

        # ---- pair block.
        P = self._pair_i.shape[0]
        Kp = C * C
        A_pi_f = A_pi.reshape(B, P, Kp, 2)
        A_pj_f = A_pj.reshape(B, P, Kp, 2)
        b0_pf = b0_p.reshape(B, P, Kp)
        h_pf = h_p.reshape(B, P, Kp)
        valid_p = jnp.ones((B, P, Kp), bool)
        if self.decentralized:
            # Decentralized QPs: each agent treats the other's control as
            # fixed (zero contribution) — drop the j-blocks.
            A_pj_f = jnp.zeros_like(A_pj_f)
        # Lambda cost weight (single source shared with the Pallas solve
        # path — see `_wl_value`); needed below by the grouped branch too.
        wl = self._wl_value()

        ws_p_arr = None
        wl_p_arr = None
        if self.grouped and group_id is not None:
            from sigmarl_tpu.safety.grouping import same_group_mask

            same = same_group_mask(group_id, self._pair_i, self._pair_j)  # [B, P]
            same_k = jnp.broadcast_to(same[..., None], (B, P, Kp))
            # Same-group rows stay coupled. A cross-group pair splits into
            # an i-sided and a j-sided row with the reference's
            # responsibility-share semantics (`build_grouped_cbf_qps`,
            # ref cbf_qp.py:1744-1757): each side carries HALF the drift
            # constant b0 and an `rs` share of the h-relaxation with its
            # own lambda, so the two sides together recover exactly the
            # coupled row (with effective lambda = rs*(lam_i + lam_j)).
            # Cross slacks use cross_slack_weight (`:1772`) and cross
            # lambdas are ALWAYS lambda_weight-regularized (`:1785-1786`),
            # even when adaptive_lambda is off.
            if cfg.is_solve_qp:
                b0_cross = 0.5 * b0_pf
                h_cross = cfg.rs * h_pf
            else:
                # Inactive form (ref `:1778-1783`): full constant, lambda
                # fixed at 1. The global non-adaptive fold below adds
                # lambda_ttcbf*h to every row — pre-compensate so cross
                # rows land at b0 + 1.0*h.
                b0_cross = b0_pf + (1.0 - cfg.lambda_ttcbf) * h_pf
                h_cross = h_pf
            extra_Ai = jnp.zeros_like(A_pi_f)
            extra_Aj = jnp.where(same_k[..., None], 0.0, A_pj_f)
            A_pj_f = jnp.where(same_k[..., None], A_pj_f, 0.0)
            A_pi_f = jnp.concatenate([A_pi_f, extra_Ai], axis=2)
            A_pj_f = jnp.concatenate([A_pj_f, extra_Aj], axis=2)
            b0_pf = jnp.concatenate(
                [jnp.where(same_k, b0_pf, b0_cross), b0_cross], axis=2
            )
            h_pf = jnp.concatenate(
                [jnp.where(same_k, h_pf, h_cross), h_cross], axis=2
            )
            valid_p = jnp.concatenate([valid_p, ~same_k], axis=2)
            ws_p_arr = jnp.concatenate(
                [
                    jnp.where(same_k, cfg.pair_slack_weight, cfg.cross_slack_weight),
                    jnp.full((B, P, Kp), cfg.cross_slack_weight),
                ],
                axis=2,
            )
            wl_p_arr = jnp.concatenate(
                [
                    jnp.where(same_k, wl, cfg.lambda_weight),
                    jnp.full((B, P, Kp), cfg.lambda_weight),
                ],
                axis=2,
            )
            Kp = 2 * Kp

        adaptive = cfg.is_solve_qp
        if not adaptive:
            # Non-adaptive: fold lambda_ttcbf * h into the constant (CLF rows
            # carry h = 0 already).
            b0_s = b0_s + cfg.lambda_ttcbf * h_s
            b0_pf = b0_pf + cfg.lambda_ttcbf * h_pf
            h_s = jnp.zeros_like(h_s)
            h_pf = jnp.zeros_like(h_pf)

        # The reference adds the quadratic lambda penalty only when
        # parameters.adaptive_lambda is set; otherwise lambda is free in
        # [0, 1] (`build_centralized_cbf_qp:927-931`) — modeled by the
        # vanishing `wl` weight computed above. Non-grouped mode fills the
        # wl arrays uniformly from `_wl_value`; grouped mode's row-varying
        # wl/ws stream into BOTH solver paths (the Pallas kernel takes wl
        # per row).
        cons = StructuredConstraintSet(
            A_s=A_s,
            b_s=b0_s,
            h_s=h_s,
            ws_s=ws_s,
            wl_s=jnp.full((B, N, Ks), wl),
            valid_s=valid_s,
            A_pi=A_pi_f,
            A_pj=A_pj_f,
            b_p=b0_pf,
            h_p=h_pf,
            ws_p=(
                ws_p_arr
                if ws_p_arr is not None
                else jnp.full((B, P, Kp), cfg.pair_slack_weight)
            ),
            wl_p=(
                wl_p_arr
                if wl_p_arr is not None
                else jnp.full((B, P, Kp), wl)
            ),
            valid_p=valid_p,
            pair_i=self._pair_i,
            pair_j=self._pair_j,
        )
        aux = {
            "lane_margin_L": smL.min(-1),
            "lane_margin_R": smR.min(-1),
            "rl_clamped": rl_clamped,
            "lane_A": lane_A,
            "lane_b0": lane_b0,
            "lane_h": lane_h,
            "pair_Ai": A_pi.reshape(B, P, C * C, 2),
            "pair_Aj": (jnp.zeros_like(A_pj) if self.decentralized else A_pj).reshape(
                B, P, C * C, 2
            ),
            "pair_b0": b0_p.reshape(B, P, C * C),
            "pair_h": h_p.reshape(B, P, C * C),
        }
        return cons, u_nom, rl_clamped, aux

    def to_dense(self, cons: StructuredConstraintSet) -> ConstraintSet:
        """Expand a structured set to the dense [B, M, 2N] form (testing /
        oracle cross-checks only — never on the hot path)."""
        B, N, Ks = cons.A_s.shape[:3]
        P, Kp = cons.A_pi.shape[1:3]
        d = 2 * N
        ei = jax.nn.one_hot(jnp.asarray(cons.pair_i), N)
        ej = jax.nn.one_hot(jnp.asarray(cons.pair_j), N)
        A_single = jnp.einsum("bnkc,nm->bnkmc", cons.A_s, jnp.eye(N)).reshape(
            B, N * Ks, d
        )
        A_pair = (
            jnp.einsum("bpkc,pn->bpknc", cons.A_pi, ei)
            + jnp.einsum("bpkc,pn->bpknc", cons.A_pj, ej)
        ).reshape(B, P * Kp, d)
        cat = lambda s, p: jnp.concatenate(
            [s.reshape(B, N * Ks), p.reshape(B, P * Kp)], axis=1
        )
        return ConstraintSet(
            A=jnp.concatenate([A_single, A_pair], axis=1),
            b=cat(cons.b_s, cons.b_p),
            h=cat(cons.h_s, cons.h_p),
            w_slack=cat(cons.ws_s, cons.ws_p),
            w_lambda=cat(cons.wl_s, cons.wl_p),
            valid=cat(cons.valid_s, cons.valid_p),
        )

    # ----------------------------------------------------------------- solve
    def filter_actions(
        self,
        state: WorldState,
        rl_actions: Array,
        key: Array | None = None,
        u_init: Array | None = None,
    ) -> CBFStepInfo:
        """Solve the batched CBF-QP and return safe (speed, steering) targets.

        `u_init` (e.g. `state.cbf_u_prev`, the previous step's solution)
        warm-starts the Newton iteration — same minimizer, fewer iterations
        needed (the reference warm-starts OSQP identically)."""
        cfg = self.cfg
        B, N = state.pos.shape[:2]
        d = 2 * N
        group_id = None
        if self.grouped:
            from sigmarl_tpu.safety.grouping import group_agents_k_nearest

            group_id = group_agents_k_nearest(state.pos, self.max_group_size)
        cons, u_nom, rl_clamped, aux = self.assemble(state, rl_actions, key, group_id)

        u_lo = jnp.asarray([self.a_min, self.rate_min])
        u_hi = jnp.asarray([self.a_max, self.rate_max])
        w_u = jnp.asarray([cfg.w_u_acc, cfg.w_u_steer])

        def _solve_xla():
            return solve_structured_qp(
                cons, u_nom, w_u, u_lo, u_hi, n_iters=cfg.newton_iters,
                u_init=u_init, soft_iters=cfg.newton_soft_iters,
                soft_cap=cfg.newton_soft_cap,
            )

        def _solve_pallas():
            from sigmarl_tpu.safety.qp import solve_structured_qp_pallas

            return solve_structured_qp_pallas(
                cons, u_nom, w_u, u_lo, u_hi, n_iters=cfg.newton_iters,
                u_init=u_init, soft_iters=cfg.newton_soft_iters,
                soft_cap=cfg.newton_soft_cap,
                static_bounds=(
                    (cfg.w_u_acc, cfg.w_u_steer),
                    (self.a_min, self.rate_min),
                    (self.a_max, self.rate_max),
                ),
            )

        if cfg.use_pallas_qp and self._pair_i.shape[0] > 0:
            # Dispatch on the actual LOWERING platform, not the host's
            # default backend: a TPU host tracing for a CPU mesh (or vice
            # versa) gets the right solver (ADVICE r3). Only the selected
            # platform's branch is lowered, so the Mosaic kernel never
            # reaches a CPU compile.
            u_star, F = jax.lax.platform_dependent(
                tpu=_solve_pallas, default=_solve_xla
            )
        else:
            u_star, F = _solve_xla()
        solved = jnp.isfinite(F) & jnp.isfinite(u_star).all((-1, -2))
        u_star = jnp.where(solved[:, None, None], u_star, u_nom)

        # Residual penetration at the solution (infeasibility diagnostic):
        # best-case lambda is 1 when h relaxes the row (h > 0), else 0.
        r_s = (
            jnp.einsum("bnkc,bnc->bnk", cons.A_s, u_star)
            + cons.b_s
            + jnp.maximum(cons.h_s, 0.0)
        )
        r_p = (
            jnp.einsum("bpkc,bpc->bpk", cons.A_pi, u_star[:, cons.pair_i])
            + jnp.einsum("bpkc,bpc->bpk", cons.A_pj, u_star[:, cons.pair_j])
            + cons.b_p
            + jnp.maximum(cons.h_p, 0.0)
        )
        viol_s = jnp.where(cons.valid_s, jnp.maximum(0.0, -r_s), 0.0).max(
            (-1, -2), initial=0.0
        )
        # initial= keeps the reductions defined for N=1 (zero pair rows).
        viol_p = jnp.where(cons.valid_p, jnp.maximum(0.0, -r_p), 0.0).max(
            (-1, -2), initial=0.0
        )
        viol = jnp.maximum(viol_s, viol_p)

        safe_actions = self.u_to_rl_action(u_star, state.speed, state.steering)

        margins = self._margins_from_aux(cons, u_nom, aux, B, N)
        return CBFStepInfo(
            safe_actions=safe_actions,
            nominal_actions=rl_clamped,
            solved=solved,
            max_violation=viol,
            infeasible=~solved | (viol > cfg.infeasibility_tol),
            u_star=u_star,
            **margins,
        )

    def nominal_margin_rewards(
        self, state: WorldState, rl_actions: Array, key: Array | None = None
    ) -> Dict[str, Array]:
        """Margins-only mode: CBF-informed shaping rewards at the nominal
        action (no QP solve)."""
        cons, u_nom, _, aux = self.assemble(state, rl_actions, key)
        B, N = state.pos.shape[:2]
        return self._margins_from_aux(cons, u_nom, aux, B, N)

    def _margins_from_aux(self, cons, u_nom, aux, B, N):
        """Per-agent shaping rewards from constraint margins at u_nom with
        lambda = lambda_ttcbf (reference `:2562-2803`).

        u_nom: [B, N, 2]; block coefficients from `aux` (pre lambda-folding).
        """
        cfg = self.cfg
        C = cfg.n_circles
        lam = cfg.lambda_ttcbf
        # Margins always evaluated with the fixed gain lambda_ttcbf
        # (reference `compute_nominal_cbf_constraint_margins`, both branches).
        g_lane = (
            jnp.einsum("bnkc,bnc->bnk", aux["lane_A"], u_nom)
            + aux["lane_b0"]
            + aux["lane_h"] * lam
        )
        g_lane = g_lane.reshape(B, N, C, 2)
        g_left = g_lane[..., 0].min(-1)  # [B, N]
        g_right = g_lane[..., 1].min(-1)

        g_pair = (
            jnp.einsum("bpkc,bpc->bpk", aux["pair_Ai"], u_nom[:, self._pair_i])
            + jnp.einsum("bpkc,bpc->bpk", aux["pair_Aj"], u_nom[:, self._pair_j])
            + aux["pair_b0"]
            + aux["pair_h"] * lam
        )
        P = self._pair_i.shape[0]
        g_pair = g_pair.min(-1, initial=1e9)  # [B, P]
        g_pair_neg = jnp.minimum(g_pair, 0.0)
        # Worst (most negative) pair margin touching each agent.
        # initial= keeps the reductions defined for N=1 (zero pairs).
        ei = jax.nn.one_hot(self._pair_i, N)  # [P, N]
        ej = jax.nn.one_hot(self._pair_j, N)
        big = 1e9
        g_i = jnp.where(ei[None] > 0, g_pair_neg[:, :, None], big).min(
            1, initial=big
        )  # [B, N]
        g_j = jnp.where(ej[None] > 0, g_pair_neg[:, :, None], big).min(
            1, initial=big
        )
        v_pair = jnp.minimum(jnp.minimum(g_i, g_j), 0.0)

        def to_reward(v):
            return jnp.clip(v / cfg.h_nom, -1.0, 0.0)

        return {
            "rew_near_left_lane": to_reward(g_left),
            "rew_near_right_lane": to_reward(g_right),
            "rew_near_other_agents": to_reward(v_pair),
        }
