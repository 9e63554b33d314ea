"""Reward computation, vectorized over `[B, N]`.

Parity port of the reference `ScenarioRoadTraffic.reward`
(`road_traffic.py:925-1332`) with the per-agent Python loop folded into the
agent axis. All four reward-method families are supported: "sparse",
"ttc*", "distance*", "cbf*" (each optionally "+_sparse").
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sigmarl_tpu.core.geometry import decreasing_fcn
from sigmarl_tpu.env.structs import EnvConfig, WorldState

Array = jax.Array


def _ttc_penalty(cfg: EnvConfig, state: WorldState) -> Array:
    """2-D time-to-collision penalty (reference `road_traffic.py:1255-1332`)."""
    eps = 1e-6
    pos, vel = state.pos, state.vel  # [B, N, 2]
    p_rel = pos[:, None, :, :] - pos[:, :, None, :]  # [B, i, j, 2]
    v_rel = vel[:, None, :, :] - vel[:, :, None, :]
    d_safe = cfg.threshold_near_other_agents_low
    d_gate = cfg.threshold_near_other_agents_high

    a = jnp.sum(v_rel * v_rel, axis=-1)
    b = 2.0 * jnp.sum(p_rel * v_rel, axis=-1)
    c = jnp.sum(p_rel * p_rel, axis=-1) - d_safe * d_safe
    disc = b * b - 4.0 * a * c
    sqrt_disc = jnp.sqrt(jnp.clip(disc, 0.0))
    dist = jnp.sqrt(jnp.clip(jnp.sum(p_rel * p_rel, axis=-1), 0.0))

    valid = (a > eps) & (disc > 0.0) & (b < 0.0)
    ttc_candidate = (-b - sqrt_disc) / (2.0 * a + eps)
    ttc = jnp.where(valid & (ttc_candidate > 0.0), ttc_candidate, jnp.inf)
    ttc = jnp.where(dist <= d_safe, 0.0, ttc)
    eye = jnp.eye(cfg.n_agents, dtype=bool)
    ttc = jnp.where(eye, jnp.inf, ttc)
    ttc = jnp.where(dist <= d_gate, ttc, jnp.inf)

    risk = decreasing_fcn(jnp.clip(ttc, None, cfg.ttc_high), cfg.ttc_low, cfg.ttc_high)
    risk = risk.sum(axis=-1) / max(1, cfg.n_agents - 1)  # [B, N] (over j)
    return risk * cfg.penalty_near_other_agents


def compute_rewards(
    cfg: EnvConfig,
    state: WorldState,
    prev_pos: Array,
    prev_short_term: Array,
    weighting_ref: Array,
) -> Tuple[Array, Dict[str, Array]]:
    """Per-agent rewards for the step just taken.

    Args:
        state: post-dynamics, post-`update_geometry` world state.
        prev_pos: [B, N, 2] positions recorded at the end of the previous
            step (the reference's `state_buffer.get_latest(1)`).
        prev_short_term: [B, N, S, 2] short-term path from the previous step
            (the reference updates it only *after* rewarding).
        weighting_ref: [S] direction weights (linspace(1, 0.2, S), normalized).

    Returns:
        (reward [B, N] clamped to [-1, 1], reward-info dict).
    """
    # Forward-movement reward: project the step displacement onto the vectors
    # toward the (previous) short-term reference points.
    move_vec = (state.pos - prev_pos)[:, :, None, :]  # [B, N, 1, 2]
    ref_vecs = prev_short_term - prev_pos[:, :, None, :]  # [B, N, S, 2]
    move_projected = jnp.sum(move_vec * ref_vecs, axis=-1)  # [B, N, S]
    move_weighted = jnp.einsum("bns,s->bn", move_projected, weighting_ref)
    rew_progress = move_weighted / (cfg.max_speed * cfg.dt) * cfg.reward_progress

    is_reach_goal = state.coll_exit
    rew_goal = is_reach_goal * cfg.reward_reach_goal

    is_collide_agents = state.coll_agents.any(axis=-1)  # [B, N]
    pen_coll_agents = is_collide_agents * cfg.penalty_collide_with_agents
    pen_coll_lanelets = state.coll_lanelets * cfg.penalty_collide_with_boundaries

    pen_boundary = (
        decreasing_fcn(
            state.d_boundary, cfg.threshold_near_boundary_low, cfg.threshold_near_boundary_high
        )
        * cfg.penalty_near_boundary
    )

    pen_near_agents = jnp.zeros_like(rew_progress)

    # The goal reward is only applied in testing mode; in training the
    # reward-method branches deliberately omit it (`road_traffic.py:1050-1062`).
    method = cfg.rew_method
    if cfg.is_testing_mode:
        rew = rew_progress + rew_goal + pen_coll_agents + pen_coll_lanelets
    else:
        rew = rew_progress
        if method == "sparse":
            rew = rew + pen_coll_agents + pen_coll_lanelets
        if "ttc" in method:
            pen_near_agents = _ttc_penalty(cfg, state)
            rew = rew + pen_near_agents + pen_boundary
            rew = rew + pen_coll_agents + pen_coll_lanelets
            if "sparse" in method:
                rew = rew + pen_coll_agents + pen_coll_lanelets
        if "distance" in method:
            ramp = decreasing_fcn(
                state.d_agents,
                cfg.threshold_near_other_agents_low,
                cfg.threshold_near_other_agents_high,
            )
            pen_near_agents = ramp.sum(axis=-1) * cfg.penalty_near_other_agents
            rew = rew + pen_near_agents + pen_boundary
            if "sparse" in method:
                rew = rew + pen_coll_agents + pen_coll_lanelets
        if "cbf" in method:
            if cfg.is_using_cbf and cfg.is_solve_qp:
                # Penalize deviation of the applied (CBF-filtered) action from
                # the nominal RL action (`road_traffic.py:1112-1139`).
                dev_v = (
                    jnp.abs(state.applied_action[..., 0] - state.nominal_action[..., 0])
                    / cfg.max_speed
                )
                dev_s = (
                    jnp.abs(state.applied_action[..., 1] - state.nominal_action[..., 1])
                    / cfg.max_steering
                )
                rew = (
                    rew
                    + cfg.penalty_deviate_from_cbf_vel * dev_v
                    + cfg.penalty_deviate_from_cbf_steer * dev_s
                )
            else:
                # CBF-informed shaping from constraint margins written by the
                # safety layer (`road_traffic.py:1141-1151`).
                cbf_rew = (
                    state.rew_near_left_lane
                    + state.rew_near_right_lane
                    + state.rew_near_other_agents_cbf
                ) / 3
                rew = rew + cbf_rew
            if "sparse" in method:
                rew = rew + pen_coll_agents + pen_coll_lanelets

    rew = jnp.clip(rew, -1.0, 1.0)

    info = {
        "rew_progress": rew_progress,
        "rew_reach_goal": rew_goal,
        "rew_near_other_agents": pen_near_agents,
        "rew_collide_other_agents": pen_coll_agents,
        "rew_collide_lane": pen_coll_lanelets,
        "rew_near_boundary": pen_boundary,
        "rew_total": rew,
    }
    return rew, info
