"""CBF-constrained environment-step wrappers.

TPU-native equivalents of the reference's rollout policy wrappers
(`helper_training.py:1317-1635`: `cbf_constrained_centralized_policy`,
`cbf_constrained_decentralized_policy*`): the filter runs in-graph between
the policy call and the env step, so the whole CBF-filtered rollout stays
one compiled program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sigmarl_tpu.env.env import RoadTrafficEnv
from sigmarl_tpu.env.structs import WorldState, replace_state
from sigmarl_tpu.safety.cbf_qp import CBFSafetyFilter

Array = jax.Array


def cbf_filtered_step(
    env: RoadTrafficEnv,
    cbf: CBFSafetyFilter,
    state: WorldState,
    rl_actions: Array,
    key: Array,
    apply_cbf_action: bool = True,
):
    """One env step through the CBF-QP safety filter.

    When `apply_cbf_action`, the filtered action is applied and the RL
    action recorded as nominal (reference `cbf_constrained_centralized_policy`
    + `is_apply_cbf_action`); otherwise the nominal action is applied and
    the would-be safe action recorded (diagnostics mode).
    Returns (state', obs, reward, done, info) with CBF diagnostics merged.
    """
    k_cbf, k_env = jax.random.split(key)
    finfo = cbf.filter_actions(state, rl_actions, k_cbf, u_init=state.cbf_u_prev)
    if apply_cbf_action:
        applied = finfo.safe_actions
        nominal = finfo.nominal_actions
    else:
        applied = finfo.nominal_actions
        nominal = finfo.safe_actions
    state = replace_state(
        state,
        nominal_action=nominal,
        applied_action=applied,
        cbf_u_prev=finfo.u_star,
    )
    state, obs, reward, done, info = env.step(state, applied, k_env)
    info = dict(info)
    info.update(
        cbf_solved=finfo.solved,
        cbf_infeasible=finfo.infeasible,
        cbf_max_violation=finfo.max_violation,
        cbf_action_deviation=jnp.abs(finfo.safe_actions - finfo.nominal_actions),
    )
    return state, obs, reward, done, info


def cbf_margin_step(
    env: RoadTrafficEnv,
    cbf: CBFSafetyFilter,
    state: WorldState,
    rl_actions: Array,
    key: Array,
):
    """One env step in margins-only mode (CBF-informed MARL training,
    `is_solve_qp=False`): compute shaping rewards from constraint margins at
    the nominal action, write them into the world state for the "cbf"
    reward method, then step with the unfiltered action
    (reference call stack SURVEY §3.5)."""
    k_cbf, k_env = jax.random.split(key)
    rews = cbf.nominal_margin_rewards(state, rl_actions, k_cbf)
    state = replace_state(
        state,
        rew_near_left_lane=rews["rew_near_left_lane"],
        rew_near_right_lane=rews["rew_near_right_lane"],
        rew_near_other_agents_cbf=rews["rew_near_other_agents"],
    )
    return env.step(state, rl_actions, k_env)
