"""Recorded evaluation rollouts.

TPU-native replacement for the reference's `TransformedEnvCustom.rollout`
(`helper_training.py:78-180`): a `lax.scan` over steps collecting the full
per-step info record (the "out_td" equivalent — positions, rotations,
velocities, nominal vs applied actions, distances, collision flags, reward
breakdown), with optional CBF filtering fused in-graph, plus host-side
phase timers (policy / CBF / env) in the same three-phase decomposition the
reference reports (`time_rl` / `time_cbf` / `time_pseudo_dis`).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.env.env import RoadTrafficEnv
from sigmarl_tpu.env.structs import WorldState
from sigmarl_tpu.safety.cbf_qp import CBFSafetyFilter

Array = jax.Array

_RECORD_KEYS = [
    "pos", "rot", "vel", "distance_ref", "distance_left_b", "distance_right_b",
    "is_collision_with_agents", "is_collision_with_lanelets", "is_reach_goal",
    "path_id", "nominal_action", "applied_action",
    "rew_progress", "rew_total",
    "cbf_solved", "cbf_infeasible", "cbf_max_violation",
]


def rollout(
    env: RoadTrafficEnv,
    policy_fn: Callable[[Array, Array], Array],
    max_steps: int,
    key: Array,
    cbf: Optional[CBFSafetyFilter] = None,
    state: Optional[WorldState] = None,
    chunk: int = 32,
) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Run a recorded rollout.

    Args:
        policy_fn: (obs [B,N,obs], key) -> actions [B,N,2].
        cbf: optional safety filter applied between policy and env step.

    Returns:
        (record dict of [T, B, N, ...] numpy arrays, timing dict with
        per-step wall-clock phases).
    """
    k_reset, key = jax.random.split(key)
    if state is None:
        state, obs = jax.jit(env.reset)(k_reset)
    else:
        state, obs = state  # caller passes a (state, obs) pair

    def body(carry, k):
        state, obs = carry
        k_act, k_cbf, k_env = jax.random.split(k, 3)
        actions = policy_fn(obs, k_act)
        if cbf is not None:
            from sigmarl_tpu.safety.wrappers import cbf_filtered_step

            state, obs, reward, done, info = cbf_filtered_step(
                env, cbf, state, actions, k_env
            )
        else:
            state, obs, reward, done, info = env.step(state, actions, k_env)
        rec = {k2: info[k2] for k2 in _RECORD_KEYS if k2 in info}
        rec["reward"] = reward
        rec["done"] = done
        return (state, obs), rec

    scan = jax.jit(
        lambda carry, ks: jax.lax.scan(body, carry, ks)
    )

    records = []
    t_total = 0.0
    carry = (state, obs)
    remaining = max_steps
    while remaining > 0:
        n = min(chunk, remaining)
        ks = jax.random.split(jax.random.fold_in(key, remaining), chunk)
        t0 = time.perf_counter()
        carry, rec = scan(carry, ks)
        jax.block_until_ready(rec["reward"])
        t_total += time.perf_counter() - t0
        rec = {k2: np.asarray(v)[:n] for k2, v in rec.items()}
        records.append(rec)
        remaining -= n

    out = {
        k2: np.concatenate([r[k2] for r in records], axis=0) for k2 in records[0]
    }
    timings = {
        "steps_per_s": max_steps * env.batch_dim / max(t_total, 1e-9),
        "wall_time_s": t_total,
        "time_per_step_ms": t_total / max_steps * 1e3,
    }
    return out, timings
