"""Opponent modeling (reference `helper_training.py:1071-1142`).

Each ego agent predicts the tentative actions of its observed neighbors
with its *own* policy (Raileanu et al., "Modeling others using oneself"),
optionally corrupted by Gaussian model-inaccuracy noise, appends them to
the zero-padded tail of its observation, and acts on the augmented
observation. Two policy passes per step, fully batched.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sigmarl_tpu.constants import AGENTS
from sigmarl_tpu.rl.networks import tanh_normal_sample

Array = jax.Array


class OpponentModelResult(NamedTuple):
    actions: Array  # [B, N, 2]
    log_prob: Array  # [B, N]
    obs_used: Array  # [B, N, obs_pad]


def opponent_modeling_policy(
    policy_net,
    policy_params,
    obs: Array,  # [B, N, obs_dim + k*2] zero-padded tail
    nearing_idx: Array,  # [B, N, k]
    low: Array,
    high: Array,
    key: Array,
    noise_percentage: float = 0.0,
) -> OpponentModelResult:
    k1, k2, k3 = jax.random.split(key, 3)
    B, N = obs.shape[:2]
    k = nearing_idx.shape[-1]
    n_act = 2

    # Pass 1: tentative actions on the zero-tailed observation.
    loc, scale = policy_net.apply(policy_params, obs)
    tentative, _ = tanh_normal_sample(k1, loc, scale, low, high)

    if noise_percentage > 0:
        std = jnp.asarray([AGENTS["max_speed"], AGENTS["max_steering"]]) * noise_percentage
        tentative = tentative + std * jax.random.normal(k2, tentative.shape)

    # Insert each ego's neighbors' tentative actions into its tail.
    env_idx = jnp.arange(B)[:, None, None]
    neighbor_actions = tentative[env_idx, nearing_idx]  # [B, N, k, 2]
    obs2 = obs.at[..., -k * n_act :].set(neighbor_actions.reshape(B, N, k * n_act))

    # Pass 2: final actions on the augmented observation.
    loc, scale = policy_net.apply(policy_params, obs2)
    actions, log_prob = tanh_normal_sample(k3, loc, scale, low, high)
    return OpponentModelResult(actions, log_prob, obs2)
