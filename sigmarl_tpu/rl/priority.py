"""XP-MARL: learned priority assignment and prioritized action propagation.

TPU-native port of the reference priority module
(`sigmarl/modules/priority_module.py`) and the sequential action-propagation
wrapper (`helper_training.py:1162-1314` `prioritized_ap_policy`): a second
actor-critic scores agents; agents act in descending-score order via a
`lax.scan` over priority turns, each agent observing the already-decided
actions of its higher-priority neighbors through the padded tail of its
observation (optionally with communication noise).

Efficiency note: the reference calls the full policy N times per step over
all agents and masks out all but one agent's output; here each turn runs
the policy only on the acting agents' observations (a factor-N compute
saving with identical semantics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sigmarl_tpu.constants import AGENTS
from sigmarl_tpu.rl.networks import (
    MLP,
    _SCALE_LB,
    _SOFTPLUS_BIAS_1,
    tanh_normal_log_prob,
    tanh_normal_sample,
)

Array = jax.Array


class PriorityNet(nn.Module):
    """Score policy: obs -> (loc, scale) for a 1-D TanhNormal score in
    (-1, 1) (reference depth=2, num_cells=256, `priority_module.py:36-67`)."""

    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs: Array) -> Tuple[Array, Array]:
        out = MLP(2, self.hidden)(obs)
        loc, scale_raw = jnp.split(out, 2, axis=-1)
        scale = jnp.maximum(jax.nn.softplus(scale_raw + _SOFTPLUS_BIAS_1), _SCALE_LB)
        return loc, scale


class PriorityCritic(nn.Module):
    """Centralized critic over priority observations (depth=2)."""

    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        flat = obs.reshape(obs.shape[:-2] + (-1,))
        v = MLP(1, self.hidden)(flat)
        return jnp.broadcast_to(v[..., None, :], obs.shape[:-1] + (1,))


class PriorityOutput(NamedTuple):
    rank: Array  # [B, N] agent indices in descending priority
    scores: Array  # [B, N]
    log_prob: Array  # [B, N]


def priority_rank(
    method: str,
    net: PriorityNet,
    params: Any,
    obs: Array,  # [B, N, obs] priority observation (unpadded)
    key: Array,
) -> PriorityOutput:
    """Compute the per-env priority rank (reference `__call__:152-186`)."""
    B, N = obs.shape[:2]
    if method == "random":
        keys = jax.random.split(key, B)
        rank = jax.vmap(lambda k: jax.random.permutation(k, N))(keys).astype(jnp.int32)
        return PriorityOutput(rank, jnp.zeros((B, N)), jnp.zeros((B, N)))
    loc, scale = net.apply(params, obs)
    low = jnp.asarray([-1.0])
    high = jnp.asarray([1.0])
    scores, log_prob = tanh_normal_sample(key, loc, scale, low, high)
    rank = jnp.argsort(-scores[..., 0], axis=-1).astype(jnp.int32)
    return PriorityOutput(rank, scores[..., 0], log_prob)


class APResult(NamedTuple):
    actions: Array  # [B, N, 2]
    log_prob: Array  # [B, N]
    obs_used: Array  # [B, N, obs_pad] observation each agent actually saw


def prioritized_action_propagation(
    policy_net,
    policy_params,
    base_obs: Array,  # [B, N, obs_dim + k*2] zero-padded tail
    rank: Array,  # [B, N]
    nearing_idx: Array,  # [B, N, k]
    low: Array,
    high: Array,
    key: Array,
    communication_noise_level: float = 0.0,
) -> APResult:
    """Sequential decision-making over priority turns
    (reference `prioritized_ap_policy:1162-1314`).

    Per turn, the acting agent's observation tail is filled with its
    neighbors' already-decided actions (zeros for lower-priority neighbors),
    the policy runs on that observation, and the sampled action is recorded.
    """
    B, N = base_obs.shape[:2]
    k = nearing_idx.shape[-1]
    n_act = 2
    env_idx = jnp.arange(B)

    def turn(carry, inp):
        combined_action, combined_logp, combined_obs = carry
        t, k_t = inp
        acting = rank[:, t]  # [B]
        obs_a = base_obs[env_idx, acting]  # [B, obs_pad]
        neighbors = nearing_idx[env_idx, acting]  # [B, k]
        tail = combined_action[env_idx[:, None], neighbors].reshape(B, k * n_act)
        if communication_noise_level > 0:
            k_noise, k_t = jax.random.split(k_t)
            std = jnp.asarray(
                [AGENTS["max_speed"], AGENTS["max_steering"]] * k
            ) * communication_noise_level
            tail = tail + std * jax.random.normal(k_noise, tail.shape)
        obs_a = obs_a.at[..., -k * n_act :].set(tail)

        loc, scale = policy_net.apply(policy_params, obs_a)
        action, logp = tanh_normal_sample(k_t, loc, scale, low, high)

        combined_action = combined_action.at[env_idx, acting].set(action)
        combined_logp = combined_logp.at[env_idx, acting].set(logp)
        combined_obs = combined_obs.at[env_idx, acting].set(obs_a)
        return (combined_action, combined_logp, combined_obs), None

    init = (
        jnp.zeros((B, N, n_act)),
        jnp.zeros((B, N)),
        base_obs,
    )
    keys = jax.random.split(key, N)
    (actions, logp, obs_used), _ = jax.lax.scan(
        turn, init, (jnp.arange(N), keys)
    )
    return APResult(actions, logp, obs_used)


def nearing_agent_indices(d_agents: Array, k: int) -> Array:
    """Top-k nearest neighbor indices from the mutual distance matrix."""
    _, idx = jax.lax.top_k(-d_agents, k)
    return idx
