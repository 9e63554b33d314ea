"""GAE and Clip-PPO losses (pure JAX).

Parity with the reference's torchrl objectives
(`optimization_module.py:44-75`): GAE over the time axis, clipped PPO
objective, smooth-L1 critic loss against the GAE value target, single-sample
entropy bonus (TanhNormal has no analytic entropy; torchrl falls back to a
Monte-Carlo estimate), advantages NOT normalized (normalizing across the
agent dimension is wrong for MARL — reference comment).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sigmarl_tpu.rl.networks import tanh_normal_log_prob, tanh_normal_sample

Array = jax.Array


class PPOConfig(NamedTuple):
    gamma: float = 0.99
    lmbda: float = 0.9
    clip_epsilon: float = 0.2
    entropy_eps: float = 1e-4
    critic_coeff: float = 1.0


def gae(
    rewards: Array,  # [T, B, N]
    values: Array,  # [T, B, N]
    next_values: Array,  # [T, B, N]
    dones: Array,  # [T, B] bool (terminated)
    gamma: float,
    lmbda: float,
):
    """Generalized advantage estimation over the leading time axis.

    Returns (advantages [T,B,N], value_targets [T,B,N]).
    """
    not_done = (~dones).astype(rewards.dtype)[..., None]  # [T, B, 1]
    deltas = rewards + gamma * next_values * not_done - values

    def scan_fn(carry, x):
        delta, nd = x
        adv = delta + gamma * lmbda * nd * carry
        return adv, adv

    _, advs = jax.lax.scan(
        scan_fn, jnp.zeros_like(deltas[-1]), (deltas, not_done), reverse=True
    )
    return advs, advs + values


def smooth_l1(pred: Array, target: Array, beta: float = 1.0) -> Array:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def ppo_losses(
    loc: Array,
    scale: Array,
    values: Array,
    actions: Array,
    old_log_prob: Array,
    advantages: Array,
    value_targets: Array,
    low: Array,
    high: Array,
    cfg: PPOConfig,
    entropy_key: Array,
):
    """Clip-PPO loss terms for one minibatch.

    Shapes: loc/scale/actions [M, N, A]; values/old_log_prob/advantages/
    value_targets [M, N].
    """
    log_prob = tanh_normal_log_prob(actions, loc, scale, low, high)
    ratio = jnp.exp(log_prob - old_log_prob)
    surr1 = ratio * advantages
    surr2 = jnp.clip(ratio, 1 - cfg.clip_epsilon, 1 + cfg.clip_epsilon) * advantages
    loss_objective = -jnp.minimum(surr1, surr2).mean()

    loss_critic = cfg.critic_coeff * smooth_l1(values, value_targets).mean()

    # Monte-Carlo entropy estimate (one fresh sample through the squash).
    _, sample_lp = tanh_normal_sample(entropy_key, loc, scale, low, high)
    entropy = -sample_lp.mean()
    loss_entropy = -cfg.entropy_eps * entropy

    total = loss_objective + loss_critic + loss_entropy
    stats = {
        "loss_objective": loss_objective,
        "loss_critic": loss_critic,
        "loss_entropy": loss_entropy,
        "entropy": entropy,
        "ratio_mean": ratio.mean(),
    }
    return total, stats
