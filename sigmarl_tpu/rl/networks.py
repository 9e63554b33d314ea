"""Actor/critic networks and the bounded TanhNormal policy head (flax).

Architecture parity with the reference's torchrl modules
(`sigmarl/modules/decision_making_module.py:34-80`,
`optimization_module.py:17-43`): 3x256 Tanh MLPs, parameter-shared across
agents; the policy head splits into (loc, scale) with a biased-softplus
scale mapping; actions are TanhNormal-squashed into the action box; the
MAPPO critic is centralized (all agents' observations concatenated, one
shared value).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_SOFTPLUS_BIAS_1 = math.log(math.e - 1.0)  # softplus(bias) == 1.0
_SCALE_LB = 1e-4


class MLP(nn.Module):
    """Plain MLP with Tanh activations (reference depth=3, num_cells=256)."""

    out_dim: int
    hidden: Sequence[int] = (256, 256, 256)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class PolicyNet(nn.Module):
    """Decentralized, parameter-shared policy: obs -> (loc, scale) per agent.

    Input [..., N, obs_dim]; outputs ([..., N, act_dim], [..., N, act_dim]).
    """

    act_dim: int = 2
    hidden: Sequence[int] = (256, 256, 256)

    @nn.compact
    def __call__(self, obs: Array) -> Tuple[Array, Array]:
        out = MLP(2 * self.act_dim, self.hidden)(obs)
        loc, scale_raw = jnp.split(out, 2, axis=-1)
        # torchrl NormalParamExtractor's "biased_softplus_1.0" mapping with
        # the default 1e-4 lower bound.
        scale = jnp.maximum(jax.nn.softplus(scale_raw + _SOFTPLUS_BIAS_1), _SCALE_LB)
        return loc, scale


class CentralizedCritic(nn.Module):
    """MAPPO critic: concat of all agents' observations -> one shared value,
    broadcast back to every agent (torchrl MultiAgentMLP with
    centralised=True, share_params=True).

    Input [..., N, obs_dim] -> [..., N, 1].
    """

    hidden: Sequence[int] = (256, 256, 256)

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        n_agents = obs.shape[-2]
        flat = obs.reshape(obs.shape[:-2] + (-1,))
        v = MLP(1, self.hidden)(flat)  # [..., 1]
        return jnp.broadcast_to(v[..., None, :], obs.shape[:-1] + (1,))


class DecentralizedCritic(nn.Module):
    """Per-agent critic (IPPO-style), parameter shared. [..., N, obs] -> [..., N, 1]."""

    hidden: Sequence[int] = (256, 256, 256)

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        return MLP(1, self.hidden)(obs)


# ------------------------------------------------------------------ TanhNormal
def tanh_normal_sample(
    key: Array, loc: Array, scale: Array, low: Array, high: Array, upscale: float = 5.0
) -> Tuple[Array, Array]:
    """Sample a bounded action and its log-probability.

    torchrl TanhNormal semantics (`ProbabilisticActor` in
    `decision_making_module.py:65-80`): the pre-squash loc is soft-clipped by
    `upscale * tanh(loc / upscale)`; z ~ Normal; the action is an affine
    rescaling of tanh(z) into [low, high]. The log-prob includes the
    tanh+affine change of variables, summed over action dims.
    """
    loc_c = upscale * jnp.tanh(loc / upscale)
    z = loc_c + scale * jax.random.normal(key, loc.shape)
    return _squash(z, loc_c, scale, low, high)


def tanh_normal_mode(loc: Array, low: Array, high: Array, upscale: float = 5.0) -> Array:
    """Deterministic (mode) action: tanh of the clipped loc, rescaled."""
    loc_c = upscale * jnp.tanh(loc / upscale)
    t = jnp.tanh(loc_c)
    mid, half = (high + low) / 2, (high - low) / 2
    return mid + half * t


def _squash(z, loc_c, scale, low, high):
    t = jnp.tanh(z)
    mid, half = (high + low) / 2, (high - low) / 2
    action = mid + half * t
    log_prob = _normal_log_prob(z, loc_c, scale) - jnp.log(half * (1 - t**2) + 1e-6)
    return action, log_prob.sum(axis=-1)


def tanh_normal_log_prob(
    action: Array, loc: Array, scale: Array, low: Array, high: Array, upscale: float = 5.0
) -> Array:
    """Log-probability of a given bounded action (for PPO ratios)."""
    loc_c = upscale * jnp.tanh(loc / upscale)
    mid, half = (high + low) / 2, (high - low) / 2
    t = jnp.clip((action - mid) / half, -1 + 1e-6, 1 - 1e-6)
    z = jnp.arctanh(t)
    log_prob = _normal_log_prob(z, loc_c, scale) - jnp.log(half * (1 - t**2) + 1e-6)
    return log_prob.sum(axis=-1)


def _normal_log_prob(z, loc, scale):
    var = scale**2
    return -((z - loc) ** 2) / (2 * var) - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi)
