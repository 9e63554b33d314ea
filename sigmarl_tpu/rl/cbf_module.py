"""Learned-CBF module: an actor-critic that scores control-barrier values.

Parity with the reference's `sigmarl/modules/cbf_module.py` (CBFModule): a
second actor-critic whose TanhNormal "scores" head learns a CBF from a
dedicated `cbf_observation`, optimized by its own Clip-PPO loss with GAE
(`cbf_module.py:95-125`).

Documented reference quirk (SURVEY §7): the reference constructs this
module but never wires it into the main trainer, and its observation key
`("agents","info","cbf_observation")` is read by
`helper_training.py:1434-1592` yet never written by any scenario. Here the
module is fully functional: `make_cbf_observation` produces the
observation concretely (the base observation plus the action-propagation
zero-pad tail, the exact tail-fill semantics `helper_training.py:1538-1545`
applies to both keys), and `cbf_train_step` runs a complete PPO update so
the module can actually be trained when enabled.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from sigmarl_tpu.rl.networks import (
    MLP,
    _SCALE_LB,
    _SOFTPLUS_BIAS_1,
    tanh_normal_sample,
)
from sigmarl_tpu.rl.ppo import PPOConfig, gae, ppo_losses

Array = jax.Array

# The learned barrier score is 1-D and TanhNormal-squashed into (-1, 1)
# (reference `cbf_module.py:38`: n_agent_outputs = 2 * 1).
_SCORE_LOW = jnp.asarray([-1.0])
_SCORE_HIGH = jnp.asarray([1.0])


class CBFScoreNet(nn.Module):
    """Decentralized score policy: cbf_obs -> (loc, scale) for a 1-D
    TanhNormal score (reference depth=2, num_cells=256, Tanh,
    `cbf_module.py:35-47`)."""

    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs: Array) -> Tuple[Array, Array]:
        out = MLP(2, self.hidden)(obs)
        loc, scale_raw = jnp.split(out, 2, axis=-1)
        scale = jnp.maximum(jax.nn.softplus(scale_raw + _SOFTPLUS_BIAS_1), _SCALE_LB)
        return loc, scale


class CBFCritic(nn.Module):
    """Critic over cbf observations; `centralised` concatenates all agents'
    observations (MAPPO, reference `cbf_module.py:69-82`)."""

    centralised: bool = True
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        if self.centralised:
            flat = obs.reshape(obs.shape[:-2] + (-1,))
            v = MLP(1, self.hidden)(flat)
            return jnp.broadcast_to(v[..., None, :], obs.shape[:-1] + (1,))
        return MLP(1, self.hidden)(obs)


def make_cbf_observation(base_obs: Array, n_nearing_agents: int) -> Array:
    """Build the `cbf_observation` from the base observation.

    The reference treats `cbf_observation` exactly like `base_observation`
    in the action-propagation path (same zero-pad tail overwritten with
    neighbors' decided actions, `helper_training.py:1538-1545`) but no
    scenario ever writes the key; we define it as the base observation with
    a fresh `n_nearing_agents * 2` zero tail so propagation has somewhere
    to land.
    """
    pad = jnp.zeros(base_obs.shape[:-1] + (n_nearing_agents * 2,), base_obs.dtype)
    return jnp.concatenate([base_obs, pad], axis=-1)


class CBFModuleState(NamedTuple):
    policy_params: Any
    critic_params: Any
    opt_state: Any


class CBFModule:
    """Actor-critic learning CBF scores with its own Clip-PPO optimizer
    (reference `cbf_module.py:12-125`)."""

    def __init__(
        self,
        obs_dim: int,
        n_agents: int,
        mappo: bool = True,
        lr: float = 1e-4,
        ppo: PPOConfig = PPOConfig(),
    ):
        self.obs_dim = obs_dim
        self.n_agents = n_agents
        self.ppo = ppo
        self.policy = CBFScoreNet()
        self.critic = CBFCritic(centralised=mappo)
        self.optimizer = optax.adam(lr)

    def init(self, key: Array) -> CBFModuleState:
        kp, kc = jax.random.split(key)
        dummy = jnp.zeros((1, self.n_agents, self.obs_dim))
        policy_params = self.policy.init(kp, dummy)
        critic_params = self.critic.init(kc, dummy)
        opt_state = self.optimizer.init((policy_params, critic_params))
        return CBFModuleState(policy_params, critic_params, opt_state)

    def sample_scores(
        self, state: CBFModuleState, obs: Array, key: Array
    ) -> Tuple[Array, Array]:
        """Sample TanhNormal scores in (-1, 1); returns (scores [...,N],
        log_prob [...,N])."""
        loc, scale = self.policy.apply(state.policy_params, obs)
        scores, log_prob = tanh_normal_sample(key, loc, scale, _SCORE_LOW, _SCORE_HIGH)
        return scores[..., 0], log_prob

    def train_step(
        self,
        state: CBFModuleState,
        obs: Array,  # [T, B, N, obs_dim]
        next_obs: Array,  # [T, B, N, obs_dim]
        scores: Array,  # [T, B, N]
        old_log_prob: Array,  # [T, B, N]
        rewards: Array,  # [T, B, N]
        dones: Array,  # [T, B] bool
        key: Array,
    ) -> Tuple[CBFModuleState, dict]:
        """One full-batch PPO update on a recorded rollout (GAE + ClipPPO,
        reference `cbf_module.py:95-125`)."""
        values = self.critic.apply(state.critic_params, obs)[..., 0]
        next_values = self.critic.apply(state.critic_params, next_obs)[..., 0]
        advs, targets = gae(
            rewards, values, next_values, dones, self.ppo.gamma, self.ppo.lmbda
        )

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        obs_f, scores_f = flat(obs), flat(scores)[..., None]
        lp_f, adv_f, tgt_f = flat(old_log_prob), flat(advs), flat(targets)

        def loss_fn(params, k):
            pp, cp = params
            loc, scale = self.policy.apply(pp, obs_f)
            vals = self.critic.apply(cp, obs_f)[..., 0]
            return ppo_losses(
                loc, scale, vals, scores_f, lp_f, adv_f, tgt_f,
                _SCORE_LOW, _SCORE_HIGH, self.ppo, k,
            )

        params = (state.policy_params, state.critic_params)
        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, key)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, params)
        policy_params, critic_params = optax.apply_updates(params, updates)
        return CBFModuleState(policy_params, critic_params, opt_state), stats
