"""MAPPO trainer for the road-traffic environment.

TPU-native re-design of the reference trainer (`sigmarl/mappo_cavs.py`):
the torchrl collector/replay-buffer/loss stack becomes one jitted training
iteration — a `lax.scan` rollout of `max_steps` over all envs, GAE, and
`num_epochs x minibatch` PPO updates, all compiled into a single XLA
program. Checkpointing keeps the reference's reward-keyed retention policy
(`helper_training.py:886-1026`): a new checkpoint is written only when the
mean episode reward improves, stale lower-reward files are deleted, and the
run config rides along as a JSON sidecar.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.env import RoadTrafficEnv, make_env
from sigmarl_tpu.env.structs import WorldState
from sigmarl_tpu.rl import checkpoint as ckpt
from sigmarl_tpu.rl.networks import (
    CentralizedCritic,
    PolicyNet,
    tanh_normal_mode,
    tanh_normal_sample,
)
from sigmarl_tpu.rl.ppo import PPOConfig, gae, ppo_losses

Array = jax.Array


@dataclass
class DecisionMakingModule:
    """Policy container (API parity with the reference module of the same name)."""

    net: PolicyNet
    params: Any
    low: Array
    high: Array

    def act(self, obs: Array, key: Array, deterministic: bool = False):
        loc, scale = self.net.apply(self.params, obs)
        if deterministic:
            action = tanh_normal_mode(loc, self.low, self.high)
            return action, jnp.zeros(loc.shape[:-1])
        return tanh_normal_sample(key, loc, scale, self.low, self.high)


@dataclass
class OptimizationModule:
    """Critic + optimizer container (API parity with the reference)."""

    critic: CentralizedCritic
    critic_params: Any
    optimizer: optax.GradientTransformation
    opt_state: Any


class TrainState(NamedTuple):
    policy_params: Any
    critic_params: Any
    opt_state: Any
    env_state: WorldState
    obs: Array
    ep_reward_accum: Array  # [B, N] running episodic reward (RewardSum)
    key: Array
    iteration: Array  # [] int32
    prio_policy_params: Any = None
    prio_critic_params: Any = None


class Transition(NamedTuple):
    obs: Array  # [B, N, obs_policy] observation the policy acted on
    action: Array  # [B, N, 2]
    log_prob: Array  # [B, N]
    reward: Array  # [B, N]
    done: Array  # [B]
    next_obs: Array  # [B, N, obs] raw next observation
    ep_reward_at_done: Array  # [B, N] episodic reward recorded at done
    done_mask: Array  # [B] bool
    # XP-MARL stream (zeros when prioritized MARL is off)
    prio_obs: Array  # [B, N, obs] raw observation for the priority nets
    prio_scores: Array  # [B, N]
    prio_log_prob: Array  # [B, N]


def compute_td_error(reward, values, next_values, done, gamma: float = 0.9):
    """Normalized TD-error priorities for the prioritized replay buffer
    (reference `helper_training.py:1029-1068`): |TD error| averaged over the
    cooperative agents, min-max normalized to (1e-3, 10]."""
    not_done = (~done).astype(reward.dtype)[..., None]
    td = jnp.abs(reward + gamma * next_values * not_done - values)
    td = td.mean(axis=-1)  # cooperative agents
    td_min, td_max = td.min(), td.max()
    rng = jnp.maximum(td_max - td_min, 1e-3)
    return jnp.clip((td - td_min) / rng * 10.0, 1e-3, 10.0)


class MAPPOCAVs:
    """Multi-Agent PPO trainer (reference `mappo_cavs.py` MAPPOCAVs)."""

    def __init__(self, parameters: Parameters, env: Optional[RoadTrafficEnv] = None):
        self.parameters = parameters
        if parameters.debug_numerics:
            from sigmarl_tpu.utils.debug import enable_debug_numerics

            enable_debug_numerics()
        self.env = env if env is not None else make_env(parameters)
        cfg = self.env.cfg

        # CBF-constrained MARL (reference `_setup_cbf_qp_controller:570-605`):
        # one batched filter replaces the per-env / per-env-x-agent CBFQP
        # instances. In margins mode (is_solve_qp=False) the filter feeds the
        # "cbf" reward method; otherwise it filters actions in-graph.
        self.cbf_filter = None
        if parameters.is_using_cbf_training or parameters.is_using_cbf_testing:
            from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter

            self.cbf_filter = CBFSafetyFilter(
                CBFConfig(
                    n_agents=parameters.n_agents,
                    n_circles=parameters.n_circles_approximate_vehicle,
                    dt=parameters.dt,
                    is_solve_qp=parameters.is_solve_qp,
                    adaptive_lambda_cost=parameters.adaptive_lambda,
                    nom_controller_type=parameters.nom_controller_type,
                    h_nom=parameters.h_nom,
                    is_obs_noise=parameters.is_obs_noise,
                    obs_noise_level=parameters.obs_noise_level,
                ),
                cfg,
                self.env.tables,
                decentralized=not parameters.is_using_centralized_cbf,
            )

        self.policy_net = PolicyNet(act_dim=2)
        self.critic_net = CentralizedCritic()
        self.low = -self.env.action_limits
        self.high = self.env.action_limits

        # Observation widths: prioritized MARL pads the policy observation
        # with n_nearing * n_actions slots for propagated actions (the
        # reference's `base_observation`, `road_traffic.py:1513-1520`);
        # opponent-modeling padding is already part of cfg.obs_dim.
        self.use_prio = parameters.is_using_prioritized_marl
        self.use_om = parameters.is_using_opponent_modeling and not self.use_prio
        self.k_nearing = cfg.n_nearing_agents_observed
        self.pad_extra = self.k_nearing * 2 if self.use_prio else 0
        self.policy_obs_dim = cfg.obs_dim + self.pad_extra

        key = jax.random.PRNGKey(parameters.random_seed)
        k_pi, k_v, k_pp, k_pv, self._key = jax.random.split(key, 5)
        dummy = jnp.zeros((1, cfg.n_agents, self.policy_obs_dim))
        self.policy_params = self.policy_net.init(k_pi, dummy)
        self.critic_params = self.critic_net.init(k_v, dummy)

        self.prio_policy_net = self.prio_critic_net = None
        self.prio_policy_params = self.prio_critic_params = None
        if self.use_prio and parameters.prioritization_method.lower() == "marl":
            from sigmarl_tpu.rl.priority import PriorityCritic, PriorityNet

            self.prio_policy_net = PriorityNet()
            self.prio_critic_net = PriorityCritic()
            dummy_raw = jnp.zeros((1, cfg.n_agents, cfg.obs_dim))
            self.prio_policy_params = self.prio_policy_net.init(k_pp, dummy_raw)
            self.prio_critic_params = self.prio_critic_net.init(k_pv, dummy_raw)

        self.ppo_cfg = PPOConfig(
            gamma=parameters.gamma,
            lmbda=parameters.lmbda,
            clip_epsilon=parameters.clip_epsilon,
            entropy_eps=parameters.entropy_eps,
        )

        frames = parameters.frames_per_batch
        self.n_minibatches = max(1, frames // parameters.minibatch_size)
        self.updates_per_iter = parameters.num_epochs * self.n_minibatches

        def lr_schedule(count):
            it = count // self.updates_per_iter
            frac = 1.0 - it / parameters.n_iters
            return parameters.lr_min + (parameters.lr - parameters.lr_min) * frac

        self.optimizer = optax.chain(
            optax.clip_by_global_norm(parameters.max_grad_norm),
            optax.adam(learning_rate=lr_schedule),
        )

        # Continue-training restore (reference `mappo_cavs.py:219-307`):
        # load policy+critic from the checkpoint dir and keep optimizing.
        # The reference rebuilds its optimizer after the load (fresh Adam
        # moments) — matched here by initializing opt_state from the
        # restored params below. The sidecar's best reward and reward
        # history are restored so reward-keyed retention continues from
        # where the previous run stopped.
        self._restored_history: list = []
        if parameters.is_continue_train and parameters.is_load_model:
            loaded = ckpt.load_best(parameters)
            self.policy_params = jax.tree.map(jnp.asarray, loaded["policy"])
            self.critic_params = jax.tree.map(jnp.asarray, loaded["critic"])
            side = ckpt.load_sidecar(parameters)
            if side is not None:
                self._restored_history = list(
                    side.get("episode_reward_mean_list", [])
                )
                best = side.get("parameters", {}).get(
                    "episode_reward_intermediate"
                )
                if best is not None:
                    parameters.episode_reward_intermediate = float(best)

        both = {"policy": self.policy_params, "critic": self.critic_params}
        if self.prio_policy_params is not None:
            both["prio_policy"] = self.prio_policy_params
            both["prio_critic"] = self.prio_critic_params
        self.opt_state = self.optimizer.init(both)
        self._init_params = both

        self._train_iteration = jax.jit(self._build_train_iteration())

    # --------------------------------------------------------------- rollout
    def _build_train_iteration(self):
        env = self.env
        policy_net, critic_net = self.policy_net, self.critic_net
        low, high = self.low, self.high
        p = self.parameters
        ppo_cfg = self.ppo_cfg
        T = p.max_steps
        n_mb = self.n_minibatches
        optimizer = self.optimizer

        cbf = self.cbf_filter
        use_cbf_train = p.is_using_cbf_training and cbf is not None

        def env_transition(env_state, action, k_env):
            if use_cbf_train:
                from sigmarl_tpu.safety.wrappers import cbf_filtered_step, cbf_margin_step

                if p.is_solve_qp and p.is_apply_cbf_action:
                    return cbf_filtered_step(env, cbf, env_state, action, k_env)
                return cbf_margin_step(env, cbf, env_state, action, k_env)
            return env.step(env_state, action, k_env)

        use_prio, use_om = self.use_prio, self.use_om
        pad_extra, k_near = self.pad_extra, self.k_nearing
        prio_method = p.prioritization_method.lower()
        prio_policy_net = self.prio_policy_net

        def act(params, env_state, obs, key):
            """Policy invocation per mode. Returns
            (action, log_prob, obs_for_ppo, prio_scores, prio_log_prob)."""
            B = obs.shape[0]
            if use_prio:
                from sigmarl_tpu.rl.priority import (
                    nearing_agent_indices,
                    prioritized_action_propagation,
                    priority_rank,
                )

                k_prio, k_ap = jax.random.split(key)
                prio_out = priority_rank(
                    prio_method, prio_policy_net, params.get("prio_policy"), obs, k_prio
                )
                nearing = nearing_agent_indices(env_state.d_agents, k_near)
                base_obs = jnp.pad(obs, ((0, 0), (0, 0), (0, pad_extra)))
                noise = (
                    p.communication_noise_level if p.is_communication_noise else 0.0
                )
                ap = prioritized_action_propagation(
                    policy_net, params["policy"], base_obs, prio_out.rank, nearing,
                    low, high, k_ap, communication_noise_level=noise,
                )
                return ap.actions, ap.log_prob, ap.obs_used, prio_out.scores, prio_out.log_prob
            if use_om:
                from sigmarl_tpu.rl.opponent import opponent_modeling_policy
                from sigmarl_tpu.rl.priority import nearing_agent_indices

                nearing = nearing_agent_indices(env_state.d_agents, k_near)
                om = opponent_modeling_policy(
                    policy_net, params["policy"], obs, nearing, low, high, key,
                    noise_percentage=0.0,
                )
                zN = jnp.zeros(obs.shape[:2])
                return om.actions, om.log_prob, om.obs_used, zN, zN
            loc, scale = policy_net.apply(params["policy"], obs)
            action, log_prob = tanh_normal_sample(key, loc, scale, low, high)
            zN = jnp.zeros(obs.shape[:2])
            return action, log_prob, obs, zN, zN

        def rollout_step(carry, key):
            env_state, obs, params, ep_accum = carry
            k_act, k_env = jax.random.split(key)
            action, log_prob, obs_ppo, prio_scores, prio_logp = act(
                params, env_state, obs, k_act
            )
            env_state, next_obs, reward, done, _ = env_transition(
                env_state, action, k_env
            )
            ep_accum = ep_accum + reward
            ep_at_done = ep_accum
            ep_accum = jnp.where(done[:, None], 0.0, ep_accum)
            tr = Transition(
                obs_ppo, action, log_prob, reward, done, next_obs, ep_at_done, done,
                obs, prio_scores, prio_logp,
            )
            return (env_state, next_obs, params, ep_accum), tr

        def train_iteration(state: TrainState):
            key, k_roll, k_perm, k_ent = jax.random.split(state.key, 4)

            params0 = {"policy": state.policy_params, "critic": state.critic_params}
            if state.prio_policy_params is not None:
                params0["prio_policy"] = state.prio_policy_params
                params0["prio_critic"] = state.prio_critic_params

            # 1. Collect frames_per_batch = B * T frames.
            keys = jax.random.split(k_roll, T)
            (env_state, obs, _, ep_accum), batch = jax.lax.scan(
                rollout_step,
                (state.env_state, state.obs, params0, state.ep_reward_accum),
                keys,
            )

            def pad_obs(o):
                if pad_extra:
                    return jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, pad_extra)))
                return o

            # 2. Values + GAE (no grad).
            critic_apply = lambda o: critic_net.apply(state.critic_params, o)[..., 0]
            values = critic_apply(batch.obs)  # [T, B, N]
            next_values = critic_apply(pad_obs(batch.next_obs))
            advantages, value_targets = gae(
                batch.reward, values, next_values, batch.done, ppo_cfg.gamma, ppo_cfg.lmbda
            )
            if "prio_critic" in params0:
                prio_v = lambda o: self.prio_critic_net.apply(
                    state.prio_critic_params, o
                )[..., 0]
                pv = prio_v(batch.prio_obs)
                pnv = prio_v(batch.next_obs)
                prio_adv, prio_vt = gae(
                    batch.reward, pv, pnv, batch.done, ppo_cfg.gamma, ppo_cfg.lmbda
                )
            else:
                prio_adv = prio_vt = jnp.zeros_like(advantages)

            # 3. Flatten to env-frames and run epochs of minibatch updates.
            def flat(x):
                return x.reshape((-1,) + x.shape[2:])

            data = dict(
                obs=flat(batch.obs),
                action=flat(batch.action),
                log_prob=flat(batch.log_prob),
                adv=flat(advantages),
                vt=flat(value_targets),
            )
            if "prio_policy" in params0:
                data.update(
                    prio_obs=flat(batch.prio_obs),
                    prio_scores=flat(batch.prio_scores),
                    prio_log_prob=flat(batch.prio_log_prob),
                    prio_adv=flat(prio_adv),
                    prio_vt=flat(prio_vt),
                )
            if p.is_prb:
                # Initial priorities from the collection-time TD error
                # (reference `_update_priorities:380-387`, alpha=0.7).
                prio0 = compute_td_error(
                    batch.reward, values, next_values, batch.done
                ).reshape(-1)
                data.update(
                    reward=flat(batch.reward),
                    next_obs=flat(batch.next_obs),
                    done_f=(
                        jnp.broadcast_to(
                            batch.done[..., None], batch.reward.shape
                        ).reshape(-1, batch.reward.shape[-1])
                    ),
                )
            M = data["obs"].shape[0]
            mb_size = M // n_mb

            def loss_fn(params, mb, ent_key):
                loc, scale = policy_net.apply(params["policy"], mb["obs"])
                v = critic_net.apply(params["critic"], mb["obs"])[..., 0]
                total, stats = ppo_losses(
                    loc, scale, v, mb["action"], mb["log_prob"], mb["adv"], mb["vt"],
                    low, high, ppo_cfg, ent_key,
                )
                if "prio_policy" in params:
                    # XP-MARL: the priority actor-critic trains with its own
                    # Clip-PPO loss on the 1-D TanhNormal score stream
                    # (reference `priority_module.py:93-126`).
                    p_loc, p_scale = prio_policy_net.apply(
                        params["prio_policy"], mb["prio_obs"]
                    )
                    p_v = self.prio_critic_net.apply(
                        params["prio_critic"], mb["prio_obs"]
                    )[..., 0]
                    p_total, p_stats = ppo_losses(
                        p_loc, p_scale, p_v,
                        mb["prio_scores"][..., None], mb["prio_log_prob"],
                        mb["prio_adv"], mb["prio_vt"],
                        jnp.asarray([-1.0]), jnp.asarray([1.0]), ppo_cfg, ent_key,
                    )
                    total = total + p_total
                    stats = {**stats, "loss_priority": p_total}
                return total, stats

            def minibatch_update(carry, mb_and_key):
                params, opt_state = carry
                mb, ent_key = mb_and_key
                (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb, ent_key
                )
                if p.debug_numerics:
                    # Reference asserts loss finiteness (`mappo_cavs.py:419`).
                    from sigmarl_tpu.utils.debug import assert_finite

                    assert_finite(loss, "ppo_loss")
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), stats

            prb_alpha = 0.7  # reference `mappo_cavs.py:324-326`

            def prb_minibatch_update(carry, key_pair):
                params, opt_state, priorities = carry
                k_s, ent_key = key_pair
                logits = prb_alpha * jnp.log(priorities)
                idx = jax.random.categorical(k_s, logits, shape=(mb_size,))
                mb = {k: v[idx] for k, v in data.items()}
                (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb, ent_key
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                # Refresh priorities of the sampled frames with the updated
                # critic (reference `_update_priorities_after_training`).
                v_new = critic_net.apply(params["critic"], mb["obs"])[..., 0]
                nv_new = critic_net.apply(params["critic"], pad_obs_flat(mb["next_obs"]))[..., 0]
                done_mb = mb["done_f"][:, 0] > 0.5
                td_new = compute_td_error(mb["reward"], v_new, nv_new, done_mb)
                priorities = priorities.at[idx].set(td_new)
                return (params, opt_state, priorities), stats

            def pad_obs_flat(o):
                if pad_extra:
                    return jnp.pad(o, ((0, 0), (0, 0), (0, pad_extra)))
                return o

            def epoch_update(carry, epoch_key):
                if p.is_prb:
                    params, opt_state, priorities = carry
                    k_e = epoch_key
                    keys = jax.random.split(k_e, 2 * n_mb).reshape(n_mb, 2, -1)
                    (params, opt_state, priorities), stats = jax.lax.scan(
                        prb_minibatch_update,
                        (params, opt_state, priorities),
                        (keys[:, 0], keys[:, 1]),
                    )
                    return (params, opt_state, priorities), jax.tree.map(
                        lambda s: s.mean(), stats
                    )
                params, opt_state = carry
                k_p, k_e = jax.random.split(epoch_key)
                perm = jax.random.permutation(k_p, M)
                shuffled = {k: v[perm] for k, v in data.items()}
                mbs = {
                    k: v[: mb_size * n_mb].reshape((n_mb, mb_size) + v.shape[1:])
                    for k, v in shuffled.items()
                }
                ent_keys = jax.random.split(k_e, n_mb)
                (params, opt_state), stats = jax.lax.scan(
                    minibatch_update, (params, opt_state), (mbs, ent_keys)
                )
                return (params, opt_state), jax.tree.map(lambda s: s.mean(), stats)

            epoch_keys = jax.random.split(k_ent, p.num_epochs)
            if p.is_prb:
                (params, opt_state, _), stats = jax.lax.scan(
                    epoch_update, (params0, state.opt_state, prio0), epoch_keys
                )
            else:
                (params, opt_state), stats = jax.lax.scan(
                    epoch_update, (params0, state.opt_state), epoch_keys
                )

            # 4. Metrics: mean episodic reward over done events (RewardSum).
            done_f = batch.done_mask[..., None].astype(jnp.float32)  # [T, B, 1]
            n_done = done_f.sum() * env.cfg.n_agents
            ep_rew_sum = (batch.ep_reward_at_done * done_f).sum()
            episode_reward_mean = jnp.where(
                n_done > 0, ep_rew_sum / jnp.maximum(n_done, 1.0), jnp.nan
            )

            metrics = {
                "episode_reward_mean": episode_reward_mean,
                "n_done": done_f.sum(),
                **jax.tree.map(lambda s: s.mean(), stats),
            }
            new_state = TrainState(
                policy_params=params["policy"],
                critic_params=params["critic"],
                prio_policy_params=params.get("prio_policy"),
                prio_critic_params=params.get("prio_critic"),
                opt_state=opt_state,
                env_state=env_state,
                obs=obs,
                ep_reward_accum=ep_accum,
                key=key,
                iteration=state.iteration + 1,
            )
            return new_state, metrics

        return train_iteration

    # ----------------------------------------------------------------- train
    def train(self, progress_callback=None):
        """Run the full training loop.

        Returns (env, decision_making_module, optimization_module,
        priority_module, cbf_controllers, parameters) for API parity with the
        reference `mappo_cavs(parameters)` entry (`mappo_cavs.py:635-646`).
        """
        p = self.parameters
        key, k_reset = jax.random.split(self._key)
        env_state, obs = jax.jit(self.env.reset)(k_reset)

        state = TrainState(
            policy_params=self.policy_params,
            critic_params=self.critic_params,
            opt_state=self.opt_state,
            env_state=env_state,
            obs=obs,
            ep_reward_accum=jnp.zeros((p.num_vmas_envs, p.n_agents)),
            key=key,
            iteration=jnp.zeros((), jnp.int32),
            prio_policy_params=self.prio_policy_params,
            prio_critic_params=self.prio_critic_params,
        )

        saver = ckpt.RewardKeyedCheckpointer(p)
        reward_history = list(self._restored_history)
        t_start = time.time()
        for i in range(p.n_iters):
            state, metrics = self._train_iteration(state)
            rew = float(metrics["episode_reward_mean"])
            rew = round(rew, 2) if np.isfinite(rew) else rew
            reward_history.append(rew)
            if p.is_save_intermediate_model:
                saver.maybe_save(
                    rew,
                    {"policy": state.policy_params, "critic": state.critic_params},
                    reward_history,
                )
            if progress_callback:
                progress_callback(i, metrics)

        saver.save_final(
            {"policy": state.policy_params, "critic": state.critic_params},
            reward_history,
        )
        self._final_state = state
        self._reward_history = reward_history
        self._train_time = time.time() - t_start

        decision_module = DecisionMakingModule(
            self.policy_net, state.policy_params, self.low, self.high
        )
        optimization_module = OptimizationModule(
            self.critic_net, state.critic_params, self.optimizer, state.opt_state
        )
        return (
            self.env,
            decision_module,
            optimization_module,
            None,  # priority module (XP-MARL) attached by the priority trainer
            None,  # cbf controllers attached by the safety layer
            self.parameters,
        )


def mappo_cavs(parameters: Parameters):
    """Functional entry point mirroring the reference
    `mappo_cavs(parameters)` (`mappo_cavs.py:635-646`)."""
    trainer = MAPPOCAVs(parameters)
    if not parameters.is_continue_train and parameters.is_load_model:
        # Load-only path: restore the best (or final) checkpoint, no training.
        env = trainer.env
        params = ckpt.load_best(parameters)
        decision_module = DecisionMakingModule(
            trainer.policy_net, params["policy"], trainer.low, trainer.high
        )
        optimization_module = OptimizationModule(
            trainer.critic_net, params["critic"], trainer.optimizer, trainer.opt_state
        )
        return env, decision_module, optimization_module, None, None, parameters
    return trainer.train()
