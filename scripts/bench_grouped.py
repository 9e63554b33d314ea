"""Grouped-mode throughput bench (VERDICT r4 item 5).

Measures the CBF-filtered rollout at B=1024, N=15 with
`--is_grouping_agents`-style grouping (k-seeded farthest-point groups of
max_group_size=4, reference `group_agents_k_nearest` `cbf_qp.py:193-308`)
vs the plain centralized filter. Grouped mode doubles the pair-row count
(cross-group pairs split into two single-sided rows) and adds the per-step
group assignment; since round 5 it rides the same Pallas whole-solve
kernel (per-row lambda weights). Prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(grouped: bool, B: int = 1024, N: int = 15, T: int = 32, n_chunks: int = 5):
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.structs import zero_state
    from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=N, n_circles=3, dt=0.1, newton_iters=5, newton_soft_iters=3),
        env.cfg, env.tables,
        max_group_size=4 if grouped else 0,
    )
    policy = PolicyNet(act_dim=2)
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, N, env.obs_dim)))
    low, high = -env.action_limits, env.action_limits

    def one_step(state, obs, k):
        k_act, k_env = jax.random.split(k)
        loc, scale = policy.apply(params, obs)
        action, _ = tanh_normal_sample(k_act, loc, scale, low, high)
        state, obs, reward, done, _ = cbf_filtered_step(env, cbf, state, action, k_env)
        return state, obs, reward.mean()

    def rollout_chunk(state, obs, key):
        def body(carry, k):
            state, obs = carry
            state, obs, r = one_step(state, obs, k)
            return (state, obs), r
        (state, obs), rews = jax.lax.scan(body, (state, obs), jax.random.split(key, T))
        return state, obs, rews.mean()

    rollout = jax.jit(rollout_chunk, donate_argnums=(0, 1))
    state = zero_state(env.cfg)
    obs = jnp.zeros((B, N, env.obs_dim))
    t0 = time.perf_counter()
    state, obs, r = rollout(state, obs, jax.random.PRNGKey(1))
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, obs, r = rollout(state, obs, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return B * T * n_chunks / dt, compile_s


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for grouped in (False, True):
        sps, cs = measure(grouped)
        print(json.dumps({
            "metric": "cbf_filtered_env_steps_per_s_15agents_cpm",
            "mode": "grouped_m4" if grouped else "centralized",
            "value": round(sps, 1),
            "unit": "env-steps/s/chip",
            "compile_s": round(cs, 1),
        }))


if __name__ == "__main__":
    main()
