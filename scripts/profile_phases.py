"""Per-phase TPU timing: env step / policy / CBF filter.

Mirrors the reference's three-phase timing decomposition (time_rl /
time_cbf / time_pseudo_dis, `helper_training.py:153-155`) but measured as
compiled-program deltas: rollout chunks with (a) env only, (b) policy+env,
(c) policy+CBF+env are timed separately; differences attribute the cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.structs import zero_state
    from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    B, N, T = 1024, 15, 32
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=N, n_circles=3, dt=0.1,
                  newton_iters=10),
        env.cfg, env.tables,
    )
    policy = PolicyNet(act_dim=2)
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, N, env.obs_dim)))
    low, high = -env.action_limits, env.action_limits

    const_act = jnp.zeros((B, N, 2)).at[..., 0].set(0.3)

    def chunk_env_only(state, obs, key):
        def body(carry, k):
            state, obs = carry
            state, obs, reward, done, _ = env.step(state, const_act, k)
            return (state, obs), reward.mean()
        (state, obs), r = jax.lax.scan(body, (state, obs), jax.random.split(key, T))
        return state, obs, r.mean()

    def chunk_policy_env(state, obs, key):
        def body(carry, k):
            state, obs = carry
            k_a, k_e = jax.random.split(k)
            loc, scale = policy.apply(params, obs)
            act, _ = tanh_normal_sample(k_a, loc, scale, low, high)
            state, obs, reward, done, _ = env.step(state, act, k_e)
            return (state, obs), reward.mean()
        (state, obs), r = jax.lax.scan(body, (state, obs), jax.random.split(key, T))
        return state, obs, r.mean()

    def chunk_full(state, obs, key):
        def body(carry, k):
            state, obs = carry
            k_a, k_e = jax.random.split(k)
            loc, scale = policy.apply(params, obs)
            act, _ = tanh_normal_sample(k_a, loc, scale, low, high)
            state, obs, reward, done, _ = cbf_filtered_step(env, cbf, state, act, k_e)
            return (state, obs), reward.mean()
        (state, obs), r = jax.lax.scan(body, (state, obs), jax.random.split(key, T))
        return state, obs, r.mean()

    results = {}
    for name, fn in [("env_only", chunk_env_only),
                     ("policy_env", chunk_policy_env),
                     ("full_cbf", chunk_full)]:
        jfn = jax.jit(fn)
        state = zero_state(env.cfg)
        obs = jnp.zeros((B, N, env.obs_dim))
        t0 = time.perf_counter()
        state, obs, r = jfn(state, obs, jax.random.PRNGKey(1))
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t0
        n_chunks = 4
        t0 = time.perf_counter()
        for i in range(n_chunks):
            state, obs, r = jfn(state, obs, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        sps = B * T * n_chunks / dt
        results[name] = {"steps_per_s": round(sps, 1),
                         "ms_per_step": round(1e3 * dt / (T * n_chunks), 3),
                         "compile_s": round(compile_s, 1)}
        print(name, results[name], flush=True)

    e = results["env_only"]["ms_per_step"]
    pe = results["policy_env"]["ms_per_step"]
    f = results["full_cbf"]["ms_per_step"]
    print(json.dumps({
        "env_ms": e, "policy_ms": round(pe - e, 3), "cbf_ms": round(f - pe, 3),
        "total_ms": f,
    }))


if __name__ == "__main__":
    main()
