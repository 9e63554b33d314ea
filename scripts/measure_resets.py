"""Measure the per-step distribution of resetting envs in the bench
workload (sizes the compact-reset budget: envs whose done flag fires per
step at B=1024 under the CBF filter)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.env import make_env
from sigmarl_tpu.env.structs import zero_state
from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample
from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
from sigmarl_tpu.safety.wrappers import cbf_filtered_step


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


    B = int(os.environ.get("BENCH_B", 1024))
    N, T = 15, 64
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=N, n_circles=3, dt=0.1, newton_iters=6),
        env.cfg, env.tables,
    )
    policy = PolicyNet(act_dim=2)
    key = jax.random.PRNGKey(0)
    params = policy.init(key, jnp.zeros((1, N, env.obs_dim)))
    low, high = -env.action_limits, env.action_limits

    def rollout_chunk(state, obs, key):
        def body(carry, k):
            state, obs = carry
            k_act, k_env = jax.random.split(k)
            loc, scale = policy.apply(params, obs)
            action, _ = tanh_normal_sample(k_act, loc, scale, low, high)
            state, obs, reward, done, _ = cbf_filtered_step(env, cbf, state, action, k_env)
            return (state, obs), done.sum()

        (state, obs), dones = jax.lax.scan(body, (state, obs), jax.random.split(key, T))
        return state, obs, dones

    rollout = jax.jit(rollout_chunk, donate_argnums=(0, 1))
    state = zero_state(env.cfg)
    obs = jnp.zeros((B, N, env.obs_dim))
    state, obs, d = rollout(state, obs, jax.random.PRNGKey(1))
    jax.block_until_ready(d)

    counts = []
    for i in range(6):
        state, obs, d = rollout(state, obs, jax.random.PRNGKey(2 + i))
        counts.append(np.asarray(d))
    c = np.concatenate(counts)
    print(f"B={B} steps={len(c)}")
    print(f"resets/step: mean={c.mean():.2f} p50={np.percentile(c,50):.0f} "
          f"p90={np.percentile(c,90):.0f} p99={np.percentile(c,99):.0f} max={c.max()}")
    print(f"frac steps with zero resets: {(c==0).mean():.3f}")
    for r in (8, 16, 32, 64, 128):
        print(f"  P(count > {r}) = {(c > r).mean():.4f}")


if __name__ == "__main__":
    main()
