"""Real-time deployment latency: per-step WALL latency at small batch.

The reference's raison d'être is the physical CPM lab — one control
decision every dt = 0.1 s (`world_state_rt_real.py:1-111`,
`eva_at25/run_models.py:20-57`). This measures the latency story the
throughput bench cannot: a single compiled step (policy forward +
centralized CBF-QP filter + env step) dispatched ONCE PER CONTROL PERIOD
with a blocking read-back each time — exactly the lab control-loop shape,
dispatch overhead included.

Prints one JSON line per batch config with mean/p50/p99 step latency (ms)
and the fraction of the 100 ms control budget used. Note: the axon chip
tunnel adds ~3 ms RPC per dispatch; a locally attached chip would be
strictly faster, so these numbers are an upper bound.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CONTROL_BUDGET_MS = 100.0  # reference dt = 0.1 s


def measure(B: int, n_agents: int = 15, n_steps: int = 300):
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    p = Parameters(
        scenario_type="cpm_entire",
        n_agents=n_agents,
        num_vmas_envs=B,
        dt=0.1,
        max_steps=1_000_000,
        is_use_mtv_distance=False,
        is_obs_noise=False,
        is_using_cbf_testing=True,
        is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=n_agents, n_circles=3, dt=0.1, newton_iters=5, newton_soft_iters=3),
        env.cfg,
        env.tables,
    )
    policy = PolicyNet(act_dim=2)
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, n_agents, env.obs_dim)))
    low, high = -env.action_limits, env.action_limits

    @jax.jit
    def one_step(state, obs, k):
        k_act, k_env = jax.random.split(k)
        loc, scale = policy.apply(params, obs)
        action, _ = tanh_normal_sample(k_act, loc, scale, low, high)
        state, obs, reward, done, _ = cbf_filtered_step(env, cbf, state, action, k_env)
        return state, obs, reward

    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(1))
    # Warmup: compile + settle the auto-reset transient.
    for i in range(20):
        state, obs, r = one_step(state, obs, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(r)

    lat = np.zeros(n_steps)
    for i in range(n_steps):
        t0 = time.perf_counter()
        state, obs, r = one_step(state, obs, jax.random.PRNGKey(i))
        jax.block_until_ready(r)  # control loop: block before actuating
        lat[i] = time.perf_counter() - t0
    lat_ms = lat * 1e3
    return {
        "metric": "cbf_filtered_step_latency_ms",
        "batch": B,
        "n_agents": n_agents,
        "mean": round(float(lat_ms.mean()), 2),
        "p50": round(float(np.percentile(lat_ms, 50)), 2),
        "p99": round(float(np.percentile(lat_ms, 99)), 2),
        "budget_ms": CONTROL_BUDGET_MS,
        "budget_used_pct_p99": round(float(np.percentile(lat_ms, 99)) / CONTROL_BUDGET_MS * 100, 1),
    }


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for B in (1, 16):
        print(json.dumps(measure(B)))


if __name__ == "__main__":
    main()
