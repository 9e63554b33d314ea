"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): CBF-QP-filtered env steps/s/chip on
the 15-agent full CPM map — the policy forward pass, the batched
centralized CBF-QP safety filter (constraint assembly + projected-Newton
solve for all envs), and the environment step, all in one compiled
program. Target: 1e5 steps/s/chip.

Exactly one XLA program is compiled (the T-step rollout chunk): the warmup
chunk starts from the all-zero world state, whose guaranteed collision
triggers the in-graph auto-reset — so no separate reset program is needed
(remote compiles through the chip tunnel cost minutes each).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_S = 1.0e5


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.structs import zero_state
    from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    import os as _os

    # Per-chip throughput peaks at B~512-1024 and decays smoothly above
    # (B=512: 123.3k, 1024: 121.4k, 2048: 109.4k, 4096 monolithic: 97.3k
    # steps/s — the broadcast-heavy geometry/constraint chains stream HBM
    # ~1.6x slower per element at 4x the working set). Larger requested
    # batches are therefore tiled into serial CHUNK-sized sub-batches via
    # lax.map — semantics-identical (every env is independent) and each
    # sub-batch runs at the sweet spot.
    B = int(_os.environ.get("BENCH_B", 1024))
    CHUNK = int(_os.environ.get("BENCH_CHUNK", 1024))
    n_sub = B // CHUNK if (B > CHUNK and B % CHUNK == 0) else 1
    Bc = B // n_sub
    N, T = 15, 32
    p = Parameters(
        scenario_type="cpm_entire",
        n_agents=N,
        num_vmas_envs=Bc,
        dt=0.1,
        max_steps=1_000_000,  # no episode-end resets during the bench
        is_use_mtv_distance=False,
        is_obs_noise=False,
        is_using_cbf_testing=True,
        is_using_centralized_cbf=True,
    )
    env = make_env(p)
    # Warm-started production configuration: 6 Newton iterations from the
    # previous step's solution reach the cold 30-iteration solve's objective
    # within 1e-3 relative (certified by tests/test_warm_start.py; measured
    # gap 9.6e-6 at 6 iters, 3.56 at 5 — the projected-arc line search
    # converges in 6).
    cbf = CBFSafetyFilter(
        CBFConfig(
            n_agents=N,
            n_circles=3,
            dt=0.1,
            newton_iters=6,
        ),
        env.cfg,
        env.tables,
    )
    policy = PolicyNet(act_dim=2)
    key = jax.random.PRNGKey(0)
    params = policy.init(key, jnp.zeros((1, N, env.obs_dim)))
    low = -env.action_limits
    high = env.action_limits

    def one_step(state, obs, k):
        k_act, k_env = jax.random.split(k)
        loc, scale = policy.apply(params, obs)
        action, _ = tanh_normal_sample(k_act, loc, scale, low, high)
        state, obs, reward, done, _ = cbf_filtered_step(
            env, cbf, state, action, k_env
        )
        return state, obs, reward.mean()

    def rollout_chunk(state, obs, key):
        def body(carry, k):
            state, obs = carry
            if n_sub == 1:
                state, obs, r = one_step(state, obs, k)
            else:
                # Serial micro-batch tiling: state/obs carry a leading
                # [n_sub] axis; each sub-batch steps at the sweet spot.
                def one(args):
                    s, o, kk = args
                    return one_step(s, o, kk)

                state, obs, r = jax.lax.map(
                    one, (state, obs, jax.random.split(k, n_sub))
                )
                r = r.mean()
            return (state, obs), r

        (state, obs), rews = jax.lax.scan(body, (state, obs), jax.random.split(key, T))
        return state, obs, rews.mean()

    rollout = jax.jit(rollout_chunk, donate_argnums=(0, 1))

    # Warmup chunk from the zero state: compiles the single program and lets
    # the in-graph auto-reset establish a valid state.
    state = zero_state(env.cfg)
    obs = jnp.zeros((Bc, N, env.obs_dim))
    if n_sub > 1:
        state = jax.tree.map(
            lambda x: jnp.zeros((n_sub, *x.shape), x.dtype), state
        )
        obs = jnp.zeros((n_sub, Bc, N, env.obs_dim))
    t0 = time.perf_counter()
    state, obs, r = rollout(state, obs, jax.random.PRNGKey(1))
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0

    n_chunks = 5
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, obs, r = rollout(state, obs, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    env_steps = B * T * n_chunks
    steps_per_s = env_steps / dt
    print(
        json.dumps(
            {
                "metric": "cbf_filtered_env_steps_per_s_15agents_cpm",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
                "detail": {
                    "batch": B,
                    "chunks": n_sub,
                    "n_agents": N,
                    "n_circles": 3,
                    "compile_s": round(compile_s, 1),
                    "qp_per_s": round(steps_per_s, 1),
                    "agent_steps_per_s": round(steps_per_s * N, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
