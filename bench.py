"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): CBF-QP-filtered env steps/s/chip on
the 15-agent full CPM map — the policy forward pass, the batched
centralized CBF-QP safety filter (constraint assembly + projected-Newton
solve for all envs), and the environment step, all in one compiled
program. Target: 1e5 steps/s/chip.

One invocation measures BOTH BASELINE framings and reports them in the
single JSON line:
  - B=1024 (the per-chip sweet spot; `value` / `vs_baseline`)
  - B=4096 chunked 4x1024 (`detail.b4096_chunked` / `detail.vs_baseline_b4096`)
    — the BASELINE config-#5 batch, tiled into serial sweet-spot
    sub-batches via lax.map inside the jitted program (semantics-identical
    for independent envs; monolithic B=4096 streams HBM ~1.6x slower per
    element).
Set BENCH_B to measure a single custom framing instead.

Exactly one XLA program is compiled per framing (the T-step rollout
chunk): the warmup chunk starts from the all-zero world state, whose
guaranteed collision triggers the in-graph auto-reset — so no separate
reset program is needed (remote compiles through the chip tunnel cost
minutes each).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_S = 1.0e5


def measure(B: int, chunk: int = 1024, n_chunks: int = 5):
    """Compile and time the CBF-filtered rollout at batch B.

    Returns (steps_per_s, compile_s, n_sub)."""
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.structs import zero_state
    from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    n_sub = B // chunk if (B > chunk and B % chunk == 0) else 1
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
    # Warm-started production configuration (r5): a geometric
    # stiffness-continuation ladder (BENCH_SOFT_ITERS relaxed iterations,
    # caps soft_cap -> ws_cap) followed by BENCH_NEWTON_ITERS
    # full-stiffness iterations. Certified at THIS batch/agent scale under
    # a constant-max-accel stress rollout by
    # scripts/check_warm_start_tpu.py --batch 1024 --n_agents 15; a pure
    # 6-iteration solve converges on the small N=4 fixture but creeps on
    # ~5% of heavily-infeasible pile-up instances at this scale (see
    # PROFILE_r05.md).
    cbf = CBFSafetyFilter(
        CBFConfig(
            n_agents=N,
            n_circles=3,
            dt=0.1,
            newton_iters=int(os.environ.get("BENCH_NEWTON_ITERS", "5")),
            newton_soft_iters=int(os.environ.get("BENCH_SOFT_ITERS", "3")),
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

    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, obs, r = rollout(state, obs, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    return B * T * n_chunks / dt, compile_s, n_sub


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N = 15
    env_b = os.environ.get("BENCH_B")
    chunk = int(os.environ.get("BENCH_CHUNK", 1024))
    if env_b is not None:
        B = int(env_b)
        steps_per_s, compile_s, n_sub = measure(B, chunk)
        detail = {"batch": B, "chunks": n_sub, "compile_s": round(compile_s, 1)}
    else:
        # Both BASELINE framings in one run: the B=1024 sweet spot is the
        # headline; B=4096 (BASELINE config #5) runs chunked 4x1024.
        B = 1024
        steps_per_s, compile_s, _ = measure(1024, chunk)
        v4096, compile4_s, n_sub4 = measure(4096, chunk)
        detail = {
            "batch": B,
            "chunks": 1,
            "compile_s": round(compile_s, 1),
            "b4096_chunked": round(v4096, 1),
            "vs_baseline_b4096": round(v4096 / BASELINE_STEPS_PER_S, 3),
            "b4096_sub_batches": n_sub4,
            "compile_b4096_s": round(compile4_s, 1),
        }
    detail.update(
        {
            "n_agents": N,
            "n_circles": 3,
            "qp_per_s": round(steps_per_s, 1),
            "agent_steps_per_s": round(steps_per_s * N, 1),
        }
    )
    print(
        json.dumps(
            {
                "metric": "cbf_filtered_env_steps_per_s_15agents_cpm",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
