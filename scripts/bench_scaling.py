"""Scaling benchmark: CBF-filtered rollout throughput vs mesh size.

BASELINE.md target: >= 80% linear scaling when the scenario (env batch)
axis is sharded over a growing `jax.sharding.Mesh`. Each mesh size runs the
same per-device batch (weak scaling), so ideal scaling doubles total
steps/s per doubling of devices.

On real hardware run as-is (devices = TPU chips; multi-host after
`jax.distributed.initialize`). Without multiple chips, `--virtual N` forces
N virtual CPU devices to validate the sharded program end-to-end (the
numbers then measure mechanics, not hardware scaling).

Output: one JSON line per mesh size + a summary with scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (testing the mechanics)")
    ap.add_argument("--per_device_batch", type=int, default=128)
    ap.add_argument("--n_agents", type=int, default=15)
    ap.add_argument("--scenario_type", default="cpm_entire")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--chunks", type=int, default=3)
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from jax.sharding import NamedSharding, PartitionSpec as P

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.structs import zero_state
    from sigmarl_tpu.parallel.mesh import ENV_AXIS, make_mesh, shard_world_state
    from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    all_devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= len(all_devices)]
    N, T = args.n_agents, args.steps
    results = []

    for n_dev in sizes:
        B = args.per_device_batch * n_dev
        p = Parameters(
            scenario_type=args.scenario_type, n_agents=N, num_vmas_envs=B,
            dt=0.1, max_steps=1_000_000, is_use_mtv_distance=False,
            is_obs_noise=False, is_using_cbf_testing=True,
            is_using_centralized_cbf=True,
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

        mesh = make_mesh(all_devices[:n_dev])
        env_shard = NamedSharding(mesh, P(ENV_AXIS))

        def chunk(state, obs, key):
            def body(carry, k):
                state, obs = carry
                k_a, k_e = jax.random.split(k)
                loc, scale = policy.apply(params, obs)
                act, _ = tanh_normal_sample(k_a, loc, scale, low, high)
                state, obs, reward, done, _ = cbf_filtered_step(
                    env, cbf, state, act, k_e
                )
                return (state, obs), reward.mean()

            (state, obs), r = jax.lax.scan(body, (state, obs), jax.random.split(key, T))
            return state, obs, r.mean()

        jchunk = jax.jit(chunk, donate_argnums=(0, 1))
        state = shard_world_state(zero_state(env.cfg), mesh)
        obs = jax.device_put(jnp.zeros((B, N, env.obs_dim)), env_shard)

        with mesh:
            t0 = time.perf_counter()
            state, obs, r = jchunk(state, obs, jax.random.PRNGKey(1))
            jax.block_until_ready(r)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(args.chunks):
                state, obs, r = jchunk(state, obs, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(r)
            dt = time.perf_counter() - t0

        sps = B * T * args.chunks / dt
        row = {"n_devices": n_dev, "batch": B, "steps_per_s": round(sps, 1),
               "compile_s": round(compile_s, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]["steps_per_s"]
    summary = {
        "metric": "scaling_efficiency",
        "per_device_batch": args.per_device_batch,
        "sizes": [r["n_devices"] for r in results],
        "steps_per_s": [r["steps_per_s"] for r in results],
        "efficiency_vs_1dev": [
            round(r["steps_per_s"] / (base * r["n_devices"]), 3) for r in results
        ],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
