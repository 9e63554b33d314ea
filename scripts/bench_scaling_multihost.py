"""True multi-process (multi-"host") weak-scaling benchmark.

Exercises the real `jax.distributed.initialize` path (SURVEY §5.8,
BASELINE: >= 80% linear scaling to 2 hosts): the launcher spawns
`--hosts` OS processes, each owning `--devices_per_host` virtual CPU
devices pinned to its own physical core (taskset), joined through a local
gRPC coordinator into ONE global mesh. The CBF-filtered rollout is jitted
over that mesh with the scenario axis sharded across hosts; the per-step
reward mean is a genuine cross-host collective.

Weak scaling: per-DEVICE batch is constant, so ideal scaling doubles
total env-steps/s per doubling of hosts. The committed result is
SCALING_r03.json.

On real TPU pods the same worker runs unchanged with
`jax.distributed.initialize()` auto-detection (no --virtual flags).

Usage (this image, 2 cores):
    python scripts/bench_scaling_multihost.py --hosts 2 --devices_per_host 1
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker(args) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_host}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.hosts > 1:
        from sigmarl_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.hosts,
            process_id=args.process_id,
        )

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.structs import zero_state
    from sigmarl_tpu.parallel.mesh import (
        make_host_device_mesh,
        make_global_state,
    )
    from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    n_global_dev = len(jax.devices())
    B = args.per_device_batch * n_global_dev
    N, T = args.n_agents, args.steps

    p = Parameters(
        scenario_type=args.scenario_type, n_agents=N, num_vmas_envs=B,
        dt=0.1, max_steps=1_000_000, is_use_mtv_distance=False,
        is_obs_noise=False, is_using_cbf_testing=True,
        is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=N, n_circles=3, dt=0.1, newton_iters=8),
        env.cfg, env.tables,
    )
    policy = PolicyNet(act_dim=2)
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, N, env.obs_dim)))
    low, high = -env.action_limits, env.action_limits

    mesh = make_host_device_mesh()
    batch_spec = P(mesh.axis_names)  # shard batch over (host, env) jointly

    def chunk(state, obs, key):
        def body(carry, k):
            state, obs = carry
            k_a, k_e = jax.random.split(k)
            loc, scale = policy.apply(params, obs)
            act, _ = tanh_normal_sample(k_a, loc, scale, low, high)
            state, obs, reward, done, _ = cbf_filtered_step(
                env, cbf, state, act, k_e
            )
            return (state, obs), reward.mean()  # cross-host collective

        (state, obs), r = jax.lax.scan(
            body, (state, obs), jax.random.split(key, T)
        )
        return state, obs, r.mean()

    jchunk = jax.jit(chunk, donate_argnums=(0, 1))

    state = make_global_state(zero_state(env.cfg), mesh, batch_spec)
    import numpy as np

    obs0 = np.zeros((B, N, env.obs_dim), np.float32)
    obs = jax.make_array_from_callback(
        obs0.shape, NamedSharding(mesh, batch_spec), lambda i: obs0[i]
    )

    from jax.experimental import multihost_utils

    with mesh:
        t0 = time.perf_counter()
        state, obs, r = jchunk(state, obs, jax.random.PRNGKey(1))
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t0
        if args.hosts > 1:
            multihost_utils.sync_global_devices("bench_start")
        t0 = time.perf_counter()
        for i in range(args.chunks):
            state, obs, r = jchunk(state, obs, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(r)
        if args.hosts > 1:
            multihost_utils.sync_global_devices("bench_end")
        dt = time.perf_counter() - t0

    if args.process_id == 0:
        sps = B * T * args.chunks / dt
        print("RESULT " + json.dumps({
            "hosts": args.hosts,
            "devices_per_host": args.devices_per_host,
            "global_devices": n_global_dev,
            "batch": B,
            "steps_per_s": round(sps, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


def launch(args) -> None:
    ncores = os.cpu_count() or 1

    def run_size(hosts: int) -> dict:
        port = _free_port()
        procs = []
        for pid in range(hosts):
            cmd = [
                sys.executable, os.path.abspath(__file__), "--worker",
                "--hosts", str(hosts), "--process_id", str(pid),
                "--coordinator", f"127.0.0.1:{port}",
                "--devices_per_host", str(args.devices_per_host),
                "--per_device_batch", str(args.per_device_batch),
                "--n_agents", str(args.n_agents),
                "--scenario_type", args.scenario_type,
                "--steps", str(args.steps),
                "--chunks", str(args.chunks),
            ]
            if ncores >= hosts:
                # One physical core per "host": without pinning, XLA's
                # per-process thread pools fight over the same cores and the
                # measurement mixes oversubscription into the scaling number.
                cmd = ["taskset", "-c", str(pid % ncores)] + cmd
            env = dict(os.environ)
            env.pop("JAX_PLATFORMS", None)
            procs.append(
                subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True, env=env)
            )
        outs = [pr.communicate(timeout=3000)[0] for pr in procs]
        for pr in procs:
            if pr.returncode != 0:
                raise RuntimeError(f"worker failed (rc={pr.returncode})")
        for o in outs:
            for line in o.splitlines():
                if line.startswith("RESULT "):
                    return json.loads(line[len("RESULT "):])
        raise RuntimeError("no RESULT line from workers")

    results = [run_size(h) for h in (1, args.hosts)]
    base = results[0]["steps_per_s"]
    summary = {
        "metric": "multihost_weak_scaling",
        "config": {
            "per_device_batch": args.per_device_batch,
            "n_agents": args.n_agents,
            "scenario": args.scenario_type,
            "devices_per_host": args.devices_per_host,
            "physical_cores": ncores,
        },
        "results": results,
        "efficiency_vs_1host": [
            round(r["steps_per_s"] / (base * r["hosts"]), 3) for r in results
        ],
    }
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--devices_per_host", type=int, default=1)
    ap.add_argument("--per_device_batch", type=int, default=128)
    ap.add_argument("--n_agents", type=int, default=15)
    ap.add_argument("--scenario_type", default="cpm_entire")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        launch(args)


if __name__ == "__main__":
    main()
