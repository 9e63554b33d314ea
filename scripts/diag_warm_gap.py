"""Diagnose the bench-scale warm-start gap: which instances disagree,
how many, in which direction, and do they correlate with resets/collisions.

Usage: python scripts/diag_warm_gap.py [--batch 1024] [--n_agents 15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--n_agents", type=int, default=15)
    ap.add_argument("--warm-iters", type=int, default=6)
    ap.add_argument("--cold-iters", type=int, default=30)
    ap.add_argument("--soft-iters", type=int, default=0)
    ap.add_argument("--soft-cap", type=float, default=10.0)
    ap.add_argument("--cold-soft-iters", type=int, default=2)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument(
        "--no-warm", action="store_true",
        help="use the solver's default init instead of cbf_u_prev for the "
        "'warm' side (isolates stale-init effects from iteration count)",
    )
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.qp import solve_structured_qp
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    B, N = args.batch, args.n_agents
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1000, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    warm = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=args.warm_iters,
                  newton_soft_iters=args.soft_iters,
                  newton_soft_cap=args.soft_cap),
        env.cfg, env.tables,
    )
    cold = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=args.cold_iters,
                  newton_soft_iters=args.cold_soft_iters),
        env.cfg, env.tables,
    )
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.5)
    # Drive the rollout with the COLD filter so the per-step instance
    # sequence is identical for every warm config under test.
    step = jax.jit(lambda s, k: cbf_filtered_step(env, cold, s, act, k))

    w_u = jnp.asarray([warm.cfg.w_u_acc, warm.cfg.w_u_steer])
    lo = jnp.asarray([warm.a_min, warm.rate_min])
    hi = jnp.asarray([warm.a_max, warm.rate_max])

    @jax.jit
    def diag(state):
        info_cold = cold.filter_actions(state, act)
        u_init = None if args.no_warm else state.cbf_u_prev
        info_warm = warm.filter_actions(state, act, u_init=u_init)
        cons, u_nom, _, _ = warm.assemble(state, act)
        _, F_w = solve_structured_qp(
            cons, u_nom, w_u, lo, hi, n_iters=0, u_init=info_warm.u_star
        )
        _, F_c = solve_structured_qp(
            cons, u_nom, w_u, lo, hi, n_iters=0, u_init=info_cold.u_star
        )
        gap = (F_w - F_c) / (1.0 + jnp.abs(F_c))
        udev = jnp.abs(info_warm.u_star - info_cold.u_star).max(axis=(-2, -1))
        return gap, udev, F_w, F_c

    for i in range(args.steps):
        gap, udev, F_w, F_c = diag(state)
        g = np.asarray(gap)
        n_bad = int((np.abs(g) > 1e-3).sum())
        n_warm_worse = int((g > 1e-3).sum())
        n_cold_worse = int((g < -1e-3).sum())
        j = int(np.abs(g).argmax())
        print(json.dumps({
            "step": i,
            "n_bad_of": [n_bad, len(g)],
            "warm_worse": n_warm_worse,
            "cold_worse": n_cold_worse,
            "worst_env": j,
            "gap_worst": float(g[j]),
            "F_w_worst": float(np.asarray(F_w)[j]),
            "F_c_worst": float(np.asarray(F_c)[j]),
            "udev_worst_env": float(np.asarray(udev)[j]),
            "udev_max": float(np.asarray(udev).max()),
        }))
        state, obs, rew, done, info = step(state, jax.random.PRNGKey(i))


if __name__ == "__main__":
    main()
