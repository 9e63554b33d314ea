"""TPU-side warm-start certificate check (the same certificate as
tests/test_warm_start.py, run on the real chip rather than the CPU
conftest mesh). Prints one JSON line; gap < 1e-3 is the production
6-iteration configuration's validity certificate for bench.py."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.qp import solve_structured_qp
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    B, N = 4, 4
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1000, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    warm = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=6), env.cfg, env.tables
    )
    cold = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=30), env.cfg, env.tables
    )
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.5)
    step = jax.jit(lambda s, k: cbf_filtered_step(env, warm, s, act, k))

    w_u = jnp.asarray([warm.cfg.w_u_acc, warm.cfg.w_u_steer])
    lo = jnp.asarray([warm.a_min, warm.rate_min])
    hi = jnp.asarray([warm.a_max, warm.rate_max])

    max_err = 0.0
    max_gap = 0.0
    for i in range(10):
        info_cold = cold.filter_actions(state, act)
        info_warm = warm.filter_actions(state, act, u_init=state.cbf_u_prev)
        err = float(jnp.abs(info_warm.u_star - info_cold.u_star).max())
        max_err = max(max_err, err)
        cons, u_nom, _, _ = warm.assemble(state, act)
        _, F_w = solve_structured_qp(
            cons, u_nom, w_u, lo, hi, n_iters=0, u_init=info_warm.u_star
        )
        _, F_c = solve_structured_qp(
            cons, u_nom, w_u, lo, hi, n_iters=0, u_init=info_cold.u_star
        )
        gap = float(((F_w - F_c) / (1.0 + jnp.abs(F_c))).max())
        max_gap = max(max_gap, gap)
        state, obs, rew, done, info = step(state, jax.random.PRNGKey(i))

    ok = max_gap < 1e-3 and max_err < 2e-2
    print(json.dumps({
        "check": "warm_start_certificate_tpu",
        "backend": jax.default_backend(),
        "newton_iters": 6,
        "max_objective_gap": max_gap,
        "max_u_dev": max_err,
        "ok": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
