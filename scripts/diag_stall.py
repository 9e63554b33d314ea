"""Trace the stalled QP instance: replay the bench-scale rollout to the
worst step, slice the worst env's constraint set to B=1, and print F per
Newton iteration from (a) the warm cbf_u_prev init and (b) the default
nominal init, plus the float64 ADMM oracle objective.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.qp import solve_structured_qp
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    B, N = 1024, 15
    TARGET_STEP, TARGET_ENV = 2, 102
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1000, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    warm = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=6), env.cfg, env.tables
    )
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.5)
    step = jax.jit(lambda s, k: cbf_filtered_step(env, warm, s, act, k))
    for i in range(TARGET_STEP):
        state, obs, rew, done, info = step(state, jax.random.PRNGKey(i))

    cons, u_nom, _, _ = warm.assemble(state, act)

    def sl(x):
        return x[TARGET_ENV : TARGET_ENV + 1]

    cons1 = cons._replace(
        **{
            f: sl(getattr(cons, f))
            for f in cons._fields
            if f not in ("pair_i", "pair_j")
        }
    )
    u_nom1 = sl(u_nom)
    u_prev1 = sl(state.cbf_u_prev)

    w_u = jnp.asarray([warm.cfg.w_u_acc, warm.cfg.w_u_steer])
    lo = jnp.asarray([warm.a_min, warm.rate_min])
    hi = jnp.asarray([warm.a_max, warm.rate_max])

    # Continuation-ladder configs (now in-solver: soft_iters/soft_cap).
    for si, ni in ((0, 6), (0, 12), (2, 4), (3, 5)):
        u, F = solve_structured_qp(
            cons1, u_nom1, w_u, lo, hi, n_iters=ni, soft_iters=si
        )
        print(f"soft={si} stiff={ni}  F={float(F[0]):.6f}")

    if "--save-fixture" in sys.argv:
        out = os.path.join(
            _ROOT, "tests", "golden", "qp_creep_n15.npz"
        )
        np.savez_compressed(
            out,
            **{
                f: np.asarray(getattr(cons1, f))
                for f in cons1._fields
            },
            u_nom=np.asarray(u_nom1),
            w_u=np.asarray(w_u),
            u_lo=np.asarray(lo),
            u_hi=np.asarray(hi),
        )
        print("saved", out)



if __name__ == "__main__":
    main()
