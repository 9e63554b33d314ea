"""Replay a control-parity fixture against the TPU CBF filter and print the
deviation metrics as one JSON line.

Run in its own process because the float64 parity solve needs
jax_enable_x64, which is process-global (the production filter stays fp32).

Usage: python scripts/control_deviation_check.py tests/golden/control_parity_n4.npz
"""

import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from sigmarl_tpu.config import Parameters  # noqa: E402
from sigmarl_tpu.env import make_env  # noqa: E402
from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter  # noqa: E402
from sigmarl_tpu.safety.qp import solve_structured_qp  # noqa: E402
from sigmarl_tpu.env.structs import replace_state  # noqa: E402


def main(path: str) -> dict:
    z = np.load(path)
    n_agents = int(z["n_agents"])
    scenario = str(z["scenario"])
    T, B = z["pos"].shape[:2]

    p = Parameters(
        scenario_type=scenario, n_agents=n_agents, num_vmas_envs=B, dt=0.1,
        max_steps=10_000, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    # Parity configuration: float64, reference fp16 pseudo-distance
    # quantization replicated, lambda cost active (reference
    # main_eval.py:124), slack stiffness uncapped like the reference's 1e9.
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=n_agents, dt=0.1, newton_iters=100,
                  adaptive_lambda_cost=True, fp16_parity=True),
        env.cfg, env.tables,
    )
    # Production configuration (fp32 math on the fp64-enabled process is
    # emulated by explicit casts below).
    cbf_prod = CBFSafetyFilter(
        CBFConfig(n_agents=n_agents, dt=0.1, newton_iters=8,
                  adaptive_lambda_cost=True),
        env.cfg, env.tables,
    )
    # Production fp32 but with the reference's fp16 pseudo-distance
    # quantization matched: isolates our-fp32-solver deviation from the
    # reference-quantization difference in the headline prod number.
    cbf_prod16 = CBFSafetyFilter(
        CBFConfig(n_agents=n_agents, dt=0.1, newton_iters=8,
                  adaptive_lambda_cost=True, fp16_parity=True),
        env.cfg, env.tables,
    )

    w_u = jnp.asarray([cbf.cfg.w_u_acc, cbf.cfg.w_u_steer], jnp.float64)
    lo = jnp.asarray([cbf.a_min, cbf.rate_min], jnp.float64)
    hi = jnp.asarray([cbf.a_max, cbf.rate_max], jnp.float64)

    state0, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))

    def filter_f64(state, act):
        cons, u_nom, _, _ = cbf.assemble(state, act)
        cons = cons._replace(**{
            f: getattr(cons, f).astype(jnp.float64)
            for f in ["A_s", "b_s", "h_s", "ws_s", "wl_s",
                      "A_pi", "A_pj", "b_p", "h_p", "ws_p", "wl_p"]
        })
        u, _ = solve_structured_qp(
            cons, u_nom.astype(jnp.float64), w_u, lo, hi,
            n_iters=100, ws_cap=1e12,
        )
        return u

    def filter_prod(cbf_p, state, act, u_prev):
        f32 = lambda x: x.astype(jnp.float32)
        state32 = jax.tree.map(
            lambda x: f32(x) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            state,
        )
        info = cbf_p.filter_actions(
            state32, f32(act),
            u_init=None if u_prev is None else f32(u_prev),
        )
        return info.u_star

    devs_f64, devs_prod, devs_prod16 = [], [], []
    u_prev = None
    u_prev16 = None
    for t in range(T):
        state = replace_state(state0,
            pos=jnp.asarray(z["pos"][t], jnp.float64),
            rot=jnp.asarray(z["rot"][t], jnp.float64),
            speed=jnp.asarray(z["speed"][t], jnp.float64),
            steering=jnp.asarray(z["steering"][t], jnp.float64),
            path_id=jnp.asarray(z["path_id"][t]),
        )
        act = jnp.asarray(z["act"][t], jnp.float64)
        u_ref = z["u_ref"][t]

        u64 = np.asarray(filter_f64(state, act))
        u32 = np.asarray(filter_prod(cbf_prod, state, act, u_prev))
        u16 = np.asarray(filter_prod(cbf_prod16, state, act, u_prev16))
        u_prev = jnp.asarray(u32)
        u_prev16 = jnp.asarray(u16)
        devs_f64.append(np.abs(u64 - u_ref).max())
        devs_prod.append(np.abs(u32 - u_ref).max())
        devs_prod16.append(np.abs(u16 - u_ref).max())

    return {
        "fixture": os.path.basename(path),
        "steps": T,
        "max_dev_f64": float(np.max(devs_f64)),
        "mean_dev_f64": float(np.mean(devs_f64)),
        "max_dev_prod_fp32": float(np.max(devs_prod)),
        "mean_dev_prod_fp32": float(np.mean(devs_prod)),
        "max_dev_prod_fp32_fp16parity": float(np.max(devs_prod16)),
        "mean_dev_prod_fp32_fp16parity": float(np.mean(devs_prod16)),
    }


if __name__ == "__main__":
    print(json.dumps(main(sys.argv[1])))
