"""Micro-profile of the CBF filter internals on the real chip.

Times each sub-phase as its own compiled program over a fixed state:
lane terms (pseudo-distance stencil), full assembly, QP solve alone,
filter_actions end-to-end, env.step, policy. Used to target optimization
work (VERDICT round-1 item #1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, name=""):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / n
    print(f"{name:30s} {ms:8.3f} ms  (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.structs import zero_state
    from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.circles import circle_centers_world
    from sigmarl_tpu.safety.qp import solve_structured_qp

    B = int(os.environ.get("PROF_B", 1024))
    N, C = 15, 3
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cfg = CBFConfig(n_agents=N, n_circles=C, dt=0.1, newton_iters=10)
    cbf = CBFSafetyFilter(cfg, env.cfg, env.tables)
    policy = PolicyNet(act_dim=2)
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, N, env.obs_dim)))

    # A valid state: reset, then a few steps.
    key = jax.random.PRNGKey(0)
    state, obs = jax.jit(env.reset)(key)
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.3)
    step = jax.jit(env.step)
    for i in range(3):
        state, obs, *_ = step(state, act, jax.random.PRNGKey(i))
    jax.block_until_ready(state.pos)
    print(f"B={B} N={N} C={C}  PB={env.tables.left_boundary.shape}", flush=True)

    res = {}

    def lane_only(state):
        centers = circle_centers_world(cbf.approx, state.pos, state.rot)
        (smL, gL, HL), (smR, gR, HR) = cbf._lane_terms(
            centers, state.path_id, state.idx_left, state.idx_right
        )
        return smL, gL, HL, smR, gR, HR

    res["lane_terms"] = timeit(lane_only, state, name="lane_terms (pd stencil)")

    def assemble_only(state):
        cons, u_nom, rl_clamped, aux = cbf.assemble(state, act)
        return cons.A_s, cons.A_pi, u_nom

    res["assemble"] = timeit(assemble_only, state, name="assemble (all)")

    cons, u_nom, _, _ = jax.jit(lambda s: cbf.assemble(s, act))(state)
    # jit outputs turn the static pair maps into device arrays; restore them.
    cons = cons._replace(pair_i=cbf._pair_i, pair_j=cbf._pair_j)
    u_lo = jnp.asarray([cbf.a_min, cbf.rate_min])
    u_hi = jnp.asarray([cbf.a_max, cbf.rate_max])
    w_u = jnp.asarray([cfg.w_u_acc, cfg.w_u_steer])

    def qp_only(u_nom):
        return solve_structured_qp(cons, u_nom, w_u, u_lo, u_hi, n_iters=10)

    res["qp_solve_10it"] = timeit(qp_only, u_nom, name="qp solve (10 iters)")

    def qp_only_5(u_nom):
        return solve_structured_qp(cons, u_nom, w_u, u_lo, u_hi, n_iters=5)

    res["qp_solve_5it"] = timeit(qp_only_5, u_nom, name="qp solve (5 iters)")

    def qp_only_1(u_nom):
        return solve_structured_qp(cons, u_nom, w_u, u_lo, u_hi, n_iters=1)

    res["qp_solve_1it"] = timeit(qp_only_1, u_nom, name="qp solve (1 iter)")

    def filt(state):
        info = cbf.filter_actions(state, act)
        return info.safe_actions

    res["filter_actions"] = timeit(filt, state, name="filter_actions e2e")

    def env_only(state):
        s, o, r, d, _ = env.step(state, act, jax.random.PRNGKey(0))
        return s.pos, o, r

    res["env_step"] = timeit(env_only, state, name="env.step")

    def pol(obs):
        loc, scale = policy.apply(params, obs)
        a, _ = tanh_normal_sample(
            jax.random.PRNGKey(0), loc, scale, -env.action_limits, env.action_limits
        )
        return a

    res["policy"] = timeit(pol, obs, name="policy")

    print(json.dumps(res))


if __name__ == "__main__":
    main()
