"""Dispatch-amortized micro-profile (tunnel-proof).

The axon TPU is reached through a tunnel with ~3 ms per-dispatch RPC
latency, which floors any per-op host timing (scripts/profile_micro2.py's
numbers are all ~3-4 ms regardless of op). Here every op runs K times
inside ONE jitted lax.scan — per-iteration cost = (t_scan - t_dispatch)/K.
Each iteration perturbs its input by a tiny iteration-dependent amount so
XLA cannot hoist the loop-invariant computation out of the scan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = 32  # in-graph repetitions per dispatch


def scan_time(make_body, init, n=5, name=""):
    """Time K in-graph repetitions of body (one dispatch), return ms/iter."""

    def run(carry):
        def body(c, i):
            return make_body(c, i), ()

        c, _ = jax.lax.scan(body, carry, jnp.arange(K))
        return c

    jrun = jax.jit(run)
    t0 = time.perf_counter()
    out = jrun(init)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = jrun(out)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / (n * K)
    print(f"{name:40s} {ms:8.4f} ms/iter  (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.map_tables import lookup, path_onehot
    from sigmarl_tpu.env.observations import observe
    from sigmarl_tpu.env.rewards import compute_rewards
    from sigmarl_tpu.env.updates import (
        latest_state_record,
        update_geometry,
        update_short_term_paths,
    )
    from sigmarl_tpu.env.structs import replace_state
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.pseudo_distance import pseudo_distance_seg
    from sigmarl_tpu.safety.qp import solve_structured_qp

    B = int(os.environ.get("PROF_B", 1024))
    N, C = 15, 3
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cfg, tables = env.cfg, env.tables
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=N, n_circles=C, dt=0.1, newton_iters=8),
        cfg, tables,
    )
    key = jax.random.PRNGKey(0)
    state, obs = jax.jit(env.reset)(key)
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.3)
    step = jax.jit(env.step)
    for i in range(3):
        state, obs, *_ = step(state, act, jax.random.PRNGKey(i))
    jax.block_until_ready(state.pos)

    def jiggle(s, i):
        # Tiny iteration-dependent perturbation defeats loop hoisting while
        # keeping the state physically valid.
        return replace_state(s, pos=s.pos + 1e-7 * (i + 1))

    res = {}

    # Baseline: the jiggle alone (scan overhead floor).
    res["scan_floor"] = scan_time(lambda s, i: jiggle(s, i), state,
                                  name="scan floor (jiggle only)")

    res["env_step"] = scan_time(
        lambda s, i: step(jiggle(s, i), act, jax.random.PRNGKey(0))[0],
        state, name="full env.step")

    res["update_geometry"] = scan_time(
        lambda s, i: update_geometry(cfg, tables, jiggle(s, i)),
        state, name="update_geometry")

    res["short_term"] = scan_time(
        lambda s, i: update_short_term_paths(cfg, tables, jiggle(s, i)),
        state, name="update_short_term_paths")

    def obs_body(s, i):
        s = jiggle(s, i)
        o = observe(cfg, tables, s, jax.random.PRNGKey(0))
        return replace_state(s, pos=s.pos + 1e-12 * o.sum())

    res["observe"] = scan_time(obs_body, state, name="observe")

    prev = jax.jit(latest_state_record)(state)

    def rew_body(s, i):
        s = jiggle(s, i)
        r = compute_rewards(cfg, s, prev[..., 0:2], s.short_term,
                            env.weighting_ref)[0]
        return replace_state(s, pos=s.pos + 1e-12 * r.sum())

    res["rewards"] = scan_time(rew_body, state, name="compute_rewards")

    # --- CBF phases
    def lane_body(s, i):
        s = jiggle(s, i)
        from sigmarl_tpu.safety.circles import circle_centers_world

        centers = circle_centers_world(cbf.approx, s.pos, s.rot)
        (smL, gL, HL), (smR, gR, HR) = cbf._lane_terms(
            centers, s.path_id, s.idx_left, s.idx_right
        )
        return replace_state(s, pos=s.pos + 1e-12 * (smL.sum() + smR.sum()))

    res["lane_terms_stencil"] = scan_time(
        lane_body, state, name="lane stencil (pseudo-dist 27q x 2 sides)")

    def pd_only_body(s, i):
        s = jiggle(s, i)
        oh = path_onehot(s.path_id, tables.left_boundary.shape[0])
        lseg = lookup(oh, tables.left_seg)
        q = s.pos[:, :, None, :] + jnp.arange(27)[None, None, :, None] * 1e-4
        d = pseudo_distance_seg(q, lseg)
        return replace_state(s, pos=s.pos + 1e-12 * d.sum())

    res["pd_27q_oneside"] = scan_time(
        pd_only_body, state, name="pseudo_distance_seg 27q one side")

    def assemble_body(s, i):
        s = jiggle(s, i)
        cons, u_nom, _, _ = cbf.assemble(s, act)
        return replace_state(s, pos=s.pos + 1e-12 * cons.b_s.sum())

    res["assemble"] = scan_time(assemble_body, state, name="full assemble")

    cons0, u_nom0, _, _ = jax.jit(lambda s: cbf.assemble(s, act))(state)
    cons0 = cons0._replace(pair_i=cbf._pair_i, pair_j=cbf._pair_j)
    w_u = jnp.asarray([cbf.cfg.w_u_acc, cbf.cfg.w_u_steer])
    lo = jnp.asarray([cbf.a_min, cbf.rate_min])
    hi = jnp.asarray([cbf.a_max, cbf.rate_max])

    def solve_body(c, i):
        b_s, u_nom = c
        # Rebuild the constraint set around the perturbed b_s so the static
        # numpy pair index vectors never enter the scan carry.
        cons = cons0._replace(b_s=b_s)
        u, F = solve_structured_qp(cons, u_nom, w_u, lo, hi, n_iters=8)
        return (b_s + 1e-12 * F.sum(), u_nom + 1e-12 * u)

    res["qp_solve_8it"] = scan_time(
        solve_body, (cons0.b_s, u_nom0), name="solve_structured_qp (8 iters)")

    def reset_body(s, i):
        from sigmarl_tpu.env.reset import apply_reset

        s = jiggle(s, i)
        mask = jnp.zeros((B, N), bool).at[:, 0].set(True)
        return apply_reset(cfg, tables, s, mask, jax.random.PRNGKey(0))

    res["apply_reset"] = scan_time(reset_body, state, name="apply_reset (1 agent/env)")

    def dyn_body(s, i):
        from sigmarl_tpu.core.dynamics import command_step

        s = jiggle(s, i)
        pos, rot, speed, steering, sideslip, vel = command_step(
            env.bicycle, s.pos, s.rot, s.speed, s.steering, act, cfg.dt
        )
        return replace_state(s, pos=pos, rot=rot, speed=speed,
                             steering=steering, sideslip=sideslip, vel=vel)

    res["dynamics"] = scan_time(dyn_body, state, name="dynamics command_step")

    def filter_body(s, i):
        s = jiggle(s, i)
        info = cbf.filter_actions(s, act)
        return replace_state(s, pos=s.pos + 1e-12 * info.u_star.sum())

    res["filter_actions"] = scan_time(filter_body, state,
                                      name="full filter_actions")

    print(json.dumps({k: round(v, 4) for k, v in res.items()}))


if __name__ == "__main__":
    main()
