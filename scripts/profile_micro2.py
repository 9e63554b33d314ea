"""Deeper micro-profile: env.step internals and QP-iteration internals."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    print(f"{name:34s} {ms:8.3f} ms  (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.core import geometry as G
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.map_tables import lookup, path_onehot
    from sigmarl_tpu.env.observations import observe
    from sigmarl_tpu.env.rewards import compute_rewards
    from sigmarl_tpu.env.updates import (
        latest_state_record,
        update_geometry,
        update_short_term_paths,
    )
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.qp import _phi_terms, solve_structured_qp

    B = int(os.environ.get("PROF_B", 1024))
    N, C = 15, 3
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cfg = env.cfg
    tables = env.tables
    cbfc = CBFConfig(n_agents=N, n_circles=C, dt=0.1, newton_iters=10)
    cbf = CBFSafetyFilter(cbfc, cfg, tables)

    key = jax.random.PRNGKey(0)
    state, obs = jax.jit(env.reset)(key)
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.3)
    step = jax.jit(env.step)
    for i in range(3):
        state, obs, *_ = step(state, act, jax.random.PRNGKey(i))
    jax.block_until_ready(state.pos)
    print(f"tables: long_term {tables.long_term.shape} lb {tables.left_boundary.shape}")

    res = {}
    res["update_geometry"] = timeit(
        lambda s: update_geometry(cfg, tables, s).d_agents, state,
        name="update_geometry")
    res["short_term"] = timeit(
        lambda s: update_short_term_paths(cfg, tables, s).short_term, state,
        name="update_short_term_paths")
    res["observe"] = timeit(
        lambda s: observe(cfg, tables, s, jax.random.PRNGKey(0)), state,
        name="observe")

    prev = jax.jit(latest_state_record)(state)
    res["rewards"] = timeit(
        lambda s: compute_rewards(cfg, s, prev[..., 0:2], s.short_term,
                                  env.weighting_ref)[0],
        state, name="compute_rewards")

    # geometry pieces
    verts = jax.jit(lambda s: G.rectangle_vertices(
        s.pos, s.rot, cfg.agent_width, cfg.agent_length, True))(state)
    oh = jax.jit(lambda s: path_onehot(s.path_id, tables.long_term.shape[0]))(state)

    res["lookups"] = timeit(
        lambda o: (lookup(o, tables.long_term), lookup(o, tables.left_boundary),
                   lookup(o, tables.right_boundary)),
        oh, name="3 table lookups (lt, lb, rb)")

    def perp_all(s, o):
        lt = lookup(o, tables.long_term)
        n_lt = lookup(o, tables.n_points_long_term)
        return G.perpendicular_distances(s.pos, lt, n_lt)

    res["perp_center"] = timeit(perp_all, state, oh, name="perp dist to center line")

    def vert_bound(s, o):
        lb = lookup(o, tables.left_boundary)
        n_lb = lookup(o, tables.n_points_left_b)
        v4 = verts[..., 0:4, :]
        return G.perpendicular_distances(v4, lb[..., None, :, :], n_lb[..., None])

    res["perp_verts"] = timeit(vert_bound, state, oh, name="perp 4 verts vs left bnd")

    def interx_bound(o):
        lb = lookup(o, tables.left_boundary)
        rb = lookup(o, tables.right_boundary)
        return G.interx(verts, lb) | G.interx(verts, rb)

    res["interx_bound"] = timeit(interx_bound, oh, name="interx verts vs boundaries")

    res["interx_agents"] = timeit(
        lambda v: G.interx(v[:, :, None], v[:, None, :]), verts,
        name="interx agent pairs")

    # ---- QP internals
    cons, u_nom, _, _ = jax.jit(lambda s: cbf.assemble(s, act))(state)
    cons = cons._replace(pair_i=cbf._pair_i, pair_j=cbf._pair_j)
    from sigmarl_tpu.safety import qp as qpmod

    consn = jax.jit(lambda c: qpmod._normalize_structured(c, 3e6))(cons)
    consn = consn._replace(pair_i=cbf._pair_i, pair_j=cbf._pair_j)

    Ks, Kp = consn.A_s.shape[2], consn.A_pi.shape[2]
    P = cbf._pair_i.shape[0]
    Ms, Mp = N * Ks, P * Kp
    M = Ms + Mp

    def flat(x_s, x_p):
        return jnp.concatenate([x_s.reshape(B, Ms), x_p.reshape(B, Mp)], axis=1)

    Ax = jax.jit(flat)(consn.A_s[..., 0], consn.A_pi[..., 0])
    b = jax.jit(flat)(consn.b_s, consn.b_p)
    h = jax.jit(flat)(consn.h_s, consn.h_p)
    ws = jax.jit(flat)(consn.ws_s, consn.ws_p)
    wl = jax.jit(flat)(consn.wl_s, consn.wl_p)

    row_i = np.concatenate([np.repeat(np.arange(N), Ks), np.repeat(cbf._pair_i, Kp)])
    Ei = jnp.asarray(np.eye(N, dtype=np.float32)[row_i])

    def resid(u):
        uxi = jnp.einsum("bx,xy->by", u[..., 0], Ei.T)
        r = Ax * uxi + b
        return _phi_terms(r, h, ws, wl)

    res["residual_phi"] = timeit(resid, u_nom, name="1 residual+phi eval (approx)")

    # Cholesky of a [B, 2N, 2N] SPD matrix
    Hm = jax.random.normal(jax.random.PRNGKey(0), (B, 2 * N, 2 * N))
    Hm = jnp.einsum("bij,bkj->bik", Hm, Hm) + 10 * jnp.eye(2 * N)

    def chol_solve(Hm, g):
        L = jnp.linalg.cholesky(Hm)
        y = jax.scipy.linalg.solve_triangular(L, g, lower=True)
        return jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)

    g = jnp.ones((B, 2 * N, 1))
    res["cholesky_solve"] = timeit(chol_solve, Hm, g, name="cholesky+2 trisolves [B,30,30]")

    res["cholesky_only"] = timeit(
        lambda H: jnp.linalg.cholesky(H), Hm, name="cholesky only")

    def lin_solve(Hm, g):
        return jnp.linalg.solve(Hm, g)

    res["linalg_solve"] = timeit(lin_solve, Hm, g, name="jnp.linalg.solve")

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
