"""Bisect update_geometry's 3.3 ms at bench shape: time progressively
stripped variants to find where the time actually goes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K_REP = 32


def scan_time(make_body, init, n=5, name=""):
    def run(carry):
        def body(c, i):
            return make_body(c, i), ()

        c, _ = jax.lax.scan(body, carry, jnp.arange(K_REP))
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
    ms = 1e3 * (time.perf_counter() - t0) / (n * K_REP)
    print(f"{name:52s} {ms:8.4f} ms/iter  (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.core import geometry as G
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.map_tables import lookup, path_onehot
    from sigmarl_tpu.env.structs import replace_state
    from sigmarl_tpu.env.updates import update_geometry

    B, N = int(os.environ.get("BENCH_B", 1024)), 15
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cfg, tables = env.cfg, env.tables
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))

    def jiggle(s, i):
        # Perturb pos AND path_id-adjacent inputs so nothing hoists.
        return replace_state(
            s,
            pos=s.pos + 1e-7 * (i + 1),
            rot=s.rot + 1e-9 * (i + 1),
        )

    def var_full(s, i):
        return update_geometry(cfg, tables, jiggle(s, i))

    def var_nocoll(s, i):
        return update_geometry(cfg, tables, jiggle(s, i), skip_collisions=True)

    half_w = cfg.agent_width / 2

    def geom_core(s, do_center=True, do_verts=True, do_ref=True):
        pos, rot = s.pos, s.rot
        verts = G.rectangle_vertices(pos, rot, cfg.agent_width, cfg.agent_length, True)
        d_agents = G.c2c_distances(pos, set_diagonal_to=cfg.world_semidiag)
        oh = path_onehot(s.path_id, tables.long_term.shape[0])
        lt = lookup(oh, tables.long_term)
        n_lt = lookup(oh, tables.n_points_long_term)
        lb = lookup(oh, tables.left_boundary)
        rb = lookup(oh, tables.right_boundary)
        n_lb = lookup(oh, tables.n_points_left_b)
        n_rb = lookup(oh, tables.n_points_right_b)
        acc = verts.sum() + d_agents.sum() + lt.sum() * 1e-9
        if do_ref:
            d_ref, idx_ref = G.perpendicular_distances(pos, lt, n_lt)
            acc = acc + d_ref.sum() + idx_ref.sum()
        if do_center:
            dl0, idx_left = G.perpendicular_distances(pos, lb, n_lb)
            dr0, idx_right = G.perpendicular_distances(pos, rb, n_rb)
            acc = acc + dl0.sum() + dr0.sum() + idx_left.sum() + idx_right.sum()
        if do_verts:
            v4 = verts[..., 0:4, :]
            dlv, _ = G.perpendicular_distances(v4, lb[..., None, :, :], n_lb[..., None])
            drv, _ = G.perpendicular_distances(v4, rb[..., None, :, :], n_rb[..., None])
            acc = acc + dlv.sum() + drv.sum()
        return acc

    def mk(fn):
        def body(s, i):
            s = jiggle(s, i)
            acc = fn(s)
            return replace_state(s, pos=s.pos + 1e-12 * acc)

        return body

    scan_time(var_full, state, name="update_geometry full")
    scan_time(var_nocoll, state, name="update_geometry skip_collisions")
    scan_time(mk(lambda s: geom_core(s, True, True, True)), state,
              name="core: lookups+vertices+all sweeps")
    scan_time(mk(lambda s: geom_core(s, True, False, True)), state,
              name="core: no vertex sweeps")
    scan_time(mk(lambda s: geom_core(s, False, False, True)), state,
              name="core: ref sweep only")
    scan_time(mk(lambda s: geom_core(s, False, False, False)), state,
              name="core: lookups+vertices only")

    def interx_body(s, i):
        s = jiggle(s, i)
        verts = G.rectangle_vertices(s.pos, s.rot, cfg.agent_width, cfg.agent_length, True)
        oh = path_onehot(s.path_id, tables.long_term.shape[0])
        lb = lookup(oh, tables.left_boundary)
        rb = lookup(oh, tables.right_boundary)
        pair_hit = G.interx(verts[:, :, None], verts[:, None, :])
        cl = G.interx(verts, lb) | G.interx(verts, rb)
        not_loop = ~lookup(oh, tables.is_loop)
        ce = G.interx(verts, lookup(oh, tables.entry)) & not_loop
        cx = G.interx(verts, lookup(oh, tables.exit)) & not_loop
        return replace_state(
            s, pos=s.pos + 1e-12 * (pair_hit.sum() + cl.sum() + ce.sum() + cx.sum())
        )

    scan_time(interx_body, state, name="collisions: interx pair+lanelet+entry/exit")


if __name__ == "__main__":
    main()


def barrier_variant():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.core import geometry as G
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.map_tables import lookup, path_onehot
    from sigmarl_tpu.env.structs import replace_state

    B, N = int(os.environ.get("BENCH_B", 1024)), 15
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cfg, tables = env.cfg, env.tables
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    half_w = cfg.agent_width / 2

    def jiggle(s, i):
        return replace_state(s, pos=s.pos + 1e-7 * (i + 1), rot=s.rot + 1e-9 * (i + 1))

    def geom_all(s, use_barrier):
        pos, rot = s.pos, s.rot
        verts = G.rectangle_vertices(pos, rot, cfg.agent_width, cfg.agent_length, True)
        d_agents = G.c2c_distances(pos, set_diagonal_to=cfg.world_semidiag)
        oh = path_onehot(s.path_id, tables.long_term.shape[0])
        lt = lookup(oh, tables.long_term)
        n_lt = lookup(oh, tables.n_points_long_term)
        lb = lookup(oh, tables.left_boundary)
        rb = lookup(oh, tables.right_boundary)
        n_lb = lookup(oh, tables.n_points_left_b)
        n_rb = lookup(oh, tables.n_points_right_b)
        if use_barrier:
            lt, lb, rb = jax.lax.optimization_barrier((lt, lb, rb))
        d_ref, idx_ref = G.perpendicular_distances(pos, lt, n_lt)
        dl0, idx_left = G.perpendicular_distances(pos, lb, n_lb)
        dr0, idx_right = G.perpendicular_distances(pos, rb, n_rb)
        v4 = verts[..., 0:4, :]
        dlv = G.min_perpendicular_distance(v4, lb[..., None, :, :])
        drv = G.min_perpendicular_distance(v4, rb[..., None, :, :])
        pair_hit = G.interx(verts[:, :, None], verts[:, None, :])
        cl = G.interx(verts, lb) | G.interx(verts, rb)
        return (verts.sum() + d_agents.sum() + d_ref.sum() + idx_ref.sum()
                + dl0.sum() + dr0.sum() + idx_left.sum() + idx_right.sum()
                + dlv.sum() + drv.sum() + pair_hit.sum() + cl.sum())

    for ub in (False, True):
        def body(s, i, ub=ub):
            s = jiggle(s, i)
            return replace_state(s, pos=s.pos + 1e-12 * geom_all(s, ub))
        scan_time(body, state, name=f"all consumers, barrier={ub}")


if __name__ == "__main__":
    pass
