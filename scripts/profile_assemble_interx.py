"""Round-4 second experiment batch: (a) optimization_barrier after the
lane-stencil segment-table lookups in assemble, (b) pair interX over the
N(N-1)/2 triangle instead of the full NxN grid, (c) entry/exit interX
skip for all-loop maps."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.circles import circle_centers_world
    from sigmarl_tpu.safety.pseudo_distance import pseudo_distance_seg

    B, N = int(os.environ.get("BENCH_B", 1024)), 15
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cfg, tables = env.cfg, env.tables
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=N, n_circles=3, dt=0.1, newton_iters=6), cfg, tables
    )
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.3)

    def jiggle(s, i):
        return replace_state(s, pos=s.pos + 1e-7 * (i + 1), rot=s.rot + 1e-9 * (i + 1))

    # (a) assemble as-is vs stencil-with-barrier
    def assemble_body(s, i):
        s = jiggle(s, i)
        cons, u_nom, _, _ = cbf.assemble(s, act)
        return replace_state(s, pos=s.pos + 1e-12 * cons.b_s.sum())

    def stencil(s, barrier):
        centers = circle_centers_world(cbf.approx, s.pos, s.rot)
        Bv, Nv, C = centers.shape[:3]
        from sigmarl_tpu.safety.cbf_qp import _STENCIL

        offsets = jnp.asarray(_STENCIL) * jnp.asarray([cbf.cfg.dx, cbf.cfg.dy])
        q = (centers[..., None, :] + offsets).reshape(Bv, Nv, C * 9, 2)
        oh = path_onehot(s.path_id, tables.left_boundary.shape[0])
        lseg = lookup(oh, tables.left_seg)
        rseg = lookup(oh, tables.right_seg)
        if barrier:
            lseg, rseg = jax.lax.optimization_barrier((lseg, rseg))
        dl = pseudo_distance_seg(q, lseg)
        dr = pseudo_distance_seg(q, rseg)
        return dl.sum() + dr.sum()

    for barrier in (False, True):
        def body(s, i, barrier=barrier):
            s = jiggle(s, i)
            return replace_state(s, pos=s.pos + 1e-12 * stencil(s, barrier))
        scan_time(body, state, name=f"lane stencil, barrier={barrier}")

    scan_time(assemble_body, state, name="full assemble (production)")

    # (b) pair interX full grid vs triangle
    pair_i = np.asarray(cbf._pair_i)
    pair_j = np.asarray(cbf._pair_j)
    P = pair_i.shape[0]
    # one-hot scatter [P] -> [N*N] (both orders for symmetry)
    M_scat = np.zeros((P, N * N), np.float32)
    M_scat[np.arange(P), pair_i * N + pair_j] = 1.0
    M_scat[np.arange(P), pair_j * N + pair_i] = 1.0
    M_scat_j = jnp.asarray(M_scat)

    def verts_of(s):
        return G.rectangle_vertices(s.pos, s.rot, cfg.agent_width, cfg.agent_length, True)

    def pair_full(s, i):
        s = jiggle(s, i)
        v = verts_of(s)
        hit = G.interx(v[:, :, None], v[:, None, :])
        eye = jnp.eye(N, dtype=bool)
        coll = hit & ~eye
        return replace_state(s, pos=s.pos + 1e-12 * coll.sum())

    def pair_tri(s, i):
        s = jiggle(s, i)
        v = verts_of(s)
        hit_p = G.interx(v[:, pair_i], v[:, pair_j])  # [B, P]
        coll = (
            jnp.einsum("bp,pm->bm", hit_p.astype(jnp.float32), M_scat_j) > 0.5
        ).reshape(-1, N, N)
        return replace_state(s, pos=s.pos + 1e-12 * coll.sum())

    # verify equality
    v = jax.jit(verts_of)(state)
    hit_full = jax.jit(lambda v: G.interx(v[:, :, None], v[:, None, :]) & ~jnp.eye(N, dtype=bool))(v)
    hit_tri = jax.jit(lambda v: (jnp.einsum(
        "bp,pm->bm", G.interx(v[:, pair_i], v[:, pair_j]).astype(jnp.float32), M_scat_j
    ) > 0.5).reshape(-1, N, N))(v)
    print("pair tri == full:", bool((hit_full == hit_tri).all()))

    scan_time(pair_full, state, name="pair interX full NxN")
    scan_time(pair_tri, state, name="pair interX triangle+scatter")

    # (c) lanelet interx + entry/exit cost split
    def lanelet_only(s, i):
        s = jiggle(s, i)
        v = verts_of(s)
        oh = path_onehot(s.path_id, tables.long_term.shape[0])
        lb, rb = jax.lax.optimization_barrier(
            (lookup(oh, tables.left_boundary), lookup(oh, tables.right_boundary))
        )
        cl = G.interx(v, lb) | G.interx(v, rb)
        return replace_state(s, pos=s.pos + 1e-12 * cl.sum())

    def entry_exit(s, i):
        s = jiggle(s, i)
        v = verts_of(s)
        oh = path_onehot(s.path_id, tables.long_term.shape[0])
        not_loop = ~lookup(oh, tables.is_loop)
        ce = G.interx(v, lookup(oh, tables.entry)) & not_loop
        cx = G.interx(v, lookup(oh, tables.exit)) & not_loop
        return replace_state(s, pos=s.pos + 1e-12 * (ce.sum() + cx.sum()))

    scan_time(lanelet_only, state, name="lanelet interX (barriered lookups)")
    scan_time(entry_exit, state, name="entry/exit interX + lookups")
    print("is_loop.all():", bool(np.asarray(tables.is_loop).all()))


if __name__ == "__main__":
    main()
