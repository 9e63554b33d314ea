"""Prototype + profile variants of update_geometry's boundary sweeps at
bench shape (B=1024, N=15). Verifies numerics against the production path
on the same inputs, then times each variant (profile_micro3 methodology)."""

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
    print(f"{name:46s} {ms:8.4f} ms/iter  (compile {compile_s:.1f}s)", flush=True)
    return ms


def perp_baseline(point, polyline, n_valid):
    from sigmarl_tpu.core.geometry import perpendicular_distances

    return perpendicular_distances(point, polyline, n_valid)


def perp_sq(point, polyline, n_valid, need_idx=True):
    """Squared-distance variant: one sqrt at the end instead of per segment."""
    starts = polyline[..., :-1, :]
    vecs = polyline[..., 1:, :] - starts
    rel = point[..., None, :] - starts
    len2 = jnp.sum(vecs * vecs, axis=-1)
    t = jnp.sum(rel * vecs, axis=-1) / jnp.maximum(len2, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    closest = starts + vecs * t[..., None]
    diff = closest - point[..., None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    n_seg = d2.shape[-1]
    seg_idx = jnp.arange(n_seg)
    end_idx = jnp.maximum(n_valid - 2, 0).astype(jnp.int32)
    d_end = jnp.sum(
        jnp.where(seg_idx == end_idx[..., None], d2, 0.0), axis=-1, keepdims=True
    )
    d2 = jnp.where(seg_idx >= (n_valid[..., None] - 1), d_end, d2)
    dist = jnp.sqrt(jnp.min(d2, axis=-1))
    if need_idx:
        idx = jnp.argmin(d2, axis=-1).astype(jnp.int32) + 1
        return dist, idx
    return dist, None


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.core import geometry as G
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.map_tables import lookup, path_onehot

    B, N = int(os.environ.get("BENCH_B", 1024)), 15
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cfg, tables = env.cfg, env.tables
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    pos, rot, pid = state.pos, state.rot, state.path_id
    half_w = cfg.agent_width / 2

    verts = G.rectangle_vertices(pos, rot, cfg.agent_width, cfg.agent_length, True)
    v4 = verts[..., 0:4, :]

    oh = path_onehot(pid, tables.long_term.shape[0])
    lt = lookup(oh, tables.long_term)
    n_lt = lookup(oh, tables.n_points_long_term)
    lb = lookup(oh, tables.left_boundary)
    rb = lookup(oh, tables.right_boundary)
    n_lb = lookup(oh, tables.n_points_left_b)
    n_rb = lookup(oh, tables.n_points_right_b)

    # ---------- numerics: variant vs production on identical inputs
    def prod(pos, v4, lt, lb, rb):
        d_ref, idx_ref = perp_baseline(pos, lt, n_lt)
        dl0, idx_left = perp_baseline(pos, lb, n_lb)
        dr0, idx_right = perp_baseline(pos, rb, n_rb)
        dlv, _ = perp_baseline(v4, lb[..., None, :, :], n_lb[..., None])
        drv, _ = perp_baseline(v4, rb[..., None, :, :], n_rb[..., None])
        d_left = jnp.concatenate([(dl0 - half_w)[..., None], dlv], axis=-1)
        d_right = jnp.concatenate([(dr0 - half_w)[..., None], drv], axis=-1)
        return d_ref, idx_ref, idx_left, idx_right, d_left, d_right

    def variant(pos, v4, lt, lb, rb):
        d_ref, idx_ref = perp_sq(pos, lt, n_lt)
        # One stacked sweep per boundary: queries [B, N, 5, 2] = center+4.
        q = jnp.concatenate([pos[..., None, :], v4], axis=-2)
        dl, idx_l5 = perp_sq(q, lb[..., None, :, :], n_lb[..., None])
        dr, idx_r5 = perp_sq(q, rb[..., None, :, :], n_rb[..., None])
        idx_left = idx_l5[..., 0]
        idx_right = idx_r5[..., 0]
        d_left = dl.at[..., 0].add(-half_w)
        d_right = dr.at[..., 0].add(-half_w)
        return d_ref, idx_ref, idx_left, idx_right, d_left, d_right

    a = jax.jit(prod)(pos, v4, lt, lb, rb)
    b = jax.jit(variant)(pos, v4, lt, lb, rb)
    for i, (x, y) in enumerate(zip(a, b)):
        x, y = np.asarray(x), np.asarray(y)
        if x.dtype == np.int32:
            n_diff = (x != y).mean()
            print(f"out[{i}] int: mismatch frac {n_diff:.2e}")
        else:
            print(f"out[{i}] max abs diff {np.abs(x - y).max():.3e}")

    # ---------- timing
    def body_prod(c, i):
        pos_i = pos + (i % 7).astype(jnp.float32) * 1e-6
        v4_i = v4 + (i % 7).astype(jnp.float32) * 1e-6
        out = prod(pos_i, v4_i, lt, lb, rb)
        return c + out[0].mean() + out[4].mean()

    def body_var(c, i):
        pos_i = pos + (i % 7).astype(jnp.float32) * 1e-6
        v4_i = v4 + (i % 7).astype(jnp.float32) * 1e-6
        out = variant(pos_i, v4_i, lt, lb, rb)
        return c + out[0].mean() + out[4].mean()

    def body_lookups(c, i):
        oh_i = path_onehot((pid + (i % 2)) % tables.long_term.shape[0], tables.long_term.shape[0])
        return (
            c
            + lookup(oh_i, tables.long_term).mean()
            + lookup(oh_i, tables.left_boundary).mean()
            + lookup(oh_i, tables.right_boundary).mean()
        )

    def body_interx(c, i):
        v_i = verts + (i % 7).astype(jnp.float32) * 1e-6
        pair_hit = G.interx(v_i[:, :, None], v_i[:, None, :])
        cl = G.interx(v_i, lb) | G.interx(v_i, rb)
        return c + pair_hit.sum() + cl.sum()

    z = jnp.zeros(())
    scan_time(body_prod, z, name="5-sweep production path")
    scan_time(body_var, z, name="2-sweep stacked sq-dist variant")
    scan_time(body_lookups, z, name="table lookups (lt+lb+rb)")
    scan_time(body_interx, z, name="interX (pair + lanelet)")


if __name__ == "__main__":
    main()
