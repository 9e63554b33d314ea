"""Variants of the corner-vertex boundary sweep at bench shape — find a
layout XLA maps well onto the TPU (the naive [B,N,4,P] broadcast chain
measures ~1.9 ms for both boundaries, far above roofline)."""

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
        return replace_state(s, pos=s.pos + 1e-7 * (i + 1), rot=s.rot + 1e-9 * (i + 1))

    def prep(s):
        verts = G.rectangle_vertices(s.pos, s.rot, cfg.agent_width, cfg.agent_length, True)
        oh = path_onehot(s.path_id, tables.long_term.shape[0])
        lb = lookup(oh, tables.left_boundary)
        rb = lookup(oh, tables.right_boundary)
        return verts[..., 0:4, :], lb, rb

    # A: current broadcast chain
    def vA(v4, bnd):
        return G.min_perpendicular_distance(v4, bnd[..., None, :, :])

    # B: loop over the 4 corners, each a [B, N] query sweep
    def vB(v4, bnd):
        ds = [G.min_perpendicular_distance(v4[..., k, :], bnd) for k in range(4)]
        return jnp.stack(ds, axis=-1)

    # C: shared per-segment precompute + dot-product assembly
    def vC(v4, bnd):
        starts = bnd[..., :-1, :]  # [B, N, S, 2]
        vecs = bnd[..., 1:, :] - starts
        len2 = jnp.sum(vecs * vecs, axis=-1)  # [B, N, S]
        inv_len2 = 1.0 / jnp.maximum(len2, 1e-12)
        av = jnp.sum(starts * vecs, axis=-1)  # [B, N, S]
        aa = jnp.sum(starts * starts, axis=-1)
        qq = jnp.sum(v4 * v4, axis=-1)  # [B, N, 4]
        # q.v and q.a via one einsum each: [B,N,4,S]
        qv = jnp.einsum("bnkc,bnsc->bnks", v4, vecs)
        qa = jnp.einsum("bnkc,bnsc->bnks", v4, starts)
        num = qv - av[:, :, None, :]
        t = jnp.clip(num * inv_len2[:, :, None, :], 0.0, 1.0)
        d2 = (
            qq[..., None] - 2.0 * qa + aa[:, :, None, :]
            - 2.0 * t * num + t * t * len2[:, :, None, :]
        )
        return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))

    # D: both boundaries concatenated into ONE sweep (halves kernel count)
    def vD(v4, lb, rb):
        bnd = jnp.concatenate([lb, rb], axis=-2)  # [B, N, 2P, 2] — NOTE: the
        # join segment between lb[-1] and rb[0] adds a phantom segment; for
        # timing only.
        return G.min_perpendicular_distance(v4, bnd[..., None, :, :])

    # verify numerics A vs B vs C
    v4, lb, rb = jax.jit(prep)(state)
    a = jax.jit(lambda: vA(v4, lb))()
    b = jax.jit(lambda: vB(v4, lb))()
    c = jax.jit(lambda: vC(v4, lb))()
    print("B vs A max diff", float(jnp.abs(a - b).max()))
    print("C vs A max diff", float(jnp.abs(a - c).max()))

    def mk(fn):
        def body(s, i):
            s = jiggle(s, i)
            v4, lb, rb = prep(s)
            acc = fn(v4, lb).sum() + fn(v4, rb).sum()
            return replace_state(s, pos=s.pos + 1e-12 * acc)

        return body

    def mkD(s, i):
        s = jiggle(s, i)
        v4, lb, rb = prep(s)
        return replace_state(s, pos=s.pos + 1e-12 * vD(v4, lb, rb).sum())

    scan_time(mk(vA), state, name="A: broadcast chain (current)")
    scan_time(mk(vB), state, name="B: per-corner loop")
    scan_time(mk(vC), state, name="C: shared-precompute dot form")
    scan_time(mkD, state, name="D: concat boundaries one sweep")


if __name__ == "__main__":
    main()
