"""Sub-phase micro-profile of apply_reset / spawn_positions at bench shape
(B=1024, N=15, cpm_entire), plus spawn-candidate feasibility statistics —
sizes the compact-reset budget and the candidate budget T.

Methodology: scripts/profile_micro3.py (K in-graph reps per dispatch)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = 32


def scan_time(make_body, init, n=5, name=""):
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
    print(f"{name:44s} {ms:8.4f} ms/iter  (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.reset import (
        _candidate_point_ids,
        _sample_candidate_paths,
        _sample_scenario_ids,
        apply_reset,
        spawn_positions,
    )
    from sigmarl_tpu.env.structs import zero_state

    B, N = int(os.environ.get("BENCH_B", 1024)), 15
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cfg, tables = env.cfg, env.tables
    T = cfg.max_spawn_tries
    Kp, P = tables.long_term.shape[:2]
    print(f"B={B} N={N} T={T} paths K={Kp} points P={P}")

    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # A realistic partial-reset mask: ~23% of envs fully reset (measured
    # bench reset rate).
    mask_envs = jax.random.uniform(jax.random.PRNGKey(1), (B,)) < 0.23
    mask = jnp.broadcast_to(mask_envs[:, None], (B, N))

    def jiggle(s, i):
        from sigmarl_tpu.env.structs import replace_state

        eps = (i.astype(jnp.float32) % 7) * 1e-6
        return replace_state(s, pos=s.pos + eps)

    # --- full apply_reset
    def reset_body(s, i):
        s = jiggle(s, i)
        return apply_reset(cfg, tables, s, mask, jax.random.fold_in(jax.random.PRNGKey(0), i))

    scan_time(reset_body, state, name="apply_reset (23% envs)")

    # --- spawn_positions only
    def spawn_body(s, i):
        s = jiggle(s, i)
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        pos, rot, pid, ptid = spawn_positions(
            cfg, tables, k, s.scenario_id[:, 0], s.pos, mask
        )
        from sigmarl_tpu.env.structs import replace_state

        return replace_state(s, pos=jnp.where(mask[..., None], pos, s.pos))

    scan_time(spawn_body, state, name="spawn_positions")

    # --- candidate sampling only (paths + points)
    def cand_body(s, i):
        s = jiggle(s, i)
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        k1, k2 = jax.random.split(k)
        cand_path = _sample_candidate_paths(cfg, tables, k1, s.scenario_id[:, 0], (B, N, T))
        oh = jax.nn.one_hot(cand_path, Kp, dtype=jnp.float32)
        n_pts = jnp.einsum("bntk,k->bnt", oh, tables.n_points_long_term.astype(jnp.float32)).astype(jnp.int32)
        cand_point = _candidate_point_ids(cfg, k2, n_pts, T)
        from sigmarl_tpu.env.structs import replace_state

        return replace_state(s, pos=s.pos + 1e-9 * (cand_path + cand_point)[..., :1].astype(jnp.float32).mean(-1, keepdims=True))

    scan_time(cand_body, state, name="candidate path+point sampling")

    # --- candidate position materialization (the double one-hot loop)
    hp = jax.lax.Precision.HIGHEST

    def pos_body(s, i):
        s = jiggle(s, i)
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        k1, k2 = jax.random.split(k)
        cand_path = _sample_candidate_paths(cfg, tables, k1, s.scenario_id[:, 0], (B, N, T))
        oh = jax.nn.one_hot(cand_path, Kp, dtype=jnp.float32)
        n_pts = jnp.einsum("bntk,k->bnt", oh, tables.n_points_long_term.astype(jnp.float32)).astype(jnp.int32)
        cand_point = _candidate_point_ids(cfg, k2, n_pts, T)
        chunks = []
        for t in range(T):
            ohp = jax.nn.one_hot(cand_point[:, :, t], P, dtype=jnp.float32)
            ohk = jax.nn.one_hot(cand_path[:, :, t], Kp, dtype=jnp.float32)
            rows = jnp.einsum("bnp,kpc->bnkc", ohp, tables.long_term, precision=hp)
            chunks.append(jnp.einsum("bnk,bnkc->bnc", ohk, rows, precision=hp))
        cand_pos = jnp.stack(chunks, axis=2)
        from sigmarl_tpu.env.structs import replace_state

        return replace_state(s, pos=s.pos + 1e-9 * cand_pos.mean(2))

    scan_time(pos_body, state, name="candidate positions (double one-hot)")

    # --- feasibility statistics: which candidate index gets chosen?
    def choice_stats(s, key):
        k1, k2, k3 = jax.random.split(key, 3)
        cand_path = _sample_candidate_paths(cfg, tables, k1, s.scenario_id[:, 0], (B, N, T))
        oh = jax.nn.one_hot(cand_path, Kp, dtype=jnp.float32)
        n_pts = jnp.einsum("bntk,k->bnt", oh, tables.n_points_long_term.astype(jnp.float32)).astype(jnp.int32)
        cand_point = _candidate_point_ids(cfg, k3, n_pts, T)
        chunks = []
        for t in range(T):
            ohp = jax.nn.one_hot(cand_point[:, :, t], P, dtype=jnp.float32)
            ohk = jax.nn.one_hot(cand_path[:, :, t], Kp, dtype=jnp.float32)
            rows = jnp.einsum("bnp,kpc->bnkc", ohp, tables.long_term, precision=hp)
            chunks.append(jnp.einsum("bnk,bnkc->bnc", ohk, rows, precision=hp))
        cand_pos = jnp.stack(chunks, axis=2)

        full = jnp.ones((B, N), bool)
        placed_pos = s.pos
        placed_mask = ~full
        choices = []
        anyf = []
        for n in range(N):
            c_pos = cand_pos[:, n]
            diff = c_pos[:, :, None, :] - placed_pos[:, None, :, :]
            dist2 = jnp.sum(diff * diff, axis=-1)
            dist2 = jnp.where(placed_mask[:, None, :], dist2, jnp.inf)
            feasible = dist2.min(axis=-1) >= cfg.reset_agent_min_distance**2
            first = jnp.argmax(feasible, axis=-1)
            any_f = feasible.any(axis=-1)
            choice = jnp.where(any_f, first, T - 1)
            pos_n = jnp.take_along_axis(c_pos, choice[:, None, None], axis=1)[:, 0]
            placed_pos = placed_pos.at[:, n].set(pos_n)
            placed_mask = placed_mask.at[:, n].set(True)
            choices.append(choice)
            anyf.append(any_f)
        return jnp.stack(choices, 1), jnp.stack(anyf, 1)

    ch, af = jax.jit(choice_stats)(state, jax.random.PRNGKey(5))
    ch = np.asarray(ch)
    af = np.asarray(af)
    print(f"spawn choice idx: mean={ch.mean():.2f} p90={np.percentile(ch,90):.0f} "
          f"p99={np.percentile(ch,99):.0f} p999={np.percentile(ch,99.9):.0f} max={ch.max()}")
    print(f"all-infeasible rate: {(~af).mean():.2e}")


if __name__ == "__main__":
    main()


def post_phases():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.env.structs import replace_state
    from sigmarl_tpu.env.updates import (
        push_state_buffer,
        refresh_geometry_after_reset,
        update_short_term_paths,
    )

    B, N = int(os.environ.get("BENCH_B", 1024)), 15
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cfg, tables = env.cfg, env.tables
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    mask_envs = jax.random.uniform(jax.random.PRNGKey(1), (B,)) < 0.23
    mask = jnp.broadcast_to(mask_envs[:, None], (B, N))

    def jiggle(s, i):
        return replace_state(s, pos=s.pos + 1e-7 * (i + 1))

    def b_refresh(s, i):
        s = jiggle(s, i)
        return refresh_geometry_after_reset(cfg, tables, s, mask)

    def b_short(s, i):
        s = jiggle(s, i)
        return update_short_term_paths(cfg, tables, s, at_reset=True)

    def b_push(s, i):
        s = jiggle(s, i)
        return push_state_buffer(s)

    scan_time(b_refresh, state, name="refresh_geometry_after_reset")
    scan_time(b_short, state, name="update_short_term_paths at_reset")
    scan_time(b_push, state, name="push_state_buffer")


if __name__ == "__main__":
    pass
