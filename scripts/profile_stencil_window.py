"""Lane-stencil variants micro-bench (dispatch-amortized, TPU).

Compares the production full-scan pseudo-distance stencil (one-hot lookup
of the whole [B,N,S,8] segment table + 54-query sweep over S=176
segments) against the windowed flat-gather variant (W-segment modular
window around the tracked closest boundary vertex, gathered by flat index
straight from the stacked [K,S,8] table) and reports max deviation of the
resulting (sm, grad, hess) lane terms — both sides.

Run after `scripts/profile_micro3.py`-style warmup; see PROFILE_r05.md.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K_REPS = 32


def scan_time(make_body, init, n=5, name=""):
    def run(carry):
        def body(c, i):
            return make_body(c, i), ()

        c, _ = jax.lax.scan(body, carry, jnp.arange(K_REPS))
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
    ms = 1e3 * (time.perf_counter() - t0) / (n * K_REPS)
    print(f"{name:44s} {ms:8.4f} ms/iter  (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.cbf_qp import circle_centers_world

    B, N = 1024, 15
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)

    # Drive to a representative state with a few random steps.
    key = jax.random.PRNGKey(0)
    state, obs = jax.jit(env.reset)(key)

    @jax.jit
    def rand_step(state, k):
        k1, k2 = jax.random.split(k)
        a = jax.random.uniform(
            k1, (B, N, 2), minval=-env.action_limits, maxval=env.action_limits
        )
        state, *_ = env.step(state, a, k2)
        return state

    for i in range(10):
        state = rand_step(state, jax.random.PRNGKey(10 + i))
    jax.block_until_ready(state.pos)

    cfg = CBFConfig(n_agents=N, n_circles=3, dt=0.1, newton_iters=6)
    filt_full = CBFSafetyFilter(cfg, env.cfg, env.tables)
    variants = {"full-scan S=176": filt_full}
    windows = [int(w) for w in os.environ.get("PD_WINDOWS", "").split(",") if w]
    for W in windows:
        cw = dataclasses.replace(
            cfg, use_windowed_pseudo_distance=True, pd_window=W
        )
        variants[f"window W={W}"] = CBFSafetyFilter(cw, env.cfg, env.tables)
    chunks = [int(c) for c in os.environ.get("PD_CHUNKS", "").split(",") if c]
    for kc in chunks:
        ck = dataclasses.replace(cfg, pd_topk_chunks=kc)
        variants[f"top-{kc} chunks (16 seg)"] = CBFSafetyFilter(
            ck, env.cfg, env.tables
        )

    centers0 = jax.jit(lambda s: circle_centers_world(filt_full.approx, s.pos, s.rot))(
        state
    )

    # Correctness: compare lane terms against the full scan.
    ref = jax.jit(
        lambda c: filt_full._lane_terms(c, state.path_id, state.idx_left, state.idx_right)
    )(centers0)
    for name, f in variants.items():
        out = jax.jit(
            lambda c, f=f: f._lane_terms(c, state.path_id, state.idx_left, state.idx_right)
        )(centers0)
        dev = max(
            float(jnp.max(jnp.abs(a - b)))
            for ta, tb in zip(ref, out)
            for a, b in zip(ta, tb)
        )
        # sm-level diagnosis: rows where either program found no valid
        # projection (_BIG) are knife-edge lambda cases, counted separately
        # from real coverage misses.
        n_rows = n_big_ref = n_big_out = 0
        sm_dev_ok = 0.0
        for si in range(2):
            smr, smo = np.asarray(ref[si][0]), np.asarray(out[si][0])
            big_r, big_o = smr > 900, smo > 900
            n_big_ref += int(big_r.sum())
            n_big_out += int(big_o.sum())
            both_ok = ~big_r & ~big_o
            n_rows += smr.size
            if both_ok.any():
                sm_dev_ok = max(
                    sm_dev_ok, float(np.abs(smr - smo)[both_ok].max())
                )
        print(
            f"{name:44s} max|dev|={dev:.3e}  sm-dev(non-BIG)={sm_dev_ok:.2e}"
            f"  BIG ref/out: {n_big_ref}/{n_big_out} of {n_rows}"
        )

    # Speed: perturb centers each iteration so the sweep cannot be hoisted.
    for name, f in variants.items():
        def body(c, i, f=f):
            (smL, gL, HL), (smR, gR, HR) = f._lane_terms(
                c, state.path_id, state.idx_left, state.idx_right
            )
            bump = (smL.mean() + smR.mean() + gL.mean() + gR.mean()) * 1e-9
            return c + bump
        scan_time(body, centers0, name=name)


if __name__ == "__main__":
    main()
