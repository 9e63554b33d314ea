"""First-party Pallas kernels vs their jnp reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.env import make_env
from sigmarl_tpu.env.map_tables import lookup, path_onehot
from sigmarl_tpu.ops.boundary_pallas import pseudo_distance_stencil
from sigmarl_tpu.safety.pseudo_distance import pseudo_distance_seg


def test_pseudo_distance_stencil_matches_jnp():
    """The Pallas stencil kernel must match the jnp `pseudo_distance_seg`
    path on real CPM tables with realistic agent states."""
    B, N, Q = 8, 15, 27
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=100, is_use_mtv_distance=False,
    )
    env = make_env(p)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)
    offs = jax.random.uniform(key, (B, N, Q, 2), minval=-0.05, maxval=0.05)
    q = state.pos[:, :, None, :] + offs  # [B, N, Q, 2]

    # jnp reference path (gathered tables).
    oh = path_onehot(state.path_id, env.tables.left_seg.shape[0])
    lseg = lookup(oh, env.tables.left_seg)
    rseg = lookup(oh, env.tables.right_seg)
    d_left_ref = pseudo_distance_seg(q, lseg)
    d_right_ref = pseudo_distance_seg(q, rseg)

    # Pallas kernel (interpret mode off-TPU).
    interpret = jax.default_backend() != "tpu"
    d_left, d_right = pseudo_distance_stencil(
        q.reshape(B * N, Q, 2), state.path_id.reshape(-1),
        env.tables.left_seg, env.tables.right_seg, interpret=interpret,
    )
    np.testing.assert_allclose(
        np.asarray(d_left), np.asarray(d_left_ref).reshape(B * N, Q), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_right), np.asarray(d_right_ref).reshape(B * N, Q), atol=2e-5
    )


def test_qp_newton_kernel_matches_xla():
    """The fused whole-solve QP kernel must (a) match the XLA solver
    EXACTLY for 0/1 iterations (algorithmic identity) and (b) agree with
    it in converged objective at 30 iterations (fp32 trajectories through
    branchy line-search decisions legitimately diverge in near-flat
    directions; the certificate is objective agreement, as for
    structured-vs-dense)."""
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.qp import (
        solve_structured_qp,
        solve_structured_qp_pallas,
    )

    B, N = 8, 4
    p = Parameters(
        scenario_type="cpm_mixed", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=100, is_use_mtv_distance=False, is_obs_noise=False,
    )
    env = make_env(p)
    cbf = CBFSafetyFilter(CBFConfig(n_agents=N, dt=0.1), env.cfg, env.tables)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    act = jax.random.uniform(jax.random.PRNGKey(5), (B, N, 2), minval=-0.3, maxval=0.9)
    cons, u_nom, _, _ = cbf.assemble(state, act)

    w_u = jnp.asarray([cbf.cfg.w_u_acc, cbf.cfg.w_u_steer])
    lo = jnp.asarray([cbf.a_min, cbf.rate_min])
    hi = jnp.asarray([cbf.a_max, cbf.rate_max])
    interpret = jax.default_backend() != "tpu"

    for it in (0, 1):
        ux, Fx = solve_structured_qp(cons, u_nom, w_u, lo, hi, n_iters=it)
        up, Fp = solve_structured_qp_pallas(
            cons, u_nom, w_u, lo, hi, n_iters=it, interpret=interpret,
        )
        # fp32-roundoff tolerance, not exact equality: interpret-mode Pallas
        # and the XLA path reassociate the line-search reductions differently,
        # which can shift a handful of controls by a few ulps (observed 4e-6
        # on 4/64 elements at the r4 HEAD).
        np.testing.assert_allclose(
            np.asarray(up), np.asarray(ux), atol=2e-5, rtol=1e-5
        )

    ux, Fx = solve_structured_qp(cons, u_nom, w_u, lo, hi, n_iters=30)
    up, Fp = solve_structured_qp_pallas(
        cons, u_nom, w_u, lo, hi, n_iters=30, interpret=interpret
    )
    rel = np.abs(np.asarray(Fp - Fx)) / (1.0 + np.abs(np.asarray(Fx)))
    assert rel.max() < 1e-4, rel.max()
