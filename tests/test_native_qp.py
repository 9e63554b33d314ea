"""Cross-validation of the batched TPU QP solver against the first-party
C++ ADMM oracle (the reference's solver family, in f64)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sigmarl_tpu.safety.qp import ConstraintSet, solve_boxed_penalty_qp

native = pytest.importorskip("sigmarl_tpu.native")


def test_oracle_solves_box_qp():
    """Sanity: min (x - t)'W(x - t) inside a box — analytic solution."""
    n = 4
    W = np.diag([1.0, 2.0, 3.0, 4.0])
    t = np.array([2.0, -2.0, 0.5, 0.0])
    P = 2 * W
    q = -2 * W @ t
    A = np.eye(n)
    l = -np.ones(n)
    u = np.ones(n)
    x, y, iters = native.solve_qp(P, q, A, l, u)
    np.testing.assert_allclose(x, np.clip(t, -1, 1), atol=1e-6)
    assert iters > 0


def test_tpu_solver_matches_admm_oracle():
    """The eliminated-variable projected-Newton solver must agree with the
    explicit-variable f64 ADMM solve of the same QP (z = [u, s, lam])."""
    rng = np.random.RandomState(11)
    d, M = 6, 20
    for trial in range(4):
        Am = rng.randn(M, d).astype(np.float64)
        b = rng.randn(M).astype(np.float64) * 0.5
        h = np.abs(rng.randn(M)).astype(np.float64) * 0.3
        ws = np.full(M, 1e4)
        wl = np.full(M, 50.0)
        u_nom = rng.randn(d).astype(np.float64)
        w_u = np.array([100.0, 1.0] * (d // 2))
        lo = np.full(d, -3.0)
        hi = np.full(d, 3.0)

        # TPU solver.
        cons = ConstraintSet(
            A=jnp.asarray(Am, jnp.float32)[None],
            b=jnp.asarray(b, jnp.float32)[None],
            h=jnp.asarray(h, jnp.float32)[None],
            w_slack=jnp.asarray(ws, jnp.float32)[None],
            w_lambda=jnp.asarray(wl, jnp.float32)[None],
            valid=jnp.ones((1, M), bool),
        )
        u_tpu, _ = solve_boxed_penalty_qp(
            cons, jnp.asarray(u_nom, jnp.float32)[None], jnp.asarray(w_u, jnp.float32),
            jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32), n_iters=30,
        )

        # Oracle on the explicit QP: z = [u (d), s (M), lam (M)].
        nz = d + 2 * M
        P = np.zeros((nz, nz))
        P[:d, :d] = 2 * np.diag(w_u)
        P[d : d + M, d : d + M] = 2 * np.diag(ws)
        P[d + M :, d + M :] = 2 * np.diag(wl)
        q = np.concatenate([-2 * w_u * u_nom, np.zeros(2 * M)])
        # Rows: A u + s + h lam >= -b; box on u; s >= 0; lam in [0, 1].
        G = np.zeros((M + nz, nz))
        G[:M, :d] = Am
        G[:M, d : d + M] = np.eye(M)
        G[:M, d + M :] = np.diag(h)
        G[M:, :] = np.eye(nz)
        lbound = np.concatenate([-b, lo, np.zeros(M), np.zeros(M)])
        ubound = np.concatenate(
            [np.full(M, 1e20), hi, np.full(M, 1e20), np.ones(M)]
        )
        x, y, iters = native.solve_qp(P, q, G, lbound, ubound)
        np.testing.assert_allclose(
            np.asarray(u_tpu[0]), x[:d], atol=3e-3, err_msg=f"trial {trial}"
        )
