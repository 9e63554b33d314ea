"""Stiffness-continuation regression test on a real creep instance.

The fixture `tests/golden/qp_creep_n15.npz` is a single-env constraint set
captured from the B=1024/N=15 constant-max-accel stress rollout on the CPM
map (scripts/diag_stall.py --save-fixture): a heavily-infeasible pile-up
where the pure full-stiffness projected-Newton iteration creeps — 6
iterations leave the objective ~800x above the optimum (F ≈ 2450 vs 3.12)
and only ~12 reach it. The geometric stiffness-continuation ladder
(CBFConfig.newton_soft_iters) must reach the optimum within the production
budget. Reference behavior being replaced: OSQP's ADMM with thousands of
cheap iterations per instance (/root/reference/sigmarl/cbf_qp.py:1222-1260)
has no such creep mode; this test pins that our fixed-budget solver
matches that robustness on the worst measured instance class.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sigmarl_tpu.safety.qp import (
    StructuredConstraintSet,
    solve_structured_qp,
    solve_structured_qp_pallas,
)

FIX = os.path.join(os.path.dirname(__file__), "golden", "qp_creep_n15.npz")


@pytest.fixture(scope="module")
def creep():
    z = np.load(FIX)
    cons = StructuredConstraintSet(
        **{
            f: (
                np.asarray(z[f])
                if f in ("pair_i", "pair_j")
                else jnp.asarray(z[f])
            )
            for f in StructuredConstraintSet._fields
        }
    )
    return (
        cons,
        jnp.asarray(z["u_nom"]),
        jnp.asarray(z["w_u"]),
        jnp.asarray(z["u_lo"]),
        jnp.asarray(z["u_hi"]),
    )


def test_pure_stiff_budget_creeps(creep):
    """Documents the failure mode the ladder exists for: if this starts
    passing at 6 pure iterations, the ladder may no longer be needed."""
    cons, u_nom, w_u, lo, hi = creep
    _, F6 = solve_structured_qp(cons, u_nom, w_u, lo, hi, n_iters=6)
    _, F_ref = solve_structured_qp(
        cons, u_nom, w_u, lo, hi, n_iters=30, soft_iters=2
    )
    assert float(F6[0]) > 100.0 * float(F_ref[0])


def test_ladder_reaches_optimum_in_budget(creep):
    cons, u_nom, w_u, lo, hi = creep
    _, F_ref = solve_structured_qp(
        cons, u_nom, w_u, lo, hi, n_iters=30, soft_iters=2
    )
    for soft, stiff in ((2, 4), (3, 5)):
        _, F = solve_structured_qp(
            cons, u_nom, w_u, lo, hi, n_iters=stiff, soft_iters=soft
        )
        rel = (float(F[0]) - float(F_ref[0])) / (1.0 + abs(float(F_ref[0])))
        assert rel < 1e-3, (soft, stiff, float(F[0]), float(F_ref[0]))


def test_pallas_ladder_matches_xla(creep):
    cons, u_nom, w_u, lo, hi = creep
    _, Fx = solve_structured_qp(
        cons, u_nom, w_u, lo, hi, n_iters=5, soft_iters=3
    )
    _, Fp = solve_structured_qp_pallas(
        cons, u_nom, w_u, lo, hi, n_iters=5, soft_iters=3, interpret=True
    )
    # 1e-3: the certificate's relative-gap standard. On this hard instance
    # the two fp32 paths land at slightly different near-optimal points
    # (measured 4.9e-4 apart, both within 2e-3 of the 30-iter objective).
    rel = abs(float(Fp[0]) - float(Fx[0])) / (1.0 + abs(float(Fx[0])))
    assert rel < 1e-3, (float(Fp[0]), float(Fx[0]))
