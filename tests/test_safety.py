"""Safety-layer tests: circle cover, pseudo-distance parity, kinematic
coefficients vs autodiff ground truth, QP solver vs scipy, and end-to-end
CBF filtering behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.constants import AGENTS
from sigmarl_tpu.env import make_env
from sigmarl_tpu.safety.circles import CircleApproximation, circle_centers_world
from sigmarl_tpu.safety.kinematics import center_kinematics
from sigmarl_tpu.safety.pseudo_distance import (
    pseudo_distance_to_polyline,
    pseudo_distance_windowed,
)
from sigmarl_tpu.safety.qp import ConstraintSet, _phi_terms, solve_boxed_penalty_qp


def test_circle_cover():
    ap = CircleApproximation(0.22, 0.107, 3)
    # Every rectangle corner and edge midpoint must be inside some circle.
    pts = np.array(
        [[x, y] for x in (-0.11, 0, 0.11) for y in (-0.0535, 0, 0.0535)]
    )
    centers = ap.centers_local
    d = np.linalg.norm(pts[:, None] - centers[None], axis=-1).min(1)
    assert (d <= ap.radius + 1e-6).all()
    # Reference formula: radius = hypot(l/2n, w/2).
    assert np.isclose(ap.radius, np.hypot(0.22 / 6, 0.107 / 2))


def test_pseudo_distance_matches_reference(golden):
    from sigmarl_tpu.maps.manager import load_map

    g = golden("pseudo_distance")
    m = load_map("cpm_mixed")
    paths = m.reference_paths_intersection
    pos = jnp.asarray(g["pos"])
    for rid in range(4):
        p = paths[rid]
        left = pseudo_distance_to_polyline(
            pos[None],
            jnp.asarray(p.left_boundary_shared)[None],
            jnp.asarray(p.left_boundary_shared_pseudo_vector)[None],
        )[0]
        right = pseudo_distance_to_polyline(
            pos[None],
            jnp.asarray(p.right_boundary_shared)[None],
            jnp.asarray(p.right_boundary_shared_pseudo_vector)[None],
        )[0]
        # Reference intermediates are float16; 1e-3 covers its quantization.
        np.testing.assert_allclose(np.asarray(left), g[f"r{rid}_left"], atol=1.5e-3)
        np.testing.assert_allclose(np.asarray(right), g[f"r{rid}_right"], atol=1.5e-3)


def test_pseudo_distance_windowed_matches_full():
    from sigmarl_tpu.maps.manager import load_map

    m = load_map("cpm_mixed")
    p = m.reference_paths_intersection[0]
    bnd = jnp.asarray(p.left_boundary_shared)[None]
    tan = jnp.asarray(p.left_boundary_shared_pseudo_vector)[None]
    # Query points near the boundary (realistic CBF queries).
    mid = bnd[0, 10:40:4] + 0.05
    q = mid[None]
    full = pseudo_distance_to_polyline(q, bnd, tan)
    # Window centered at the nearest vertex.
    d2 = jnp.linalg.norm(bnd[0][None, :, :] - mid[:, None, :], axis=-1)
    centers = jnp.argmin(d2, axis=-1)
    win = jax.vmap(
        lambda pt, c: pseudo_distance_windowed(
            pt[None, None], bnd, tan, c[None], window=24
        )[0, 0]
    )(mid, centers)
    np.testing.assert_allclose(np.asarray(win), np.asarray(full[0]), atol=2e-3)


def test_center_kinematics_vs_autodiff():
    """The closed-form affine acceleration coefficients must equal the true
    second time-derivative of the circle-center trajectory (autodiff)."""
    ap = CircleApproximation(AGENTS["length"], AGENTS["width"], 3)
    l_r, l_wb = AGENTS["l_r"], AGENTS["l_wb"]
    centers_local = jnp.asarray(ap.centers_local)

    def f(state, u):
        # state: [x, y, psi, v, delta]
        x, y, psi, v, delta = state
        beta = jnp.arctan(l_r / l_wb * jnp.tan(delta))
        return jnp.array(
            [
                v * jnp.cos(psi + beta),
                v * jnp.sin(psi + beta),
                v / l_wb * jnp.tan(delta) * jnp.cos(beta),
                u[0],
                u[1],
            ]
        )

    def center_pos(state, ci):
        x, y, psi = state[0], state[1], state[2]
        ox, oy = centers_local[ci]
        return jnp.array(
            [
                x + ox * jnp.cos(psi) - oy * jnp.sin(psi),
                y + ox * jnp.sin(psi) + oy * jnp.cos(psi),
            ]
        )

    rng = np.random.RandomState(0)
    for _ in range(5):
        state = jnp.asarray(
            rng.uniform([-1, -1, -3, -0.5, -0.5], [1, 1, 3, 1.0, 0.5])
        ).astype(jnp.float32)
        u = jnp.asarray(rng.uniform(-2, 2, 2)).astype(jnp.float32)

        kins = center_kinematics(
            state[2], state[3], state[4], centers_local, l_r, l_wb
        )
        for ci in range(3):
            # First derivative of the center: J_c(s) f(s, u).
            dc = jax.jacfwd(center_pos)(state, ci) @ f(state, u)
            # Second derivative: J_{s}(dc)(s) f(s, u).
            g = lambda s: jax.jacfwd(center_pos)(s, ci) @ f(s, u)
            ddc = jax.jacfwd(g)(state) @ f(state, u)

            np.testing.assert_allclose(float(kins.dx[ci]), float(dc[0]), atol=2e-5)
            np.testing.assert_allclose(float(kins.dy[ci]), float(dc[1]), atol=2e-5)
            ddx_pred = float(kins.c_ddx[ci] + kins.a_ddx[ci] @ u)
            ddy_pred = float(kins.c_ddy[ci] + kins.a_ddy[ci] @ u)
            np.testing.assert_allclose(ddx_pred, float(ddc[0]), atol=5e-4)
            np.testing.assert_allclose(ddy_pred, float(ddc[1]), atol=5e-4)


def test_phi_elimination_exact():
    """Closed-form (s, lambda) elimination equals brute-force minimization."""
    rng = np.random.RandomState(1)
    r = jnp.asarray(rng.uniform(-2, 2, 64).astype(np.float32))
    h = jnp.asarray(rng.uniform(-1, 1, 64).astype(np.float32))
    ws = jnp.full(64, 100.0)
    wl = jnp.full(64, 3.0)
    val, dphi, _ = _phi_terms(r, h, ws, wl)

    lam_grid = np.linspace(0, 1, 4001)[None, :]
    pen = np.maximum(0.0, -(np.asarray(r)[:, None] + np.asarray(h)[:, None] * lam_grid))
    g = 3.0 * lam_grid**2 + 100.0 * pen**2
    brute = g.min(axis=1)
    np.testing.assert_allclose(np.asarray(val), brute, atol=1e-4, rtol=1e-4)


def test_qp_solver_kkt_optimality():
    """First-order optimality certificate: at the solver's output, the
    projected gradient of the (exactly eliminated) objective must vanish.
    For a convex problem this certifies the global optimum."""
    from sigmarl_tpu.safety.qp import _phi_terms as phi

    rng = np.random.RandomState(7)
    d, M, B = 6, 24, 16
    A = jnp.asarray(rng.randn(B, M, d).astype(np.float32))
    b = jnp.asarray(rng.randn(B, M).astype(np.float32) * 0.5)
    h = jnp.asarray(np.abs(rng.randn(B, M)).astype(np.float32) * 0.3)
    ws = jnp.full((B, M), 1e4)  # below the solver's internal stiffness cap
    wl = jnp.full((B, M), 1e3)
    u_nom = jnp.asarray(rng.randn(B, d).astype(np.float32))
    w_u = jnp.asarray([100.0, 1.0] * 3)
    lo, hi = jnp.full(d, -3.0), jnp.full(d, 3.0)

    cons = ConstraintSet(A=A, b=b, h=h, w_slack=ws, w_lambda=wl,
                         valid=jnp.ones((B, M), bool))
    u_star, F = solve_boxed_penalty_qp(cons, u_nom, w_u, lo, hi, n_iters=30)

    r = jnp.einsum("bmd,bd->bm", A, u_star) + b
    _, dphi, _ = phi(r, h, ws, wl)
    grad = 2 * w_u * (u_star - u_nom) + jnp.einsum("bmd,bm->bd", A, dphi)
    # Projected-gradient residual (scaled): zero at the box-constrained optimum.
    pg = u_star - jnp.clip(u_star - 1e-3 * grad, lo, hi)
    scale = 1.0 + jnp.abs(grad) * 1e-3
    assert float(jnp.abs(pg / scale).max()) < 5e-4, float(jnp.abs(pg / scale).max())


def test_qp_solver_vs_scipy():
    """The batched projected-Newton solver must match a high-accuracy scipy
    solve of the explicit QP (slack variables included) on random instances."""
    from scipy.optimize import minimize

    rng = np.random.RandomState(2)
    d, M = 4, 10
    for trial in range(4):
        A = rng.randn(M, d).astype(np.float32)
        b = rng.randn(M).astype(np.float32) * 0.5
        h = np.abs(rng.randn(M)).astype(np.float32) * 0.3
        ws = np.full(M, 100.0, np.float32)
        wl = np.full(M, 10.0, np.float32)
        u_nom = rng.randn(d).astype(np.float32)
        w_u = np.array([10.0, 1.0, 10.0, 1.0], np.float32)
        lo = np.full(d, -3.0, np.float32)
        hi = np.full(d, 3.0, np.float32)

        cons = ConstraintSet(
            A=jnp.asarray(A)[None],
            b=jnp.asarray(b)[None],
            h=jnp.asarray(h)[None],
            w_slack=jnp.asarray(ws)[None],
            w_lambda=jnp.asarray(wl)[None],
            valid=jnp.ones((1, M), bool),
        )
        u_star, F = solve_boxed_penalty_qp(
            cons, jnp.asarray(u_nom)[None], jnp.asarray(w_u),
            jnp.asarray(lo), jnp.asarray(hi), n_iters=25,
        )

        # scipy trust-constr on the explicit QP: z = [u, s, lam].
        from scipy.optimize import LinearConstraint

        nz = d + 2 * M

        def obj(z):
            u, s, lam = z[:d], z[d : d + M], z[d + M :]
            return (
                np.sum(w_u * (u - u_nom) ** 2)
                + np.sum(ws * s**2)
                + np.sum(wl * lam**2)
            )

        def grad(z):
            u, s, lam = z[:d], z[d : d + M], z[d + M :]
            return np.concatenate(
                [2 * w_u * (u - u_nom), 2 * ws * s, 2 * wl * lam]
            )

        G = np.zeros((M, nz))
        G[:, :d] = A
        G[np.arange(M), d + np.arange(M)] = 1.0  # + s
        G[np.arange(M), d + M + np.arange(M)] = h  # + h*lam
        lin = LinearConstraint(G, -b, np.inf)
        bounds = [(lo[i], hi[i]) for i in range(d)] + [(0, None)] * M + [(0, 1)] * M
        z0 = np.concatenate([np.clip(u_nom, lo, hi), np.ones(M) * 0.01, np.ones(M) * 0.5])
        res = minimize(
            obj, z0, jac=grad, method="trust-constr", bounds=bounds,
            constraints=[lin], options={"maxiter": 3000, "gtol": 1e-10, "xtol": 1e-12},
        )
        np.testing.assert_allclose(
            np.asarray(u_star[0]), res.x[:d], atol=3e-3,
            err_msg=f"trial {trial}",
        )


@pytest.fixture(scope="module")
def cbf_env():
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter

    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=4, dt=0.1,
        is_use_mtv_distance=False, is_obs_noise=False,
    )
    env = make_env(p)
    cfg = CBFConfig(n_agents=4, n_circles=3, dt=0.1)
    cbf = CBFSafetyFilter(cfg, env.cfg, env.tables)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    return env, cbf, state


def test_cbf_filter_passes_safe_actions(cbf_env):
    """A mild forward action should be passed (nearly) unchanged for most
    agents. (Individual agents may legitimately receive corrections: the
    circle radius of 0.065 m against the 0.075 m half-lane leaves ~1 cm lane
    margins, and spawn speeds are random up to 1 m/s.)"""
    env, cbf, state = cbf_env
    actions = jnp.zeros((4, 4, 2)).at[..., 0].set(0.2)
    info = jax.jit(cbf.filter_actions)(state, actions)
    assert bool(info.solved.all())
    dev = np.asarray(jnp.abs(info.safe_actions - info.nominal_actions))
    assert np.median(dev) < 0.01, np.median(dev)
    assert (dev < 0.01).mean() >= 0.5, (dev < 0.01).mean()


def test_cbf_filter_blocks_unsafe_steering(cbf_env):
    """Full-speed max-steering (drives straight into the lane boundary) must
    be modified materially more than a lane-following action."""
    env, cbf, state = cbf_env
    unsafe = jnp.zeros((4, 4, 2)).at[..., 0].set(1.0).at[..., 1].set(0.54)
    info = jax.jit(cbf.filter_actions)(state, unsafe)
    dev_steer = jnp.abs(info.safe_actions[..., 1] - info.nominal_actions[..., 1])
    # At least some agents' steering must be pulled back.
    assert float(dev_steer.max()) > 0.05, float(dev_steer.max())


def test_cbf_margin_rewards(cbf_env):
    env, cbf, state = cbf_env
    actions = jnp.zeros((4, 4, 2)).at[..., 0].set(0.5)
    rews = jax.jit(cbf.nominal_margin_rewards)(state, actions)
    for k, v in rews.items():
        v = np.asarray(v)
        assert v.shape == (4, 4)
        assert (v <= 0).all() and (v >= -1).all(), k


def test_cbf_filter_reduces_collisions():
    """Rolling out aggressive actions with the filter must produce fewer
    boundary collisions than without it."""
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter

    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=8, dt=0.1,
        is_use_mtv_distance=False, is_obs_noise=False, is_testing_mode=True,
    )
    env = make_env(p)
    cbf = CBFSafetyFilter(CBFConfig(n_agents=4, dt=0.1), env.cfg, env.tables)
    step = jax.jit(env.step)
    filt = jax.jit(cbf.filter_actions)

    def rollout(use_cbf, steps=25):
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
        colls = 0.0
        for i in range(steps):
            # Aggressive: full speed, mild fixed steering.
            acts = jnp.zeros((8, 4, 2)).at[..., 0].set(1.0).at[..., 1].set(0.1)
            if use_cbf:
                acts = filt(state, acts).safe_actions
            state, _, _, _, info = step(state, acts, jax.random.PRNGKey(100 + i))
            colls += float(info["is_collision_with_lanelets"].sum())
        return colls

    c_without = rollout(False)
    c_with = rollout(True)
    assert c_with < c_without, (c_with, c_without)


def test_hocbf_taylor_experiments():
    """TTCBF vs HOCBF point-mass obstacle avoidance (LCSS25)."""
    from sigmarl_tpu.safety import hocbf_taylor as H

    for deg in (1, 2):
        for appr, lam in (("taylor", 0.5), ("hocbf", 3.0)):
            cfg = H.HOCBFConfig(
                relative_degree=deg, approach=appr, num_steps=300, dt=0.01,
                lambda_1=lam, lambda_2=3.0,
            )
            assert H.check_initial_conditions(cfg), (deg, appr)
            t = H.run_simulation(cfg)
            assert not bool(t["collided"]), (deg, appr, float(t["h_min"]))
    # Parameter sweep produces a heatmap with both safe and unsafe regions.
    res = H.run_experiment_multi_parameters(
        H.HOCBFConfig(relative_degree=2, approach="taylor", num_steps=150),
        np.linspace(0.1, 1.0, 4), np.linspace(0.005, 0.05, 4),
    )
    assert np.isfinite(res["h_min"]).all()


def test_cbf_demo_two_agents():
    """ECC25 standalone 2-agent CBF demo: the filter prevents collisions."""
    from sigmarl_tpu.safety.cbf_demo import CBFDemoConfig, run_demo

    for scen in ("overtaking", "bypassing"):
        t = run_demo(CBFDemoConfig(scenario=scen))
        assert not t["collided"], (scen, t["h_min"])
        # The filter actually modified the nominal action at some point.
        assert np.abs(t["u"] - t["u_nom"]).max() > 1e-3


def test_cbf_demo_rl_nominal():
    """ECC25 demo with the RL-policy nominal controller (reference
    `cbf.py:445-520`): the policy's actions replace the scripted nominal and
    the filter (both-sided in bypassing, `cbf.py:524-529`) keeps the run
    collision-free."""
    import jax

    from sigmarl_tpu.safety.cbf_demo import (
        CBFDemoConfig,
        fit_rl_nominal,
        run_demo,
    )

    params, loss = fit_rl_nominal(
        CBFDemoConfig(nominal="rl"), jax.random.PRNGKey(0), n_steps=1500
    )
    assert loss < 0.5, loss
    for scen in ("overtaking", "bypassing"):
        cfg = CBFDemoConfig(scenario=scen, sm_type="c2c", nominal="rl")
        t = run_demo(cfg, rl_policy_params=params)
        assert not t["collided"], (scen, t["h_min"])

    import pytest

    with pytest.raises(ValueError):
        run_demo(CBFDemoConfig(nominal="rl"))


def test_sm_predictor_learns():
    """The MTV safety-margin net learns the distance field (small budget)."""
    from sigmarl_tpu.safety.sm_predictor import SafetyMarginEstimatorModule

    sm = SafetyMarginEstimatorModule()
    bound = sm.train(num_values=13, epochs=60, batch_size=512, verbose=False)
    assert np.isfinite(bound)
    assert bound < 0.2, bound  # coarse fit is enough at this budget
    # Gradient/Hessian are available and finite (needed by the CBF chain).
    import jax.numpy as jnp

    m, g, h = sm.margin_grad_hess(jnp.asarray([0.3, 0.1, 0.5]))
    assert np.isfinite(float(m)) and np.isfinite(np.asarray(g)).all()
    assert np.asarray(h).shape == (3, 3)


def test_structured_solver_matches_dense(cbf_env):
    """The block-sparse hot-path solver must agree with the dense reference
    solver on the actual assembled CBF constraints."""
    from sigmarl_tpu.safety.qp import solve_boxed_penalty_qp, solve_structured_qp

    env, cbf, _ = cbf_env
    # Dedicated reset seed: the minimizer comparison below needs envs whose
    # objective is small enough for fp32 to resolve (the fixture's seed-0
    # spawn happens to put every env in a high-slack crash state; spawn
    # draws shift whenever the candidate budget changes, so pin a seed
    # measured to give feasible envs).
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(11)
    actions = jax.random.uniform(key, (4, 4, 2), minval=-0.3, maxval=0.8)
    cons, u_nom, _, _ = cbf.assemble(state, actions)
    dense = cbf.to_dense(cons)

    w_u = jnp.asarray([cbf.cfg.w_u_acc, cbf.cfg.w_u_steer])
    lo = jnp.asarray([cbf.a_min, cbf.rate_min])
    hi = jnp.asarray([cbf.a_max, cbf.rate_max])

    u_struct, F_struct = solve_structured_qp(cons, u_nom, w_u, lo, hi, n_iters=25)
    B, N = u_nom.shape[:2]
    u_dense, F_dense = solve_boxed_penalty_qp(
        dense, u_nom.reshape(B, 2 * N), jnp.tile(w_u, N),
        jnp.tile(lo, N), jnp.tile(hi, N), n_iters=25,
    )
    # Objective values must agree everywhere (fp32-tight).
    np.testing.assert_allclose(
        np.asarray(F_struct), np.asarray(F_dense), rtol=1e-4, atol=1e-6
    )
    # Minimizers compared only on feasible-ish envs: on massively infeasible
    # crash states (F ~ 1e6 from stiff slack penalties) the fp32 objective
    # cannot resolve the flat tracking directions, so both solvers park at
    # equally-optimal-to-rounding points that differ in u (the reference's
    # OSQP path declares QP-INF there and falls back to the nominal action).
    feasible = np.asarray(F_struct) < 1.0
    assert feasible.any()
    # Tolerance note: 3e-3, not solver-exactness. With stiff penalty rows
    # (w_slack capped at 3e6) the fp32 objective has near-flat directions it
    # cannot resolve: measured against a float64 scipy reference solve on
    # this fixture, BOTH fp32 solvers sit ~4.4e-3 from the true optimum in
    # a flat steering coordinate while their objectives agree with the
    # optimum to ~1e-6 (the rtol=1e-4 assert above is the real agreement
    # certificate). 3e-3 = 0.03% of the accel range / 0.1% of the
    # steering-rate range.
    np.testing.assert_allclose(
        np.asarray(u_struct.reshape(B, 2 * N))[feasible],
        np.asarray(u_dense)[feasible],
        atol=3e-3,
    )


def test_pseudo_distance_seg_table_matches_full():
    """The precomputed-segment-table fast path (`segment_table` +
    `pseudo_distance_seg`) must agree with the reference-parity
    `pseudo_distance_to_polyline` on the real CPM boundary tables."""
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.safety.pseudo_distance import pseudo_distance_seg

    p = Parameters(
        scenario_type="cpm_entire", n_agents=2, num_vmas_envs=2, dt=0.1,
        max_steps=10,
    )
    env = make_env(p)
    t = env.tables
    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (5, 40, 2), minval=0.0, maxval=4.5)
    for tab_seg, tab_b, tab_pv, tab_n in (
        (t.left_seg, t.left_boundary, t.left_boundary_pseudo_vec, t.n_points_left_b),
        (t.right_seg, t.right_boundary, t.right_boundary_pseudo_vec, t.n_points_right_b),
    ):
        for k in (0, 3, 7):
            d_full = pseudo_distance_to_polyline(
                q, tab_b[k][None], tab_pv[k][None], tab_n[k][None]
            )
            d_seg = pseudo_distance_seg(q, tab_seg[k][None])
            np.testing.assert_allclose(
                np.asarray(d_seg), np.asarray(d_full), atol=1e-6
            )


def test_pseudo_distance_stencil_matches_seg():
    """The transform-sharing stencil evaluation (kept as an alternative;
    measured slower end-to-end despite fewer flops) must agree with the
    production per-query path."""
    from sigmarl_tpu.constants import AGENTS
    from sigmarl_tpu.env.map_tables import lookup, path_onehot
    from sigmarl_tpu.safety.cbf_qp import _STENCIL
    from sigmarl_tpu.safety.circles import CircleApproximation, circle_centers_world
    from sigmarl_tpu.safety.pseudo_distance import (
        pseudo_distance_seg,
        pseudo_distance_stencil,
    )

    p = Parameters(
        scenario_type="cpm_entire", n_agents=4, num_vmas_envs=8, dt=0.1,
        is_use_mtv_distance=False, is_obs_noise=False,
    )
    env = make_env(p)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    oh = path_onehot(state.path_id, env.tables.left_seg.shape[0])
    lseg = lookup(oh, env.tables.left_seg)
    C = 3
    approx = CircleApproximation(AGENTS["length"], AGENTS["width"], C)
    centers = circle_centers_world(approx, state.pos, state.rot)
    offsets = jnp.asarray(_STENCIL) * jnp.asarray([0.02, 0.02])
    B, N = state.pos.shape[:2]
    q = (centers[..., None, :] + offsets).reshape(B, N, C * 9, 2)
    a = pseudo_distance_seg(q, lseg).reshape(B, N, C, 9)
    b = pseudo_distance_stencil(centers, offsets, lseg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lane_terms_chunked_matches_full():
    """The top-k chunk-pruned stencil (production default,
    CBFConfig.pd_topk_chunks=3) must reproduce the full-scan lane terms on
    rollout states: the per-chunk bounding-circle bound is a true lower
    bound of the pseudo distance (the projection point lies ON the
    segment), so the selected chunks contain the winner everywhere the
    constraint can activate. States are driven with random actions so
    resets and off-center poses are covered (1.55 -> 0.90 ms/step on TPU
    v5e at B=1024, N=15; BENCH 142.6k -> 165.2k steps/s)."""
    import dataclasses

    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.cbf_qp import circle_centers_world

    B, N = 16, 8
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1_000_000, is_use_mtv_distance=False, is_obs_noise=False,
    )
    env = make_env(p)
    cfg = CBFConfig(n_agents=N, n_circles=3, dt=0.1, pd_topk_chunks=0)
    f_full = CBFSafetyFilter(cfg, env.cfg, env.tables)
    f_ch = CBFSafetyFilter(
        dataclasses.replace(cfg, pd_topk_chunks=3), env.cfg, env.tables
    )
    key = jax.random.PRNGKey(0)
    state, _ = jax.jit(env.reset)(key)
    step = jax.jit(lambda s, a, k: env.step(s, a, k)[0])
    lane_full = jax.jit(
        lambda c, s: f_full._lane_terms(c, s.path_id, s.idx_left, s.idx_right)
    )
    lane_ch = jax.jit(
        lambda c, s: f_ch._lane_terms(c, s.path_id, s.idx_left, s.idx_right)
    )
    for i in range(6):
        k1, k2, key = jax.random.split(key, 3)
        a = jax.random.uniform(
            k1, (B, N, 2), minval=-env.action_limits, maxval=env.action_limits
        )
        state = step(state, a, k2)
        centers = circle_centers_world(f_full.approx, state.pos, state.rot)
        ref = lane_full(centers, state)
        out = lane_ch(centers, state)
        for side_ref, side_out in zip(ref, out):
            for t_ref, t_out in zip(side_ref, side_out):
                np.testing.assert_allclose(
                    np.asarray(t_out), np.asarray(t_ref), atol=1e-5
                )
