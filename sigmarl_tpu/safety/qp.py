"""Batched small-QP solver for the CBF safety filter (pure JAX).

The reference solves, per env per step, one cvxpy QP with OSQP (fallback
CLARABEL -> SCS, `cbf_qp.py:1222-1260`) over variables
(u, slacks, CLF slacks, pair slacks, lambdas). On TPU we need thousands of
these QPs per step with fixed iteration bounds. Key observation: every
variable except u is *separable* given u —

  min_{s>=0}            w_s s^2   s.t.  s >= -(r + h*lam)
  min_{lam in [0,1]}    w_l lam^2 (+ the slack cost above)

— so slacks and lambdas can be eliminated in closed form, turning the QP
into a box-constrained minimization of a convex C^1 piecewise-quadratic in
u only (dimension 2N per env):

  F(u) = (u - u_nom)^T W (u - u_nom) + sum_c phi_c(a_c . u + b_c)

with phi_c the value function of the (s, lam) elimination. We solve this
with a damped projected Newton method: batched dense residuals (one
[M, d] matvec on the MXU), case-wise exact phi'/phi'', a [d, d] Cholesky
solve per env, and a fixed iteration budget with backtracking — fully
vmappable, deterministic, and exact at the optimum (same minimizer as the
reference's QP because the elimination is exact).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class ConstraintSet(NamedTuple):
    """M one-sided constraints per problem: a . u + b + h*lam >= -s.

    Shapes (leading batch dims allowed): A [..., M, d]; b, h [..., M];
    w_slack [..., M] slack penalty weight; w_lambda [..., M] lambda penalty
    weight (set h = 0 to disable the lambda channel for a row);
    valid [..., M] row mask.
    """

    A: Array
    b: Array
    h: Array
    w_slack: Array
    w_lambda: Array
    valid: Array


def _phi_terms(r: Array, h: Array, ws: Array, wl: Array) -> Tuple[Array, Array, Array]:
    """Value, first and second derivative (in r) of

        phi(r) = min_{lam in [0,1], s >= 0, s >= -(r + h lam)}  wl lam^2 + ws s^2.

    Exact closed form via candidate enumeration: the objective in lam is
    convex piecewise-quadratic with breakpoint lam0 = -r/h, so its minimum
    over [0, 1] is at one of {0, 1, clip(lam0), clip(lam_stat)} where
    lam_stat = -ws h r / (wl + ws h^2) is the stationary point of the
    penetrated piece.
    """
    h_safe = jnp.where(jnp.abs(h) > 1e-12, h, 1.0)
    lam0 = jnp.clip(-r / h_safe, 0.0, 1.0)
    lam_stat = jnp.clip(-ws * h * r / (wl + ws * h * h), 0.0, 1.0)
    zeros = jnp.zeros_like(r)
    ones = jnp.ones_like(r)

    def g(lam):
        pen = jnp.maximum(0.0, -(r + h * lam))
        return wl * lam * lam + ws * pen * pen

    cands = jnp.stack([zeros, ones, lam0, lam_stat], axis=-1)
    vals = g(cands[..., 0])
    lam_best = cands[..., 0]
    for k in range(1, 4):
        vk = g(cands[..., k])
        take = vk < vals
        vals = jnp.where(take, vk, vals)
        lam_best = jnp.where(take, cands[..., k], lam_best)

    pen = jnp.maximum(0.0, -(r + h * lam_best))
    active = pen > 0
    # Envelope theorem: dphi/dr = -2 ws s*.
    dphi = -2.0 * ws * pen
    # Curvature by case: lam* interior-stationary with s*>0 ->
    # phi = wl ws r^2 / (wl + ws h^2); lam* pinned at 0/1 with s*>0 -> 2 ws;
    # inactive -> 0.
    interior = active & (lam_best > 0) & (lam_best < 1) & (jnp.abs(h) > 1e-12)
    ddphi_int = 2.0 * wl * ws / (wl + ws * h * h)
    ddphi = jnp.where(active, jnp.where(interior, ddphi_int, 2.0 * ws), 0.0)
    return vals, dphi, ddphi


def solve_boxed_penalty_qp(
    cons: ConstraintSet,
    u_nom: Array,  # [..., d]
    w_u: Array,  # [d] diagonal tracking weights (cost: sum w_u (u-u_nom)^2)
    u_lo: Array,  # [d]
    u_hi: Array,  # [d]
    n_iters: int = 12,
    ridge: float = 1e-8,
) -> Tuple[Array, Array]:
    """Minimize F(u) over the box [u_lo, u_hi] with projected damped Newton.

    Returns (u_star [..., d], F(u_star) [...]).

    Numerical conditioning: each row is normalized by its coefficient norm
    (an exact reformulation — the slack weight scales by the squared norm),
    and the resulting slack stiffness is capped at `ws_cap`. The cap changes
    the QP only at the 1/ws_cap level (~1e-6 constraint penetration), far
    below the reference OSQP's own 1e-5 tolerance, while keeping the
    fp32 gradient noise of the stiff penalty bounded.
    """
    d = u_nom.shape[-1]

    row_norm = jnp.linalg.norm(cons.A, axis=-1)
    s = jnp.maximum(row_norm, 1e-6)
    ws_cap = 3e6
    cons = cons._replace(
        A=cons.A / s[..., None],
        b=cons.b / s,
        h=cons.h / s,
        w_slack=jnp.minimum(cons.w_slack * s * s, ws_cap),
    )  # lambda itself is unscaled, so w_lambda carries over unchanged

    def F_parts(u):
        r = jnp.einsum("...md,...d->...m", cons.A, u) + cons.b
        val, dphi, ddphi = _phi_terms(r, cons.h, cons.w_slack, cons.w_lambda)
        val = jnp.where(cons.valid, val, 0.0)
        dphi = jnp.where(cons.valid, dphi, 0.0)
        ddphi = jnp.where(cons.valid, ddphi, 0.0)
        F = jnp.sum(w_u * (u - u_nom) ** 2, axis=-1) + val.sum(axis=-1)
        grad = 2.0 * w_u * (u - u_nom) + jnp.einsum("...md,...m->...d", cons.A, dphi)
        return F, grad, ddphi

    eye = jnp.eye(d)

    def newton_step(u):
        F, grad, ddphi = F_parts(u)
        # Gauss-Newton Hessian: 2 diag(w_u) + A^T diag(phi'') A.
        H = 2.0 * jnp.einsum("d,de->de", w_u, eye) + jnp.einsum(
            "...md,...m,...me->...de", cons.A, ddphi, cons.A
        )
        H = H + ridge * eye
        step = jnp.linalg.solve(H, -grad[..., None])[..., 0]

        # Backtracking over a fixed candidate ladder (batched, branch-free).
        def trial(alpha):
            u_t = jnp.clip(u + alpha * step, u_lo, u_hi)
            F_t, _, _ = F_parts(u_t)
            return u_t, F_t

        best_u, best_F = u, F
        for alpha in (1.0, 0.5, 0.25, 0.0625):
            u_t, F_t = trial(alpha)
            take = F_t < best_F
            best_u = jnp.where(take[..., None], u_t, best_u)
            best_F = jnp.where(take, F_t, best_F)
        return best_u

    u = jnp.clip(u_nom, u_lo, u_hi)
    u = jax.lax.fori_loop(0, n_iters, lambda _, uu: newton_step(uu), u)
    F, _, _ = F_parts(u)
    return u, F


class StructuredConstraintSet(NamedTuple):
    """Block-sparse constraint set exploiting CBF structure: every row
    touches at most two agents' controls.

    Single-agent rows (lane + CLF): a . u_n + b + h*lam >= -s, shapes
    [B, N, Ks, ...]. Pair rows: ai . u_i + aj . u_j + b + h*lam >= -s,
    shapes [B, P, Kp, ...] with static pair index vectors (numpy, [P]).

    Versus the dense [B, M, 2N] form this cuts residual/gradient/Hessian
    work per Newton iteration by ~d/2 = N x and never materializes the
    dense constraint matrix (127 MB at B=1024, N=15) in HBM.
    """

    A_s: Array  # [B, N, Ks, 2]
    b_s: Array  # [B, N, Ks]
    h_s: Array  # [B, N, Ks]
    ws_s: Array  # [B, N, Ks]
    wl_s: Array  # [B, N, Ks]
    valid_s: Array  # [B, N, Ks]
    A_pi: Array  # [B, P, Kp, 2]
    A_pj: Array  # [B, P, Kp, 2]
    b_p: Array  # [B, P, Kp]
    h_p: Array  # [B, P, Kp]
    ws_p: Array  # [B, P, Kp]
    wl_p: Array  # [B, P, Kp]
    valid_p: Array  # [B, P, Kp]
    pair_i: np.ndarray  # static [P]
    pair_j: np.ndarray  # static [P]


def _normalize_structured(cons: StructuredConstraintSet, ws_cap: float):
    """Row normalization (exact reformulation, see solve_boxed_penalty_qp)."""
    ns = jnp.linalg.norm(cons.A_s, axis=-1)
    ss = jnp.maximum(ns, 1e-6)
    np_ = jnp.sqrt(
        jnp.sum(cons.A_pi**2, axis=-1) + jnp.sum(cons.A_pj**2, axis=-1)
    )
    sp = jnp.maximum(np_, 1e-6)
    return cons._replace(
        A_s=cons.A_s / ss[..., None],
        b_s=cons.b_s / ss,
        h_s=cons.h_s / ss,
        ws_s=jnp.minimum(cons.ws_s * ss * ss, ws_cap),
        A_pi=cons.A_pi / sp[..., None],
        A_pj=cons.A_pj / sp[..., None],
        b_p=cons.b_p / sp,
        h_p=cons.h_p / sp,
        ws_p=jnp.minimum(cons.ws_p * sp * sp, ws_cap),
    )


def solve_structured_qp(
    cons: StructuredConstraintSet,
    u_nom: Array,  # [B, N, 2]
    w_u: Array,  # [2]
    u_lo: Array,  # [2]
    u_hi: Array,  # [2]
    n_iters: int = 12,
    ridge: float = 1e-8,
    u_init: Array | None = None,
) -> Tuple[Array, Array]:
    """Projected damped Newton on the eliminated QP in block-sparse form.

    Same minimizer as `solve_boxed_penalty_qp` on the equivalent dense
    constraints (tests pin the agreement).

    TPU layout design: all per-row work runs on FLAT [B, M] arrays
    (M = N*Ks + P*Kp rows, ~5% lane padding) — small trailing axes like
    [B, P, Kp] or [B, N, 2] tile to (sublane, lane) shapes that waste up to
    40x of the VPU, which dominated an earlier blocked implementation.
    Row<->agent gathers/scatters are static one-hot matmuls on the MXU; the
    Gauss-Newton Hessian is accumulated per 2x2 agent block from flat
    row products and solved by batched Cholesky.

    `u_init` warm-starts the Newton iteration (e.g. with the previous
    step's solution); the minimizer is unchanged, convergence is faster.

    Returns (u_star [B, N, 2], F(u_star) [B]).
    """
    B, N = u_nom.shape[:2]
    d = 2 * N
    P = cons.pair_i.shape[0]
    Ks = cons.A_s.shape[2]
    Kp = cons.A_pi.shape[2]
    Ms, Mp = N * Ks, P * Kp
    M = Ms + Mp
    cons = _normalize_structured(cons, ws_cap=3e6)

    # ---- flatten rows: [B, M] with single rows first, then pair rows.
    def flat(x_s, x_p):
        return jnp.concatenate(
            [x_s.reshape(B, Ms), x_p.reshape(B, Mp)], axis=1
        )

    Ax = flat(cons.A_s[..., 0], cons.A_pi[..., 0])
    Ay = flat(cons.A_s[..., 1], cons.A_pi[..., 1])
    Axj = flat(jnp.zeros((B, N, Ks)), cons.A_pj[..., 0])
    Ayj = flat(jnp.zeros((B, N, Ks)), cons.A_pj[..., 1])
    b = flat(cons.b_s, cons.b_p)
    h = flat(cons.h_s, cons.h_p)
    ws = flat(cons.ws_s, cons.ws_p)
    wl = flat(cons.wl_s, cons.wl_p)
    valid = flat(cons.valid_s, cons.valid_p)

    # ---- static row->agent / row->pair maps (baked as constants).
    row_i = np.concatenate(
        [np.repeat(np.arange(N), Ks), np.repeat(cons.pair_i, Kp)]
    )  # [M]
    row_j = np.concatenate(
        [np.repeat(np.arange(N), Ks), np.repeat(cons.pair_j, Kp)]
    )
    Ei = jnp.asarray(np.eye(N, dtype=np.float32)[row_i])  # [M, N]
    Ej = jnp.asarray(np.eye(N, dtype=np.float32)[row_j])
    row_p = np.concatenate(
        [np.zeros(Ms, np.int64), np.repeat(np.arange(P), Kp)]
    )
    Ep = np.eye(P, dtype=np.float32)[row_p]
    Ep[:Ms] = 0.0  # single rows contribute to no pair block
    Ep = jnp.asarray(Ep)  # [M, P]
    ei_p = jax.nn.one_hot(jnp.asarray(cons.pair_i), N)  # [P, N]
    ej_p = jax.nn.one_hot(jnp.asarray(cons.pair_j), N)

    hp = jax.lax.Precision.HIGHEST

    def mm(a, bmat):  # [B, X] @ [X, Y] exact fp32 on the MXU
        return jnp.einsum("bx,xy->by", a, bmat, precision=hp)

    def residual(u):  # u [B, N, 2] -> r [B, M]
        uxi = mm(u[..., 0], Ei.T)
        uyi = mm(u[..., 1], Ei.T)
        uxj = mm(u[..., 0], Ej.T)
        uyj = mm(u[..., 1], Ej.T)
        return Ax * uxi + Ay * uyi + Axj * uxj + Ayj * uyj + b

    def F_value(u):
        val, _, _ = _phi_terms(residual(u), h, ws, wl)
        val = jnp.where(valid, val, 0.0)
        track = jnp.sum(w_u * (u - u_nom) ** 2, axis=(-1, -2))
        return track + val.sum(-1)

    eye2 = jnp.eye(2)
    w_diag = 2.0 * w_u * eye2 + ridge * eye2  # [2, 2]
    iN = np.arange(N)

    def newton_step(u):
        r = residual(u)
        val, dphi, ddphi = _phi_terms(r, h, ws, wl)
        val = jnp.where(valid, val, 0.0)
        dphi = jnp.where(valid, dphi, 0.0)
        ddphi = jnp.where(valid, ddphi, 0.0)

        F = jnp.sum(w_u * (u - u_nom) ** 2, axis=(-1, -2)) + val.sum(-1)

        # Gradient [B, N, 2]: scatter row contributions to both end agents.
        gx = mm(dphi * Ax, Ei) + mm(dphi * Axj, Ej)
        gy = mm(dphi * Ay, Ei) + mm(dphi * Ayj, Ej)
        grad = 2.0 * w_u * (u - u_nom) + jnp.stack([gx, gy], axis=-1)

        # Hessian 2x2 agent blocks from flat row products.
        # Diagonal blocks: i-side and j-side quadratic terms.
        dxx = mm(ddphi * Ax * Ax, Ei) + mm(ddphi * Axj * Axj, Ej)  # [B, N]
        dyy = mm(ddphi * Ay * Ay, Ei) + mm(ddphi * Ayj * Ayj, Ej)
        dxy = mm(ddphi * Ax * Ay, Ei) + mm(ddphi * Axj * Ayj, Ej)
        # Cross blocks per pair (i-coeff x j-coeff).
        cxx = mm(ddphi * Ax * Axj, Ep)  # [B, P]
        cxy = mm(ddphi * Ax * Ayj, Ep)
        cyx = mm(ddphi * Ay * Axj, Ep)
        cyy = mm(ddphi * Ay * Ayj, Ep)

        # Assemble H [B, 2N, 2N] (interleaved (agent, comp) ordering).
        def scat(cp, left, right):  # [B, P] -> [B, N, N]
            return jnp.einsum("bp,pn,pm->bnm", cp, left, right, precision=hp)

        Hxx = scat(cxx, ei_p, ej_p)
        Hxy = scat(cxy, ei_p, ej_p)
        Hyx = scat(cyx, ei_p, ej_p)
        Hyy = scat(cyy, ei_p, ej_p)
        # Symmetrize (j-side sees the transposed cross block).
        Hxx = Hxx + Hxx.swapaxes(1, 2)
        Hyy = Hyy + Hyy.swapaxes(1, 2)
        Hxy_full = Hxy + Hyx.swapaxes(1, 2)
        Hyx_full = Hyx + Hxy.swapaxes(1, 2)
        # Add diagonal blocks.
        Hxx = Hxx.at[:, iN, iN].add(dxx + w_diag[0, 0])
        Hyy = Hyy.at[:, iN, iN].add(dyy + w_diag[1, 1])
        Hxy_full = Hxy_full.at[:, iN, iN].add(dxy)
        Hyx_full = Hyx_full.at[:, iN, iN].add(dxy)

        H = jnp.concatenate(
            [
                jnp.concatenate([Hxx, Hxy_full], axis=-1),
                jnp.concatenate([Hyx_full, Hyy], axis=-1),
            ],
            axis=-2,
        )  # [B, 2N, 2N] with u ordered as [x_0..x_{N-1}, y_0..y_{N-1}]

        L = jnp.linalg.cholesky(H)
        g2 = jnp.concatenate([grad[..., 0], grad[..., 1]], axis=-1)[..., None]
        y = jax.scipy.linalg.solve_triangular(L, -g2, lower=True)
        s2 = jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)[..., 0]
        step = jnp.stack([s2[:, :N], s2[:, N:]], axis=-1)  # [B, N, 2]

        best_u, best_F = u, F
        for alpha in (1.0, 0.5, 0.25, 0.0625):
            u_t = jnp.clip(u + alpha * step, u_lo, u_hi)
            F_t = F_value(u_t)
            take = F_t < best_F
            best_u = jnp.where(take[..., None, None], u_t, best_u)
            best_F = jnp.where(take, F_t, best_F)
        return best_u

    u0 = u_nom if u_init is None else u_init
    u = jnp.clip(u0, u_lo, u_hi)
    u = jax.lax.fori_loop(0, n_iters, lambda _, uu: newton_step(uu), u)
    return u, F_value(u)


def eliminated_lambda(
    cons: ConstraintSet, u: Array
) -> Array:
    """Recover the optimal lambda per constraint at a given u (diagnostics)."""
    r = jnp.einsum("...md,...d->...m", cons.A, u) + cons.b
    _, _, _ = _phi_terms(r, cons.h, cons.w_slack, cons.w_lambda)
    h_safe = jnp.where(jnp.abs(cons.h) > 1e-12, cons.h, 1.0)
    lam0 = jnp.clip(-r / h_safe, 0.0, 1.0)
    lam_stat = jnp.clip(
        -cons.w_slack * cons.h * r / (cons.w_lambda + cons.w_slack * cons.h**2),
        0.0,
        1.0,
    )

    def g(lam):
        pen = jnp.maximum(0.0, -(r + cons.h * lam))
        return cons.w_lambda * lam**2 + cons.w_slack * pen**2

    cands = [jnp.zeros_like(r), jnp.ones_like(r), lam0, lam_stat]
    best = cands[0]
    vals = g(best)
    for c in cands[1:]:
        v = g(c)
        take = v < vals
        vals = jnp.where(take, v, vals)
        best = jnp.where(take, c, best)
    return best
