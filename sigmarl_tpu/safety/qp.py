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


def _phi_grad1(r: Array, h: Array, ws: Array, wl: Array) -> Array:
    """d phi / d r only — the bisection line search needs just the
    gradient SIGN, so the curvature pass (and its two full-array
    reductions at the call sites) is skipped there; the Newton polish
    still uses `_phi_grad`."""
    h_safe = jnp.where(jnp.abs(h) > 1e-12, h, 1.0)
    lam0 = jnp.clip(-r / h_safe, 0.0, 1.0)
    lam_stat = jnp.clip(-ws * h * r / (wl + ws * h * h), 0.0, 1.0)

    def g(lam):
        pen = jnp.maximum(0.0, -(r + h * lam))
        return wl * lam * lam + ws * pen * pen

    lam_best = jnp.zeros_like(r)
    vals = g(lam_best)
    for cand in (jnp.ones_like(r), lam0, lam_stat):
        vk = g(cand)
        take = vk < vals
        vals = jnp.where(take, vk, vals)
        lam_best = jnp.where(take, cand, lam_best)
    pen = jnp.maximum(0.0, -(r + h * lam_best))
    return -2.0 * ws * pen


def _phi_grad(r: Array, h: Array, ws: Array, wl: Array) -> Tuple[Array, Array]:
    """(d phi / d r, d^2 phi / d r^2) — one cheap pass for line search."""
    h_safe = jnp.where(jnp.abs(h) > 1e-12, h, 1.0)
    lam0 = jnp.clip(-r / h_safe, 0.0, 1.0)
    lam_stat = jnp.clip(-ws * h * r / (wl + ws * h * h), 0.0, 1.0)

    def g(lam):
        pen = jnp.maximum(0.0, -(r + h * lam))
        return wl * lam * lam + ws * pen * pen

    lam_best = jnp.zeros_like(r)
    vals = g(lam_best)
    for cand in (jnp.ones_like(r), lam0, lam_stat):
        vk = g(cand)
        take = vk < vals
        vals = jnp.where(take, vk, vals)
        lam_best = jnp.where(take, cand, lam_best)
    pen = jnp.maximum(0.0, -(r + h * lam_best))
    active = pen > 0
    interior = active & (lam_best > 0) & (lam_best < 1) & (jnp.abs(h) > 1e-12)
    ddphi = jnp.where(
        active,
        jnp.where(interior, 2.0 * wl * ws / (wl + ws * h * h), 2.0 * ws),
        0.0,
    )
    return -2.0 * ws * pen, ddphi


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

    def g(lam):
        pen = jnp.maximum(0.0, -(r + h * lam))
        return wl * lam * lam + ws * pen * pen

    # Candidate loop without a stacked minor axis (a [..., 4] stack +
    # integer indexing lowers to a gather, which Pallas/Mosaic rejects).
    lam_best = jnp.zeros_like(r)
    vals = g(lam_best)
    for cand in (jnp.ones_like(r), lam0, lam_stat):
        vk = g(cand)
        take = vk < vals
        vals = jnp.where(take, vk, vals)
        lam_best = jnp.where(take, cand, lam_best)

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
    eps_b = 1e-6 * (u_hi - u_lo)

    def newton_step(u):
        F, grad, ddphi = F_parts(u)
        # Gauss-Newton Hessian: 2 diag(w_u) + A^T diag(phi'') A.
        H = 2.0 * jnp.einsum("d,de->de", w_u, eye) + jnp.einsum(
            "...md,...m,...me->...de", cons.A, ddphi, cons.A
        )
        H = H + ridge * eye
        # Binding-set projection (Bertsekas projected Newton): variables at a
        # bound with the gradient pushing outward are pinned, else the
        # clipped Newton direction can fail to descend and the iteration
        # stalls at a suboptimal box corner.
        bind = ((u <= u_lo + eps_b) & (grad > 0)) | (
            (u >= u_hi - eps_b) & (grad < 0)
        )
        free = jnp.where(bind, 0.0, 1.0)
        grad_f = grad * free
        H = H * free[..., :, None] * free[..., None, :] + jnp.einsum(
            "...d,de->...de", jnp.where(bind, 1.0, 0.0), eye
        )
        step = jnp.linalg.solve(H, -grad_f[..., None])[..., 0]
        # Project outward-pointing components of at-bound free variables
        # (two-metric safeguard; removing them only strengthens descent).
        outward = ((u <= u_lo + eps_b) & (step < 0)) | (
            (u >= u_hi - eps_b) & (step > 0)
        )
        step = jnp.where(outward, 0.0, step)

        # Exact-ish line search: F(alpha) is convex piecewise-quadratic
        # along the direction, so bisection on its (monotone) derivative
        # finds the true step — a fixed backtracking ladder stalls when the
        # Gauss-Newton model underestimates a stiff not-yet-active row.
        big = 1e30
        a_hi = jnp.where(step > 1e-30, (u_hi - u) / jnp.where(step > 1e-30, step, 1.0), big)
        a_lo = jnp.where(step < -1e-30, (u_lo - u) / jnp.where(step < -1e-30, step, 1.0), big)
        a_cap = jnp.maximum(jnp.minimum(jnp.min(jnp.minimum(a_hi, a_lo), axis=-1), 4.0), 0.0)

        dr = jnp.einsum("...md,...d->...m", cons.A, step)
        dr = jnp.where(cons.valid, dr, 0.0)
        q1 = jnp.sum(2.0 * w_u * (u - u_nom) * step, axis=-1)
        q2 = jnp.sum(w_u * step * step, axis=-1)

        def dF1(alpha):
            """Gradient only — the bisection needs just its sign."""
            r_a = jnp.einsum("...md,...d->...m", cons.A, u) + cons.b + alpha[..., None] * dr
            dphi_a = _phi_grad1(r_a, cons.h, cons.w_slack, cons.w_lambda)
            dphi_a = jnp.where(cons.valid, dphi_a, 0.0)
            return q1 + 2.0 * q2 * alpha + jnp.sum(dphi_a * dr, axis=-1)

        def dF(alpha):
            r_a = jnp.einsum("...md,...d->...m", cons.A, u) + cons.b + alpha[..., None] * dr
            dphi_a, ddphi_a = _phi_grad(r_a, cons.h, cons.w_slack, cons.w_lambda)
            dphi_a = jnp.where(cons.valid, dphi_a, 0.0)
            ddphi_a = jnp.where(cons.valid, ddphi_a, 0.0)
            g1 = q1 + 2.0 * q2 * alpha + jnp.sum(dphi_a * dr, axis=-1)
            g2d = 2.0 * q2 + jnp.sum(ddphi_a * dr * dr, axis=-1)
            return g1, g2d

        g_cap = dF1(a_cap)
        lo_a = jnp.zeros_like(a_cap)
        hi_a = a_cap
        # 3 bisections + the 2-step Newton polish below: each dF is a full
        # constraint sweep (the line search dominates a Newton iteration's
        # cost), and the polish lands exactly within a single-kink bracket.
        # Certified at 6 warm Newton iters on TPU: objective gap 6e-6 vs
        # the cold 30-iter solve, u-dev 2.9e-3 in flat directions, and
        # fp16-parity control deviation 5e-6 vs the float64 oracle
        # (scripts/check_warm_start_tpu.py, scripts/control_deviation_check.py,
        # r5; 4 bisections gap 0.0/u-dev 1e-4 but 4.5k steps/s slower, 8
        # bisections no tighter than 4).
        for _ in range(3):
            mid = 0.5 * (lo_a + hi_a)
            pos = dF1(mid) > 0
            hi_a = jnp.where(pos, mid, hi_a)
            lo_a = jnp.where(pos, lo_a, mid)
        alpha = 0.5 * (lo_a + hi_a)
        # 1D Newton polish: collapses the bisection-resolution plateau.
        for _ in range(2):
            g1, g2d = dF(alpha)
            alpha = jnp.clip(
                alpha - g1 / jnp.maximum(g2d, 1e-12), lo_a, hi_a
            )
        alpha = jnp.where(g_cap <= 0, a_cap, alpha)

        u_t = jnp.clip(u + alpha[..., None] * step, u_lo, u_hi)
        F_t, _, _ = F_parts(u_t)
        # Arc-clipped candidates PAST the first bound crossing: capping the
        # whole step at a_cap makes near-bound coordinates creep toward the
        # bound geometrically (never reaching it, the round-2 regression);
        # searching the projected arc lets them clamp exactly while the free
        # coordinates keep moving.
        best_u, best_F = u_t, F_t
        for a_arc in (1.0, 4.0):
            u_a = jnp.clip(u + a_arc * step, u_lo, u_hi)
            F_a, _, _ = F_parts(u_a)
            take_a = F_a < best_F
            best_u = jnp.where(take_a[..., None], u_a, best_u)
            best_F = jnp.where(take_a, F_a, best_F)
        take = best_F < F
        return jnp.where(take[..., None], best_u, u)

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


def _chol_solve_blast(H: Array, g: Array, d: int) -> Array:
    """Solve H x = g for SPD H in batch-LAST layout: H [d, d, B], g [d, B].

    Unrolled right-looking Cholesky + two substitution sweeps over the
    (small, static) dimension d: every op is an elementwise/broadcast VPU op
    on `[k, B]` tiles with the large batch axis along the lanes — this is
    ~10x faster on TPU than `jnp.linalg.cholesky` over `[B, d, d]`, whose
    XLA lowering loops with poor layouts (measured 5.8 ms vs <0.5 ms at
    B=1024, d=30).
    """
    # Factorize on a shrinking trailing submatrix (halves the HBM traffic
    # versus updating the full [d, d, B] array in place).
    cols = []  # cols[j]: L[j:, j], shape [d - j, B]
    sub = H
    for j in range(d):
        # Clamp the pivot: fp32 Schur updates with stiff penalty rows
        # (w_slack up to 3e6) can drive a trailing pivot <= 0, which would
        # NaN the whole solve and silently disable the filter for that env.
        piv = jax.lax.rsqrt(jnp.maximum(sub[0, 0], 1e-12))  # [B]
        col = sub[:, 0] * piv[None]  # [d - j, B]
        cols.append(col)
        if j < d - 1:
            sub = sub[1:, 1:] - col[1:, None, :] * col[None, 1:, :]

    # Forward solve L y = g (right-looking: eliminate as soon as computed).
    r = g
    ys = []
    for j in range(d):
        yj = r[0] / cols[j][0]  # [B]
        ys.append(yj)
        if j < d - 1:
            r = r[1:] - cols[j][1:] * yj[None]

    # Backward solve L^T x = y: x_j = (y_j - L[j+1:, j] . x[j+1:]) / L[j, j].
    xs: list = [None] * d
    for j in range(d - 1, -1, -1):
        acc = ys[j]
        if j < d - 1:
            tail = jnp.stack(xs[j + 1 :], axis=0)  # [d-1-j, B]
            acc = acc - jnp.sum(cols[j][1:] * tail, axis=0)
        xs[j] = acc / cols[j][0]
    return jnp.stack(xs, axis=0)  # [d, B]


def solve_structured_qp(
    cons: StructuredConstraintSet,
    u_nom: Array,  # [B, N, 2]
    w_u: Array,  # [2]
    u_lo: Array,  # [2]
    u_hi: Array,  # [2]
    n_iters: int = 12,
    ridge: float = 1e-8,
    u_init: Array | None = None,
    ws_cap: float = 3e6,
    max_alpha: float = 4.0,
    arc_alphas: Tuple[float, ...] = (1.0, 4.0),
    soft_iters: int = 0,
    soft_cap: float = 10.0,
) -> Tuple[Array, Array]:
    """Projected damped Newton on the eliminated QP in block-sparse form.

    Same minimizer as `solve_boxed_penalty_qp` on the equivalent dense
    constraints (tests pin the agreement).

    TPU layout design: everything runs BATCH-LAST — flat row arrays are
    [M, B] (M = N*Ks + P*Kp rows) and the Gauss-Newton Hessian is [d, d, B]
    — so the huge batch axis rides the 128-wide vector lanes and row<->agent
    gathers/scatters are static one-hot matmuls `[X, M] @ [M, B]` on the
    MXU. The per-env [d, d] Newton system is solved by an unrolled
    batch-last Cholesky (`_chol_solve_blast`) instead of XLA's slow batched
    `linalg.cholesky`.

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
    # ws_cap bounds the slack stiffness after row normalization: 3e6 keeps
    # fp32 penalty-gradient noise bounded (see solve_boxed_penalty_qp);
    # float64 parity runs can lift it to the reference's uncapped 1e9.
    cons = _normalize_structured(cons, ws_cap=ws_cap)

    # ---- flatten rows batch-last: [M, B], single rows first then pair rows.
    def flat(x_s, x_p):
        return jnp.concatenate(
            [x_s.reshape(B, Ms), x_p.reshape(B, Mp)], axis=1
        ).T

    Ax = flat(cons.A_s[..., 0], cons.A_pi[..., 0])
    Ay = flat(cons.A_s[..., 1], cons.A_pi[..., 1])
    zs = jnp.zeros((B, N, Ks))
    Axj = flat(zs, cons.A_pj[..., 0])
    Ayj = flat(zs, cons.A_pj[..., 1])
    b = flat(cons.b_s, cons.b_p)
    h = flat(cons.h_s, cons.h_p)
    ws = flat(cons.ws_s, cons.ws_p)
    wl = flat(cons.wl_s, cons.wl_p)
    valid = flat(cons.valid_s, cons.valid_p)

    # ---- static row->agent / row->pair maps. The flat row order is
    # agent-major for single rows and pair-major for pair rows, so every
    # row<->agent gather/scatter is a pure RESHAPE (repeat / segment-sum)
    # plus one tiny [N, P]-sized matmul for the pair->agent hop — an
    # order-of-magnitude fewer FLOPs than the round-2 full [M, N] one-hot
    # matmuls ([M,N]@[N,B] and [P,M]@[M,B] on every Newton iteration).
    ei_p = np.eye(N, dtype=np.float32)[np.asarray(cons.pair_i)]  # [P, N]
    ej_p = np.eye(N, dtype=np.float32)[np.asarray(cons.pair_j)]
    Ei_p = jnp.asarray(ei_p)  # [P, N] pair -> i agent
    Ej_p = jnp.asarray(ej_p)
    Ei_pT = jnp.asarray(ei_p.T)  # [N, P]
    Ej_pT = jnp.asarray(ej_p.T)
    # Pair scatter map: W[(n*N + m), p] = ei_p[p, n] * ej_p[p, m].
    W_nm = jnp.asarray(
        (ei_p[:, :, None] * ej_p[:, None, :]).reshape(P, N * N).T
    )  # [N*N, P]

    hp = jax.lax.Precision.HIGHEST

    def mm(a, bmat):  # [X, Y] @ [Y, B] exact fp32 on the MXU
        return jnp.einsum("xy,yb->xb", a, bmat, precision=hp)

    # u is carried as [2, N, B] (batch-last).
    u_nom_t = jnp.transpose(u_nom, (2, 1, 0))  # [2, N, B]
    w_u_c = w_u[:, None, None]  # [2, 1, 1]
    lo_c = u_lo[:, None, None]
    hi_c = u_hi[:, None, None]

    def rep_s(v):  # [N, B] -> [Ms, B] (each agent's value on its Ks rows)
        return jnp.broadcast_to(v[:, None, :], (N, Ks, B)).reshape(Ms, B)

    def rep_p(v):  # [P, B] -> [Mp, B]
        return jnp.broadcast_to(v[:, None, :], (P, Kp, B)).reshape(Mp, B)

    def gath_i(v):  # [N, B] -> per-row i-agent value [M, B]
        return jnp.concatenate([rep_s(v), rep_p(mm(Ei_p, v))], axis=0)

    def gath_j(v):
        return jnp.concatenate([rep_s(v), rep_p(mm(Ej_p, v))], axis=0)

    def sum_s(x):  # [M, B] -> per-agent sum over that agent's single rows
        return x[:Ms].reshape(N, Ks, B).sum(1)

    def sum_p(x):  # [M, B] -> per-pair sum over that pair's rows [P, B]
        return x[Ms:].reshape(P, Kp, B).sum(1)

    def scat_i(x):  # [M, B] -> [N, B]: rows scattered to their i agent
        return sum_s(x) + mm(Ei_pT, sum_p(x))

    def scat_j(x):  # rows scattered to their j agent (row_j == row_i on
        # single rows, so the single part is identical)
        return sum_s(x) + mm(Ej_pT, sum_p(x))

    def residual(u):  # u [2, N, B] -> r [M, B]
        uxi = gath_i(u[0])
        uyi = gath_i(u[1])
        uxj = gath_j(u[0])
        uyj = gath_j(u[1])
        return Ax * uxi + Ay * uyi + Axj * uxj + Ayj * uyj + b

    def F_value(u, ws_=None):
        val, _, _ = _phi_terms(residual(u), h, ws if ws_ is None else ws_, wl)
        val = jnp.where(valid, val, 0.0)
        track = jnp.sum(w_u_c * (u - u_nom_t) ** 2, axis=(0, 1))
        return track + val.sum(0)  # [B]

    iN = np.arange(N)
    iD = np.arange(d)
    eps_b = 1e-6 * (hi_c - lo_c)

    def newton_step(u, ws):
        r = residual(u)
        val, dphi, ddphi = _phi_terms(r, h, ws, wl)
        val = jnp.where(valid, val, 0.0)
        dphi = jnp.where(valid, dphi, 0.0)
        ddphi = jnp.where(valid, ddphi, 0.0)

        F = jnp.sum(w_u_c * (u - u_nom_t) ** 2, axis=(0, 1)) + val.sum(0)

        # Gradient [2, N, B]: scatter row contributions to both end agents.
        gx = scat_i(dphi * Ax) + scat_j(dphi * Axj)
        gy = scat_i(dphi * Ay) + scat_j(dphi * Ayj)
        grad = 2.0 * w_u_c * (u - u_nom_t) + jnp.stack([gx, gy], axis=0)

        # Binding-set projection (Bertsekas projected Newton): pin variables
        # at a bound whose gradient pushes outward, else the clipped Newton
        # direction can fail to descend and the iteration stalls at a
        # suboptimal box corner.
        bind = ((u <= lo_c + eps_b) & (grad > 0)) | (
            (u >= hi_c - eps_b) & (grad < 0)
        )  # [2, N, B]
        free2 = jnp.where(bind, 0.0, 1.0)
        grad = grad * free2
        free_d = jnp.concatenate([free2[0], free2[1]], axis=0)  # [d, B]
        bind_d = 1.0 - free_d

        # Hessian 2x2 agent blocks from flat row products.
        dxx = scat_i(ddphi * Ax * Ax) + scat_j(ddphi * Axj * Axj)  # [N, B]
        dyy = scat_i(ddphi * Ay * Ay) + scat_j(ddphi * Ayj * Ayj)
        dxy = scat_i(ddphi * Ax * Ay) + scat_j(ddphi * Axj * Ayj)
        # Cross blocks per pair (i-coeff x j-coeff), then scatter into
        # [N, N, B] via ONE static matmul per component.
        cxx = sum_p(ddphi * Ax * Axj)  # [P, B]
        cxy = sum_p(ddphi * Ax * Ayj)
        cyx = sum_p(ddphi * Ay * Axj)
        cyy = sum_p(ddphi * Ay * Ayj)

        def scat(cp):  # [P, B] -> [N, N, B]
            return mm(W_nm, cp).reshape(N, N, B)

        Hxx = scat(cxx)
        Hxy = scat(cxy)
        Hyx = scat(cyx)
        Hyy = scat(cyy)
        # Symmetrize (j-side sees the transposed cross block).
        Hxx = Hxx + Hxx.swapaxes(0, 1)
        Hyy = Hyy + Hyy.swapaxes(0, 1)
        Hxy_full = Hxy + Hyx.swapaxes(0, 1)
        Hyx_full = Hyx + Hxy.swapaxes(0, 1)
        # Add diagonal blocks.
        Hxx = Hxx.at[iN, iN].add(dxx + 2.0 * w_u[0] + ridge)
        Hyy = Hyy.at[iN, iN].add(dyy + 2.0 * w_u[1] + ridge)
        Hxy_full = Hxy_full.at[iN, iN].add(dxy)
        Hyx_full = Hyx_full.at[iN, iN].add(dxy)

        H = jnp.concatenate(
            [
                jnp.concatenate([Hxx, Hxy_full], axis=1),
                jnp.concatenate([Hyx_full, Hyy], axis=1),
            ],
            axis=0,
        )  # [2N, 2N, B] with u ordered as [x_0..x_{N-1}, y_0..y_{N-1}]

        # Restrict the system to the free set (bound vars get identity rows).
        H = H * free_d[:, None, :] * free_d[None, :, :]
        H = H.at[iD, iD].add(bind_d)

        g2 = jnp.concatenate([grad[0], grad[1]], axis=0)  # [2N, B]
        s2 = _chol_solve_blast(H, -g2, d)  # [2N, B]
        step = jnp.stack([s2[:N], s2[N:]], axis=0)  # [2, N, B]

        # A variable at its bound with INWARD gradient stays free, but the
        # coupled Newton step can still point outward — which would zero the
        # box cap below and stall the iteration. Project those components
        # out; this only removes positive g.s terms, so the direction stays
        # a descent direction.
        outward = ((u <= lo_c + eps_b) & (step < 0)) | (
            (u >= hi_c - eps_b) & (step > 0)
        )
        step = jnp.where(outward, 0.0, step)

        # ---- exact-ish line search. Along the Newton direction, F(alpha) is
        # CONVEX piecewise-quadratic, so its directional derivative dF(alpha)
        # is monotone and a short bisection finds the true minimizer — unlike
        # a fixed backtracking ladder, which stalls when the Gauss-Newton
        # curvature underestimates a stiff not-yet-active penalty row and the
        # full step massively overshoots. Each dF eval is ONE elementwise
        # pass over [M, B] (dr = A step is computed once, no matmuls).
        # Cap alpha so no free variable crosses its box bound (keeps the
        # 1D problem convex; bound vars have step 0 from the projection).
        big = 1e30
        a_hi = jnp.where(step > 1e-30, (hi_c - u) / jnp.where(step > 1e-30, step, 1.0), big)
        a_lo = jnp.where(step < -1e-30, (lo_c - u) / jnp.where(step < -1e-30, step, 1.0), big)
        a_cap = jnp.minimum(
            jnp.min(jnp.minimum(a_hi, a_lo), axis=(0, 1)), max_alpha
        )  # [B]
        a_cap = jnp.maximum(a_cap, 0.0)

        dr = (
            Ax * gath_i(step[0])
            + Ay * gath_i(step[1])
            + Axj * gath_j(step[0])
            + Ayj * gath_j(step[1])
        )  # [M, B]
        dr = jnp.where(valid, dr, 0.0)
        # Tracking-term derivative pieces: q1 + 2 q2 alpha.
        q1 = jnp.sum(2.0 * w_u_c * (u - u_nom_t) * step, axis=(0, 1))  # [B]
        q2 = jnp.sum(w_u_c * step * step, axis=(0, 1))

        def dF1(alpha):  # [B] -> [B]; gradient only (bisection sign test)
            dphi_a = _phi_grad1(r + alpha[None] * dr, h, ws, wl)
            dphi_a = jnp.where(valid, dphi_a, 0.0)
            return q1 + 2.0 * q2 * alpha + jnp.sum(dphi_a * dr, axis=0)

        def dF(alpha):  # [B] -> ([B], [B])
            dphi_a, ddphi_a = _phi_grad(r + alpha[None] * dr, h, ws, wl)
            dphi_a = jnp.where(valid, dphi_a, 0.0)
            ddphi_a = jnp.where(valid, ddphi_a, 0.0)
            g1 = q1 + 2.0 * q2 * alpha + jnp.sum(dphi_a * dr, axis=0)
            g2d = 2.0 * q2 + jnp.sum(ddphi_a * dr * dr, axis=0)
            return g1, g2d

        g_cap = dF1(a_cap)
        lo_a = jnp.zeros_like(a_cap)
        hi_a = a_cap
        # 3 bisections + the 2-step Newton polish below: each dF is a full
        # constraint sweep (the line search dominates a Newton iteration's
        # cost), and the polish lands exactly within a single-kink bracket.
        # Certified at 6 warm Newton iters on TPU: objective gap 6e-6 vs
        # the cold 30-iter solve, u-dev 2.9e-3 in flat directions, and
        # fp16-parity control deviation 5e-6 vs the float64 oracle
        # (scripts/check_warm_start_tpu.py, scripts/control_deviation_check.py,
        # r5; 4 bisections gap 0.0/u-dev 1e-4 but 4.5k steps/s slower, 8
        # bisections no tighter than 4).
        for _ in range(3):
            mid = 0.5 * (lo_a + hi_a)
            pos = dF1(mid) > 0
            hi_a = jnp.where(pos, mid, hi_a)
            lo_a = jnp.where(pos, lo_a, mid)
        alpha = 0.5 * (lo_a + hi_a)
        # 1D Newton polish: collapses the bisection-resolution plateau
        # (dF is piecewise linear, so within the final bracket this is
        # essentially exact).
        for _ in range(2):
            g1, g2d = dF(alpha)
            alpha = jnp.clip(alpha - g1 / jnp.maximum(g2d, 1e-12), lo_a, hi_a)
        alpha = jnp.where(g_cap <= 0, a_cap, alpha)  # [B]

        u_t = jnp.clip(u + alpha[None, None] * step, lo_c, hi_c)
        F_t = F_value(u_t, ws)
        # Arc-clipped candidates PAST the first bound crossing: capping the
        # whole step at a_cap makes near-bound coordinates creep toward the
        # bound geometrically (never reaching it, the round-2 regression);
        # searching the projected arc lets them clamp exactly while the free
        # coordinates keep moving.
        best_u, best_F = u_t, F_t
        for a_arc in arc_alphas:
            u_a = jnp.clip(u + a_arc * step, lo_c, hi_c)
            F_a = F_value(u_a, ws)
            take_a = F_a < best_F
            best_u = jnp.where(take_a[None, None], u_a, best_u)
            best_F = jnp.where(take_a, F_a, best_F)
        # Safety: never accept an increase (exactness is up to bisection
        # resolution; also guards alpha = 0 fixed points).
        take = best_F < F
        return jnp.where(take[None, None], best_u, u)

    u = jnp.transpose(jnp.clip(u_nom, u_lo, u_hi), (2, 1, 0))  # [2, N, B]
    if u_init is not None:
        # Per-env, start from whichever of {previous solution, nominal} has
        # the lower objective — a stale warm start (post-reset, large state
        # jump) would otherwise need extra iterations to recover.
        u_w = jnp.transpose(jnp.clip(u_init, u_lo, u_hi), (2, 1, 0))
        better = F_value(u_w) < F_value(u)
        u = jnp.where(better[None, None], u_w, u)
    if soft_iters > 0:
        # Stiffness continuation: the relaxed landscape (slack stiffness
        # capped at soft_cap) is smooth enough for Newton to jump near the
        # constrained solution's basin in one or two iterations, where the
        # full-stiffness iterations then converge quadratically. Without
        # it, heavily-infeasible pile-up instances creep (~8 iterations of
        # tiny line-searched steps while the stiff active set resolves one
        # kink at a time; see PROFILE_r05.md).
        # Geometric cap ladder soft_cap -> ws_cap: stage k of S runs one
        # iteration at cap soft_cap^(1-k/S) * ws_cap^(k/S), so successive
        # stages tighten toward the true stiffness instead of jumping.
        u_soft = u
        for k in range(soft_iters):
            cap_k = float(
                soft_cap ** (1.0 - k / soft_iters) * ws_cap ** (k / soft_iters)
            )
            u_soft = newton_step(u_soft, jnp.minimum(ws, cap_k))
        # Keep the soft result only where it helps under the FULL
        # objective: the relaxed stage deliberately ignores large
        # violations, so on already-feasible instances it can wander to a
        # full-F-worse point that the stiff iterations then creep back
        # from (measured: without this guard the continuation ADDS bad
        # instances at B=1024/N=15).
        keep = F_value(u_soft) < F_value(u)
        u = jnp.where(keep[None, None], u_soft, u)
    u = jax.lax.fori_loop(0, n_iters, lambda _, uu: newton_step(uu, ws), u)
    F = F_value(u)
    return jnp.transpose(u, (2, 1, 0)), F


def solve_structured_qp_pallas(
    cons: StructuredConstraintSet,
    u_nom: Array,  # [B, N, 2]
    w_u: Array,
    u_lo: Array,
    u_hi: Array,
    n_iters: int = 12,
    ridge: float = 1e-8,
    u_init: Array | None = None,
    ws_cap: float = 3e6,
    static_bounds: Tuple | None = None,  # ((w_u), (lo), (hi)) python floats
    soft_iters: int = 0,
    soft_cap: float = 10.0,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """`solve_structured_qp` through the fused Pallas whole-solve kernel
    (`ops/qp_pallas.py`): same algorithm, all Newton iterations in one
    VMEM-resident program. Converges to the same objective (pinned by
    tests); individual fp32 trajectories may differ in near-flat
    directions exactly like any two solver variants do.

    The lambda penalty weights stream in per ROW (`cons.wl_s` /
    `cons.wl_p`), so grouped mode's row-varying cross-group weights ride
    the same kernel as the uniform plain-mode fill."""
    from sigmarl_tpu.ops.qp_pallas import newton_solve_pallas

    B, N = u_nom.shape[:2]
    P = cons.pair_i.shape[0]
    if P == 0:  # single-agent problems: zero-size pair blocks are illegal
        return solve_structured_qp(
            cons, u_nom, w_u, u_lo, u_hi, n_iters, ridge, u_init, ws_cap,
            soft_iters=soft_iters, soft_cap=soft_cap,
        )
    Ks, Kp = cons.A_s.shape[2], cons.A_pi.shape[2]
    consn = _normalize_structured(cons, ws_cap=ws_cap)

    tr = lambda x: jnp.transpose(x, (2, 1, 0))
    # Invalid rows -> ws = 0 (phi vanishes identically); wl is scalar.
    ws_s = jnp.where(consn.valid_s, consn.ws_s, 0.0)
    ws_p = jnp.where(consn.valid_p, consn.ws_p, 0.0)
    singles = (tr(consn.A_s[..., 0]), tr(consn.A_s[..., 1]), tr(consn.b_s),
               tr(consn.h_s), tr(ws_s), tr(consn.wl_s))
    pairs = (tr(consn.A_pi[..., 0]), tr(consn.A_pi[..., 1]),
             tr(consn.A_pj[..., 0]), tr(consn.A_pj[..., 1]),
             tr(consn.b_p), tr(consn.h_p), tr(ws_p), tr(consn.wl_p))

    # The kernel bakes weights/bounds statically; under jit the array
    # forms are tracers, so callers inside jit must supply static_bounds.
    if static_bounds is not None:
        (wu0, wu1), (lo0, lo1), (hi0, hi1) = static_bounds
    else:
        wu0, wu1 = (float(x) for x in np.asarray(w_u))
        lo0, lo1 = (float(x) for x in np.asarray(u_lo))
        hi0, hi1 = (float(x) for x in np.asarray(u_hi))

    u_nom_t = jnp.concatenate([u_nom[..., 0].T, u_nom[..., 1].T], axis=0)
    u0 = jnp.concatenate(
        [jnp.clip(u_nom[..., 0], lo0, hi0).T,
         jnp.clip(u_nom[..., 1], lo1, hi1).T], axis=0,
    )
    if u_init is not None:
        ui = jnp.concatenate(
            [jnp.clip(u_init[..., 0], lo0, hi0).T,
             jnp.clip(u_init[..., 1], lo1, hi1).T], axis=0,
        )
    else:
        ui = u0

    u_t, F = newton_solve_pallas(
        singles, pairs, u0, ui, u_nom_t,
        N, Ks, Kp, P,
        tuple(np.asarray(cons.pair_i).tolist()),
        tuple(np.asarray(cons.pair_j).tolist()),
        (wu0, wu1), (lo0, lo1), (hi0, hi1),
        n_iters, ridge, soft_iters=soft_iters, soft_cap=soft_cap,
        interpret=interpret,
    )
    u = jnp.stack([u_t[:N].T, u_t[N:].T], axis=-1)  # [B, N, 2]
    return u, F


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
