"""Pallas TPU kernel: the whole batched CBF-QP Newton solve, fused.

The reference delegates each env's CBF-QP to OSQP/CLARABEL/SCS through
cvxpy (`/root/reference/sigmarl/cbf_qp.py:1222-1260`), one host solve per
env per step. The TPU design solves thousands of eliminated-variable QPs
(`safety/qp.py`) batch-parallel; profiling shows the XLA lowering is
LATENCY-bound, not FLOP-bound — ~100 small ops per Newton iteration
(residual, phi terms, Hessian blocks, Cholesky, 10-point line search)
each round-tripping [M, B]-sized intermediates through HBM at ~0.65 ms
per iteration for B=1024, N=15 (~70 GFLOP/s effective, far below VPU
peak).

This kernel runs the ENTIRE solve (all Newton iterations, including the
in-kernel unrolled Cholesky and the bisection + projected-arc line
search) for a tile of TB envs in one Pallas program: every intermediate
lives in VMEM; HBM sees the constraint blocks once in and the solution
once out.

Layout notes (v5e, fp32 (8, 128) tiles):
- single-agent rows:   [Ks, N, TB]  (N=15 -> 16 sublanes, TB=128 lanes)
- pair rows:           [Kp, P, TB]  (P=105 -> 112 sublanes)
- controls:            [2N, TB]     (x block then y block)
- pair<->agent hops:   one-hot [P, N] matmuls at Precision.HIGHEST — the
  default MXU f32 path rounds operands through bfloat16, which corrupts
  a gather (measured on the pseudo-distance kernel: ~1e-2 coordinate
  error). Every in-kernel dot here is HIGHEST.

Correctness is pinned against the XLA `solve_structured_qp` path by
`tests/test_pallas_kernels.py`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigmarl_tpu.safety.qp import _phi_grad, _phi_grad1, _phi_terms

Array = jax.Array

TB = 128  # envs per grid step (lane width; Mosaic requires 128)


def _hdot(a, b):  # [X, Y] @ [Y, T] exact fp32
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _make_kernel(N, Ks, Kp, P, pair_i, pair_j, w_u, u_lo, u_hi,
                 n_iters, ridge, soft_iters=0, soft_cap=10.0, ws_cap=3e6):
    """Build the kernel body with all static structure baked in."""
    d = 2 * N
    ei_p = np.eye(N, dtype=np.float32)[pair_i]  # [P, N]
    ej_p = np.eye(N, dtype=np.float32)[pair_j]
    W_nm = (ei_p[:, :, None] * ej_p[:, None, :]).reshape(P, N * N)
    wux, wuy = float(w_u[0]), float(w_u[1])
    lox, loy = float(u_lo[0]), float(u_lo[1])
    hix, hiy = float(u_hi[0]), float(u_hi[1])
    eps_bx = 1e-6 * (hix - lox)
    eps_by = 1e-6 * (hiy - loy)

    def kernel(asx_r, asy_r, bs_r, hs_r, wss_r, wls_r,
               apxi_r, apyi_r, apxj_r, apyj_r, bp_r, hp_r, wsp_r, wlp_r,
               u0_r, ui_r, unom_r,
               eip_r, ejp_r, eipt_r, ejpt_r, wnmt_r, wnm2t_r, eyen_r,
               eyed_r, out_u, out_F):
        # Static structure matrices arrive as inputs (Pallas kernels may
        # not capture array constants).
        EiP = eip_r[:]
        EjP = ejp_r[:]
        EiPT = eipt_r[:]
        EjPT = ejpt_r[:]
        WnmT = wnmt_r[:]  # [N*N, P], row n*N+m
        Wnm2T = wnm2t_r[:]  # [N*N, P], row m*N+n (transposed layout)
        eyeN = eyen_r[:]  # [N, N]
        eyeD = eyed_r[:]  # [d, d]

        def eyeN_c(k):  # one-hot column e_k as [N, 1]
            return eyeN[:, k:k + 1]

        def eyeD_c(k):
            return eyeD[:, k:k + 1]

        # Invalid rows are encoded as ws = 0 upstream: phi and all its
        # derivatives vanish identically there (the lambda optimum is 0 and
        # the penalty term carries the only r-dependence), so no separate
        # validity masks are needed in-kernel. wl arrives per ROW — uniform
        # (_wl_value) in plain mode, row-varying in grouped mode where
        # cross-group lambda rows are always lambda_weight-regularized.
        ASX, ASY, BS = asx_r[:], asy_r[:], bs_r[:]
        HS, WSS, WLS = hs_r[:], wss_r[:], wls_r[:]
        APXI, APYI = apxi_r[:], apyi_r[:]
        APXJ, APYJ = apxj_r[:], apyj_r[:]
        BP, HP, WSP, WLP = bp_r[:], hp_r[:], wsp_r[:], wlp_r[:]
        unom = unom_r[:]
        unx, uny = unom[:N], unom[N:]

        def residual(ux, uy):
            r_s = ASX * ux[None] + ASY * uy[None] + BS
            uxi = _hdot(EiP, ux)  # [P, T]
            uyi = _hdot(EiP, uy)
            uxj = _hdot(EjP, ux)
            uyj = _hdot(EjP, uy)
            r_p = (APXI * uxi[None] + APYI * uyi[None]
                   + APXJ * uxj[None] + APYJ * uyj[None] + BP)
            return r_s, r_p

        def track(ux, uy):  # [1, T]
            dx, dy = ux - unx, uy - uny
            return (wux * dx * dx + wuy * dy * dy).sum(0, keepdims=True)

        def F_value(ux, uy, WSS_=None, WSP_=None):
            WSS_ = WSS if WSS_ is None else WSS_
            WSP_ = WSP if WSP_ is None else WSP_
            r_s, r_p = residual(ux, uy)
            vs_val, _, _ = _phi_terms(r_s, HS, WSS_, WLS)
            vp_val, _, _ = _phi_terms(r_p, HP, WSP_, WLP)
            vs_val = vs_val.sum(0).sum(0, keepdims=True)
            vp_val = vp_val.sum(0).sum(0, keepdims=True)
            return track(ux, uy) + vs_val + vp_val  # [1, T]

        def newton_step(u, cap=None):
            # cap=None -> full stiffness; float -> stiffness-continuation
            # stage. The min is taken HERE so the capped arrays' live
            # range stays inside one unrolled stage body — materializing
            # them outside the call pushes the grouped-mode (Kp=18)
            # kernel past the scoped-VMEM stack limit.
            WSS_ = WSS if cap is None else jnp.minimum(WSS, cap)
            WSP_ = WSP if cap is None else jnp.minimum(WSP, cap)
            ux, uy = u[:N], u[N:]
            r_s, r_p = residual(ux, uy)
            val_s, dphi_s, ddphi_s = _phi_terms(r_s, HS, WSS_, WLS)
            val_p, dphi_p, ddphi_p = _phi_terms(r_p, HP, WSP_, WLP)

            F = (track(ux, uy) + val_s.sum(0).sum(0, keepdims=True)
                 + val_p.sum(0).sum(0, keepdims=True))  # [1, T]

            px = (dphi_p * APXI).sum(0)  # [P, T]
            py = (dphi_p * APYI).sum(0)
            pxj = (dphi_p * APXJ).sum(0)
            pyj = (dphi_p * APYJ).sum(0)
            gx = (2.0 * wux * (ux - unx) + (dphi_s * ASX).sum(0)
                  + _hdot(EiPT, px) + _hdot(EjPT, pxj))
            gy = (2.0 * wuy * (uy - uny) + (dphi_s * ASY).sum(0)
                  + _hdot(EiPT, py) + _hdot(EjPT, pyj))

            bind_x = ((ux <= lox + eps_bx) & (gx > 0)) | (
                (ux >= hix - eps_bx) & (gx < 0))
            bind_y = ((uy <= loy + eps_by) & (gy > 0)) | (
                (uy >= hiy - eps_by) & (gy < 0))
            freex = jnp.where(bind_x, 0.0, 1.0)
            freey = jnp.where(bind_y, 0.0, 1.0)
            gx = gx * freex
            gy = gy * freey

            # Hessian diagonal 2x2 agent blocks [N, T].
            dxx = ((ddphi_s * ASX * ASX).sum(0)
                   + _hdot(EiPT, (ddphi_p * APXI * APXI).sum(0))
                   + _hdot(EjPT, (ddphi_p * APXJ * APXJ).sum(0)))
            dyy = ((ddphi_s * ASY * ASY).sum(0)
                   + _hdot(EiPT, (ddphi_p * APYI * APYI).sum(0))
                   + _hdot(EjPT, (ddphi_p * APYJ * APYJ).sum(0)))
            dxy = ((ddphi_s * ASX * ASY).sum(0)
                   + _hdot(EiPT, (ddphi_p * APXI * APYI).sum(0))
                   + _hdot(EjPT, (ddphi_p * APXJ * APYJ).sum(0)))
            # Cross blocks per pair in BOTH row layouts: Cxx[(n*N+m)] row
            # layout gives C^T columns as contiguous slices; the transposed
            # layout Wnm2 gives C columns as contiguous slices — 3-D arrays
            # (whose mid-axis slicing Mosaic lowers as gathers) never appear.
            sxx = (ddphi_p * APXI * APXJ).sum(0)
            sxy = (ddphi_p * APXI * APYJ).sum(0)
            syx = (ddphi_p * APYI * APXJ).sum(0)
            syy = (ddphi_p * APYI * APYJ).sum(0)
            Cxx = _hdot(WnmT, sxx)  # [N*N, T], row n*N+m = C[n, m]
            Cxy = _hdot(WnmT, sxy)
            Cyx = _hdot(WnmT, syx)
            Cyy = _hdot(WnmT, syy)
            CxxT = _hdot(Wnm2T, sxx)  # row m*N+n = C[n, m] (transposed layout)
            CxyT = _hdot(Wnm2T, sxy)
            CyxT = _hdot(Wnm2T, syx)
            CyyT = _hdot(Wnm2T, syy)

            free_d = jnp.concatenate([freex, freey], axis=0)  # [d, T]
            bind_d = 1.0 - free_d
            g2 = jnp.concatenate([gx, gy], axis=0)  # [d, T]

            ddx = dxx + 2.0 * wux + ridge
            ddy = dyy + 2.0 * wuy + ridge

            def hcol(k):
                """Column k of the free-set-restricted Hessian as [d, T]."""
                if k < N:  # x-variable of agent k
                    sl = slice(k * N, (k + 1) * N)
                    top = CxxT[sl] + Cxx[sl] + eyeN_c(k) * ddx[k:k + 1]
                    bot = CyxT[sl] + Cxy[sl] + eyeN_c(k) * dxy[k:k + 1]
                else:  # y-variable of agent k - N
                    m = k - N
                    sl = slice(m * N, (m + 1) * N)
                    top = CxyT[sl] + Cyx[sl] + eyeN_c(m) * dxy[m:m + 1]
                    bot = CyyT[sl] + Cyy[sl] + eyeN_c(m) * ddy[m:m + 1]
                col = jnp.concatenate([top, bot], axis=0)  # [d, T]
                col = col * free_d * free_d[k:k + 1]
                return col + eyeD_c(k) * bind_d[k:k + 1]

            # ---- unrolled right-looking Cholesky on full-height columns
            # (entries above the pivot are never read; semantics identical
            # to `safety/qp._chol_solve_blast`).
            Hcols = [hcol(k) for k in range(d)]
            L = []
            for j in range(d):
                piv = jax.lax.rsqrt(jnp.maximum(Hcols[j][j:j + 1], 1e-12))
                Lj = Hcols[j] * piv  # [d, T]
                L.append(Lj)
                for k in range(j + 1, d):
                    Hcols[k] = Hcols[k] - Lj * Lj[k:k + 1]
            rr = -g2
            ys = []
            for j in range(d):
                yj = rr[j:j + 1] / L[j][j:j + 1]  # [1, T]
                ys.append(yj)
                rr = rr - L[j] * yj  # rows <= j become junk, never read
            xs = [None] * d
            for j in range(d - 1, -1, -1):
                acc = ys[j]
                if j < d - 1:
                    tail = jnp.concatenate(xs[j + 1:], axis=0)  # [d-1-j, T]
                    acc = acc - (L[j][j + 1:] * tail).sum(0, keepdims=True)
                xs[j] = acc / L[j][j:j + 1]
            step = jnp.concatenate(xs, axis=0)  # [d, T]

            sx, sy = step[:N], step[N:]
            outward_x = ((ux <= lox + eps_bx) & (sx < 0)) | (
                (ux >= hix - eps_bx) & (sx > 0))
            outward_y = ((uy <= loy + eps_by) & (sy < 0)) | (
                (uy >= hiy - eps_by) & (sy > 0))
            sx = jnp.where(outward_x, 0.0, sx)
            sy = jnp.where(outward_y, 0.0, sy)

            big = 1e30
            ax_hi = jnp.where(sx > 1e-30, (hix - ux) / jnp.where(sx > 1e-30, sx, 1.0), big)
            ax_lo = jnp.where(sx < -1e-30, (lox - ux) / jnp.where(sx < -1e-30, sx, 1.0), big)
            ay_hi = jnp.where(sy > 1e-30, (hiy - uy) / jnp.where(sy > 1e-30, sy, 1.0), big)
            ay_lo = jnp.where(sy < -1e-30, (loy - uy) / jnp.where(sy < -1e-30, sy, 1.0), big)
            a_cap = jnp.minimum(
                jnp.minimum(ax_hi, ax_lo).min(0, keepdims=True),
                jnp.minimum(ay_hi, ay_lo).min(0, keepdims=True),
            )
            a_cap = jnp.clip(a_cap, 0.0, 4.0)  # [1, T]

            dr_s = ASX * sx[None] + ASY * sy[None]
            sxi = _hdot(EiP, sx)
            syi = _hdot(EiP, sy)
            sxj = _hdot(EjP, sx)
            syj = _hdot(EjP, sy)
            dr_p = (APXI * sxi[None] + APYI * syi[None]
                    + APXJ * sxj[None] + APYJ * syj[None])
            q1 = (2.0 * wux * (ux - unx) * sx + 2.0 * wuy * (uy - uny) * sy
                  ).sum(0, keepdims=True)
            q2 = (wux * sx * sx + wuy * sy * sy).sum(0, keepdims=True)

            def dF1(alpha):  # [1, T]; gradient only (bisection sign test)
                dphi_as = _phi_grad1(r_s + alpha[None] * dr_s, HS, WSS_, WLS)
                dphi_ap = _phi_grad1(r_p + alpha[None] * dr_p, HP, WSP_, WLP)
                return (q1 + 2.0 * q2 * alpha
                        + (dphi_as * dr_s).sum(0).sum(0, keepdims=True)
                        + (dphi_ap * dr_p).sum(0).sum(0, keepdims=True))

            def dF(alpha):  # [1, T]
                dphi_as, ddphi_as = _phi_grad(
                    r_s + alpha[None] * dr_s, HS, WSS_, WLS)
                dphi_ap, ddphi_ap = _phi_grad(
                    r_p + alpha[None] * dr_p, HP, WSP_, WLP)
                g1 = (q1 + 2.0 * q2 * alpha
                      + (dphi_as * dr_s).sum(0).sum(0, keepdims=True)
                      + (dphi_ap * dr_p).sum(0).sum(0, keepdims=True))
                g2d = (2.0 * q2
                       + (ddphi_as * dr_s * dr_s).sum(0).sum(0, keepdims=True)
                       + (ddphi_ap * dr_p * dr_p).sum(0).sum(0, keepdims=True))
                return g1, g2d

            g_cap = dF1(a_cap)
            lo_a = jnp.zeros_like(a_cap)
            hi_a = a_cap
            # 3 bisections (see safety/qp.py line-search comment: certified
            # with the 2-step polish; halves the dominant line-search cost).
            for _ in range(3):
                mid = 0.5 * (lo_a + hi_a)
                pos = dF1(mid) > 0
                hi_a = jnp.where(pos, mid, hi_a)
                lo_a = jnp.where(pos, lo_a, mid)
            alpha = 0.5 * (lo_a + hi_a)
            for _ in range(2):
                g1, g2d = dF(alpha)
                alpha = jnp.clip(alpha - g1 / jnp.maximum(g2d, 1e-12), lo_a, hi_a)
            alpha = jnp.where(g_cap <= 0, a_cap, alpha)

            def clip_u(uxn, uyn):
                return (jnp.clip(uxn, lox, hix), jnp.clip(uyn, loy, hiy))

            bx, by = clip_u(ux + alpha * sx, uy + alpha * sy)
            best_F = F_value(bx, by, WSS_, WSP_)
            for a_arc in (1.0, 4.0):
                cxu, cyu = clip_u(ux + a_arc * sx, uy + a_arc * sy)
                F_a = F_value(cxu, cyu, WSS_, WSP_)
                take_a = F_a < best_F
                bx = jnp.where(take_a, cxu, bx)
                by = jnp.where(take_a, cyu, by)
                best_F = jnp.where(take_a, F_a, best_F)
            take = best_F < F
            ux = jnp.where(take, bx, ux)
            uy = jnp.where(take, by, uy)
            return jnp.concatenate([ux, uy], axis=0)

        u0 = u0_r[:]
        ui = ui_r[:]
        F0 = F_value(u0[:N], u0[N:])
        Fi = F_value(ui[:N], ui[N:])
        better = Fi < F0
        u = jnp.where(better, ui, u0)

        if soft_iters > 0:
            # Stiffness continuation (see safety/qp.py): relaxed slack
            # stiffness lets Newton reach the constrained basin before the
            # full-stiffness iterations polish.
            # Geometric cap ladder soft_cap -> ws_cap (the upstream
            # normalization cap; see safety/qp.py). Runs as a fori_loop
            # with the stage cap computed from the loop index — unrolling
            # the stages triples the kernel's VMEM stack frame and blows
            # the scoped limit in grouped mode (Kp=18).
            log_soft = float(np.log(soft_cap))
            log_ratio = float(
                (np.log(ws_cap) - np.log(soft_cap)) / soft_iters
            )
            u_soft = jax.lax.fori_loop(
                0, soft_iters,
                lambda k, uu: newton_step(
                    uu,
                    jnp.exp(log_soft + k.astype(jnp.float32) * log_ratio),
                ),
                u, unroll=False,
            )
            # Accept the soft stage only where it improves the FULL
            # objective (see safety/qp.py continuation guard).
            keep = F_value(u_soft[:N], u_soft[N:]) < F_value(u[:N], u[N:])
            u = jnp.where(keep, u_soft, u)
        u = jax.lax.fori_loop(
            0, n_iters, lambda _, uu: newton_step(uu), u,
            unroll=False,
        )
        out_u[:] = u
        out_F[:] = jnp.broadcast_to(F_value(u[:N], u[N:]), (8, TB))

    return kernel


@partial(
    jax.jit,
    static_argnames=("N", "Ks", "Kp", "P", "pair_i", "pair_j", "w_u",
                     "u_lo", "u_hi", "n_iters", "ridge", "soft_iters",
                     "soft_cap", "ws_cap", "interpret"),
)
def newton_solve_pallas(
    singles,  # tuple of 6 arrays [Ks, N, B]: asx, asy, b, h, ws, wl (ws=0 marks invalid rows)
    pairs,  # tuple of 8 arrays [Kp, P, B]: axi, ayi, axj, ayj, b, h, ws, wl
    u0,  # [2N, B] start (x block then y block)
    u_init,  # [2N, B] warm candidate (pass u0 when absent)
    u_nom,  # [2N, B]
    N: int, Ks: int, Kp: int, P: int,
    pair_i: tuple, pair_j: tuple,
    w_u: tuple, u_lo: tuple, u_hi: tuple,
    n_iters: int, ridge: float,
    soft_iters: int = 0, soft_cap: float = 10.0, ws_cap: float = 3e6,
    interpret: bool = False,
):
    """Fused whole-solve. Returns (u_star [2N, B], F [B])."""
    B = u0.shape[-1]
    B_pad = ((B + TB - 1) // TB) * TB
    dpad = B_pad - B

    def padB(x):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, dpad)])

    asx, asy, bs, hs, wss, wls = (padB(x) for x in singles)
    apxi, apyi, apxj, apyj, bp, hp, wsp, wlp = (padB(x) for x in pairs)
    u0p, uip, unomp = padB(u0), padB(u_init), padB(u_nom)

    kernel = _make_kernel(
        N, Ks, Kp, P, np.asarray(pair_i), np.asarray(pair_j),
        w_u, u_lo, u_hi, n_iters, ridge, soft_iters, soft_cap, ws_cap,
    )
    d = 2 * N
    ei_p = np.eye(N, dtype=np.float32)[np.asarray(pair_i)]
    ej_p = np.eye(N, dtype=np.float32)[np.asarray(pair_j)]
    W_nmT = (ei_p[:, :, None] * ej_p[:, None, :]).reshape(P, N * N).T
    # Transposed layout (row m*N+n): gives C's COLUMNS as contiguous rows.
    W_nm2T = (ej_p[:, :, None] * ei_p[:, None, :]).reshape(P, N * N).T
    consts = (
        jnp.asarray(ei_p), jnp.asarray(ej_p),
        jnp.asarray(ei_p.T), jnp.asarray(ej_p.T),
        jnp.asarray(W_nmT), jnp.asarray(W_nm2T),
        jnp.asarray(np.eye(N, dtype=np.float32)),
        jnp.asarray(np.eye(d, dtype=np.float32)),
    )
    s_spec = pl.BlockSpec((Ks, N, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((Kp, P, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((d, TB), lambda i: (0, i), memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: tuple(0 for _ in c.shape),
                     memory_space=pltpu.VMEM)
        for c in consts
    ]

    out_u, out_F = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((d, B_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, B_pad), jnp.float32),
        ),
        grid=(B_pad // TB,),
        in_specs=[s_spec] * 6 + [p_spec] * 8 + [u_spec] * 3 + const_specs,
        out_specs=(
            u_spec,
            pl.BlockSpec((8, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # The whole-solve live set (~26 MB at TB=128) exceeds the
            # compiler's default 16 MB scoped-vmem budget; v5e VMEM is far
            # larger. 64 MB leaves headroom for double buffering.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(asx, asy, bs, hs, wss, wls,
      apxi, apyi, apxj, apyj, bp, hp, wsp, wlp,
      u0p, uip, unomp, *consts)
    return out_u[:, :B], out_F[0, :B]
