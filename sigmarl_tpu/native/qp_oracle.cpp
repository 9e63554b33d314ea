// First-party dense ADMM QP solver (OSQP-style splitting), double precision.
//
// Role in the framework: the reference delegates its CBF-QP solves to the
// third-party native OSQP/CLARABEL/SCS solvers (reference
// sigmarl/cbf_qp.py:1222-1251). The TPU build replaces those with the
// batched eliminated-variable projected-Newton solver in safety/qp.py; this
// C++ oracle is the first-party native replacement for the reference
// solver family — the same ADMM scheme OSQP uses, in f64 — and serves as
// the exactness oracle the test suite cross-validates the TPU solver
// against (tests/test_native_qp.py).
//
// Problem form:   minimize    1/2 x' P x + q' x
//                 subject to  l <= A x <= u
//
// Algorithm (standard OSQP ADMM splitting):
//   K = P + sigma*I + rho*A'A            (Cholesky, factored once)
//   x~    = K^-1 (sigma*x - q + A'(rho*z - y))
//   x     = alpha*x~ + (1-alpha)*x
//   zhat  = A x~
//   z     = clip(alpha*zhat + (1-alpha)*z + y/rho, l, u)
//   y     = y + rho*(alpha*zhat + (1-alpha)*z_prev - z)
//
// Build: g++ -O2 -shared -fPIC qp_oracle.cpp -o libqp_oracle.so

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Dense Cholesky factorization (lower triangular, in place). Returns 0 on
// success, -1 if the matrix is not positive definite.
int cholesky(std::vector<double>& K, int n) {
  for (int j = 0; j < n; ++j) {
    double d = K[j * n + j];
    for (int k = 0; k < j; ++k) d -= K[j * n + k] * K[j * n + k];
    if (d <= 0.0) return -1;
    d = std::sqrt(d);
    K[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double s = K[i * n + j];
      for (int k = 0; k < j; ++k) s -= K[i * n + k] * K[j * n + k];
      K[i * n + j] = s / d;
    }
  }
  return 0;
}

void chol_solve(const std::vector<double>& L, int n, double* b) {
  // Forward substitution L w = b.
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * b[k];
    b[i] = s / L[i * n + i];
  }
  // Back substitution L' x = w.
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * b[k];
    b[i] = s / L[i * n + i];
  }
}

inline double clip(double v, double lo, double hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

// Returns the number of iterations used (>= 0) on convergence, or
// -iterations if the budget was exhausted, or -1000000 - code on setup
// failure. Outputs: x_out [n], y_out [m] (duals), z_out [m].
int solve_qp_admm(int n, int m, const double* P, const double* q,
                  const double* A_in, const double* l_in, const double* u_in,
                  double* x_out, double* y_out, double* z_out, int max_iter,
                  double eps_abs, double eps_rel, double rho, double sigma,
                  double alpha) {
  // Row equilibration (Ruiz-lite): scale each constraint row to unit norm.
  // Exact reformulation — x is unchanged, duals are rescaled on output.
  std::vector<double> A(static_cast<size_t>(m) * n), l(m), u(m), rscale(m);
  for (int k = 0; k < m; ++k) {
    double nrm = 0.0;
    for (int i = 0; i < n; ++i) nrm += A_in[k * n + i] * A_in[k * n + i];
    nrm = std::sqrt(nrm);
    double s = nrm > 1e-12 ? 1.0 / nrm : 1.0;
    rscale[k] = s;
    for (int i = 0; i < n; ++i) A[k * n + i] = A_in[k * n + i] * s;
    l[k] = (l_in[k] <= -1e19) ? l_in[k] : l_in[k] * s;
    u[k] = (u_in[k] >= 1e19) ? u_in[k] : u_in[k] * s;
  }

  std::vector<double> K(static_cast<size_t>(n) * n);
  auto factor = [&](double rho_f) -> int {
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double v = P[i * n + j] + (i == j ? sigma : 0.0);
        for (int k = 0; k < m; ++k) v += rho_f * A[k * n + i] * A[k * n + j];
        K[i * n + j] = v;
      }
    return cholesky(K, n);
  };
  if (factor(rho) != 0) return -1000001;

  std::vector<double> x(n, 0.0), z(m, 0.0), y(m, 0.0);
  std::vector<double> rhs(n), xt(n), zhat(m), z_prev(m), Ax(m), Aty(n), Px(n);

  for (int it = 1; it <= max_iter; ++it) {
    // rhs = sigma*x - q + A'(rho*z - y)
    for (int i = 0; i < n; ++i) {
      double s = sigma * x[i] - q[i];
      for (int k = 0; k < m; ++k) s += A[k * n + i] * (rho * z[k] - y[k]);
      rhs[i] = s;
    }
    std::memcpy(xt.data(), rhs.data(), sizeof(double) * n);
    chol_solve(K, n, xt.data());

    for (int k = 0; k < m; ++k) {
      double s = 0.0;
      for (int i = 0; i < n; ++i) s += A[k * n + i] * xt[i];
      zhat[k] = s;
    }
    for (int i = 0; i < n; ++i) x[i] = alpha * xt[i] + (1.0 - alpha) * x[i];
    std::memcpy(z_prev.data(), z.data(), sizeof(double) * m);
    for (int k = 0; k < m; ++k) {
      double v = alpha * zhat[k] + (1.0 - alpha) * z_prev[k] + y[k] / rho;
      z[k] = clip(v, l[k], u[k]);
      y[k] += rho * (alpha * zhat[k] + (1.0 - alpha) * z_prev[k] - z[k]);
    }

    if (it % 10 == 0 || it == max_iter) {
      // Primal residual: ||Ax - z||_inf; dual: ||Px + q + A'y||_inf.
      double r_prim = 0.0, norm_ax = 0.0, norm_z = 0.0;
      for (int k = 0; k < m; ++k) {
        double s = 0.0;
        for (int i = 0; i < n; ++i) s += A[k * n + i] * x[i];
        Ax[k] = s;
        r_prim = std::max(r_prim, std::fabs(s - z[k]));
        norm_ax = std::max(norm_ax, std::fabs(s));
        norm_z = std::max(norm_z, std::fabs(z[k]));
      }
      double r_dual = 0.0, norm_px = 0.0, norm_aty = 0.0, norm_q = 0.0;
      for (int i = 0; i < n; ++i) {
        double px = 0.0;
        for (int j = 0; j < n; ++j) px += P[i * n + j] * x[j];
        double aty = 0.0;
        for (int k = 0; k < m; ++k) aty += A[k * n + i] * y[k];
        Px[i] = px;
        Aty[i] = aty;
        r_dual = std::max(r_dual, std::fabs(px + q[i] + aty));
        norm_px = std::max(norm_px, std::fabs(px));
        norm_aty = std::max(norm_aty, std::fabs(aty));
        norm_q = std::max(norm_q, std::fabs(q[i]));
      }
      double eps_prim = eps_abs + eps_rel * std::max(norm_ax, norm_z);
      double eps_dual =
          eps_abs + eps_rel * std::max(norm_px, std::max(norm_aty, norm_q));
      if (r_prim <= eps_prim && r_dual <= eps_dual) {
        std::memcpy(x_out, x.data(), sizeof(double) * n);
        for (int k = 0; k < m; ++k) {
          y_out[k] = y[k] * rscale[k];
          z_out[k] = z[k] / rscale[k];
        }
        return it;
      }
      // Adaptive rho (OSQP rule): balance primal and dual residuals,
      // refactor when rho changes materially.
      if (it % 100 == 0) {
        double sp = r_prim / std::max(std::max(norm_ax, norm_z), 1e-12);
        double sd = r_dual /
                    std::max(std::max(norm_px, std::max(norm_aty, norm_q)), 1e-12);
        double ratio = std::sqrt(sp / std::max(sd, 1e-16));
        if (ratio > 5.0 || ratio < 0.2) {
          double rho_new = clip(rho * ratio, 1e-6, 1e6);
          if (factor(rho_new) == 0) {
            // Rescale dual variable consistently with the new rho.
            rho = rho_new;
          }
        }
      }
    }
  }
  std::memcpy(x_out, x.data(), sizeof(double) * n);
  for (int k = 0; k < m; ++k) {
    y_out[k] = y[k] * rscale[k];
    z_out[k] = z[k] / rscale[k];
  }
  return -max_iter;
}

// Batched entry point: solve `count` problems with identical shapes.
int solve_qp_admm_batch(int count, int n, int m, const double* P,
                        const double* q, const double* A, const double* l,
                        const double* u, double* x_out, int max_iter,
                        double eps_abs, double eps_rel, double rho,
                        double sigma, double alpha) {
  std::vector<double> y(m), z(m);
  int worst = 1;
  for (int b = 0; b < count; ++b) {
    int rc = solve_qp_admm(n, m, P + (size_t)b * n * n, q + (size_t)b * n,
                           A + (size_t)b * m * n, l + (size_t)b * m,
                           u + (size_t)b * m, x_out + (size_t)b * n, y.data(),
                           z.data(), max_iter, eps_abs, eps_rel, rho, sigma,
                           alpha);
    if (rc < worst) worst = rc;
  }
  return worst;
}

}  // extern "C"
