"""First-party native (C++) components.

`qp_oracle`: dense OSQP-style ADMM QP solver in double precision — the
first-party replacement for the reference's third-party native solver
chain (OSQP/CLARABEL/SCS, reference `cbf_qp.py:1222-1251`) and the
exactness oracle for the batched TPU solver. Compiled on first use with
g++ and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "qp_oracle.cpp")
_LIB = os.path.join(_HERE, "libqp_oracle.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
    return _LIB


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        dp = ctypes.POINTER(ctypes.c_double)
        lib.solve_qp_admm.restype = ctypes.c_int
        lib.solve_qp_admm.argtypes = [
            ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp, dp, dp, dp,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ]
        lib.solve_qp_admm_batch.restype = ctypes.c_int
        lib.solve_qp_admm_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp, dp,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ]
        _lib = lib
    return _lib


def _as_c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def solve_qp(
    P: np.ndarray,
    q: np.ndarray,
    A: np.ndarray,
    l: np.ndarray,
    u: np.ndarray,
    max_iter: int = 20000,
    eps_abs: float = 1e-7,
    eps_rel: float = 1e-7,
    rho: float = 0.1,
    sigma: float = 1e-6,
    alpha: float = 1.6,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Solve min 1/2 x'Px + q'x s.t. l <= Ax <= u. Returns (x, y, iters)."""
    lib = load()
    n, m = q.shape[0], l.shape[0]
    P = np.ascontiguousarray(P, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    A = np.ascontiguousarray(A, np.float64)
    l = np.ascontiguousarray(l, np.float64)
    u = np.ascontiguousarray(u, np.float64)
    x = np.zeros(n, np.float64)
    y = np.zeros(m, np.float64)
    z = np.zeros(m, np.float64)
    rc = lib.solve_qp_admm(
        n, m, _as_c(P), _as_c(q), _as_c(A), _as_c(l), _as_c(u),
        _as_c(x), _as_c(y), _as_c(z),
        max_iter, eps_abs, eps_rel, rho, sigma, alpha,
    )
    if rc <= -1000000:
        raise RuntimeError(f"qp_oracle setup failed (code {rc})")
    return x, y, rc
