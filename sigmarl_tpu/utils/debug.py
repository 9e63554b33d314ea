"""Debug-mode numerics guards.

The reference enforces numerical sanity with inline asserts — NaN/Inf
rewards (`road_traffic.py:1245-1246`) and losses (`mappo_cavs.py:419`,
`priority_module.py:214-215`). Under jit those asserts cannot run on
traced values, so the TPU build offers:

- `enable_debug_numerics()`: flips `jax_debug_nans` on — every jitted
  program re-runs op-by-op when it produces a NaN and raises at the
  offending primitive;
- `assert_finite(x, name)`: an in-graph guard (host callback) that raises
  `FloatingPointError` when the watched tensor goes non-finite. Free when
  the flag is off (the call is simply not traced in).

Both are gated by `Parameters.debug_numerics` and cost nothing in
production graphs.
"""

from __future__ import annotations

import jax
import numpy as np


def enable_debug_numerics() -> None:
    jax.config.update("jax_debug_nans", True)


def assert_finite(x, name: str):
    """In-graph finiteness check via host callback (debug mode only —
    callers gate on the debug flag so production graphs never trace it)."""

    def _check(v):
        v = np.asarray(v)
        if not np.isfinite(v).all():
            bad = int((~np.isfinite(v)).sum())
            raise FloatingPointError(
                f"debug_numerics: {bad} non-finite values in '{name}'"
            )

    jax.debug.callback(_check, x)
    return x
