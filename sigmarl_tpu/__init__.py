"""sigmarl_tpu — a TPU-native (JAX/XLA/Pallas) multi-agent RL framework for
motion planning of Connected and Automated Vehicles (CAVs).

Re-designed from scratch for TPU hardware with the capabilities of the
reference framework SigmaRL (bassamlab/SigmaRL):

- a vectorized 2-D road-traffic simulator with kinematic-bicycle agents on
  lanelet maps (pure-functional, `jit`/`vmap`/`shard_map`-first),
- MAPPO training (flax/optax) with a `lax.scan` collector,
- Control Barrier Function (CBF) safety layers: a batched Truncated-Taylor
  CBF-QP filter with a first-party batched QP solver, pseudo-distance
  road-boundary constraints, CBF-informed reward shaping,
- XP-MARL priority-based action propagation and opponent modeling.

Design stance (see SURVEY.md §7): one pure, jittable world-step over
struct-of-arrays state `[B, N, ...]`; the scenario axis shards over a
`jax.sharding.Mesh`; all data-dependent control flow of the reference
(per-agent Python loops, rejection sampling, cvxpy) becomes masked
fixed-shape tensor ops, `lax.scan`, and a batched QP kernel.
"""

__version__ = "0.1.0"

from sigmarl_tpu.constants import SCENARIOS, AGENTS, THRESHOLD  # noqa: F401
from sigmarl_tpu.config import Parameters  # noqa: F401
