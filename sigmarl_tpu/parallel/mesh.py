"""Device-mesh utilities: scenario-axis data parallelism.

The reference has no distributed runtime (SURVEY §2.3/§5.8) — its
parallelism is batch vectorization plus OS-process fan-out. Here the
scenario (env batch) axis shards over a `jax.sharding.Mesh`: rollouts run
shard-local (agents of one env never span shards), and gradient reduction
in the PPO update is the only cross-device communication, inserted by XLA
from the sharding annotations (psum over the ICI).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env batch) axis across the mesh."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_world_state(state, mesh: Mesh):
    """Shard a `WorldState`: leaves whose leading axis is the env batch shard
    over the mesh; the circular state buffer [n_stored, B, ...] shards on its
    second axis; everything else (scalars, the global challenge buffer, and
    any leaf whose leading dim is not the batch) replicates."""
    import dataclasses

    B = state.pos.shape[0]
    env_s = env_sharding(mesh)
    rep = replicated(mesh)
    axis2 = NamedSharding(mesh, P(None, ENV_AXIS))
    out = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if f.name == "state_buffer":
            out[f.name] = jax.device_put(v, axis2)
        elif getattr(v, "ndim", 0) >= 1 and v.shape[0] == B:
            out[f.name] = jax.device_put(v, env_s)
        else:
            out[f.name] = jax.device_put(v, rep)
    return dataclasses.replace(state, **out)
