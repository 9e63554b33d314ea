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
HOST_AXIS = "host"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host wiring: `jax.distributed.initialize` (SURVEY §5.8).

    On a TPU pod slice call with no arguments (JAX auto-detects from the
    TPU environment). On CPU/GPU clusters pass the coordinator address and
    process identity explicitly. After this, `jax.devices()` is the GLOBAL
    device list and meshes built from it span hosts — scenario shards ride
    ICI within a host and DCN across hosts, with XLA inserting the
    collectives (gradient psum is the only cross-host traffic in training).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (ENV_AXIS,))


def make_host_device_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D (host, env) mesh over the global device list: axis 0 enumerates
    hosts (DCN), axis 1 the devices within a host (ICI). Scenario data
    shards over BOTH axes (P((HOST_AXIS, ENV_AXIS))) so each device owns
    B/total_devices scenarios; the factored form keeps any cross-host
    collective explicit and lets gradient reductions hierarchy-reduce
    (intra-host first, then across DCN)."""
    devices = list(devices if devices is not None else jax.devices())
    n_hosts = max(1, jax.process_count())
    per_host = len(devices) // n_hosts
    arr = np.array(devices).reshape(n_hosts, per_host)
    return Mesh(arr, (HOST_AXIS, ENV_AXIS))


def make_global_state(state, mesh: Mesh, pspec_leading=None):
    """Build a GLOBAL (possibly multi-process) sharded WorldState from the
    process-local full copy (all processes hold identical values, e.g. from
    `zero_state`). Uses `jax.make_array_from_callback`, the
    multi-controller-safe construction path (each process materializes only
    its addressable shards from the global index)."""
    import dataclasses

    if pspec_leading is None:
        pspec_leading = P(*mesh.axis_names) if len(mesh.axis_names) > 1 else P(ENV_AXIS)

    B = state.pos.shape[0]
    out = {}
    for f in dataclasses.fields(state):
        v = np.asarray(getattr(state, f.name))
        if f.name in ("state_buffer", "obs_history"):
            sh = NamedSharding(mesh, P(None, *pspec_leading))
        elif v.ndim >= 1 and v.shape[0] == B:
            sh = NamedSharding(mesh, pspec_leading)
        else:
            sh = NamedSharding(mesh, P())
        out[f.name] = jax.make_array_from_callback(
            v.shape, sh, lambda idx, v=v: v[idx]
        )
    return dataclasses.replace(state, **out)


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
        if f.name in ("state_buffer", "obs_history"):
            out[f.name] = jax.device_put(v, axis2)
        elif getattr(v, "ndim", 0) >= 1 and v.shape[0] == B:
            out[f.name] = jax.device_put(v, env_s)
        else:
            out[f.name] = jax.device_put(v, rep)
    return dataclasses.replace(state, **out)
