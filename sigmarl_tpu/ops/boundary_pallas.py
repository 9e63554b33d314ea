"""Pallas TPU kernel: pseudo-distance stencil against VMEM-resident maps.

The CBF safety filter's hottest geometry op evaluates the pseudo-distance
field (reference `sigmarl/pseudo_distance.py:123-202`) at 27 stencil
points per agent per side — B x N x 27 queries, each a min over the whole
~176-segment boundary polyline of the agent's reference path
(`sigmarl/cbf_qp.py:575-665` drives this per agent per step in Python).

XLA's lowering of the jnp version (`safety/pseudo_distance.pseudo_distance_seg`)
first materializes per-agent gathered copies of the segment tables in HBM
([B, N, S, 8] ~ 21 MB at B=1024) via a one-hot matmul and then streams
them back for the stencil sweep. This kernel exploits that the WHOLE map
(all K=40 reference paths' precomputed segment frames, [K, S] per
component ~ 28 KB each) fits in VMEM: tables are loaded once per grid
step, the per-agent row is gathered with a tiny [T, K] @ [K, S] one-hot
matmul on the MXU, and all 2 x 27 query sweeps for a tile of T agents run
back-to-back from VMEM — the gathered tables never touch HBM.

Correctness is pinned against the jnp reference implementation by
`tests/test_pallas_kernels.py` (CPU interpret mode + TPU when available).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG2 = 1.0e6  # invalid-segment fill for squared distances (sqrt -> 1000.0,
# the jnp path's _BIG fill value, exactly representable)


def _stencil_kernel(oh_ref, q_ref, *refs):
    """One grid step: T agent rows x (2 sides x Q queries) x S segments.

    refs layout: 8 left-table components [K, S], 8 right-table components,
    then the output ref [T, 2*Q]. oh_ref is the precomputed one-hot path
    selector [T, K] (an int32 [T, 1] block would need an illegal sub-lane
    layout; the f32 one-hot is MXU-ready as-is).
    """
    left = refs[0:8]
    right = refs[8:16]
    out_ref = refs[16]
    Q = q_ref.shape[1] // 2

    oh = oh_ref[:]  # [T, K] f32

    def gather(comp_ref):
        # HIGHEST precision: the default MXU f32 path rounds operands
        # through bfloat16, corrupting gathered coordinates by ~1e-2 —
        # a one-hot gather must reproduce table values exactly.
        return jax.lax.dot_general(
            oh, comp_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    for side, comps in enumerate((left, right)):
        pbx, pby, cos_t, sin_t, seg_l, m_b, m_t, valid = (
            gather(c) for c in comps
        )  # each [T, S]
        ok_base = valid > 0.5
        dm = m_t - m_b
        for qi in range(Q):
            qx = q_ref[:, 2 * qi][:, None]  # [T, 1]
            qy = q_ref[:, 2 * qi + 1][:, None]
            rx = qx - pbx
            ry = qy - pby
            x = cos_t * rx + sin_t * ry
            y = -sin_t * rx + cos_t * ry
            denom = seg_l - y * dm
            lam = (x + y * m_b) / denom
            nx = x - lam * seg_l
            d2 = nx * nx + y * y
            # Same widened validity band as the jnp path (pseudo_distance.
            # _LAM_EPS): strict [0, 1) is knife-edged at segment joints.
            ok = ok_base & (lam >= -1e-3) & (lam < 1.0 + 1e-3)
            d2 = jnp.where(ok, d2, _BIG2)
            out_ref[:, side * Q + qi] = jnp.sqrt(jnp.min(d2, axis=-1))


@partial(jax.jit, static_argnames=("interpret",))
def pseudo_distance_stencil(
    q: Array,  # [R, Q, 2] query points
    path_id: Array,  # [R] int32
    left_seg: Array,  # [K, S, 8] from safety.pseudo_distance.segment_table
    right_seg: Array,  # [K, S, 8]
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Pseudo distances of all queries to both boundaries. Returns
    (d_left [R, Q], d_right [R, Q]); matches `pseudo_distance_seg` on the
    gathered tables to fp32 ulp-level accuracy."""
    R, Q = q.shape[0], q.shape[1]
    K, S = left_seg.shape[0], left_seg.shape[1]
    T = 128  # agent rows per grid step
    R_pad = ((R + T - 1) // T) * T
    # Pad the segment axis to a lane multiple (invalid-marked): non-128
    # aligned table tiles read garbage lanes on real hardware.
    S_pad = ((S + 127) // 128) * 128
    pad_seg = ((0, 0), (0, S_pad - S), (0, 0))
    left_seg = jnp.pad(left_seg, pad_seg)
    right_seg = jnp.pad(right_seg, pad_seg)
    S = S_pad

    qf = jnp.pad(q.reshape(R, 2 * Q), ((0, R_pad - R), (0, 0)))
    pid = jnp.pad(path_id.astype(jnp.int32), (0, R_pad - R))
    oh = jax.nn.one_hot(pid, K, dtype=jnp.float32)  # [R_pad, K]

    comps = [left_seg[:, :, c] for c in range(8)] + [
        right_seg[:, :, c] for c in range(8)
    ]

    table_spec = pl.BlockSpec((K, S), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _stencil_kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, 2 * Q), jnp.float32),
        grid=(R_pad // T,),
        in_specs=[
            pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2 * Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + [table_spec] * 16,
        out_specs=pl.BlockSpec((T, 2 * Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(oh, qf, *comps)
    return out[:R, :Q], out[:R, Q:]
