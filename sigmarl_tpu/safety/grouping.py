"""Spatial agent grouping for the grouped CBF-QP mode (batched, fixed shape).

The reference builds one cvxpy QP per group of capacity m, with intra-group
coupled pair constraints and single-sided cross-group constraints
(`cbf_qp.py:193-308` `group_agents_k_nearest`, `build_grouped_cbf_qps`).
Because the QP cost is separable per agent and cross-group rows touch only
one agent's control, the collection of per-group QPs is *exactly* one big
QP whose pair rows are masked by group membership — which is how the
batched filter implements it: same solver, group-masked coupling.

Grouping itself is the reference's K-seeded farthest-point sampling +
capacity-constrained nearest-centroid assignment, re-expressed as
fixed-shape `lax` loops vectorized over envs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def group_agents_k_nearest(pos: Array, max_group_size: int) -> Array:
    """Assign agents to K = ceil(N / m) spatially coherent groups.

    Args:
        pos: [B, N, 2] agent positions.

    Returns:
        group_id: [B, N] int32 in [0, K).
    """
    B, N = pos.shape[:2]
    K = int(math.ceil(N / max_group_size))
    big = 1e9

    def per_env(p):  # p: [N, 2]
        # Farthest-point seed selection (seed 0 = agent 0, reference `:229`).
        def fps_body(k, seeds):
            d2 = jnp.sum((p[:, None, :] - p[seeds][None, :, :]) ** 2, axis=-1)
            d2 = jnp.where(jnp.arange(K)[None, :] < k, d2, big)  # only real seeds
            d_min = d2.min(axis=1)  # [N] distance to nearest chosen seed
            is_seed = jnp.zeros(N, bool).at[seeds].set(True) & (
                jnp.arange(N) >= 0
            )
            d_min = jnp.where(is_seed, -1.0, d_min)
            return seeds.at[k].set(jnp.argmax(d_min).astype(jnp.int32))

        seeds = jnp.zeros(K, jnp.int32)
        seeds = jax.lax.fori_loop(1, K, fps_body, seeds)

        centroids = p[seeds]  # [K, 2]
        counts = jnp.ones(K, jnp.int32)
        group_id = jnp.full(N, -1, jnp.int32)
        group_id = group_id.at[seeds].set(jnp.arange(K, dtype=jnp.int32))

        # Capacity-constrained nearest-centroid assignment, in agent order
        # (reference `:238-268`), with incremental centroid updates.
        def assign(carry, i):
            group_id, centroids, counts = carry
            already = group_id[i] >= 0
            d2 = jnp.sum((p[i] - centroids) ** 2, axis=-1)
            d2 = jnp.where(counts < max_group_size, d2, big)
            g = jnp.argmin(d2).astype(jnp.int32)
            new_count = counts[g] + 1
            new_centroid = centroids[g] + (p[i] - centroids[g]) / new_count
            group_id = jnp.where(already, group_id, group_id.at[i].set(g))
            centroids = jnp.where(
                already, centroids, centroids.at[g].set(new_centroid)
            )
            counts = jnp.where(already, counts, counts.at[g].set(new_count))
            return (group_id, centroids, counts), None

        (group_id, _, _), _ = jax.lax.scan(
            assign, (group_id, centroids, counts), jnp.arange(N)
        )
        return group_id

    return jax.vmap(per_env)(pos)


def same_group_mask(group_id: Array, pair_i: Array, pair_j: Array) -> Array:
    """[B, P] bool — whether both agents of each pair share a group."""
    gi = group_id[:, pair_i]
    gj = group_id[:, pair_j]
    return gi == gj
