"""Goal-reaching world state (single-agent point-to-goal task).

TPU-native equivalent of the reference's minimal GR environment state
(`scenarios/world_state/world_state_gr/world_state_gr.py:22-71` and
`world_state_gr_sim.py:5-15`): one agent per env whose reference path is
the straight segment from its spawn position to a goal point. Tracked
state per step: rectangle vertices, the perpendicular distance to the
spawn->goal segment, and the c2c mutual-distance matrix (trivially zero
off-diagonal padding for N=1, kept for API symmetry with the RT state).

Everything is a pure function over `[B, N, ...]` arrays — the reference's
`update_state_before_rewarding` (vertices + distances for one agent at a
time) folds into a single fused update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sigmarl_tpu.constants import AGENTS
from sigmarl_tpu.core import geometry as G

Array = jax.Array


class GoalReachingState(NamedTuple):
    """Dynamic GR world state. Shapes: [B, N, ...] (N = 1 in the reference)."""

    pos: Array  # [B, N, 2]
    rot: Array  # [B, N]
    original_pos: Array  # [B, N, 2] spawn position (segment start)
    goal: Array  # [B, N, 2] goal point (segment end)
    vertices: Array  # [B, N, 5, 2] closed rectangle vertices
    d_ref: Array  # [B, N] perpendicular distance to the spawn->goal segment
    d_agents: Array  # [B, N, N] mutual c2c distances


def init_goal_reaching(pos: Array, rot: Array, goal: Array) -> GoalReachingState:
    """Initialize from spawn poses and goals (reference
    `WorldStateGRParameters`: `goal`, `original_pos`)."""
    state = GoalReachingState(
        pos=pos,
        rot=rot,
        original_pos=pos,
        goal=goal,
        vertices=jnp.zeros(pos.shape[:-1] + (5, 2)),
        d_ref=jnp.zeros(pos.shape[:-1]),
        d_agents=jnp.zeros(pos.shape[:-1] + (pos.shape[-2],)),
    )
    return update_goal_reaching(state, pos, rot)


def update_goal_reaching(
    state: GoalReachingState, pos: Array, rot: Array
) -> GoalReachingState:
    """Per-step state update (reference `update_state_before_rewarding`:
    vertices + distance to the spawn->goal segment + mutual distances)."""
    verts = G.rectangle_vertices(
        pos, rot, AGENTS["width"], AGENTS["length"], close_shape=True
    )
    # Reference path = the 2-point polyline [original_pos, goal]
    # (`world_state_gr.py:50-58`).
    seg = jnp.stack([state.original_pos, state.goal], axis=-2)  # [B, N, 2, 2]
    d_ref, _ = G.perpendicular_distances(pos, seg)
    d_agents = G.c2c_distances(pos, set_diagonal_to=0.0)
    return state._replace(
        pos=pos, rot=rot, vertices=verts, d_ref=d_ref, d_agents=d_agents
    )


def goal_reached(state: GoalReachingState, threshold: float) -> Array:
    """Whether each agent is within `threshold` of its goal. [B, N] bool."""
    return jnp.linalg.norm(state.pos - state.goal, axis=-1) < threshold
