"""Per-step world-state updates: distances, vertices, collisions, paths.

TPU-native consolidation of the reference's per-agent update loops
(`world_state_rt.py:582-725`, `world_state_rt_sim.py:360-454`): the agent
axis is folded into the array program, all polyline lookups are gathers
into the stacked `MapTables`, and every op is fixed-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.core import geometry as G
from sigmarl_tpu.env.map_tables import MapTables, lookup, path_onehot
from sigmarl_tpu.env.structs import EnvConfig, WorldState, replace_state

Array = jax.Array


def update_geometry(
    cfg: EnvConfig,
    tables: MapTables,
    state: WorldState,
    skip_collisions: bool = False,
) -> WorldState:
    """Recompute vertices, boundary/reference distances, mutual distances and
    collision matrices from the current kinematic state.

    Equivalent to the reference's `update_state_before_rewarding`
    (`world_state_rt_sim.py:432-448`) for all agents at once. Divergences
    (documented): vertex-to-boundary distances always use the *current*
    vertices (the reference's agent-0 pass reads one-step-stale vertices),
    and entry/exit crossing is masked per-env by the path's loop flag
    (the reference skips the check for all envs if any env's path loops).

    `skip_collisions` keeps the existing collision flags (the reset path
    uses this: post-reset flags are cleared for reset envs and unchanged
    for the rest, so the five interX sweeps there are provably redundant).
    """
    pos, rot = state.pos, state.rot
    verts = G.rectangle_vertices(pos, rot, cfg.agent_width, cfg.agent_length, True)

    if cfg.distance_type == "c2c":
        d_agents = G.c2c_distances(pos, set_diagonal_to=cfg.world_semidiag)
    else:
        d_agents = G.mtv_distances(verts, set_diagonal_to=cfg.world_semidiag)

    oh = path_onehot(state.path_id, tables.long_term.shape[0])
    lt = lookup(oh, tables.long_term)  # [B, N, P, 2]
    n_lt = lookup(oh, tables.n_points_long_term)
    lb = lookup(oh, tables.left_boundary)  # [B, N, PB, 2]
    rb = lookup(oh, tables.right_boundary)
    n_lb = lookup(oh, tables.n_points_left_b)
    n_rb = lookup(oh, tables.n_points_right_b)
    # Materialize the per-agent polylines ONCE: each has several consumers
    # (center sweep, corner sweep, interX) and without the barrier XLA
    # duplicates the one-hot lookup einsum into every consumer fusion —
    # measured 1.3 ms/step of redundant MXU work at B=1024
    # (scripts/profile_geom_bisect.py, PROFILE_r04.md).
    lt, lb, rb = jax.lax.optimization_barrier((lt, lb, rb))

    d_ref, idx_ref = G.perpendicular_distances(pos, lt, n_lt)

    half_w = cfg.agent_width / 2
    dl0, idx_left = G.perpendicular_distances(pos, lb, n_lb)
    dr0, idx_right = G.perpendicular_distances(pos, rb, n_rb)
    # The four corner vertices against each boundary, via a broadcast axis.
    # min-only sweep: the corner distances need neither the closest index
    # nor the padding correction (see `min_perpendicular_distance` — the
    # padded entries provably cannot win the min), which collapses the
    # [B, N, 4, P] intermediates to one fused reduction.
    v4 = verts[..., 0:4, :]  # [B, N, 4, 2]
    if cfg.geom_topk_chunks > 0:
        # Chunk-pruned sweep: k chunks of 16 segments selected by their
        # bounding-circle lower bound from the agent CG (reach = the rect
        # half-diagonal covers all four corners). Exact wherever the true
        # corner distance is below every unselected chunk's bound — the
        # regime where boundary rewards/observations resolve. The gathered
        # pseudo-distance segment rows double as (start, vec) segments.
        from sigmarl_tpu.safety.pseudo_distance import PD_CHUNK, topk_chunk_rows

        k_sel = min(cfg.geom_topk_chunks, tables.left_seg.shape[1] // PD_CHUNK)
        reach = 0.5 * float(np.hypot(cfg.agent_length, cfg.agent_width))
        lrows = topk_chunk_rows(
            tables.left_seg, tables.left_chunk_cc, tables.left_chunk_cr,
            oh, state.path_id, pos, reach, k_sel,
        )
        rrows = topk_chunk_rows(
            tables.right_seg, tables.right_chunk_cc, tables.right_chunk_cr,
            oh, state.path_id, pos, reach, k_sel,
        )
        dlv = G.min_distance_to_segment_rows(v4, lrows)
        drv = G.min_distance_to_segment_rows(v4, rrows)
    else:
        dlv = G.min_perpendicular_distance(v4, lb[..., None, :, :])
        drv = G.min_perpendicular_distance(v4, rb[..., None, :, :])
    d_left = jnp.concatenate([(dl0 - half_w)[..., None], dlv], axis=-1)  # [B,N,5]
    d_right = jnp.concatenate([(dr0 - half_w)[..., None], drv], axis=-1)
    d_boundary = jnp.minimum(d_left.min(-1), d_right.min(-1))

    if skip_collisions:
        coll_agents = state.coll_agents
        coll_lanelets = state.coll_lanelets
        coll_entry = state.coll_entry
        coll_exit = state.coll_exit
    else:
        # Agent-agent collisions.
        if cfg.distance_type == "c2c":
            pair_hit = G.interx(verts[:, :, None], verts[:, None, :])  # [B, N, N]
            eye = jnp.eye(cfg.n_agents, dtype=bool)
            coll_agents = pair_hit & ~eye
        else:
            coll_agents = d_agents <= 0.0

        # Agent-boundary collisions: ego-frame segment-vs-box slab test —
        # exact interX equivalent for continuous boundary polylines at ~5x
        # fewer vector ops (see `G.rect_polyline_hit`; agreement with the
        # interX path pinned by tests/test_geometry.py).
        coll_lanelets = G.rect_polyline_hit(
            pos, rot, cfg.agent_width, cfg.agent_length, lb
        ) | G.rect_polyline_hit(pos, rot, cfg.agent_width, cfg.agent_length, rb)

        # Entry/exit segment crossings (meaningful for non-loop paths only).
        # All-loop maps (cpm_entire) resolve this at TRACE time — the loop
        # property is a static Python bool on the config (set by make_env),
        # so the two interX sweeps + three lookups vanish from the compiled
        # step (0.22 ms at B=1024) and the branch stays traceable even when
        # MapTables is passed as a traced jit/shard_map argument.
        if cfg.all_paths_loop:
            B, N = pos.shape[:2]
            coll_entry = jnp.zeros((B, N), bool)
            coll_exit = jnp.zeros((B, N), bool)
        else:
            not_loop = ~lookup(oh, tables.is_loop)
            coll_entry = G.interx(verts, lookup(oh, tables.entry)) & not_loop
            coll_exit = G.interx(verts, lookup(oh, tables.exit)) & not_loop

    return replace_state(
        state,
        vertices=verts,
        d_agents=d_agents,
        d_ref=d_ref,
        idx_ref=idx_ref,
        idx_left=idx_left,
        idx_right=idx_right,
        d_left=d_left,
        d_right=d_right,
        d_boundary=d_boundary,
        coll_agents=coll_agents,
        coll_lanelets=coll_lanelets,
        coll_entry=coll_entry,
        coll_exit=coll_exit,
    )


def refresh_geometry_after_reset(
    cfg: EnvConfig, tables: MapTables, state: WorldState, reset_mask: Array
) -> WorldState:
    """Post-reset geometry refresh WITHOUT boundary-polyline sweeps.

    Every spawned pose is exactly a (path, point) entry of the spawn tables,
    whose boundary geometry was precomputed at map-build time with the same
    functions (`MapTables.spawn_*`) — so reset agents' derived fields are a
    gather, non-reset agents keep their current values (their state did not
    move), and only the cheap cross-agent pieces (vertices, mutual
    distances) are recomputed. Replaces a second full `update_geometry`
    (two boundary perp sweeps x 5 query points) in the hot step path.
    """
    pos, rot = state.pos, state.rot
    m = reset_mask
    verts = G.rectangle_vertices(pos, rot, cfg.agent_width, cfg.agent_length, True)
    if cfg.distance_type == "c2c":
        d_agents = G.c2c_distances(pos, set_diagonal_to=cfg.world_semidiag)
    else:
        d_agents = G.mtv_distances(verts, set_diagonal_to=cfg.world_semidiag)

    K, P = tables.long_term.shape[:2]
    flat = (state.path_id * P + state.point_id).astype(jnp.int32)  # [B, N]

    def g(t):
        return t.reshape(K * P, *t.shape[2:])[flat]

    m1 = m[..., None]
    d_left = jnp.where(m1, g(tables.spawn_d_left), state.d_left)
    d_right = jnp.where(m1, g(tables.spawn_d_right), state.d_right)
    return replace_state(
        state,
        vertices=verts,
        d_agents=d_agents,
        d_ref=jnp.where(m, g(tables.spawn_d_ref), state.d_ref),
        idx_ref=jnp.where(m, g(tables.spawn_idx_ref), state.idx_ref),
        idx_left=jnp.where(m, g(tables.spawn_idx_left), state.idx_left),
        idx_right=jnp.where(m, g(tables.spawn_idx_right), state.idx_right),
        d_left=d_left,
        d_right=d_right,
        d_boundary=jnp.minimum(d_left.min(-1), d_right.min(-1)),
    )


def update_short_term_paths(
    cfg: EnvConfig, tables: MapTables, state: WorldState, at_reset: bool = False
) -> WorldState:
    """Refresh the short-term reference window (and nearing boundary points
    when boundary points are observed instead of distances).

    Reference `update_ref_paths_agent_related` (`world_state_rt.py:668-725`);
    at reset the nearing-boundary windows use shift +1 instead of -2
    (`world_state_rt.py:512-576`).
    """
    # Per-agent scalars from the [K]-tables (tiny gathers), then the window
    # points directly from the [K, P, 2] tables via ONE flat gather per
    # window — never materializing per-agent [B, N, P, 2] copies.
    pid = state.path_id
    n_lt = tables.n_points_long_term[pid]  # [B, N]
    is_loop = tables.is_loop[pid]

    def window(table: Array, idx: Array, n_points: int, interval: int, shift: int):
        """Same index math as `G.short_term_reference_path`, gathered from
        the stacked table."""
        K, P = table.shape[:2]
        offsets = jnp.arange(n_points, dtype=jnp.int32) * interval
        future = offsets + idx[..., None].astype(jnp.int32) + shift
        n = n_lt[..., None].astype(jnp.int32)
        wrapped = jnp.where(future >= n - 1, (future + 1) % jnp.maximum(n, 1), future)
        future = jnp.where(is_loop[..., None], wrapped, future)
        future = jnp.clip(future, 0, P - 1)
        flat = pid[..., None] * P + future  # [B, N, n_points]
        return table.reshape(K * P, 2)[flat]

    short_term = window(
        tables.long_term, state.idx_ref, cfg.n_points_short_term,
        cfg.sample_interval_ref_path, 1,
    )
    out = {"short_term": short_term}
    if not cfg.is_observe_distance_to_boundaries:
        shift = 1 if at_reset else -2
        nl = window(
            tables.left_boundary, state.idx_left,
            cfg.n_points_nearing_boundary, 1, shift,
        )
        nr = window(
            tables.right_boundary, state.idx_right,
            cfg.n_points_nearing_boundary, 1, shift,
        )
        out.update(nearing_left=nl, nearing_right=nr)
    return replace_state(state, **out)


def push_state_buffer(state: WorldState) -> WorldState:
    """Append the current `[pos, rot, vel, scenario, path, point]` record to
    the circular state buffer (reference `StateBuffer`,
    `road_traffic.py:1226-1240`)."""
    rec = jnp.concatenate(
        [
            state.pos,
            state.rot[..., None],
            state.vel,
            state.scenario_id[..., None].astype(jnp.float32),
            state.path_id[..., None].astype(jnp.float32),
            state.point_id[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )  # [B, N, 8]
    n_stored = state.state_buffer.shape[0]
    buf = jax.lax.dynamic_update_index_in_dim(
        state.state_buffer, rec, state.sb_pointer % n_stored, axis=0
    )
    return replace_state(
        state, state_buffer=buf, sb_pointer=(state.sb_pointer + 1) % n_stored
    )


def latest_state_record(state: WorldState) -> Array:
    """The most recent record in the circular buffer. [B, N, 8]."""
    n_stored = state.state_buffer.shape[0]
    idx = (state.sb_pointer - 1) % n_stored
    return jax.lax.dynamic_index_in_dim(state.state_buffer, idx, axis=0, keepdims=False)
