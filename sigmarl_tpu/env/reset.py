"""Vectorized, fixed-shape reset / spawn logic.

The reference spawns agents with an unbounded rejection-sampling while-loop
per agent per env (`world_state_rt_sim.py:215-311`). On TPU, data-dependent
trip counts don't compile, so we draw a fixed budget of `max_spawn_tries`
candidates per agent at once and select the first feasible one with masked
ops — distributionally equivalent up to the (vanishingly rare) event of
all candidates being infeasible, where the last candidate is used (the
reference would keep looping and merely print a warning after 20 tries).

Sequencing over agents (agent i's feasibility depends on agents < i) is a
`lax.scan` over the agent axis, vectorized over envs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sigmarl_tpu.env.map_tables import MapTables
from sigmarl_tpu.env.structs import EnvConfig, WorldState, replace_state, zero_state
from sigmarl_tpu.env.updates import (
    push_state_buffer,
    update_geometry,
    update_short_term_paths,
)

Array = jax.Array


def _sample_scenario_ids(cfg: EnvConfig, key: Array, B: int) -> Array:
    """Per-env scenario-group id: {1,2,3} for cpm_mixed, else 0
    (reference `world_state_rt_sim.py:313-358`)."""
    if cfg.scenario_type != "cpm_mixed":
        return jnp.zeros((B,), jnp.int32)
    probs = jnp.asarray(cfg.cpm_scenario_probabilities, jnp.float32)
    logits = jnp.log(jnp.maximum(probs, 1e-30))
    return (jax.random.categorical(key, logits, shape=(B,)) + 1).astype(jnp.int32)


def _sample_candidate_paths(
    cfg: EnvConfig, tables: MapTables, key: Array, scenario_id: Array, shape: tuple
) -> Array:
    """Uniformly sample candidate path ids among the scenario group's paths.

    Inverse-CDF sampling: a uniform draw indexes into the group's sorted
    valid-path list (one-hot matmul against a per-group rank table) —
    identical distribution to the earlier Gumbel categorical over masked
    logits at a fraction of the cost (no [shape, K] exp/log/argmax sweep).
    """
    G, K = tables.group_mask.shape
    mask = tables.group_mask  # [G, K] bool
    # rank[g, k] = position of path k within group g's valid list (0-based).
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1  # [G, K]
    n_valid = mask.sum(-1).astype(jnp.float32)  # [G]

    u = jax.random.uniform(key, shape)  # [..., T]
    nv = n_valid[scenario_id]  # [...-1] per env
    nv = nv.reshape(nv.shape + (1,) * (len(shape) - nv.ndim))
    idx = jnp.minimum((u * nv).astype(jnp.int32), (nv - 1).astype(jnp.int32))

    # Map rank -> path id via one-hot against the env's group rank table.
    sel = jax.nn.one_hot(scenario_id, G, dtype=jnp.float32)  # [B, G]
    rank_env = jnp.einsum("bg,gk->bk", sel, rank.astype(jnp.float32))  # [B, K]
    mask_env = jnp.einsum("bg,gk->bk", sel, mask.astype(jnp.float32))
    # onehot over ranks: path = argwhere(rank_env == idx & valid).
    n_new = len(shape) - 1
    rank_b = rank_env.reshape((shape[0],) + (1,) * n_new + (K,))
    mask_b = mask_env.reshape((shape[0],) + (1,) * n_new + (K,))
    hit = (rank_b == idx[..., None].astype(jnp.float32)) & (mask_b > 0.5)
    ks = jnp.arange(K, dtype=jnp.int32)
    return jnp.sum(
        jnp.where(hit, ks, 0), axis=-1, dtype=jnp.int32
    )


def _candidate_point_ids(
    cfg: EnvConfig, key: Array, n_points: Array, tries: int
) -> Array:
    """Spawn-point index per candidate.

    Training: uniform in [3, n_points//2) (reference `:254-265`).
    Testing: a window growing with the retry count, capped at n_points//2.
    """
    u = jax.random.uniform(key, n_points.shape)
    start = 3
    if cfg.is_testing_mode:
        k = jnp.arange(tries, dtype=jnp.int32)
        shape_k = (1,) * (n_points.ndim - 1) + (tries,)
        grow = 3 + ((k + 1) * (k + 2)) // 2
        end = jnp.minimum(jnp.broadcast_to(grow.reshape(shape_k), n_points.shape), n_points // 2)
    else:
        end = n_points // 2
    end = jnp.maximum(end, start + 1)
    return (start + (u * (end - start)).astype(jnp.int32)).astype(jnp.int32)


def spawn_positions(
    cfg: EnvConfig,
    tables: MapTables,
    key: Array,
    scenario_id: Array,
    prev_pos: Array,
    reset_mask: Array,
) -> Tuple[Array, Array, Array, Array]:
    """Sample feasible spawn poses for the masked agents of each env.

    Args:
        scenario_id: [B] group id per env.
        prev_pos: [B, N, 2] current positions (non-reset agents keep these
            and constrain the feasibility of reset agents).
        reset_mask: [B, N] bool — which agents to (re)spawn.

    Returns:
        (pos [B,N,2], rot [B,N], path_id [B,N], point_id [B,N]) — entries of
        non-reset agents are passed through (`prev_pos`; rot/path/point are
        zero there and must be merged by the caller).
    """
    B, N = prev_pos.shape[:2]
    T = cfg.max_spawn_tries
    K, P = tables.long_term.shape[:2]

    # All candidate draws and table lookups hoisted OUT of the sequential
    # agent scan. Only candidate POSITIONS are gathered at full [B, N, T]
    # size (the feasibility check needs them); yaw/path/point resolve for
    # the single chosen candidate afterwards at [B, N] size — the [B, N, T]
    # gathers from the [K*P]-row tables were the dominant reset cost
    # (~3 ms/step at B=1024, XLA lowers them to scalar HBM loads).
    k_path, k_point = jax.random.split(key)
    cand_path = _sample_candidate_paths(
        cfg, tables, k_path, scenario_id, (B, N, T)
    )  # [B, N, T]
    # n_points per candidate via a one-hot matmul over the tiny [K] table
    # (a [B, N, T] gather from it would again be scalar loads).
    oh_path = jax.nn.one_hot(cand_path, K, dtype=jnp.float32)
    n_pts = jnp.einsum(
        "bntk,k->bnt", oh_path, tables.n_points_long_term.astype(jnp.float32)
    ).astype(jnp.int32)
    cand_point = _candidate_point_ids(cfg, k_point, n_pts, T)  # [B, N, T]
    # Candidate positions via double one-hot contraction on the MXU
    # (exact: each one-hot has a single nonzero). The equivalent flat
    # [B, N, T] gather from the [K*P]-row table lowers to scalar HBM
    # loads (~2 ms/step at B=1024); this is ~10 GFLOP of dense matmul
    # instead. Chunked over candidates to keep intermediates small.
    hp = jax.lax.Precision.HIGHEST
    pos_chunks = []
    for t in range(T):
        ohp = jax.nn.one_hot(cand_point[:, :, t], P, dtype=jnp.float32)
        ohk = jax.nn.one_hot(cand_path[:, :, t], K, dtype=jnp.float32)
        # contract the point axis first ([B,N,P] x [K,P,2] -> [B,N,K,2]),
        # then select the path: both contractions ride the MXU.
        rows = jnp.einsum(
            "bnp,kpc->bnkc", ohp, tables.long_term, precision=hp
        )
        pos_chunks.append(
            jnp.einsum("bnk,bnkc->bnc", ohk, rows, precision=hp)
        )
    cand_pos = jnp.stack(pos_chunks, axis=2)  # [B, N, T, 2]

    def per_agent(carry, inputs):
        placed_pos, placed_mask = carry  # [B, N, 2], [B, N] bool
        n, c_pos = inputs  # [B, T, 2]

        # Feasibility vs already-placed agents (and, for partial resets, vs
        # agents that are not being reset at all).
        diff = c_pos[:, :, None, :] - placed_pos[:, None, :, :]  # [B, T, N, 2]
        dist2 = jnp.sum(diff * diff, axis=-1)
        dist2 = jnp.where(placed_mask[:, None, :], dist2, jnp.inf)
        min_dist2 = dist2.min(axis=-1)  # [B, T]
        feasible = min_dist2 >= cfg.reset_agent_min_distance**2

        first = jnp.argmax(feasible, axis=-1)  # first True, else 0
        any_feasible = feasible.any(axis=-1)
        choice = jnp.where(any_feasible, first, T - 1)  # [B]

        pos_n = jnp.take_along_axis(c_pos, choice[:, None, None], axis=1)[:, 0]

        do = reset_mask[:, n]  # [B]
        pos_n = jnp.where(do[:, None], pos_n, prev_pos[:, n])
        placed_pos = placed_pos.at[:, n].set(pos_n)
        placed_mask = placed_mask.at[:, n].set(True)
        return (placed_pos, placed_mask), (pos_n, choice)

    # Initial "placed" set: agents that are NOT being reset keep their
    # positions and constrain everyone (partial resets check against all
    # other agents, `world_state_rt_sim.py:287-294`).
    init_pos = prev_pos
    init_mask = ~reset_mask
    (_, _), (pos_seq, choice_seq) = jax.lax.scan(
        per_agent,
        (init_pos, init_mask),
        (jnp.arange(N), jnp.moveaxis(cand_pos, 1, 0)),
    )
    # scan stacks over agent axis first -> [N, B, ...]; move to [B, N, ...].
    pos = jnp.moveaxis(pos_seq, 0, 1)
    choice = jnp.moveaxis(choice_seq, 0, 1)  # [B, N]

    # Resolve the chosen candidate's path/point/yaw at [B, N] size.
    sel = lambda a: jnp.take_along_axis(a, choice[..., None], axis=2)[..., 0]
    path_id = sel(cand_path)
    point_id = sel(cand_point)
    rot = tables.center_line_yaw.reshape(K * P)[path_id * P + point_id]
    return pos, rot, path_id, point_id


def _spawn_positions_compact(
    cfg: EnvConfig,
    tables: MapTables,
    key: Array,
    scenario_id: Array,
    prev_pos: Array,
    reset_mask: Array,
    budget: int,
) -> Tuple[Array, Array, Array, Array]:
    """`spawn_positions` over only the (<= budget) resetting envs.

    Static-size compaction: the resetting env rows are gathered into a
    fixed [budget] slot array, spawned there, and scattered back — the
    candidate sampling / position materialization / feasibility scan all
    run at budget instead of B. The caller MUST guarantee
    `reset_mask.any(-1).sum() <= budget` (via `lax.cond`, falling back to
    the full-width path otherwise); surplus slots are inert (empty mask,
    out-of-range scatter index dropped). The chosen-pose distribution is
    identical to the full path; only the RNG stream layout differs.
    """
    B, N = prev_pos.shape[:2]
    env_any = reset_mask.any(-1)
    # slot[b] = compacted position of env b (resetting envs only).
    slot = jnp.where(env_any, jnp.cumsum(env_any) - 1, budget)  # [B]
    idx = (
        jnp.full((budget,), B, jnp.int32)
        .at[slot]
        .set(jnp.arange(B, dtype=jnp.int32), mode="drop")
    )
    valid = idx < B
    idx_c = jnp.minimum(idx, B - 1)  # clamp for the gathers; masked below
    sub_mask = reset_mask[idx_c] & valid[:, None]
    pos_s, rot_s, path_s, pt_s = spawn_positions(
        cfg, tables, key, scenario_id[idx_c], prev_pos[idx_c], sub_mask
    )
    scatter = lambda full, sub: full.at[idx].set(sub, mode="drop")
    return (
        scatter(prev_pos, pos_s),
        scatter(jnp.zeros((B, N), rot_s.dtype), rot_s),
        scatter(jnp.zeros((B, N), jnp.int32), path_s),
        scatter(jnp.zeros((B, N), jnp.int32), pt_s),
    )


def apply_reset(
    cfg: EnvConfig,
    tables: MapTables,
    state: WorldState,
    reset_mask: Array,
    key: Array,
    compact_budget: int = 0,
) -> WorldState:
    """(Re)spawn the masked agents and refresh all derived state.

    Covers the reference's `reset_world_at` for full-env resets
    (`reset_mask[b, :] = True`) and single-agent resets in testing mode /
    entry-exit recycling (`road_traffic.py:816-923`).

    `compact_budget > 0` routes the spawn through the static-size
    compaction (`_spawn_positions_compact`); the caller guarantees the
    resetting-env count fits the budget.
    """
    B, N = state.pos.shape[:2]
    k_scen, k_spawn, k_speed = jax.random.split(key, 3)

    full_env_reset = reset_mask.all(axis=-1)  # [B]
    new_scenario = _sample_scenario_ids(cfg, k_scen, B)
    # Full resets draw a fresh scenario group; partial resets keep the env's
    # current group (`world_state_rt_sim.py:325-343`).
    scenario_id_env = jnp.where(
        full_env_reset, new_scenario, state.scenario_id[:, 0]
    )

    if compact_budget > 0:
        pos, rot, path_id, point_id = _spawn_positions_compact(
            cfg, tables, k_spawn, scenario_id_env, state.pos, reset_mask,
            compact_budget,
        )
    else:
        pos, rot, path_id, point_id = spawn_positions(
            cfg, tables, k_spawn, scenario_id_env, state.pos, reset_mask
        )

    speed_new = jax.random.uniform(k_speed, (B, N)) * cfg.max_speed
    vel_new = jnp.stack(
        [speed_new * jnp.cos(rot), speed_new * jnp.sin(rot)], axis=-1
    )

    if cfg.is_challenging_initial_state_buffer:
        # With probability_use_recording, full-env resets replay a recorded
        # pre-collision state instead of random spawning (reference
        # `road_traffic.py:857-873`). Record layout: [x, y, rot, vx, vy,
        # scenario, path, point].
        k_use, k_pick = jax.random.split(jax.random.fold_in(key, 7))
        use_draw = jax.random.uniform(k_use, (B,)) < cfg.probability_use_recording
        use_rec = use_draw & full_env_reset & (state.cb_valid >= 1)
        pick = jax.random.randint(
            k_pick, (B,), 0, jnp.maximum(state.cb_valid, 1)
        )
        rec = state.challenge_buffer[pick]  # [B, N, 8]
        m_rec = (use_rec[:, None] & reset_mask)
        pos = jnp.where(m_rec[..., None], rec[..., 0:2], pos)
        rot = jnp.where(m_rec, rec[..., 2], rot)
        vel_rec = rec[..., 3:5]
        vel_new = jnp.where(m_rec[..., None], vel_rec, vel_new)
        # The reference leaves speed/steering stale here; we derive speed
        # from the recorded velocity (documented divergence).
        speed_new = jnp.where(m_rec, jnp.linalg.norm(vel_rec, axis=-1), speed_new)
        path_id = jnp.where(m_rec, rec[..., 6].astype(jnp.int32), path_id)
        point_id = jnp.where(m_rec, rec[..., 7].astype(jnp.int32), point_id)
        scenario_id_env = jnp.where(
            use_rec, rec[:, 0, 5].astype(jnp.int32), scenario_id_env
        )

    m = reset_mask
    m2 = m[..., None]
    state = replace_state(
        state,
        pos=jnp.where(m2, pos, state.pos),
        rot=jnp.where(m, rot, state.rot),
        speed=jnp.where(m, speed_new, state.speed),
        steering=jnp.where(m, 0.0, state.steering),
        sideslip=jnp.where(m, 0.0, state.sideslip),
        vel=jnp.where(m2, vel_new, state.vel),
        path_id=jnp.where(m, path_id, state.path_id),
        point_id=jnp.where(m, point_id, state.point_id),
        scenario_id=jnp.where(m, scenario_id_env[:, None], state.scenario_id),
        step=jnp.where(full_env_reset, 0, state.step),
    )

    # Refresh derived state. Spawned poses are spawn-table entries whose
    # boundary geometry is precomputed (`MapTables.spawn_*`), so the default
    # path is a gather — no boundary-polyline sweeps. Challenge-buffer
    # replays restore arbitrary recorded poses and need the full recompute
    # (collisions skipped in both: cleared for reset envs below, provably
    # unchanged for the rest).
    if cfg.is_challenging_initial_state_buffer:
        state = update_geometry(cfg, tables, state, skip_collisions=True)
    else:
        from sigmarl_tpu.env.updates import refresh_geometry_after_reset

        state = refresh_geometry_after_reset(cfg, tables, state, reset_mask)
    state = update_short_term_paths(cfg, tables, state, at_reset=True)

    # Envs with any reset clear their collision flags
    # (`reset_world_at` -> `reset_collisions`, `world_state_rt_sim.py:426-430`).
    env_any = m.any(axis=-1)
    state = replace_state(
        state,
        coll_agents=jnp.where(env_any[:, None, None], False, state.coll_agents),
        coll_lanelets=jnp.where(env_any[:, None], False, state.coll_lanelets),
        coll_entry=jnp.where(env_any[:, None], False, state.coll_entry),
        coll_exit=jnp.where(env_any[:, None], False, state.coll_exit),
    )
    # Record the post-reset state (reference resets + refills the buffer).
    state = push_state_buffer(state)
    return state


def initial_state(cfg: EnvConfig, tables: MapTables, key: Array) -> WorldState:
    """Fresh world state with all envs spawned."""
    state = zero_state(cfg)
    mask = jnp.ones((cfg.batch_dim, cfg.n_agents), bool)
    return apply_reset(cfg, tables, state, mask, key)
