"""Observation pipeline, fully vectorized over `[B, N(ego), k(neighbor)]`.

Parity port of the reference observation provider
(`scenarios/observations/observation_provider_rt.py`): ego-view local-frame
transforms, top-k nearest-neighbor selection, distance/lanelet masking, the
full set of ablation switches, and post-concat uniform sensor noise.

TPU design: neighbors are selected FIRST (top-k over the distance matrix)
and only the k selected neighbors' features are gathered — via one-hot
matmuls on the MXU, not scalar gathers — and ego-transformed. The
reference's double Python loop over (ego, other) — and round 1's
[B, N, N, ...] broadcast-transform-then-gather — would do N/k times the
transform work and pay XLA's slow axis-2 gathers.

Divergence (documented): lanelet determination pads lanelet center lines
with their last point and masks invalid entries, where the reference
zero-pads (`map_manager.py:59-68`) and can match the phantom origin point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sigmarl_tpu.core import geometry as G
from sigmarl_tpu.env.map_tables import MapTables
from sigmarl_tpu.env.structs import EnvConfig, WorldState

Array = jax.Array

_HP = jax.lax.Precision.HIGHEST


def _current_lanelets(tables: MapTables, pos: Array) -> Array:
    """Nearest lanelet index per agent by min point distance
    (reference `map_manager.determine_current_lanelet`). pos: [B, N, 2].

    |p - c|^2 = |p|^2 - 2 p.c + |c|^2: the cross term is one MXU matmul
    against the flattened lanelet-point table instead of a [B, N, L, Pc, 2]
    broadcast subtraction.
    """
    B, N = pos.shape[:2]
    centers = tables.lanelet_centers  # [L, Pc, 2]
    L, Pc = centers.shape[:2]
    flat = centers.reshape(L * Pc, 2)  # [L*Pc, 2]
    cross = jnp.einsum("bnc,pc->bnp", pos, flat, precision=_HP)  # [B, N, L*Pc]
    c2 = jnp.sum(flat * flat, axis=-1)  # [L*Pc]
    d2 = (c2[None, None] - 2.0 * cross).reshape(B, N, L, Pc)
    pt_idx = jnp.arange(Pc)
    n_pts = tables.n_lanelet_center_points  # [L]
    d2 = jnp.where(pt_idx[None, None, None, :] < n_pts[None, None, :, None], d2, jnp.inf)
    return jnp.argmin(d2.min(axis=-1), axis=-1)  # [B, N]


def observe_core(
    cfg: EnvConfig, tables: MapTables, state: WorldState, key: Array
) -> Array:
    """Build the single-step per-agent feature vector (pre-padding,
    pre-noise). Returns [B, N, obs_core_dim]."""
    B, N = state.pos.shape[:2]
    pos, rot, vel = state.pos, state.rot, state.vel

    # --- normalized scalar channels (reference `update_state:345-396`)
    d_ref_n = state.d_ref / cfg.norm_distance_lanelet  # [B, N]
    d_left_n = state.d_left.min(-1) / cfg.norm_distance_lanelet  # [B, N]
    d_right_n = state.d_right.min(-1) / cfg.norm_distance_lanelet
    steering_n = G.angle_eliminate_two_pi(state.steering) / cfg.norm_rot  # [B, N]

    # --- neighbor selection (before any pairwise feature work)
    k = cfg.n_observed_agents
    if cfg.is_partial_observation:
        neg_d, nearing_idx = jax.lax.top_k(-state.d_agents, k)  # [B, N, k]
        nearing_dist = -neg_d
        if cfg.is_apply_mask:
            masked = nearing_dist >= cfg.distance_mask_agents
            if cfg.has_lanelet_neighbors:
                lane_idx = _current_lanelets(tables, pos)  # [B, N]
                ego_lane = lane_idx[:, :, None]  # [B, N, 1]
                nb_lane = jnp.take_along_axis(
                    lane_idx[:, None, :].repeat(N, 1), nearing_idx, axis=-1
                )  # [B, N, k]
                ok = tables.neighboring_lanelets[ego_lane, nb_lane]
                masked = masked | ~ok
        else:
            masked = jnp.zeros((B, N, k), bool)
    else:
        nearing_idx = jnp.broadcast_to(jnp.arange(N)[None, None, :], (B, N, N))
        nearing_dist = state.d_agents
        masked = jnp.zeros((B, N, N), bool)

    # One-hot neighbor selector [B, N, k, N]: all gathers become MXU matmuls
    # (exact: one 1.0 per row, fp32 accumulate).
    Oj = jax.nn.one_hot(nearing_idx, N, dtype=jnp.float32)

    def gather_vec(feat: Array) -> Array:
        """feat [B, N(j), F...] -> selected [B, N(i), k, F...]."""
        F = feat.shape[2:]
        out = jnp.einsum(
            "bikj,bjf->bikf", Oj, feat.reshape(B, N, -1), precision=_HP
        )
        return out.reshape(B, N, k, *F)

    # Gathered raw neighbor quantities.
    pos_j = gather_vec(pos)  # [B, N, k, 2]
    rot_j = gather_vec(rot[..., None])[..., 0]  # [B, N, k]
    vabs = jnp.linalg.norm(vel, axis=-1)  # [B, N]
    vabs_j = gather_vec(vabs[..., None])[..., 0]
    steer_j = gather_vec(steering_n[..., None])[..., 0]
    vert_j = gather_vec(state.vertices[..., 0:4, :])  # [B, N, k, 4, 2]
    ref_j = gather_vec(state.short_term)  # [B, N, k, S, 2]

    rel_rot = G.angle_eliminate_two_pi(rot_j - rot[:, :, None])  # [B, N, k]
    rel_vel = jnp.stack(
        [vabs_j * jnp.cos(rel_rot), vabs_j * jnp.sin(rel_rot)], axis=-1
    )  # [B, N, k, 2]

    if cfg.is_ego_view:
        def ego_local(points: Array) -> Array:
            """points [B, N, k, M, 2] -> ego-i frame [B, N, k, M, 2]."""
            return G.global_to_local(
                jnp.broadcast_to(pos[:, :, None, None, :], points.shape[:3] + (1, 2))[
                    ..., 0, :
                ],
                points,
                jnp.broadcast_to(rot[:, :, None, None], points.shape[:4])[..., 0],
            )

        pos_feat = ego_local(pos_j[:, :, :, None, :])[..., 0, :] / cfg.norm_pos
        rot_feat = rel_rot / cfg.norm_rot
        vel_feat = rel_vel / cfg.norm_v
        vert_feat = ego_local(vert_j) / cfg.norm_pos
        ref_feat = ego_local(ref_j) / cfg.norm_pos
        # Self features in the ego frame.
        self_ref = G.global_to_local(pos, state.short_term, rot) / cfg.norm_pos
        if not cfg.is_observe_distance_to_boundaries:
            self_lb = G.global_to_local(pos, state.nearing_left, rot) / cfg.norm_pos
            self_rb = G.global_to_local(pos, state.nearing_right, rot) / cfg.norm_pos
    else:
        # Bird view: global features of the selected neighbors.
        norm_pos_world = jnp.asarray([cfg.world_x_dim, cfg.world_y_dim])
        pos_feat = pos_j / norm_pos_world
        rot_feat = G.angle_eliminate_two_pi(rot_j) / cfg.norm_rot
        vel_feat = gather_vec(vel) / cfg.norm_v
        vert_feat = vert_j / norm_pos_world
        ref_feat = ref_j / norm_pos_world
        self_ref = state.short_term / norm_pos_world
        if not cfg.is_observe_distance_to_boundaries:
            self_lb = state.nearing_left / norm_pos_world
            self_rb = state.nearing_right / norm_pos_world

    lengths_n = cfg.agent_length / cfg.norm_distance_agent
    widths_n = cfg.agent_width / cfg.norm_distance_agent

    def apply_mask(feat: Array, fill: float) -> Array:
        m = masked.reshape(B, N, k, *([1] * (feat.ndim - 3)))
        return jnp.where(m, fill, feat)

    obs_pos_o = apply_mask(pos_feat, 1.0)
    obs_rot_o = apply_mask(rot_feat[..., None], 0.0)[..., 0]
    obs_vel_o = apply_mask(vel_feat, 0.0)
    obs_ref_o = apply_mask(ref_feat, 1.0)
    obs_vert_o = apply_mask(vert_feat, 1.0)
    obs_len_o = jnp.full((B, N, k), lengths_n)
    obs_wid_o = jnp.full((B, N, k), widths_n)
    obs_steer_o = apply_mask(steer_j[..., None], 0.0)[..., 0]
    obs_dist_o = apply_mask(
        (nearing_dist / cfg.norm_distance_lanelet)[..., None], 1.0
    )[..., 0]

    # --- assemble per-neighbor feature block (order: reference `:818-855`)
    if k == 0:
        # Single-agent env: no neighbors to observe (reshape(-1) on a
        # zero-size block is ill-defined).
        obs_others = jnp.zeros((B, N, 0))
    else:
        feats = []
        if cfg.is_observe_vertices:
            feats.append(obs_vert_o.reshape(B, N, k, -1))
        else:
            feats.extend(
                [
                    obs_pos_o.reshape(B, N, k, -1),
                    obs_rot_o[..., None],
                    obs_len_o[..., None],
                    obs_wid_o[..., None],
                ]
            )
        feats.append(obs_vel_o.reshape(B, N, k, -1))
        if cfg.is_obs_steering:
            feats.append(obs_steer_o[..., None])
        if cfg.is_observe_distance_to_agents:
            feats.append(obs_dist_o[..., None])
        if cfg.is_observe_ref_path_other_agents:
            feats.append(obs_ref_o.reshape(B, N, k, -1))
        obs_others = jnp.concatenate(feats, axis=-1).reshape(B, N, -1)

    # --- self observation (order: reference `_observe_self:857-925`)
    self_feats = []
    if not cfg.is_ego_view:
        norm_pos_world = jnp.asarray([cfg.world_x_dim, cfg.world_y_dim])
        self_feats.append(pos / norm_pos_world)
        self_feats.append(
            (G.angle_eliminate_two_pi(rot) / cfg.norm_rot)[..., None]
        )
    if cfg.is_ego_view:
        # Own ego-frame velocity: only the longitudinal component is
        # informative (the lateral one is ~0 by construction).
        self_feats.append((vabs / cfg.norm_v)[..., None])
    else:
        self_feats.append(vel / cfg.norm_v)
    if cfg.is_obs_steering:
        self_feats.append(steering_n[..., None])
    self_feats.append(self_ref.reshape(B, N, -1))
    if cfg.is_observe_distance_to_center_line:
        self_feats.append(d_ref_n[..., None])
    if cfg.is_observe_distance_to_boundaries:
        self_feats.append(d_left_n[..., None])
        self_feats.append(d_right_n[..., None])
    else:
        self_feats.append(self_lb.reshape(B, N, -1))
        self_feats.append(self_rb.reshape(B, N, -1))
    obs_self = jnp.concatenate(self_feats, axis=-1)

    return jnp.concatenate([obs_self, obs_others], axis=-1)


def _finalize(cfg: EnvConfig, obs: Array, key: Array) -> Array:
    """Opponent-modeling zero-pad + post-concat uniform sensor noise
    (reference `get_observation:594-620`)."""
    B, N = obs.shape[:2]
    if cfg.is_using_opponent_modeling:
        pad = jnp.zeros((B, N, cfg.n_nearing_agents_observed * cfg.n_actions))
        obs = jnp.concatenate([obs, pad], axis=-1)

    if cfg.is_obs_noise:
        # The reference adds *uniform* [0, level) noise post-concat
        # (`get_observation:613-618` uses torch.rand_like despite the
        # "normal distribution" comment) — matched here.
        obs = obs + cfg.obs_noise_level * jax.random.uniform(key, obs.shape)

    return obs


def observe(
    cfg: EnvConfig, tables: MapTables, state: WorldState, key: Array
) -> Array:
    """Single-shot observation (no history threading): the n_observed_steps=1
    fast path. With history enabled (`n_observed_steps > 1`) there is no
    valid single-shot observation — callers must thread state through
    `observe_with_history`; anything else would silently fabricate history
    by duplicating the current features."""
    if cfg.n_observed_steps > 1:
        raise ValueError(
            "observe() cannot produce n_observed_steps="
            f"{cfg.n_observed_steps} observations without a threaded history; "
            "use observe_with_history()."
        )
    obs = observe_core(cfg, tables, state, key)
    return _finalize(cfg, obs, key)


def observe_with_history(
    cfg: EnvConfig,
    tables: MapTables,
    state: WorldState,
    key: Array,
    reset_mask: Array | None = None,
    full_reset: bool = False,
):
    """Observation with feature history (capability parity with the
    reference's per-feature `CircularBuffer`s and `n_observed_steps`,
    `observation_provider_rt.py:100-339` — which the reference allocates
    but, as shipped, only ever reads at depth 1 via `get_latest()`; its
    `n_observed_steps` defaults to 1, `road_traffic.py:284-285`).

    The history is a rolled array [n_stored_steps, B, N, F] carried in
    `state.obs_history` (newest slot first); the observation concatenates
    the newest `n_observed_steps` slots feature-blocks, newest first. On
    (partial) reset the affected agents' history slots are refilled with
    the current features, so n=1 semantics are exactly preserved and n>1
    never mixes pre/post-reset episodes.

    Returns (obs [B, N, obs_dim], state' with the rolled history).
    """
    from sigmarl_tpu.env.structs import replace_state

    core = observe_core(cfg, tables, state, key)  # [B, N, F]
    H = cfg.n_stored_steps
    if cfg.n_observed_steps > H:
        # Unreachable through EnvConfig (its __post_init__ enforces
        # stored >= observed); kept as a hard stop so no construction path
        # can fabricate history by duplicating the current features.
        raise ValueError(
            f"n_observed_steps={cfg.n_observed_steps} exceeds "
            f"n_stored_steps={H}; cannot observe deeper than the stored "
            "history."
        )
    if H <= 1:
        return _finalize(cfg, core, key), state

    if full_reset:
        hist = jnp.broadcast_to(core[None], (H, *core.shape))
    else:
        hist = jnp.concatenate([core[None], state.obs_history[:-1]], axis=0)
        if reset_mask is not None:
            m = reset_mask[None, :, :, None]  # [1, B, N, 1]
            hist = jnp.where(m, core[None], hist)

    n_obs = cfg.n_observed_steps
    window = hist[:n_obs]  # [n_obs, B, N, F] newest first
    obs = jnp.moveaxis(window, 0, 2).reshape(*core.shape[:2], -1)
    return _finalize(cfg, obs, key), replace_state(state, obs_history=hist)
