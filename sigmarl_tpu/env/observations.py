"""Observation pipeline, fully vectorized over `[B, N(ego), N(other)]`.

Parity port of the reference observation provider
(`scenarios/observations/observation_provider_rt.py`): ego-view pairwise
local-frame transforms, top-k nearest-neighbor selection, distance/lanelet
masking, the full set of ablation switches, and post-concat uniform sensor
noise. The reference's double Python loop over (ego, other) becomes one
broadcasted transform; neighbor gathers use `take_along_axis`.

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


def _current_lanelets(tables: MapTables, pos: Array) -> Array:
    """Nearest lanelet index per agent by min point distance
    (reference `map_manager.determine_current_lanelet`). pos: [B, N, 2]."""
    centers = tables.lanelet_centers  # [L, Pc, 2]
    n_pts = tables.n_lanelet_center_points  # [L]
    d2 = jnp.sum(
        (pos[:, :, None, None, :] - centers[None, None, :, :, :]) ** 2, axis=-1
    )  # [B, N, L, Pc]
    pt_idx = jnp.arange(centers.shape[1])
    d2 = jnp.where(pt_idx[None, None, None, :] < n_pts[None, None, :, None], d2, jnp.inf)
    return jnp.argmin(d2.min(axis=-1), axis=-1)  # [B, N]


def observe(
    cfg: EnvConfig, tables: MapTables, state: WorldState, key: Array
) -> Array:
    """Build the per-agent observation vector. Returns [B, N, obs_dim]."""
    B, N = state.pos.shape[:2]
    pos, rot, vel = state.pos, state.rot, state.vel

    # --- normalized scalar channels (reference `update_state:345-396`)
    d_agents_n = state.d_agents / cfg.norm_distance_lanelet  # [B, N, N]
    d_ref_n = state.d_ref / cfg.norm_distance_lanelet  # [B, N]
    d_left_n = state.d_left.min(-1) / cfg.norm_distance_lanelet  # [B, N]
    d_right_n = state.d_right.min(-1) / cfg.norm_distance_lanelet
    steering_n = G.angle_eliminate_two_pi(state.steering) / cfg.norm_rot  # [B, N]

    if cfg.is_ego_view:
        # Pairwise ego-frame transforms [B, ego i, other j, ...]: flatten the
        # (i, j) pair axes and run one broadcasted local-frame transform.
        def pairwise_local(points_j: Array) -> Array:
            """points_j: [B, N(j), M, 2] -> ego-frame [B, N(i), N(j), M, 2]."""
            M = points_j.shape[-2]
            pts = jnp.broadcast_to(points_j[:, None], (B, N, N, M, 2)).reshape(
                B * N * N, M, 2
            )
            p_i = jnp.broadcast_to(pos[:, :, None, :], (B, N, N, 2)).reshape(-1, 2)
            r_i = jnp.broadcast_to(rot[:, :, None], (B, N, N)).reshape(-1)
            out = G.global_to_local(p_i, pts, r_i)
            return out.reshape(B, N, N, M, 2)

        rel_pos = pairwise_local(pos[:, :, None, :])[..., 0, :]  # [B, i, j, 2]
        rel_rot = G.angle_eliminate_two_pi(rot[:, None, :] - rot[:, :, None])  # [B,i,j]
        v_abs_all = jnp.linalg.norm(vel, axis=-1)  # [B, N]
        rel_vel = jnp.stack(
            [
                v_abs_all[:, None, :] * jnp.cos(rel_rot),
                v_abs_all[:, None, :] * jnp.sin(rel_rot),
            ],
            axis=-1,
        )  # [B, i, j, 2]
        rel_vertices = pairwise_local(state.vertices[..., 0:4, :])  # [B,i,j,4,2]
        rel_short_term = pairwise_local(state.short_term)  # [B,i,j,S,2]
        if not cfg.is_observe_distance_to_boundaries:
            rel_lb = pairwise_local(state.nearing_left) / cfg.norm_pos
            rel_rb = pairwise_local(state.nearing_right) / cfg.norm_pos

        pos_feat = rel_pos / cfg.norm_pos
        rot_feat = rel_rot / cfg.norm_rot
        vel_feat = rel_vel / cfg.norm_v
        ref_feat = rel_short_term / cfg.norm_pos
        vert_feat = rel_vertices / cfg.norm_pos
    else:
        # Bird view: global features, broadcast over the ego axis.
        norm_pos_world = jnp.asarray([cfg.world_x_dim, cfg.world_y_dim])
        pos_feat = jnp.broadcast_to(
            (pos / norm_pos_world)[:, None], (B, N, N, 2)
        )
        rot_feat = jnp.broadcast_to(
            (G.angle_eliminate_two_pi(rot) / cfg.norm_rot)[:, None], (B, N, N)
        )
        vel_feat = jnp.broadcast_to((vel / cfg.norm_v)[:, None], (B, N, N, 2))
        ref_feat = jnp.broadcast_to(
            (state.short_term / norm_pos_world)[:, None],
            (B, N, N, cfg.n_points_short_term, 2),
        )
        vert_feat = jnp.broadcast_to(
            (state.vertices[..., 0:4, :] / norm_pos_world)[:, None], (B, N, N, 4, 2)
        )
        if not cfg.is_observe_distance_to_boundaries:
            rel_lb = jnp.broadcast_to(
                (state.nearing_left / norm_pos_world)[:, None],
                (B, N, N, cfg.n_points_nearing_boundary, 2),
            )
            rel_rb = jnp.broadcast_to(
                (state.nearing_right / norm_pos_world)[:, None],
                (B, N, N, cfg.n_points_nearing_boundary, 2),
            )

    lengths_n = jnp.full((B, N), cfg.agent_length / cfg.norm_distance_agent)
    widths_n = jnp.full((B, N), cfg.agent_width / cfg.norm_distance_agent)

    # --- neighbor selection
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
        masked = jnp.zeros((B, N, N), bool)

    def gather_j(feat: Array) -> Array:
        """Select neighbor features: feat [B, i, j, ...] -> [B, i, k, ...]."""
        idx = nearing_idx.reshape(B, N, k, *([1] * (feat.ndim - 3)))
        idx = jnp.broadcast_to(idx, (B, N, k) + feat.shape[3:])
        return jnp.take_along_axis(feat, idx, axis=2)

    def gather_flat(feat: Array) -> Array:
        """Select per-agent features: feat [B, j] -> [B, i, k]."""
        return jnp.take_along_axis(
            jnp.broadcast_to(feat[:, None, :], (B, N, N)), nearing_idx, axis=-1
        )

    def apply_mask(feat: Array, fill: float) -> Array:
        m = masked.reshape(B, N, k, *([1] * (feat.ndim - 3)))
        return jnp.where(m, fill, feat)

    obs_pos_o = apply_mask(gather_j(pos_feat), 1.0)
    obs_rot_o = apply_mask(gather_j(rot_feat[..., None]), 0.0)[..., 0]
    obs_vel_o = apply_mask(gather_j(vel_feat), 0.0)
    obs_ref_o = apply_mask(gather_j(ref_feat), 1.0)
    obs_vert_o = apply_mask(gather_j(vert_feat), 1.0)
    obs_len_o = gather_flat(lengths_n)
    obs_wid_o = gather_flat(widths_n)
    obs_steer_o = apply_mask(gather_flat(steering_n)[..., None], 0.0)[..., 0]
    # Distance from ego i to its selected neighbors.
    obs_dist_o = apply_mask(
        jnp.take_along_axis(d_agents_n, nearing_idx, axis=-1)[..., None], 1.0
    )[..., 0]

    # --- assemble per-neighbor feature block (order: reference `:818-855`)
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
        self_feats.append(pos_feat[:, jnp.arange(N), jnp.arange(N)].reshape(B, N, -1))
        self_feats.append(rot_feat[:, jnp.arange(N), jnp.arange(N)][..., None])
    if cfg.is_ego_view:
        # Own ego-frame velocity: only the longitudinal component is
        # informative (the lateral one is ~0 by construction).
        v_abs = jnp.linalg.norm(vel, axis=-1) / cfg.norm_v
        self_feats.append(v_abs[..., None])
    else:
        self_feats.append(vel / cfg.norm_v)
    if cfg.is_obs_steering:
        self_feats.append(steering_n[..., None])
    self_feats.append(ref_feat[:, jnp.arange(N), jnp.arange(N)].reshape(B, N, -1))
    if cfg.is_observe_distance_to_center_line:
        self_feats.append(d_ref_n[..., None])
    if cfg.is_observe_distance_to_boundaries:
        self_feats.append(d_left_n[..., None])
        self_feats.append(d_right_n[..., None])
    else:
        self_feats.append(rel_lb[:, jnp.arange(N), jnp.arange(N)].reshape(B, N, -1))
        self_feats.append(rel_rb[:, jnp.arange(N), jnp.arange(N)].reshape(B, N, -1))
    obs_self = jnp.concatenate(self_feats, axis=-1)

    obs = jnp.concatenate([obs_self, obs_others], axis=-1)

    if cfg.is_using_opponent_modeling:
        pad = jnp.zeros((B, N, cfg.n_nearing_agents_observed * cfg.n_actions))
        obs = jnp.concatenate([obs, pad], axis=-1)

    if cfg.is_obs_noise:
        # The reference adds *uniform* [0, level) noise post-concat
        # (`get_observation:613-618` uses torch.rand_like despite the
        # "normal distribution" comment) — matched here.
        obs = obs + cfg.obs_noise_level * jax.random.uniform(key, obs.shape)

    return obs
