"""Device-side map tables: every reference path padded/stacked so that
per-agent path (re)assignment is a single gather.

This replaces the reference's per-agent Python copy loops at reset
(`world_state_rt.py:279-420` `_extend_map_related_ref_path` /
`_reset_agent_related_ref_path`): instead of copying polylines into
per-agent buffers on every reset, we precompute — once, on host — the
exact padded "long term" arrays the reference materializes per agent
(center line + short-term extension along the last segment + end-point
padding), stack them over all candidate paths, and on device index them
with the agent's `path_id`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.maps.data import MapData, RefPath

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MapTables:
    """Stacked, padded per-path map arrays (pytree of device arrays).

    K = number of candidate paths; P = padded long-term length;
    PB = padded boundary length; L = max lanelets per path.
    """

    # Long-term reference path, already extended by n_short*interval points
    # along the final direction and padded by repeating the final point
    # (reference `world_state_rt.py:279-311` + `:313-345`).
    long_term: Array  # [K, P, 2]
    long_term_vec_normalized: Array  # [K, P, 2]
    n_points_long_term: Array  # [K] int32 (number of raw center-line points)
    center_line_yaw: Array  # [K, P] per-point segment yaw (padded w/ last)
    left_boundary: Array  # [K, PB, 2] shared left boundary, end-padded
    right_boundary: Array  # [K, PB, 2]
    n_points_left_b: Array  # [K] int32
    n_points_right_b: Array  # [K] int32
    left_boundary_pseudo_vec: Array  # [K, PB, 2] pseudo tangent vectors
    right_boundary_pseudo_vec: Array  # [K, PB, 2]
    # Precomputed pseudo-distance segment tables (segment frame + tangent
    # slopes; `safety.pseudo_distance.segment_table`) — the hot-path stencil
    # evaluates pure arithmetic against these. The segment axis is padded to
    # a multiple of PD_CHUNK (invalid-marked) so it tiles into chunks.
    left_seg: Array  # [K, S, 8], S = PD_CHUNK * NC
    right_seg: Array  # [K, S, 8]
    # Per-chunk bounding circles over the chunk's boundary points: the
    # pseudo distance of q to any segment in chunk c is >= |q - cc| - cr
    # (the pseudo projection point lies ON the segment), so chunks can be
    # pruned by this lower bound (`safety.cbf_qp._lane_terms` top-k mode).
    # Chunks with no valid segment get cc = +1e6 (never selected).
    left_chunk_cc: Array  # [K, NC, 2]
    left_chunk_cr: Array  # [K, NC]
    right_chunk_cc: Array  # [K, NC, 2]
    right_chunk_cr: Array  # [K, NC]
    entry: Array  # [K, 2, 2] entry segment (first boundary points)
    exit: Array  # [K, 2, 2] exit segment (last boundary points)
    is_loop: Array  # [K] bool
    # Scenario-group bookkeeping: group id per path (0=all, 1=intersection,
    # 2=merge-in, 3=merge-out) and per-group path-selection masks.
    group_id: Array  # [K] int32
    group_mask: Array  # [4, K] bool — valid paths per group id
    # Lanelet-ID data for `current_lanelet_id` / info parity.
    ref_lanelet_ids: Array  # [K, L] int32 (0-padded)
    n_ref_lanelet_ids: Array  # [K] int32
    ref_lanelet_segment_points: Array  # [K, L+1, 2]
    # All-lanelet center lines (padded) for bird-view lanelet masking.
    lanelet_centers: Array  # [n_lanelets, Lc, 2]
    n_lanelet_center_points: Array  # [n_lanelets] int32
    neighboring_lanelets: Array  # [n_lanelets, n_lanelets] bool
    # Precomputed spawn-point geometry: every spawn candidate is exactly
    # (long_term[k, p], center_line_yaw[k, p]), so the boundary-polyline
    # sweeps of `update_geometry` for freshly reset agents reduce to one
    # gather from these tables (computed once at build time with the SAME
    # geometry functions the runtime uses — bit-identical by construction).
    spawn_d_ref: Array  # [K, P]
    spawn_idx_ref: Array  # [K, P] int32
    spawn_idx_left: Array  # [K, P] int32
    spawn_idx_right: Array  # [K, P] int32
    spawn_d_left: Array  # [K, P, 5]
    spawn_d_right: Array  # [K, P, 5]


def path_onehot(path_id: Array, n_paths: int) -> Array:
    """One-hot row selector for table lookups. [...,] int32 -> [..., K] f32.

    TPU note: XLA gathers of whole table rows (`table[path_id]`) lower to
    slow scalar-indexed HBM gathers; a one-hot matmul rides the MXU instead
    and is exact (each output element is 1.0 * row + 0.0 * rest). Build this
    once per step and pass it to every `lookup` so XLA CSEs the selector.
    """
    return jax.nn.one_hot(path_id, n_paths, dtype=jnp.float32)


def lookup(oh: Array, table: Array) -> Array:
    """Row lookup via one-hot matmul: oh [..., K], table [K, ...rest].

    Exact for float tables (fp32 accumulation, one nonzero per row); int and
    bool tables round-trip through fp32 exactly for the value ranges stored
    here (counts, flags).
    """
    K = table.shape[0]
    rest = table.shape[1:]
    flat = table.reshape(K, -1).astype(jnp.float32)
    out = jnp.einsum(
        "...k,kr->...r", oh, flat, precision=jax.lax.Precision.HIGHEST
    ).reshape(oh.shape[:-1] + rest)
    if table.dtype == jnp.bool_:
        return out > 0.5
    if jnp.issubdtype(table.dtype, jnp.integer):
        return jnp.round(out).astype(table.dtype)
    return out.astype(table.dtype)


def _pad_polyline(p: np.ndarray, length: int) -> np.ndarray:
    if p.shape[0] >= length:
        return p[:length]
    pad = np.repeat(p[-1:], length - p.shape[0], axis=0)
    return np.concatenate([p, pad], axis=0)


def build_map_tables(
    map_data: MapData,
    scenario_type: str,
    n_points_short_term: int,
    sample_interval: int,
) -> MapTables:
    """Build the stacked path tables for a scenario.

    For "cpm_mixed", candidate paths are the intersection + merge-in +
    merge-out families (group ids 1/2/3, reference
    `world_state_rt_sim.py:313-358`); otherwise all reference paths
    (group id 0).
    """
    if scenario_type == "cpm_mixed":
        fams = [
            (1, map_data.reference_paths_intersection),
            (2, map_data.reference_paths_merge_in),
            (3, map_data.reference_paths_merge_out),
        ]
    else:
        fams = [(0, map_data.reference_paths)]

    paths: List[RefPath] = []
    group_ids: List[int] = []
    for gid, fam in fams:
        paths.extend(fam)
        group_ids.extend([gid] * len(fam))

    n_ext = n_points_short_term * sample_interval
    max_center = max(p.center_line.shape[0] for p in paths)
    P = max_center + n_ext + 2  # reference `road_traffic.py:504-530`
    PB = max(
        max(p.left_boundary_shared.shape[0], p.right_boundary_shared.shape[0])
        for p in paths
    )
    L = max(len(p.lanelet_ids) for p in paths)

    K = len(paths)
    long_term = np.zeros((K, P, 2), np.float32)
    long_vec = np.zeros((K, P, 2), np.float32)
    yaw = np.zeros((K, P), np.float32)
    n_long = np.zeros(K, np.int32)
    lb = np.zeros((K, PB, 2), np.float32)
    rb = np.zeros((K, PB, 2), np.float32)
    lb_pv = np.zeros((K, PB, 2), np.float32)
    rb_pv = np.zeros((K, PB, 2), np.float32)
    n_lb = np.zeros(K, np.int32)
    n_rb = np.zeros(K, np.int32)
    entry = np.zeros((K, 2, 2), np.float32)
    exit_ = np.zeros((K, 2, 2), np.float32)
    is_loop = np.zeros(K, bool)
    lane_ids = np.zeros((K, L), np.int32)
    n_lane_ids = np.zeros(K, np.int32)
    seg_pts = np.zeros((K, L + 1, 2), np.float32)

    for k, p in enumerate(paths):
        c = p.center_line
        n = c.shape[0]
        n_long[k] = n
        # Extension: n_ext points continuing along the last segment, then the
        # final extended point repeated (reference `world_state_rt.py:288-345`).
        direction = c[-1] - c[-2]
        ext = c[-1] + np.arange(1, n_ext + 1, dtype=np.float32)[:, None] * direction
        full = np.concatenate([c, ext], axis=0)
        long_term[k] = _pad_polyline(full, P)
        # Normalized segment vectors: raw ones then the last repeated
        # (reference `world_state_rt.py:351-364`).
        v = p.center_line_vec_normalized
        long_vec[k] = _pad_polyline(np.concatenate([v, np.repeat(v[-1:], n_ext, 0)], 0), P)
        yaw[k] = _pad_polyline(p.center_line_yaw[:, None], P)[:, 0]
        lb[k] = _pad_polyline(p.left_boundary_shared, PB)
        rb[k] = _pad_polyline(p.right_boundary_shared, PB)
        lb_pv[k] = _pad_polyline(p.left_boundary_shared_pseudo_vector, PB)
        rb_pv[k] = _pad_polyline(p.right_boundary_shared_pseudo_vector, PB)
        n_lb[k] = p.left_boundary_shared.shape[0]
        n_rb[k] = p.right_boundary_shared.shape[0]
        entry[k, 0] = p.left_boundary_shared[0]
        entry[k, 1] = p.right_boundary_shared[0]
        exit_[k, 0] = p.left_boundary_shared[-1]
        exit_[k, 1] = p.right_boundary_shared[-1]
        is_loop[k] = p.is_loop
        ids = p.lanelet_ids
        lane_ids[k, : len(ids)] = ids
        n_lane_ids[k] = len(ids)
        sp = map_data.ref_lanelet_segment_points(ids)
        seg_pts[k, : sp.shape[0]] = sp
        seg_pts[k, sp.shape[0]:] = sp[-1]

    gid = np.asarray(group_ids, np.int32)
    # Group count tracks the data (0=all plus any scenario groups present);
    # the spawn sampler reads the one-hot width from this table's shape, so
    # the two can never drift (ADVICE r3).
    n_groups = max(4, int(gid.max()) + 1) if gid.size else 1
    group_mask = np.stack([gid == g for g in range(n_groups)], axis=0)

    from sigmarl_tpu.safety.pseudo_distance import PD_CHUNK, segment_table

    left_seg = np.asarray(
        segment_table(jnp.asarray(lb), jnp.asarray(lb_pv), jnp.asarray(n_lb))
    )
    right_seg = np.asarray(
        segment_table(jnp.asarray(rb), jnp.asarray(rb_pv), jnp.asarray(n_rb))
    )
    # Pad the segment axis to a PD_CHUNK multiple (all-zero rows: valid=0)
    # and precompute per-chunk bounding circles for top-k chunk pruning.
    S_raw = left_seg.shape[1]
    S_pad = ((S_raw + PD_CHUNK - 1) // PD_CHUNK) * PD_CHUNK
    pad = ((0, 0), (0, S_pad - S_raw), (0, 0))
    left_seg = np.pad(left_seg, pad)
    right_seg = np.pad(right_seg, pad)

    def chunk_bounds(seg, bnd):
        """(cc [K, NC, 2], cr [K, NC]) over each chunk's boundary points.

        Chunk c covers segments [c*CH, (c+1)*CH), whose geometric extent is
        boundary points [c*CH, (c+1)*CH] inclusive. Only points incident to
        a VALID segment enter the bound; empty chunks are pushed to 1e6."""
        Kn, Sp = seg.shape[0], seg.shape[1]
        NC = Sp // PD_CHUNK
        if bnd.shape[1] < Sp + 1:  # keep point slices full-width
            tail = np.repeat(bnd[:, -1:], Sp + 1 - bnd.shape[1], axis=1)
            bnd = np.concatenate([bnd, tail], axis=1)
        valid = seg[..., 7] > 0.5  # [K, Sp]
        cc = np.full((Kn, NC, 2), 1.0e6, np.float32)
        cr = np.zeros((Kn, NC), np.float32)
        for c in range(NC):
            lo, hi = c * PD_CHUNK, (c + 1) * PD_CHUNK
            m_seg = valid[:, lo:hi]  # [K, CH]
            # point p in [lo, hi] is incident to segments p-1 and p.
            m_pt = np.zeros((Kn, hi - lo + 1), bool)
            m_pt[:, :-1] |= m_seg
            m_pt[:, 1:] |= m_seg
            pts = bnd[:, lo:hi + 1]  # [K, CH+1, 2] (hi <= PB-1 by S=PB-1)
            w = m_pt[..., None].astype(np.float64)
            cnt = w.sum(1)  # [K, 1]
            has = cnt[:, 0] > 0
            mid = (pts * w).sum(1) / np.maximum(cnt, 1.0)  # [K, 2]
            r = np.sqrt(
                ((pts - mid[:, None]) ** 2).sum(-1)
            )  # [K, CH+1]
            r = np.where(m_pt, r, 0.0).max(1)
            cc[has, c] = mid[has].astype(np.float32)
            cr[has, c] = r[has].astype(np.float32)
        return cc, cr

    l_cc, l_cr = chunk_bounds(left_seg, lb)
    r_cc, r_cr = chunk_bounds(right_seg, rb)

    n_lanelets = len(map_data.lanelets)
    Lc = max(l.center_line.shape[0] for l in map_data.lanelets)
    lanelet_centers = np.stack(
        [_pad_polyline(l.center_line, Lc) for l in map_data.lanelets]
    )
    n_lc = np.asarray([l.center_line.shape[0] for l in map_data.lanelets], np.int32)
    neigh = np.zeros((n_lanelets, n_lanelets), bool)
    for i, nb in enumerate(map_data.neighboring_lanelets_idx):
        for j in nb:
            neigh[i, j] = True

    # ---- spawn-point geometry precompute (same functions as the runtime's
    # `update_geometry`, evaluated for every (path, point) candidate once).
    from sigmarl_tpu.constants import AGENTS
    from sigmarl_tpu.core import geometry as G

    lt_j = jnp.asarray(long_term)  # [K, P, 2]
    yaw_j = jnp.asarray(yaw)
    lb_j, rb_j = jnp.asarray(lb), jnp.asarray(rb)
    n_lb_j, n_rb_j = jnp.asarray(n_lb), jnp.asarray(n_rb)
    half_w = AGENTS["width"] / 2

    sp_verts = G.rectangle_vertices(
        lt_j, yaw_j, AGENTS["width"], AGENTS["length"], True
    )  # [K, P, 5, 2]
    sp_d_ref, sp_idx_ref = G.perpendicular_distances(
        lt_j, lt_j[:, None], jnp.asarray(n_long)[:, None]
    )  # [K, P]
    sp_dl0, sp_idx_left = G.perpendicular_distances(
        lt_j, lb_j[:, None], n_lb_j[:, None]
    )
    sp_dr0, sp_idx_right = G.perpendicular_distances(
        lt_j, rb_j[:, None], n_rb_j[:, None]
    )
    # Same min-only corner sweep as the runtime `update_geometry`, so the
    # gathered spawn values are bit-identical to a recompute at the pose.
    v4 = sp_verts[..., 0:4, :]  # [K, P, 4, 2]
    sp_dlv = G.min_perpendicular_distance(v4, lb_j[:, None, None])
    sp_drv = G.min_perpendicular_distance(v4, rb_j[:, None, None])
    spawn_d_left = jnp.concatenate([(sp_dl0 - half_w)[..., None], sp_dlv], -1)
    spawn_d_right = jnp.concatenate([(sp_dr0 - half_w)[..., None], sp_drv], -1)

    as_j = jnp.asarray
    return MapTables(
        spawn_d_ref=sp_d_ref,
        spawn_idx_ref=sp_idx_ref.astype(jnp.int32),
        spawn_idx_left=sp_idx_left.astype(jnp.int32),
        spawn_idx_right=sp_idx_right.astype(jnp.int32),
        spawn_d_left=spawn_d_left,
        spawn_d_right=spawn_d_right,
        long_term=as_j(long_term),
        long_term_vec_normalized=as_j(long_vec),
        n_points_long_term=as_j(n_long),
        center_line_yaw=as_j(yaw),
        left_boundary=as_j(lb),
        right_boundary=as_j(rb),
        n_points_left_b=as_j(n_lb),
        n_points_right_b=as_j(n_rb),
        left_boundary_pseudo_vec=as_j(lb_pv),
        right_boundary_pseudo_vec=as_j(rb_pv),
        left_seg=as_j(left_seg),
        right_seg=as_j(right_seg),
        left_chunk_cc=as_j(l_cc),
        left_chunk_cr=as_j(l_cr),
        right_chunk_cc=as_j(r_cc),
        right_chunk_cr=as_j(r_cr),
        entry=as_j(entry),
        exit=as_j(exit_),
        is_loop=as_j(is_loop),
        group_id=as_j(gid),
        group_mask=as_j(group_mask),
        ref_lanelet_ids=as_j(lane_ids),
        n_ref_lanelet_ids=as_j(n_lane_ids),
        ref_lanelet_segment_points=as_j(seg_pts),
        lanelet_centers=as_j(lanelet_centers),
        n_lanelet_center_points=as_j(n_lc),
        neighboring_lanelets=as_j(neigh),
    )
