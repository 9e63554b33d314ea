"""Pseudo-distance field to lane boundaries (JAX, batched).

Parity port of reference `sigmarl/pseudo_distance.py`: a smooth
point-to-polyline distance where each segment's projection is interpolated
between the pseudo tangent vectors at its two end points (giving a field
that is continuous across segment joints, unlike plain perpendicular
distance), minimized over segments with valid projections.

Differences from the reference (documented): all math in fp32 — the
reference round-trips through float16 (`pseudo_distance.py:118`) purely as
an artifact; and the whole query batch `[..., P_query]` is vectorized
against all segments at once instead of per-point host loops. An optional
windowed mode restricts the per-query segment scan to a window around a
known closest segment index for speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1000.0

# Segment-chunk granularity for top-k chunk pruning: segment tables are
# padded to a PD_CHUNK multiple and per-chunk bounding circles precomputed
# (`env/map_tables.build_map_tables`).
PD_CHUNK = 16

# Projection-validity tolerance. The pseudo-tangent construction makes the
# per-segment valid regions lambda in [0, 1) PARTITION space exactly: at a
# segment joint, lambda hits 1 on one segment exactly where it hits 0 on
# the next. With strict bounds that partition is knife-edged — fp
# reassociation (a different XLA fusion order) can flip a joint query to
# invalid on BOTH neighbors, leaving no valid segment and a spurious _BIG
# distance. Widening by _LAM_EPS turns the measure-zero gap into a small
# OVERLAP (min over two nearly equal candidates — continuous); the
# distance computed at lambda slightly outside [0,1) is still a true
# distance to a point on the segment line, off by at most eps*l ~ 6e-5 m.
_LAM_EPS = 1e-3


def pseudo_distance_to_polyline(
    points: Array,  # [..., Q, 2] query points
    boundary: Array,  # [..., P, 2] polyline vertices (padded by repetition)
    tangents: Array,  # [..., P, 2] pseudo tangent vectors at the vertices
    n_valid: Array | None = None,  # [...] number of valid vertices
) -> Array:
    """Pseudo distance of each query point to the polyline. Returns [..., Q].

    Per segment (reference `get_pseudo_distance:123-202` +
    `get_pseudo_distance_to_segment:69-121`):
    - rotate the query point and both end tangents into the segment frame,
    - slopes m_b, m_t of the tangents; projection factor
      lambda = (x + y*m_b) / (l - y*(m_t - m_b)),
    - the pseudo distance is the norm of (point - lambda*l*e_x) in the
      segment frame, valid when 0 <= lambda < 1; min over valid segments.
    """
    p_b = boundary[..., :-1, :]  # [..., S, 2]
    p_t = boundary[..., 1:, :]
    t_b = tangents[..., :-1, :]
    t_t = tangents[..., 1:, :]

    seg = p_t - p_b  # [..., S, 2]
    seg_len = jnp.linalg.norm(seg, axis=-1)  # [..., S]
    theta = jnp.arctan2(seg[..., 1], seg[..., 0])
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    def to_local(vec_x, vec_y):
        return (
            cos_t * vec_x + sin_t * vec_y,
            -sin_t * vec_x + cos_t * vec_y,
        )

    # Tangent slopes in the segment frame (reference guards x==0 with 1e-8).
    tbx, tby = to_local(t_b[..., 0], t_b[..., 1])
    ttx, tty = to_local(t_t[..., 0], t_t[..., 1])
    m_b = jnp.where(tbx != 0, tby / jnp.where(tbx != 0, tbx, 1.0), 1e-8)
    m_t = jnp.where(ttx != 0, tty / jnp.where(ttx != 0, ttx, 1.0), 1e-8)

    # Broadcast query points against segments: [..., Q, S].
    rel = points[..., :, None, :] - p_b[..., None, :, :]  # [..., Q, S, 2]
    x = cos_t[..., None, :] * rel[..., 0] + sin_t[..., None, :] * rel[..., 1]
    y = -sin_t[..., None, :] * rel[..., 0] + cos_t[..., None, :] * rel[..., 1]

    l = seg_len[..., None, :]
    denom = l - y * (m_t - m_b)[..., None, :]
    lam = (x + y * m_b[..., None, :]) / denom  # [..., Q, S]

    nx = x - lam * l
    ny = y
    d2 = nx * nx + ny * ny

    valid = (lam >= -_LAM_EPS) & (lam < 1 + _LAM_EPS)
    if n_valid is not None:
        seg_idx = jnp.arange(seg.shape[-2])
        in_range = seg_idx < (n_valid[..., None] - 1)
        valid = valid & in_range[..., None, :]
    # Degenerate padded segments (zero length) are never valid.
    valid = valid & (l > 1e-9)

    # One sqrt per query, after the (monotone) min over squared distances.
    return jnp.sqrt(jnp.where(valid, d2, _BIG * _BIG).min(axis=-1))


def segment_table(
    boundary: Array,  # [..., P, 2]
    tangents: Array,  # [..., P, 2]
    n_valid: Array | None = None,  # [...]
) -> Array:
    """Precompute per-segment data for `pseudo_distance_seg`: [..., S, 8]
    rows (pbx, pby, cos_t, sin_t, len, m_b, m_t, valid).

    The per-segment frame rotation and tangent slopes depend only on the
    map, so they are computed ONCE at map-table build time instead of per
    step per agent — the hot-path query evaluation becomes pure arithmetic
    (the round-1 implementation recomputed arctan2/cos/sin over the whole
    boundary for every agent every step)."""
    p_b = boundary[..., :-1, :]
    p_t = boundary[..., 1:, :]
    t_b = tangents[..., :-1, :]
    t_t = tangents[..., 1:, :]
    seg = p_t - p_b
    seg_len = jnp.linalg.norm(seg, axis=-1)
    theta = jnp.arctan2(seg[..., 1], seg[..., 0])
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    def to_local(vec_x, vec_y):
        return (
            cos_t * vec_x + sin_t * vec_y,
            -sin_t * vec_x + cos_t * vec_y,
        )

    tbx, tby = to_local(t_b[..., 0], t_b[..., 1])
    ttx, tty = to_local(t_t[..., 0], t_t[..., 1])
    m_b = jnp.where(tbx != 0, tby / jnp.where(tbx != 0, tbx, 1.0), 1e-8)
    m_t = jnp.where(ttx != 0, tty / jnp.where(ttx != 0, ttx, 1.0), 1e-8)

    valid = seg_len > 1e-9
    if n_valid is not None:
        seg_idx = jnp.arange(seg.shape[-2])
        valid = valid & (seg_idx < (n_valid[..., None] - 1))
    return jnp.stack(
        [p_b[..., 0], p_b[..., 1], cos_t, sin_t, seg_len, m_b, m_t,
         valid.astype(boundary.dtype)],
        axis=-1,
    )


def pseudo_distance_stencil(centers: Array, offsets: Array, seg: Array) -> Array:
    """Pseudo distance at `centers[..., C, 2] + offsets[Q, 2]` — the
    finite-difference stencil evaluation with the per-(center, segment)
    frame transform SHARED across the Q world-frame stencil offsets.

    Equivalent to `pseudo_distance_seg` on the C*Q expanded query set
    (pinned by tests to fp32 reassociation tolerance), but transforms only
    C center points + Q offsets per segment instead of C*Q queries: the
    offset's segment-frame displacement (dox, doy) is center-independent
    because the stencil offsets are world-axis constants (reference
    `estimate_agent_2_lane_safety_margin:575-600` uses the same
    world-frame grid).

    Returns [..., C, Q].
    """
    pbx = seg[..., None, :, 0]  # [..., 1, S]
    pby = seg[..., None, :, 1]
    cos_t = seg[..., None, :, 2]
    sin_t = seg[..., None, :, 3]
    l = seg[..., None, None, :, 4]  # [..., 1, 1, S]
    m_b = seg[..., None, None, :, 5]
    m_t = seg[..., None, None, :, 6]
    valid = seg[..., None, None, :, 7] > 0.5

    # Center coordinates in each segment frame: [..., C, S].
    rcx = centers[..., :, None, 0] - pbx
    rcy = centers[..., :, None, 1] - pby
    xc = cos_t * rcx + sin_t * rcy
    yc = -sin_t * rcx + cos_t * rcy
    # Offset displacements in each segment frame: [..., Q, S].
    ox = offsets[:, None, 0]  # [Q, 1]
    oy = offsets[:, None, 1]
    cos_q = seg[..., None, :, 2]  # [..., 1, S] broadcasting vs [Q, 1]
    sin_q = seg[..., None, :, 3]
    dox = cos_q * ox + sin_q * oy  # [..., Q, S]
    doy = -sin_q * ox + cos_q * oy

    x = xc[..., :, None, :] + dox[..., None, :, :]  # [..., C, Q, S]
    y = yc[..., :, None, :] + doy[..., None, :, :]
    denom = l - y * (m_t - m_b)
    lam = (x + y * m_b) / denom
    nx = x - lam * l
    d2 = nx * nx + y * y
    ok = valid & (lam >= -_LAM_EPS) & (lam < 1 + _LAM_EPS)
    return jnp.sqrt(jnp.where(ok, d2, _BIG * _BIG).min(axis=-1))


def pseudo_distance_seg(points: Array, seg: Array) -> Array:
    """Pseudo distance against a precomputed segment table.

    Args:
        points: [..., Q, 2] queries; seg: [..., S, 8] from `segment_table`.

    Returns [..., Q]. Same result as `pseudo_distance_to_polyline` on the
    source boundary/tangents (pinned by tests), with all per-segment
    trigonometry hoisted out of the evaluation."""
    pbx = seg[..., None, :, 0]  # [..., 1, S]
    pby = seg[..., None, :, 1]
    cos_t = seg[..., None, :, 2]
    sin_t = seg[..., None, :, 3]
    l = seg[..., None, :, 4]
    m_b = seg[..., None, :, 5]
    m_t = seg[..., None, :, 6]
    valid = seg[..., None, :, 7] > 0.5

    qx = points[..., :, None, 0]  # [..., Q, 1]
    qy = points[..., :, None, 1]
    rx = qx - pbx  # [..., Q, S]
    ry = qy - pby
    x = cos_t * rx + sin_t * ry
    y = -sin_t * rx + cos_t * ry
    denom = l - y * (m_t - m_b)
    lam = (x + y * m_b) / denom
    nx = x - lam * l
    d2 = nx * nx + y * y
    ok = valid & (lam >= -_LAM_EPS) & (lam < 1 + _LAM_EPS)
    # Reduce on SQUARED distances (monotone under sqrt): one sqrt per query
    # instead of one per (query, segment) — the multi-cycle sqrt is a
    # measurable slice of the VPU-bound sweep. sqrt(_BIG**2) == _BIG keeps
    # the no-valid-segment fill value bit-identical.
    return jnp.sqrt(jnp.where(ok, d2, _BIG * _BIG).min(axis=-1))


def topk_chunk_rows(
    seg_table: Array,  # [K, S, 8] stacked per-path segment tables
    chunk_cc: Array,  # [K, NC, 2] chunk bound centers (MapTables)
    chunk_cr: Array,  # [K, NC] chunk bound radii
    oh: Array,  # [..., K] path one-hot selector
    path_id: Array,  # [...] int32
    p_ref: Array,  # [..., 2] per-row reference point (e.g. agent pos)
    reach: float,  # static max |query - p_ref| over all queries
    k: int,
) -> Array:
    """Gather the k*PD_CHUNK segment rows of the k chunks with the
    smallest bounding-circle lower bound |p_ref - cc| - cr - reach.

    The bound is a true lower bound of both the pseudo distance and the
    clamped perpendicular distance of any query within `reach` of `p_ref`
    to any segment in the chunk (the projection point lies ON the
    segment), so a min over the gathered rows is EXACT whenever the true
    minimum is below every unselected chunk's bound. Returns
    [..., k*PD_CHUNK, 8]."""
    from sigmarl_tpu.env.map_tables import lookup

    K, S = seg_table.shape[0], seg_table.shape[1]
    NC = S // PD_CHUNK
    ccp = lookup(oh, chunk_cc)  # [..., NC, 2]
    crp = lookup(oh, chunk_cr)  # [..., NC]
    lbound = (
        jnp.linalg.norm(p_ref[..., None, :] - ccp, axis=-1) - crp - reach
    )
    _, sel = jax.lax.top_k(-lbound, k)  # [..., k]
    flat = path_id[..., None] * NC + sel
    rows = jnp.take(seg_table.reshape(K * NC, PD_CHUNK * 8), flat, axis=0)
    return rows.reshape(*flat.shape[:-1], k * PD_CHUNK, 8)


def window_segment_rows(
    seg_table: Array,  # [K, S, 8] stacked per-path segment tables
    path_id: Array,  # [...] int32
    center_idx: Array,  # [...] int32 — closest boundary VERTEX index
    window: int,
    n_seg: Array,  # [K] int32 — valid segment count per path
    is_loop: Array,  # [K] bool
) -> Array:
    """Gather a `window`-segment slice of each row's path table around its
    closest vertex, directly from the stacked [K, S, 8] table by flat index
    (NO per-agent full-boundary materialization — the one-hot-matmul lookup
    of the whole [B, N, S, 8] table is the stencil's dominant HBM cost).

    Loop paths (reference `world_state_rt.py` loop reference paths) wrap
    modularly so windows near the seam cover both index ends; open paths
    clamp the window inside [0, n_seg). Including extra segments can never
    change the min (every gathered segment is also in the full scan); the
    window need only CONTAIN the full scan's winning segment, which lane
    geometry guarantees for windows covering ~±0.5 m around the closest
    vertex (`tests/test_safety.py` pins windowed == full over all paths).

    Returns [..., window, 8]."""
    K, S = seg_table.shape[0], seg_table.shape[1]
    ns = n_seg[path_id]  # [...]
    lp = is_loop[path_id]
    offs = jnp.arange(window, dtype=jnp.int32) - window // 2
    idx_loop = (center_idx[..., None] + offs) % jnp.maximum(ns[..., None], 1)
    start = jnp.clip(center_idx - window // 2, 0, jnp.maximum(ns - window, 0))
    idx_open = jnp.minimum(start[..., None] + (offs + window // 2), S - 1)
    idx = jnp.where(lp[..., None], idx_loop, idx_open)
    flat = path_id[..., None] * S + idx  # [..., W]
    return jnp.take(seg_table.reshape(K * S, 8), flat, axis=0)


def pseudo_distance_windowed(
    points: Array,  # [..., Q, 2]
    boundary: Array,  # [..., P, 2]
    tangents: Array,  # [..., P, 2]
    center_idx: Array,  # [...] int32 — window center (closest vertex index)
    window: int,
    n_valid: Array | None = None,
) -> Array:
    """Windowed variant: only `window` segments around `center_idx` are
    scanned. Exact when the true minimizing segment lies inside the window
    (lane geometry guarantees this for windows covering ~±0.5 m)."""
    P = boundary.shape[-2]
    start = jnp.clip(center_idx - window // 2, 0, max(P - window, 0))
    offs = jnp.arange(window)
    idx = start[..., None] + offs  # [..., window]
    bnd = jnp.take_along_axis(boundary, idx[..., None].repeat(2, -1), axis=-2)
    tan = jnp.take_along_axis(tangents, idx[..., None].repeat(2, -1), axis=-2)
    nv = None
    if n_valid is not None:
        nv = jnp.clip(n_valid - start, 0, window)
    return pseudo_distance_to_polyline(points, bnd, tan, nv)
