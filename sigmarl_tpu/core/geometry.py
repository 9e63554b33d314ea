"""Batched geometry kernels (JAX).

TPU-native re-design of the reference geometry library
(`sigmarl/helper_scenario.py`): every function here is pure, shape-static,
`vmap`/`jit`-friendly, and vectorized over arbitrary leading batch/agent
axes — where the reference loops over agents/pairs in Python, these kernels
fold the agent and pair axes into the array program so XLA can fuse and tile
them. Padded polylines use repeated end points; all kernels are
padding-safe (zero-length segments contribute nothing).

Numerical parity with the reference is pinned by golden tests
(tests/test_geometry.py, fixtures from scripts/make_golden.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def angle_eliminate_two_pi(angle: Array) -> Array:
    """Wrap angles to (-pi, pi] (reference `helper_scenario.py:1276-1289`)."""
    two_pi = 2 * jnp.pi
    angle = angle % two_pi
    return jnp.where(angle > jnp.pi, angle - two_pi, angle)


def decreasing_fcn(x: Array, x0, x1, kind: str = "linear") -> Array:
    """Decreasing ramp on [x0, x1] with y(x0)=1, y(x1)=0
    (reference `helper_scenario.py:960-996`)."""
    x = jnp.clip(x, x0, x1)
    denom = x1 - x0
    if kind == "linear":
        return 1.0 - (x - x0) / denom
    if kind == "exponential":
        e_inv = 1.0 / jnp.e
        return (jnp.exp(-(x - x0) / denom) - e_inv) / (1.0 - e_inv)
    raise ValueError(f"unsupported kind {kind!r}")


def rectangle_vertices(
    center: Array, yaw: Array, width: float, length: float, close_shape: bool = True
) -> Array:
    """Rectangle vertices for batched poses.

    Args:
        center: [..., 2]; yaw: [...]. Returns [..., 4 or 5, 2] (first vertex
        repeated when `close_shape`). Reference `helper_scenario.py:695-826`.
    """
    lh, wh = length / 2, width / 2
    base = jnp.array(
        [[lh, wh], [lh, -wh], [-lh, -wh], [-lh, wh]], dtype=center.dtype
    )
    if close_shape:
        base = jnp.concatenate([base, base[:1]], axis=0)
    cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
    # Rotate local vertices into the world frame: v' = R(yaw) @ v.
    vx = base[..., 0] * cos_y[..., None] - base[..., 1] * sin_y[..., None]
    vy = base[..., 0] * sin_y[..., None] + base[..., 1] * cos_y[..., None]
    return jnp.stack([vx, vy], axis=-1) + center[..., None, :]


def perpendicular_distances(
    point: Array, polyline: Array, n_valid: Array | None = None
) -> tuple[Array, Array]:
    """Minimum perpendicular distance from point(s) to a padded polyline.

    Args:
        point: [..., 2]; polyline: [..., P, 2]; n_valid: [...] number of valid
        points (padding repeats the last valid point).

    Returns:
        (distance [...], index [...]) where index is the closest polyline
        point pushed one forward ("always in the future"), matching reference
        `helper_scenario.py:829-889` (incl. its padding rule: distances of
        segments at index >= n_valid-1 take the value of segment n_valid-2).
    """
    starts = polyline[..., :-1, :]
    vecs = polyline[..., 1:, :] - starts
    rel = point[..., None, :] - starts
    len2 = jnp.sum(vecs * vecs, axis=-1)
    t = jnp.sum(rel * vecs, axis=-1) / jnp.maximum(len2, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    closest = starts + vecs * t[..., None]
    d = jnp.linalg.norm(closest - point[..., None, :], axis=-1)
    if n_valid is not None:
        n_seg = d.shape[-1]
        seg_idx = jnp.arange(n_seg)
        # d at segment n_valid-2, via a one-hot reduction: a per-element
        # take_along_axis lowers to scalar HBM gathers on TPU (the same
        # pessimization as the windowed pseudo-distance, ~an order of
        # magnitude slower than this dense masked sum).
        end_idx = jnp.maximum(n_valid - 2, 0).astype(jnp.int32)
        d_end = jnp.sum(
            jnp.where(seg_idx == end_idx[..., None], d, 0.0),
            axis=-1, keepdims=True,
        )
        d = jnp.where(seg_idx >= (n_valid[..., None] - 1), d_end, d)
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32) + 1
    dist = jnp.min(d, axis=-1)
    return dist, idx


def min_perpendicular_distance(point: Array, polyline: Array) -> Array:
    """Minimum distance only — no closest index, no padding correction.

    Exactly equals `perpendicular_distances(...)[0]` for padded polylines
    whose padding repeats the last valid point: every padded segment
    degenerates to that point, so its query distance is the point distance
    |q - p_last|, which is >= the distance to the last real segment
    (a segment containing p_last) — the padding can never produce the
    minimum, and the correction that rewrites padded entries with the last
    real segment's distance cannot change `min(d)` either. Dropping the
    argmin and the correction leaves ONE fused reduction over the
    [..., P-1] distance tensor instead of three passes — the production
    vertex sweeps' hot path (update_geometry: 4 corners x 2 boundaries at
    [B, N, 4, P]; measured 1.9 ms -> see PROFILE_r04.md).
    """
    starts = polyline[..., :-1, :]
    vecs = polyline[..., 1:, :] - starts
    rel = point[..., None, :] - starts
    len2 = jnp.sum(vecs * vecs, axis=-1)
    t = jnp.sum(rel * vecs, axis=-1) / jnp.maximum(len2, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    diff = starts + vecs * t[..., None] - point[..., None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(jnp.min(d2, axis=-1))


def min_distance_to_segment_rows(points: Array, rows: Array) -> Array:
    """Minimum clamped point-to-segment distance against pseudo-distance
    segment-table rows (`safety.pseudo_distance.segment_table` layout:
    [..., S, 8] = (pbx, pby, cos_t, sin_t, len, m_b, m_t, valid)).

    The row's start point and direction recover the segment exactly
    (start = (pbx, pby), vec = len * (cos_t, sin_t)); invalid rows are
    masked out of the min. Equals `min_perpendicular_distance` on the
    source polyline restricted to the rows' segments (pinned by
    tests/test_geometry.py).

    points: [..., Q, 2]; rows: [..., S, 8]. Returns [..., Q].
    """
    sx = rows[..., None, :, 0]  # [..., 1, S]
    sy = rows[..., None, :, 1]
    ln = rows[..., None, :, 4]
    vx = ln * rows[..., None, :, 2]
    vy = ln * rows[..., None, :, 3]
    valid = rows[..., None, :, 7] > 0.5
    relx = points[..., :, None, 0] - sx  # [..., Q, S]
    rely = points[..., :, None, 1] - sy
    t = jnp.clip(
        (relx * vx + rely * vy) / jnp.maximum(ln * ln, 1e-12), 0.0, 1.0
    )
    dx = relx - t * vx
    dy = rely - t * vy
    d2 = dx * dx + dy * dy
    return jnp.sqrt(jnp.where(valid, d2, 1.0e6).min(axis=-1))


def short_term_reference_path(
    polyline: Array,
    index_closest_point: Array,
    n_points_to_return: int,
    is_loop: Array,
    n_points_long_term: Array,
    sample_interval: int = 2,
    n_points_shift: int = 1,
) -> tuple[Array, Array]:
    """Sample a short-term window from a (possibly looped) padded polyline.

    Args:
        polyline: [..., P, 2]; index_closest_point / n_points_long_term: [...];
        is_loop: [...] bool. Returns ([..., n_points_to_return, 2], indices).
        Reference `helper_scenario.py:892-957` (loop wrap skips the duplicate
        final point via `(idx + 1) % n`).
    """
    offsets = jnp.arange(n_points_to_return, dtype=jnp.int32) * sample_interval
    future = offsets + index_closest_point[..., None].astype(jnp.int32) + n_points_shift
    n = n_points_long_term[..., None].astype(jnp.int32)
    wrapped = jnp.where(future >= n - 1, (future + 1) % jnp.maximum(n, 1), future)
    future = jnp.where(is_loop[..., None], wrapped, future)
    future = jnp.clip(future, 0, polyline.shape[-2] - 1)
    path = jnp.take_along_axis(polyline, future[..., None], axis=-2)
    return path, future


def c2c_distances(pos: Array, set_diagonal_to: float | None = None) -> Array:
    """Pairwise center-to-center distances. pos: [..., N, 2] -> [..., N, N].
    Reference `helper_scenario.py:1012-1029`."""
    diff = pos[..., :, None, :] - pos[..., None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    if set_diagonal_to is not None:
        n = pos.shape[-2]
        d = jnp.where(jnp.eye(n, dtype=bool), set_diagonal_to, d)
    return d


def mtv_distances(vertices: Array, set_diagonal_to: float | None = None) -> Array:
    """Pairwise SAT/MTV-based rectangle distances, fully vectorized over the
    pair axes (the reference loops i<j in Python, `helper_scenario.py:1030-1138`).

    Args:
        vertices: [..., N, >=4, 2] rectangle vertices (first 4 used).

    Returns:
        [..., N, N] distances: positive = separation (Euclidean over the
        per-axis gaps on the other rectangle's two normal axes), negative =
        penetration (minimum translation magnitude).
    """
    v = vertices[..., :4, :]  # [..., N, 4, 2]
    axes = jnp.diff(vertices[..., 0:3, :], axis=-2)  # [..., N, 2, 2]
    axes = axes / jnp.maximum(jnp.linalg.norm(axes, axis=-1, keepdims=True), 1e-12)

    # proj[b, i, j, p, a]: vertex p of rect i projected on axis a of rect j.
    # precision=HIGHEST: on TPU the default matmul precision is bf16, which
    # costs ~1e-3 absolute error — unacceptable for contact distances. These
    # contractions are tiny (K=2), so full fp32 is free.
    proj = jnp.einsum("...ipc,...jac->...ijpa", v, axes, precision=jax.lax.Precision.HIGHEST)
    # Rect j's own projection extents on its own axes: proj[j, j, :, :].
    proj_self = jnp.einsum("...jpc,...jac->...jpa", v, axes, precision=jax.lax.Precision.HIGHEST)
    max_own = proj_self.max(axis=-2)  # [..., N(j), 2]
    min_own = proj_self.min(axis=-2)
    max_j = max_own[..., None, :, :]  # broadcast over i -> [..., 1, N, 2]
    min_j = min_own[..., None, :, :]

    min_jb = min_j[..., None, :]  # [..., 1, N, 1, 2]
    max_jb = max_j[..., None, :]
    gap = (proj - min_jb) * (proj <= min_jb) + (max_jb - proj) * (proj >= max_jb)
    pos_dist = jnp.linalg.norm(gap, axis=-1)  # [..., N, N, 4]

    # Projection extents of rect i on axes of rect j.
    max_ij = proj.max(axis=-2)  # [..., N, N, 2]
    min_ij = proj.min(axis=-2)
    overlap = jnp.minimum(max_j, max_ij) - jnp.maximum(min_j, min_ij)  # [..., N, N, 2]

    inside = jnp.all((proj > min_jb) & (proj < max_jb), axis=-1)  # [..., N, N, 4]
    neg_mag = -overlap.min(axis=-1)[..., None] * inside  # [..., N, N, 4]

    # Candidates for pair (i, j): vertices of i vs rect j AND vertices of j vs
    # rect i (the transpose), min over all 8.
    pos_dist_T = jnp.swapaxes(pos_dist, -3, -2)
    candidates = jnp.concatenate([pos_dist, pos_dist_T], axis=-1)
    dist = candidates.min(axis=-1)

    any_inside = (jnp.abs(neg_mag) > 0).any(axis=-1)
    any_inside = any_inside | jnp.swapaxes(any_inside, -2, -1)
    overlap_min = overlap.min(axis=-1)
    pen = -jnp.minimum(overlap_min, jnp.swapaxes(overlap_min, -2, -1))
    dist = jnp.where(any_inside, pen, dist)

    if set_diagonal_to is not None:
        n = v.shape[-3]
        dist = jnp.where(jnp.eye(n, dtype=bool), set_diagonal_to, dist)
    return dist


def interx(L1: Array, L2: Array) -> Array:
    """Whether two (batched) polylines intersect.

    Args:
        L1: [..., P1, 2]; L2: [..., P2, 2] (padding by repeated points is
        safe: zero-length segments never register).

    Returns:
        [...] bool. Vectorized port of the signed-distance test in reference
        `helper_scenario.py:1148-1229` (MATLAB interX).
    """
    x1, y1 = L1[..., 0], L1[..., 1]
    x2, y2 = L2[..., 0], L2[..., 1]
    dx1, dy1 = jnp.diff(x1, axis=-1), jnp.diff(y1, axis=-1)
    dx2, dy2 = jnp.diff(x2, axis=-1), jnp.diff(y2, axis=-1)
    S1 = dx1 * y1[..., :-1] - dy1 * x1[..., :-1]  # [..., P1-1]
    S2 = dx2 * y2[..., :-1] - dy2 * x2[..., :-1]  # [..., P2-1]

    # C1[i, j]: do the endpoints of segment j of L2 lie on opposite sides of
    # the (infinite) line through segment i of L1?
    d1 = (
        dx1[..., :, None] * y2[..., None, :] - dy1[..., :, None] * x2[..., None, :]
    )  # [..., P1-1, P2]
    C1 = (d1[..., :, :-1] - S1[..., :, None]) * (d1[..., :, 1:] - S1[..., :, None]) < 0

    d2 = (
        y1[..., :, None] * dx2[..., None, :] - x1[..., :, None] * dy2[..., None, :]
    )  # [..., P1, P2-1]
    C2 = (d2[..., :-1, :] - S2[..., None, :]) * (d2[..., 1:, :] - S2[..., None, :]) < 0

    return jnp.any(C1 & C2, axis=(-2, -1))


def rect_polyline_hit(
    pos: Array, rot: Array, width: float, length: float, polyline: Array
) -> Array:
    """Whether a polyline crosses a (solid) oriented rectangle.

    Exact segment-vs-box slab test in the rectangle's frame — the
    TPU-cheap equivalent of `interx(rectangle_vertices(...), polyline)`
    for CONTINUOUS polylines: a boundary segment overlapping the box
    interior implies the polyline crosses the outline (a multi-segment
    polyline larger than the box cannot sit entirely inside), and
    vice versa. Semantics match interX's strictness: grazing contacts
    (touching a corner / collinear along an edge) and degenerate padding
    segments (repeated points) do not register. ~5x fewer vector ops than
    the sign-product grid: one [..., P] chain instead of
    [..., 4, P] + [..., 5, P-1] products.

    CALLER REQUIREMENT (this is NOT a general polyline-vs-rectangle
    predicate): the polyline's extent must exceed the rectangle, as lane
    boundaries do vs the agent box. A polyline contained strictly INSIDE
    the rectangle returns True here (segments overlap the solid interior)
    where `interx` on the outline returns False. For short polylines use
    `interx(rectangle_vertices(...), polyline)` instead.

    Args:
        pos: [..., 2]; rot: [...]; polyline: [..., P, 2]. Returns [...] bool.
    """
    c, s = jnp.cos(rot), jnp.sin(rot)
    rel = polyline - pos[..., None, :]
    x = c[..., None] * rel[..., 0] + s[..., None] * rel[..., 1]
    y = -s[..., None] * rel[..., 0] + c[..., None] * rel[..., 1]
    hl, hw = length / 2, width / 2

    x0, y0 = x[..., :-1], y[..., :-1]
    dx = x[..., 1:] - x0
    dy = y[..., 1:] - y0
    big = 1e30
    eps = 1e-12

    def slab(p0, d, h):
        safe = jnp.where(jnp.abs(d) > eps, d, 1.0)
        t1 = (-h - p0) / safe
        t2 = (h - p0) / safe
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        degen = jnp.abs(d) <= eps
        inside0 = (p0 > -h) & (p0 < h)
        tmin = jnp.where(degen, jnp.where(inside0, -big, big), tmin)
        tmax = jnp.where(degen, jnp.where(inside0, big, -big), tmax)
        return tmin, tmax, degen

    tminx, tmaxx, degx = slab(x0, dx, hl)
    tminy, tmaxy, degy = slab(y0, dy, hw)
    t_lo = jnp.maximum(jnp.maximum(tminx, tminy), 0.0)
    t_hi = jnp.minimum(jnp.minimum(tmaxx, tmaxy), 1.0)
    hit = (t_lo < t_hi) & ~(degx & degy)
    return jnp.any(hit, axis=-1)


def global_to_local(pos_i: Array, pos_j: Array, rot_i: Array) -> Array:
    """Transform points into an agent's ego frame.

    Args:
        pos_i: [..., 2] ego position; rot_i: [...] ego yaw;
        pos_j: [..., M, 2] points. Returns [..., M, 2].
        Reference `helper_scenario.py:1241-1273` (polar form).
    """
    vec = pos_j - pos_i[..., None, :]
    r = jnp.linalg.norm(vec, axis=-1)
    theta = jnp.arctan2(vec[..., 1], vec[..., 0]) - rot_i[..., None]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def current_lanelet_id(
    point: Array,
    segment_points: Array,
    n_lanelets: Array,
    lanelet_ids: Array,
) -> Array:
    """Closest lanelet ID along each agent's reference path.

    Args:
        point: [..., 2]; segment_points: [..., L+1, 2] lanelet connection
        points; n_lanelets: [...]; lanelet_ids: [..., L].
        Reference `helper_scenario.py:1292-1366`.
    """
    starts = segment_points[..., :-1, :]
    vecs = segment_points[..., 1:, :] - starts
    rel = point[..., None, :] - starts
    t = jnp.sum(rel * vecs, axis=-1) / jnp.maximum(jnp.sum(vecs * vecs, axis=-1), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    closest = starts + vecs * t[..., None]
    d = jnp.linalg.norm(closest - point[..., None, :], axis=-1)
    seg_idx = jnp.arange(d.shape[-1])
    d = jnp.where(seg_idx < n_lanelets[..., None], d, jnp.inf)
    nearest = jnp.argmin(d, axis=-1)
    return jnp.take_along_axis(lanelet_ids, nearest[..., None], axis=-1)[..., 0]
