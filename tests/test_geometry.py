"""Golden-value parity tests: JAX geometry kernels vs the reference torch ops."""

import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.core import geometry as G


def test_perpendicular_distances(golden):
    g = golden("geometry")
    d, idx = G.perpendicular_distances(
        jnp.asarray(g["pd_pts"]), jnp.asarray(g["pd_poly"]), jnp.asarray(g["pd_n"])
    )
    np.testing.assert_allclose(np.asarray(d), g["pd_d"], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), g["pd_i"])


def test_short_term_reference_path(golden):
    g = golden("geometry")
    path, idx = G.short_term_reference_path(
        jnp.asarray(g["pd_poly"]),
        jnp.asarray(g["pd_i"]),
        3,
        jnp.asarray(g["st_loop"]),
        jnp.asarray(g["pd_n"]),
        sample_interval=2,
        n_points_shift=1,
    )
    np.testing.assert_array_equal(np.asarray(idx), g["st_idx"])
    np.testing.assert_allclose(np.asarray(path), g["st_path"], atol=1e-6)


def test_rectangle_vertices(golden):
    g = golden("geometry")
    verts = G.rectangle_vertices(
        jnp.asarray(g["rv_center"]), jnp.asarray(g["rv_yaw"][:, 0]), 0.107, 0.22, True
    )
    np.testing.assert_allclose(np.asarray(verts), g["rv_verts"], atol=1e-5)


def test_c2c_distances(golden):
    g = golden("geometry")
    diag = float(np.sqrt(4.5**2 + 4.0**2))
    d = G.c2c_distances(jnp.asarray(g["c2c_centers"]), set_diagonal_to=diag)
    np.testing.assert_allclose(np.asarray(d), g["c2c_d"], atol=1e-5)


def test_mtv_distances(golden):
    g = golden("geometry")
    diag = float(np.sqrt(4.5**2 + 4.0**2))
    d = G.mtv_distances(jnp.asarray(g["mtv_verts"]), set_diagonal_to=diag)
    np.testing.assert_allclose(np.asarray(d), g["mtv_d"], atol=1e-5)


def test_interx(golden):
    g = golden("geometry")
    hit = G.interx(jnp.asarray(g["mtv_verts"][:, 0]), jnp.asarray(g["ix_L2"]))
    np.testing.assert_array_equal(np.asarray(hit), g["ix_hit"])
    hit_pair = G.interx(jnp.asarray(g["mtv_verts"][:, 0]), jnp.asarray(g["mtv_verts"][:, 1]))
    np.testing.assert_array_equal(np.asarray(hit_pair), g["ix_hit_pair"])


def test_interx_padding_safe():
    # Padded polylines (repeated end point) must not create phantom hits.
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=np.float32)
    far = np.array([[5, 5], [6, 5], [6, 6]], dtype=np.float32)
    far_padded = np.concatenate([far, np.repeat(far[-1:], 7, axis=0)], axis=0)
    assert not bool(G.interx(jnp.asarray(sq[None]), jnp.asarray(far_padded[None]))[0])
    cross = np.array([[0.5, -1], [0.5, 2]], dtype=np.float32)
    cross_padded = np.concatenate([cross, np.repeat(cross[-1:], 5, axis=0)], axis=0)
    assert bool(G.interx(jnp.asarray(sq[None]), jnp.asarray(cross_padded[None]))[0])


def test_global_to_local(golden):
    g = golden("geometry")
    rel = G.global_to_local(
        jnp.asarray(g["tf_pos_i"]), jnp.asarray(g["tf_pos_j"]), jnp.asarray(g["tf_rot_i"][:, 0])
    )
    np.testing.assert_allclose(np.asarray(rel), g["tf_rel"], atol=1e-5)


def test_angle_wrap():
    a = jnp.asarray(np.linspace(-10, 10, 101, dtype=np.float32))
    w = np.asarray(G.angle_eliminate_two_pi(a))
    assert (w <= np.pi + 1e-6).all() and (w >= -np.pi - 1e-6).all()
    np.testing.assert_allclose(np.sin(w), np.sin(np.asarray(a)), atol=1e-5)


def test_interx_vs_numpy_oracle():
    """The batched interx kernel agrees with the unbatched numpy oracle
    (parity stand-in for the reference's interX_original.py) on random
    polyline pairs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sigmarl_tpu.core.geometry import interx
    from sigmarl_tpu.utils.interx_numpy import interx_bool, interx_points

    rng = np.random.default_rng(7)
    agree = 0
    for trial in range(50):
        L1 = rng.normal(0, 1, (6, 2)).cumsum(0) * 0.3
        L2 = rng.normal(0, 1, (8, 2)).cumsum(0) * 0.3
        got = bool(jax.jit(interx)(jnp.asarray(L1), jnp.asarray(L2)))
        want = interx_bool(L1, L2)
        assert got == want, f"trial {trial}"
        if want:
            assert interx_points(L1, L2).shape[0] >= 1
            agree += 1
    assert agree > 5  # sanity: a decent share of random pairs intersect


def test_rect_polyline_hit_matches_interx():
    """The slab-test lanelet collision path must agree with the interX
    sign-product path (update_geometry uses the former; the reference's
    semantics are the latter). Random rectangles vs wandering polylines
    with degenerate padding tails."""
    import jax
    import jax.numpy as jnp

    from sigmarl_tpu.core import geometry as G

    key = jax.random.PRNGKey(42)
    total_hits = 0
    for i in range(8):
        k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, i), 4)
        B = 128
        pos = jax.random.uniform(k1, (B, 2)) * 2.0
        rot = jax.random.uniform(k2, (B,)) * 6.28
        steps = jax.random.normal(k3, (B, 40, 2)) * 0.08
        start = pos + jax.random.normal(k4, (B, 2)) * 0.3
        poly = start[:, None] + jnp.cumsum(steps, axis=1)
        poly = poly.at[:, -5:].set(poly[:, -6:-5])  # padding tail
        verts = G.rectangle_vertices(pos, rot, 0.107, 0.22, True)
        ref = np.asarray(G.interx(verts, poly))
        new = np.asarray(G.rect_polyline_hit(pos, rot, 0.107, 0.22, poly))
        np.testing.assert_array_equal(ref, new)
        total_hits += int(ref.sum())
    assert total_hits > 100  # the comparison actually exercised hits


def test_min_distance_to_segment_rows_matches_sweep():
    """`min_distance_to_segment_rows` (the chunk-pruned corner sweep's
    segment-row evaluator) must equal `min_perpendicular_distance` on the
    source polyline when given ALL of its rows — the (start, vec) pairs
    recovered from the pseudo-distance segment table are the polyline's
    segments exactly."""
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env

    p = Parameters(
        scenario_type="cpm_entire", n_agents=2, num_vmas_envs=2, dt=0.1,
        max_steps=10,
    )
    env = make_env(p)
    t = env.tables
    import jax

    q = jax.random.uniform(jax.random.PRNGKey(3), (4, 20, 2), minval=0.0, maxval=4.5)
    for seg, bnd in ((t.left_seg, t.left_boundary), (t.right_seg, t.right_boundary)):
        for k in (0, 5, 17):
            ref = G.min_perpendicular_distance(q, bnd[k][None, None])
            out = G.min_distance_to_segment_rows(q, seg[k][None, None])
            np.testing.assert_allclose(
                np.asarray(out).squeeze(), np.asarray(ref).squeeze(), atol=1e-5
            )
