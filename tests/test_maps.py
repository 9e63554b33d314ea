"""Golden-value parity tests for the map stack vs the reference parsers."""

import numpy as np

from sigmarl_tpu.maps.manager import load_map


def test_cpm_reference_paths_match_reference(golden):
    g = golden("cpm_map")
    m = load_map("cpm_entire")
    assert len(m.reference_paths) == 40
    for i, p in enumerate(m.reference_paths):
        np.testing.assert_allclose(p.center_line, g[f"p{i}_center"], atol=1e-5)
        np.testing.assert_allclose(p.left_boundary_shared, g[f"p{i}_lb_sh"], atol=1e-5)
        np.testing.assert_allclose(p.right_boundary_shared, g[f"p{i}_rb_sh"], atol=1e-5)
        np.testing.assert_allclose(p.center_line_yaw, g[f"p{i}_yaw"], atol=1e-5)
        assert bool(p.is_loop) == bool(g[f"p{i}_loop"])
        np.testing.assert_allclose(
            p.left_boundary_shared_pseudo_vector, g[f"p{i}_lb_sh_pv"], atol=1e-5
        )
        np.testing.assert_allclose(
            p.right_boundary_shared_pseudo_vector, g[f"p{i}_rb_sh_pv"], atol=1e-5
        )


def test_cpm_path_families_match_reference(golden):
    g = golden("cpm_map")
    m = load_map("cpm_entire")
    fams = [
        m.reference_paths_intersection,
        m.reference_paths_merge_in,
        m.reference_paths_merge_out,
    ]
    assert [len(f) for f in fams] == [24, 4, 4]
    for j, fam in enumerate(fams):
        for i, p in enumerate(fam):
            np.testing.assert_allclose(p.center_line, g[f"f{j}_{i}_center"], atol=1e-5)
            np.testing.assert_allclose(p.left_boundary_shared, g[f"f{j}_{i}_lb_sh"], atol=1e-5)
            np.testing.assert_allclose(p.right_boundary_shared, g[f"f{j}_{i}_rb_sh"], atol=1e-5)


def test_osm_map_matches_reference(golden):
    g = golden("osm_intersection_1")
    m = load_map("intersection_1")
    assert len(m.reference_paths) == 4
    for i, p in enumerate(m.reference_paths):
        np.testing.assert_allclose(p.center_line, g[f"p{i}_center"], atol=1e-4)
        np.testing.assert_allclose(p.left_boundary, g[f"p{i}_lb"], atol=1e-4)
        np.testing.assert_allclose(p.right_boundary, g[f"p{i}_rb"], atol=1e-4)
        assert bool(p.is_loop) == bool(g[f"p{i}_loop"])


def test_all_registered_scenarios_parse():
    from sigmarl_tpu.constants import SCENARIOS

    for s in SCENARIOS:
        m = load_map(s)
        assert len(m.reference_paths) > 0
        for p in m.reference_paths:
            assert p.center_line.ndim == 2 and p.center_line.shape[1] == 2
            assert np.isfinite(p.center_line).all()
