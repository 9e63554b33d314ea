"""Render overlays, footprints, and the new paper-driver pieces."""

import os

import numpy as np


def test_render_overlays_and_footprints(tmp_path):
    """Action arrows + priority lines + footprint figure render from a
    synthetic record (reference `road_traffic.py:1942-2226`,
    `evaluation_itsc26_footprints.py`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sigmarl_tpu.render import render_footprints, render_frame

    T, B, N = 6, 1, 3
    rng = np.random.RandomState(0)
    pos = 2.0 + 0.5 * rng.rand(T, B, N, 2)
    rot = rng.rand(T, B, N) * 2 * np.pi
    record = {
        "pos": pos, "rot": rot,
        "applied_action": rng.rand(T, B, N, 2),
        "nominal_action": rng.rand(T, B, N, 2),
    }

    fig, ax = plt.subplots()
    prio = np.zeros((N, N), bool)
    prio[1, 0] = True  # agent 0's action propagates to agent 1
    render_frame(
        ax, "cpm_mixed", pos[0, 0], rot[0, 0],
        applied_action=record["applied_action"][0, 0],
        nominal_action=record["nominal_action"][0, 0],
        higher_priority=prio,
    )
    # Arrows (annotations) and the priority line made it onto the axes.
    assert len(ax.texts) + len(ax.patches) > N  # rectangles + arrow patches
    plt.close(fig)

    out = render_footprints(
        "cpm_mixed", record, str(tmp_path / "footprints.png"), stride=2
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_sobol_indices():
    from sigmarl_tpu.eval.papers import robust_stats, sobol_from_grid

    # Additive surface: no interaction, variance split between the axes.
    ta = np.linspace(0, 1, 5)[:, None]
    tb = np.linspace(0, 2, 7)[None, :]
    z = 3.0 * ta + 1.0 * tb
    s = sobol_from_grid(z)
    assert abs(s["S_int"]) < 1e-6
    assert abs(s["S_ta"] + s["S_tb"] - 1.0) < 1e-6
    assert s["S_ta"] > s["S_tb"]  # 3x coefficient on the larger... check below
    st = robust_stats(z)
    assert st["count"] == 35 and np.isfinite(st["mean"])

    # Pure-interaction surface.
    z2 = np.outer(np.array([-1.0, 1.0]), np.array([-1.0, 1.0]))
    s2 = sobol_from_grid(z2)
    assert s2["S_int"] > 0.99


def test_itsc26_robustness_quick(tmp_path):
    from sigmarl_tpu.eval.papers import itsc26_robustness

    rep = itsc26_robustness(quick=True, out_dir=str(tmp_path))
    z = np.asarray(rep["episode_reward_grid"])
    assert z.shape == (2, 2) and np.isfinite(z).all()
    assert "sobol" in rep and "robust_stats" in rep
    assert os.path.exists(os.path.join(str(tmp_path), "robustness_report.json"))
