"""Training-learns evidence: the committed LEARNING_CURVE.json artifact —
produced by real multi-seed MAPPO runs via
scripts/train_learning_curve.py on the TPU — must show the seed-mean
episode reward improving by a margin and the trained policy SUBSTANTIALLY
cutting the distance-normalized collision rate (the claim made in the
round profiles, asserted here so a regenerated artifact cannot silently
regress to mere parity).

Aggregation protocol mirrors the reference
(`eva_at25/marl_aggregated_evaluation.py:29-53`: seeds x metric ->
mean +/- CI95); curve contract `mappo_cavs.py:468-515`."""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "LEARNING_CURVE.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ART):
        pytest.skip("LEARNING_CURVE.json not generated yet "
                    "(scripts/train_learning_curve.py)")
    with open(ART) as f:
        return json.load(f)


def test_learning_curve_is_a_real_run(artifact):
    a = artifact
    assert a["n_iters"] >= 30, "not a real training run"
    assert a["total_env_steps"] >= 500_000
    assert len(a["reward_history"]) == a["n_iters"]
    assert np.isfinite(a["reward_history"]).all()


def test_multi_seed(artifact):
    """Evidence must aggregate >= 3 independent seeds, with per-seed
    curves committed alongside the mean +/- CI95."""
    a = artifact
    assert a.get("n_seeds", 1) >= 3
    assert len(a["per_seed"]) == a["n_seeds"]
    seeds = {r["seed"] for r in a["per_seed"]}
    assert len(seeds) == a["n_seeds"], "seeds must be distinct"
    assert len(a["reward_history_ci95"]) == a["n_iters"]
    for r in a["per_seed"]:
        assert len(r["reward_history"]) == a["n_iters"]


def test_reward_improves_by_margin(artifact):
    a = artifact
    init, final = a["initial_window_mean"], a["final_window_mean"]
    # The committed seed-mean moves ~-0.14 -> ~+0.07; require at least half
    # that gap so regenerated artifacts must clearly leave the random
    # plateau — and EVERY seed individually must improve.
    assert final > init + 0.1, (init, final)
    for per_seed_final in a["final_window_mean_per_seed"]:
        assert per_seed_final > init + 0.05, a["final_window_mean_per_seed"]


def test_trained_policy_evaluates_better(artifact):
    ev0, ev1 = artifact["eval_initial"], artifact["eval_final"]
    assert ev1["reward_mean"] > ev0["reward_mean"], (ev0, ev1)
    # The profile's claim is a large cut in the DISTANCE-NORMALIZED
    # collision rate (colliding agent-steps per 100 m driven; the AT25
    # debounced-event metric cannot fire under training-mode auto-reset)
    # — assert the claim, not mere parity. The best-reward checkpoint is
    # what gets evaluated (the reference's deployment protocol).
    c0 = ev0["collision_steps_per_100m"]
    c1 = ev1["collision_steps_per_100m"]
    assert c1 <= 0.7 * c0 + 1e-4, (c0, c1)
