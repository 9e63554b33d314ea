"""Evaluation pipeline tests: recorded rollouts, metrics, model evaluation."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.env import make_env
from sigmarl_tpu.eval import metrics as M
from sigmarl_tpu.eval.rollout import rollout


def test_rollout_records_and_metrics():
    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=4, dt=0.1,
        is_use_mtv_distance=False, is_obs_noise=False, is_testing_mode=True,
    )
    env = make_env(p)

    def policy_fn(obs, key):
        return jnp.zeros((4, 4, 2)).at[..., 0].set(0.4)

    record, timings = rollout(env, policy_fn, 40, jax.random.PRNGKey(0), chunk=16)
    assert record["pos"].shape == (40, 4, 4, 2)
    assert timings["steps_per_s"] > 0

    res = M.basic_metrics(record)
    for k in ("collision_rate_total", "center_line_deviation_mean", "average_speed"):
        assert np.isfinite(res[k]), k
    assert res["average_speed"] > 0.05  # agents actually move
    assert np.isfinite(M.collisions_per_100m(record))


def test_debounce_counts_events():
    # Two separated bursts with a short glitch between them -> 2 events.
    coll = np.zeros((40, 1), bool)
    coll[5:12] = True
    coll[13] = True  # glitch inside off-window: same event
    coll[30:36] = True
    events = M.debounced_collision_events(coll, n_on=3, n_off=10)
    assert events[0] == 2, events
    # A 2-step blip never turns into an event.
    blip = np.zeros((20, 1), bool)
    blip[4:6] = True
    assert M.debounced_collision_events(blip, n_on=3, n_off=10)[0] == 0


def test_iqm_and_ci():
    x = np.array([1.0, 2.0, 3.0, 100.0])
    assert M.iqm(x) == 2.5  # robust to the outlier
    assert M.ci95(x) > 0


def test_evaluation_harness(tmp_path):
    """Train a tiny model, then evaluate it through the Evaluation harness."""
    from sigmarl_tpu.eval import Evaluation
    from sigmarl_tpu.rl import MAPPOCAVs

    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=4, dt=0.1,
        max_steps=16, n_iters=1, num_epochs=1, minibatch_size=32,
        is_use_mtv_distance=False, where_to_save=str(tmp_path) + "/",
    )
    MAPPOCAVs(p).train()
    model_dir = os.path.join(str(tmp_path), p.model_name)

    ev = Evaluation(
        model_paths=[model_dir], n_sims=4, max_steps=24,
        where_to_save_eva_results=str(tmp_path) + "/eval",
    )
    results = ev.run_evaluation(seeds=[0])
    res = results[model_dir]
    assert np.isfinite(res["collision_rate_total"])
    assert np.isfinite(res["average_speed"])
    # Cached record reused on second run.
    ev2 = Evaluation(
        model_paths=[model_dir], n_sims=4, max_steps=24,
        where_to_save_eva_results=str(tmp_path) + "/eval",
    )
    res2 = ev2.evaluate_model(model_dir, seed=0)
    assert np.isfinite(res2["collision_rate_total"])


def test_render_frame(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sigmarl_tpu.render import render_frame

    fig, ax = plt.subplots()
    pos = np.array([[2.0, 2.0], [2.5, 2.2]])
    rot = np.array([0.0, 1.0])
    render_frame(ax, "cpm_mixed", pos, rot)
    fig.savefig(tmp_path / "frame.png")
    assert (tmp_path / "frame.png").exists()
    plt.close(fig)
