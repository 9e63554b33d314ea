"""End-to-end training smoke test.

Mirrors the reference's single integration test
(`sigmarl/tests/test_training.py:19-48`) — run the full MAPPO pipeline for a
few iterations on two scenarios and assert checkpoints were written — at a
reduced size for CI speed, plus learning-signal sanity checks the reference
lacks.
"""

import os

import numpy as np
import pytest

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.rl import MAPPOCAVs


@pytest.mark.parametrize("scenario", ["cpm_mixed", "intersection_1"])
def test_training_pipeline(tmp_path, scenario):
    p = Parameters(
        scenario_type=scenario,
        n_agents=4,
        num_vmas_envs=8,
        dt=0.1,
        max_steps=32,
        n_iters=2,
        num_epochs=2,
        minibatch_size=64,
        is_use_mtv_distance=False,
        where_to_save=str(tmp_path) + "/",
        random_seed=0,
    )
    trainer = MAPPOCAVs(p)
    metrics_log = []
    env, decision, optim, priority, cbf, params = trainer.train(
        progress_callback=lambda i, m: metrics_log.append(m)
    )

    out_dir = os.path.join(str(tmp_path), p.model_name)
    files = os.listdir(out_dir)
    assert len(files) > 1, files
    assert any(f.startswith("final_policy") for f in files)
    assert any(f.startswith("reward") for f in files)

    for m in metrics_log:
        assert np.isfinite(float(m["loss_objective"]))
        assert np.isfinite(float(m["loss_critic"]))

    # The returned policy must act within bounds.
    import jax
    import jax.numpy as jnp

    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    action, logp = decision.act(obs, jax.random.PRNGKey(1))
    assert action.shape == (8, 4, 2)
    assert bool((jnp.abs(action[..., 0]) <= env.cfg.max_speed + 1e-5).all())
    assert bool((jnp.abs(action[..., 1]) <= env.cfg.max_steering + 1e-5).all())
    assert bool(jnp.isfinite(logp).all())


def test_cbf_informed_training(tmp_path):
    """CBF-informed MARL (reward-from-margins, no QP solve) end to end."""
    p = Parameters(
        scenario_type="cpm_mixed",
        n_agents=4,
        num_vmas_envs=4,
        dt=0.1,
        max_steps=16,
        n_iters=1,
        num_epochs=1,
        minibatch_size=32,
        is_use_mtv_distance=False,
        rew_method="cbf",
        is_using_cbf_training=True,
        is_solve_qp=False,
        where_to_save=str(tmp_path) + "/",
    )
    trainer = MAPPOCAVs(p)
    metrics = []
    trainer.train(progress_callback=lambda i, m: metrics.append(m))
    assert np.isfinite(float(metrics[0]["loss_objective"]))


def test_cbf_filtered_training(tmp_path):
    """Training with the in-graph CBF-QP filter applied to actions."""
    p = Parameters(
        scenario_type="cpm_mixed",
        n_agents=4,
        num_vmas_envs=4,
        dt=0.1,
        max_steps=16,
        n_iters=1,
        num_epochs=1,
        minibatch_size=32,
        is_use_mtv_distance=False,
        rew_method="cbf",
        is_using_cbf_training=True,
        is_using_centralized_cbf=True,
        is_solve_qp=True,
        is_apply_cbf_action=True,
        where_to_save=str(tmp_path) + "/",
    )
    trainer = MAPPOCAVs(p)
    metrics = []
    trainer.train(progress_callback=lambda i, m: metrics.append(m))
    assert np.isfinite(float(metrics[0]["loss_objective"]))


@pytest.mark.parametrize(
    "kw",
    [
        dict(is_using_prioritized_marl=True, prioritization_method="marl"),
        dict(is_using_prioritized_marl=True, prioritization_method="random"),
        dict(is_using_opponent_modeling=True),
    ],
    ids=["xp-marl", "random-priority", "opponent-modeling"],
)
def test_extension_training_modes(tmp_path, kw):
    """XP-MARL prioritized action propagation and opponent modeling."""
    p = Parameters(
        scenario_type="cpm_mixed",
        n_agents=4,
        num_vmas_envs=4,
        dt=0.1,
        max_steps=16,
        n_iters=1,
        num_epochs=1,
        minibatch_size=32,
        is_use_mtv_distance=False,
        where_to_save=str(tmp_path) + "/",
        **kw,
    )
    trainer = MAPPOCAVs(p)
    metrics = []
    trainer.train(progress_callback=lambda i, m: metrics.append(m))
    assert np.isfinite(float(metrics[0]["loss_objective"]))
    if kw.get("prioritization_method") == "marl":
        assert np.isfinite(float(metrics[0]["loss_priority"]))


def test_cbf_module_learns_scores():
    """The learned-CBF actor-critic (reference `modules/cbf_module.py`)
    samples bounded scores and completes a finite PPO update."""
    import jax
    import jax.numpy as jnp

    from sigmarl_tpu.rl.cbf_module import CBFModule, make_cbf_observation

    T, B, N, D, k = 4, 3, 4, 10, 2
    mod = CBFModule(obs_dim=D + k * 2, n_agents=N)
    state = mod.init(jax.random.PRNGKey(0))

    base = jax.random.normal(jax.random.PRNGKey(1), (T + 1, B, N, D))
    obs = make_cbf_observation(base, k)
    assert obs.shape[-1] == D + k * 2
    assert np.allclose(np.asarray(obs[..., D:]), 0.0)

    scores, logp = mod.sample_scores(state, obs[:T], jax.random.PRNGKey(2))
    assert scores.shape == (T, B, N)
    assert np.all(np.abs(np.asarray(scores)) <= 1.0)

    rewards = jax.random.normal(jax.random.PRNGKey(3), (T, B, N))
    dones = jnp.zeros((T, B), bool)
    new_state, stats = mod.train_step(
        state, obs[:T], obs[1:], scores, logp, rewards, dones, jax.random.PRNGKey(4)
    )
    assert np.isfinite(float(stats["loss_objective"]))
    assert np.isfinite(float(stats["loss_critic"]))
    leaf0 = jax.tree.leaves(state.policy_params)[0]
    leaf1 = jax.tree.leaves(new_state.policy_params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_continue_train(tmp_path):
    """is_continue_train restores policy/critic (+ best-reward bookkeeping)
    and resumes optimization (reference `mappo_cavs.py:219-307`)."""
    import jax

    common = dict(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=8, dt=0.1,
        max_steps=32, num_epochs=2, minibatch_size=64,
        is_use_mtv_distance=False, where_to_save=str(tmp_path) + "/",
        random_seed=0,
    )
    p1 = Parameters(n_iters=2, **common)
    t1 = MAPPOCAVs(p1)
    t1.train()
    final1 = jax.tree.leaves(t1._final_state.policy_params)
    hist1 = list(t1._reward_history)

    from sigmarl_tpu.rl import checkpoint as ckpt

    p2 = Parameters(
        n_iters=1, is_continue_train=True, is_load_model=True,
        is_load_final_model=True, model_name=p1.model_name, **common,
    )
    t2 = MAPPOCAVs(p2)
    # Restored start params equal run 1's final checkpoint, not a fresh init.
    loaded = ckpt.load_best(p2)
    for a, b in zip(jax.tree.leaves(t2.policy_params), jax.tree.leaves(loaded["policy"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Reward history resumes from the saved sidecar.
    assert t2._restored_history == hist1

    t2.train()
    assert len(t2._reward_history) == len(hist1) + 1
    # Training actually moved the parameters (optimization continued).
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(t2._final_state.policy_params), final1
        )
    )
    assert moved
