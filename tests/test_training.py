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
