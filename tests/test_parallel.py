"""Multi-device (virtual 8-CPU mesh) sharded-training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigmarl_tpu.config import Parameters


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_training_step_matches_semantics():
    """One full MAPPO training iteration with the env batch sharded across 8
    devices: compiles, runs, produces finite losses, and the trained params
    stay replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sigmarl_tpu.parallel.mesh import ENV_AXIS, make_mesh, shard_world_state
    from sigmarl_tpu.rl.mappo_cavs import MAPPOCAVs, TrainState

    mesh = make_mesh(jax.devices()[:8])
    B = 16
    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=B, dt=0.1,
        max_steps=8, n_iters=1, num_epochs=1, minibatch_size=32,
        is_use_mtv_distance=False, is_save_intermediate_model=False,
        where_to_save="/tmp/shard_test/",
    )
    trainer = MAPPOCAVs(p)
    env_state, obs = jax.jit(trainer.env.reset)(jax.random.PRNGKey(0))

    env_sharding = NamedSharding(mesh, P(ENV_AXIS))
    rep = NamedSharding(mesh, P())
    state = TrainState(
        policy_params=jax.device_put(trainer.policy_params, rep),
        critic_params=jax.device_put(trainer.critic_params, rep),
        opt_state=jax.device_put(trainer.opt_state, rep),
        env_state=shard_world_state(env_state, mesh),
        obs=jax.device_put(obs, env_sharding),
        ep_reward_accum=jax.device_put(jnp.zeros((B, 4)), env_sharding),
        key=jax.device_put(jax.random.PRNGKey(1), rep),
        iteration=jax.device_put(jnp.zeros((), jnp.int32), rep),
    )

    with mesh:
        new_state, metrics = trainer._train_iteration(state)
        jax.block_until_ready(metrics["loss_objective"])

    assert np.isfinite(float(metrics["loss_objective"]))
    assert np.isfinite(float(metrics["loss_critic"]))
    # Policy params must be identical across devices (replicated after psum'd
    # gradient updates).
    leaf = jax.tree.leaves(new_state.policy_params)[0]
    gathered = np.asarray(leaf)
    assert np.isfinite(gathered).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_cbf_filtered_step_matches_unsharded():
    """The FLAGSHIP hot path — `cbf_filtered_step` (policy-nominal action ->
    batched centralized CBF-QP -> env step) — runs with the env batch
    sharded over the 8-device mesh and produces the same results as
    unsharded execution. The QP solver goes through the
    `lax.platform_dependent` Pallas/XLA branch (the XLA fallback on this
    CPU mesh), so the exact deployment program shape (SURVEY §7 stage 6)
    compiles and executes under the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.parallel.mesh import ENV_AXIS, make_mesh, shard_world_state
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
    from sigmarl_tpu.safety.wrappers import cbf_filtered_step

    mesh = make_mesh(jax.devices()[:8])
    B, N = 16, 4
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        is_use_mtv_distance=False, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=N, n_circles=3, dt=0.1, newton_iters=6),
        env.cfg, env.tables,
    )
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    acts = jnp.zeros((B, N, 2)).at[..., 0].set(0.4)
    key = jax.random.PRNGKey(1)

    def step(s, a, k):
        s2, o, r, d, info = cbf_filtered_step(env, cbf, s, a, k)
        return o, r, d, info["cbf_solved"], info["cbf_action_deviation"]

    ref_out = jax.jit(step)(state, acts, key)

    state_sh = shard_world_state(state, mesh)
    acts_sh = jax.device_put(acts, NamedSharding(mesh, P(ENV_AXIS)))
    with mesh:
        sh_out = jax.jit(step)(state_sh, acts_sh, key)
        jax.block_until_ready(sh_out[1])

    # obs / reward / done identical; QP outputs equal up to solver-level
    # float reassociation across sharded reductions.
    np.testing.assert_allclose(np.asarray(ref_out[0]), np.asarray(sh_out[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_out[1]), np.asarray(sh_out[1]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref_out[2]), np.asarray(sh_out[2]))
    np.testing.assert_array_equal(np.asarray(ref_out[3]), np.asarray(sh_out[3]))
    np.testing.assert_allclose(np.asarray(ref_out[4]), np.asarray(sh_out[4]), atol=5e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_cbf_training_iteration():
    """A full MAPPO training iteration with the in-graph CBF-QP filter in
    the rollout (is_using_cbf_training + is_apply_cbf_action), env batch
    sharded over the 8-device mesh: compiles, runs, finite losses."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sigmarl_tpu.parallel.mesh import ENV_AXIS, make_mesh, shard_world_state
    from sigmarl_tpu.rl.mappo_cavs import MAPPOCAVs, TrainState

    mesh = make_mesh(jax.devices()[:8])
    B = 16
    p = Parameters(
        scenario_type="cpm_entire", n_agents=4, num_vmas_envs=B, dt=0.1,
        max_steps=4, n_iters=1, num_epochs=1, minibatch_size=16,
        is_use_mtv_distance=False, is_save_intermediate_model=False,
        where_to_save="/tmp/shard_cbf_test/",
        is_using_cbf_training=True, is_using_centralized_cbf=True,
        is_apply_cbf_action=True,
    )
    trainer = MAPPOCAVs(p)
    env_state, obs = jax.jit(trainer.env.reset)(jax.random.PRNGKey(0))

    env_sharding = NamedSharding(mesh, P(ENV_AXIS))
    rep = NamedSharding(mesh, P())
    state = TrainState(
        policy_params=jax.device_put(trainer.policy_params, rep),
        critic_params=jax.device_put(trainer.critic_params, rep),
        opt_state=jax.device_put(trainer.opt_state, rep),
        env_state=shard_world_state(env_state, mesh),
        obs=jax.device_put(obs, env_sharding),
        ep_reward_accum=jax.device_put(jnp.zeros((B, 4)), env_sharding),
        key=jax.device_put(jax.random.PRNGKey(1), rep),
        iteration=jax.device_put(jnp.zeros((), jnp.int32), rep),
    )

    with mesh:
        new_state, metrics = trainer._train_iteration(state)
        jax.block_until_ready(metrics["loss_objective"])

    assert np.isfinite(float(metrics["loss_objective"]))
    assert np.isfinite(float(metrics["loss_critic"]))
    leaf = jax.tree.leaves(new_state.policy_params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_env_step():
    """The pure env step runs with the batch axis sharded over the mesh and
    produces the same results as unsharded execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.parallel.mesh import ENV_AXIS, make_mesh, shard_world_state

    mesh = make_mesh(jax.devices()[:8])
    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=16, dt=0.1,
        is_use_mtv_distance=False, is_obs_noise=False,
    )
    env = make_env(p)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    acts = jnp.zeros((16, 4, 2)).at[..., 0].set(0.4)
    key = jax.random.PRNGKey(1)

    ref_out = jax.jit(env.step)(state, acts, key)

    state_sh = shard_world_state(state, mesh)
    acts_sh = jax.device_put(acts, NamedSharding(mesh, P(ENV_AXIS)))
    with mesh:
        sh_out = jax.jit(env.step)(state_sh, acts_sh, key)
        jax.block_until_ready(sh_out[1])

    np.testing.assert_allclose(
        np.asarray(ref_out[1]), np.asarray(sh_out[1]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_out[2]), np.asarray(sh_out[2]), atol=1e-5
    )
