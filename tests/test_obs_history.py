"""Observation feature-history buffers (reference `n_stored_steps` /
`n_observed_steps` CircularBuffers, `observation_provider_rt.py:100-339`).

The reference allocates per-feature circular buffers but, as shipped, only
reads depth 1 (`get_latest()`, defaults n_observed_steps=1). Capability
parity here: histories are rolled arrays carried in the env state; the
observation concatenates the newest n_observed_steps feature blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.env import make_env


def _mk(n_obs_steps, n_stored, **kw):
    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=4, dt=0.1,
        max_steps=100, is_obs_noise=False, is_use_mtv_distance=False,
        n_observed_steps=n_obs_steps, n_stored_steps=n_stored, **kw,
    )
    return make_env(p)


def test_history_n1_matches_default():
    """n_stored_steps > 1 with n_observed_steps = 1 must not change the
    observation at all (depth-1 read of the history == current features)."""
    env0 = _mk(1, 1)
    env1 = _mk(1, 3)
    key = jax.random.PRNGKey(0)
    s0, o0 = jax.jit(env0.reset)(key)
    s1, o1 = jax.jit(env1.reset)(key)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    act = jnp.zeros((4, 4, 2)).at[..., 0].set(0.4)
    for i in range(3):
        s0, o0, *_ = jax.jit(env0.step)(s0, act, jax.random.PRNGKey(i))
        s1, o1, *_ = jax.jit(env1.step)(s1, act, jax.random.PRNGKey(i))
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


@pytest.mark.parametrize("n_obs", [1, 2])
def test_obs_dim_matrix(n_obs):
    env = _mk(n_obs, n_obs)
    core = env.cfg.obs_core_dim
    assert env.cfg.obs_dim == core * n_obs
    s, o = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert o.shape == (4, 4, env.cfg.obs_dim)


def test_history_semantics_n2():
    env = _mk(2, 2)
    core = env.cfg.obs_core_dim
    key = jax.random.PRNGKey(0)
    s, o = jax.jit(env.reset)(key)
    # Right after reset both observed steps are the current features.
    np.testing.assert_array_equal(
        np.asarray(o[..., :core]), np.asarray(o[..., core:])
    )
    act = jnp.zeros((4, 4, 2)).at[..., 0].set(0.4)
    step = jax.jit(env.step)
    prev_newest = np.asarray(o[..., :core])
    s, o1, rew, done, info = step(s, act, jax.random.PRNGKey(1))
    # The older block of the new obs is the previous step's newest block —
    # except for agents that were reset this step (history refilled).
    newest = np.asarray(o1[..., :core])
    older = np.asarray(o1[..., core:])
    same_as_prev = np.isclose(older, prev_newest).all(-1)
    same_as_new = np.isclose(older, newest).all(-1)
    assert (same_as_prev | same_as_new).all()
    assert not np.array_equal(newest, prev_newest)  # state actually moved


def test_history_refill_on_reset():
    """After a forced full reset (max_steps), history must not leak the
    pre-reset episode."""
    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=2, dt=0.1,
        max_steps=3, is_obs_noise=False, is_use_mtv_distance=False,
        n_observed_steps=2, n_stored_steps=2,
    )
    env = make_env(p)
    core = env.cfg.obs_core_dim
    s, o = jax.jit(env.reset)(jax.random.PRNGKey(0))
    act = jnp.zeros((2, 4, 2)).at[..., 0].set(0.4)
    step = jax.jit(env.step)
    hit = False
    for i in range(4):
        s, o, rew, done, info = step(s, act, jax.random.PRNGKey(i))
        if bool(np.asarray(done).all()):
            hit = True
            break
    assert hit
    np.testing.assert_array_equal(
        np.asarray(o[..., :core]), np.asarray(o[..., core:])
    )


def test_invalid_history_depth_rejected():
    """A direct EnvConfig construction with n_observed_steps >
    n_stored_steps must fail loudly — no construction path may fabricate
    history by duplicating current features (`EnvConfig.__post_init__`).
    `from_parameters` silently takes the max instead (also asserted)."""
    from sigmarl_tpu.env.structs import EnvConfig

    with pytest.raises(ValueError, match="n_observed_steps"):
        EnvConfig(
            scenario_type="cpm_mixed", n_agents=4, batch_dim=2, dt=0.1,
            max_steps=100, n_stored_steps=1, n_observed_steps=3,
        )
    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=2, dt=0.1,
        max_steps=100, n_stored_steps=1, n_observed_steps=3,
    )
    assert EnvConfig.from_parameters(p).n_stored_steps == 3


def test_debug_numerics_guard():
    """debug_numerics raises on injected NaN actions and is silent on a
    healthy step (reference asserts `road_traffic.py:1245-1246`)."""
    import pytest as _pytest

    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=2, dt=0.1,
        max_steps=50, is_obs_noise=False, is_use_mtv_distance=False,
        debug_numerics=True,
    )
    try:
        env = make_env(p)  # enables jax_debug_nans
        s, o = env.reset(jax.random.PRNGKey(0))
        act = jnp.zeros((2, 4, 2)).at[..., 0].set(0.4)
        s2, o2, rew, done, info = env.step(s, act, jax.random.PRNGKey(1))
        assert bool(jnp.isfinite(rew).all())
        with _pytest.raises(FloatingPointError):
            bad = act.at[0, 0, 0].set(jnp.nan)
            out = env.step(s, bad, jax.random.PRNGKey(1))
            jax.block_until_ready(out[2])
    finally:
        # jax_debug_nans is process-global; do not leak it into other tests.
        jax.config.update("jax_debug_nans", False)
