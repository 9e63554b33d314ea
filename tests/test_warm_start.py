"""Cross-step QP warm starting: same minimizer, fewer Newton iterations.

The production configuration (warm start from the previous step's solution,
5 iterations, short backtracking ladder) must track the fully converged
cold solve (30 iterations, full ladder) along a rollout — this pins the
bench configuration's correctness (VERDICT round-1 item 1c).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.env import make_env
from sigmarl_tpu.env.structs import replace_state
from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter
from sigmarl_tpu.safety.wrappers import cbf_filtered_step


def test_warm_start_matches_cold_converged():
    B, N = 4, 4
    p = Parameters(
        scenario_type="cpm_entire", n_agents=N, num_vmas_envs=B, dt=0.1,
        max_steps=1000, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    warm = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=5, ls_alphas=(1.0, 0.25)),
        env.cfg, env.tables,
    )
    cold = CBFSafetyFilter(
        CBFConfig(n_agents=N, dt=0.1, newton_iters=30),
        env.cfg, env.tables,
    )

    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    act = jnp.zeros((B, N, 2)).at[..., 0].set(0.5)
    step = jax.jit(
        lambda s, k: cbf_filtered_step(env, warm, s, act, k)
    )
    filt_cold = jax.jit(lambda s: cold.filter_actions(state, act).u_star)

    max_err = 0.0
    for i in range(10):
        info_cold = cold.filter_actions(state, act)
        info_warm = warm.filter_actions(state, act, u_init=state.cbf_u_prev)
        err = float(jnp.abs(info_warm.u_star - info_cold.u_star).max())
        max_err = max(max_err, err)
        state, obs, rew, done, info = step(state, jax.random.PRNGKey(i))
    # Units: accel in [-5, 5] m/s^2, steering rate in [-pi/2, pi/2] rad/s.
    assert max_err < 5e-3, max_err
    assert bool(jnp.isfinite(state.cbf_u_prev).all())
    # The warm-start field actually carries the previous solution.
    assert float(jnp.abs(state.cbf_u_prev).max()) > 0.0
