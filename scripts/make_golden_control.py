"""Generate the control-sequence parity fixtures (BASELINE: control
deviation <= 1e-3 vs the reference's filtered control sequences).

For BASELINE configs #2-#4 (single-agent boundary/TTCBF filter; 4-agent
pairwise + pseudo-distance), roll the TPU environment closed-loop with the
production CBF filter, record the visited states and nominal actions, and
at every recorded state compute the REFERENCE's filtered control by
driving the reference's own torch/numpy assembly code
(`scripts/ref_cbf_driver.py`) and solving the assembled QP in float64 with
the first-party C++ ADMM oracle.

Output: tests/golden/control_parity_{n1,n4}.npz with per-step states and
the reference filtered control sequence. `tests/test_control_deviation.py`
replays our filter against these. Run once; fixtures are committed.
"""

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)
sys.path.insert(0, _HERE)

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from sigmarl_tpu.config import Parameters  # noqa: E402
from sigmarl_tpu.env import make_env  # noqa: E402
from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter  # noqa: E402
from sigmarl_tpu.safety.wrappers import cbf_filtered_step  # noqa: E402

import ref_cbf_driver as rd  # noqa: E402

OUT = os.path.join(_ROOT, "tests", "golden")
os.makedirs(OUT, exist_ok=True)

T = 25  # horizon (steps)
B = 2  # envs recorded


def scripted_actions(t: int, n_agents: int) -> np.ndarray:
    """Deterministic pseudo-policy exercising speed and steering targets."""
    i = np.arange(n_agents)
    speed = 0.5 + 0.3 * np.sin(0.2 * t + 0.9 * i)
    steer = 0.25 * np.sin(0.13 * t + 1.7 * i)
    return np.stack([speed, steer], axis=-1).astype(np.float32)


def run_config(name: str, n_agents: int, scenario: str = "cpm_entire"):
    p = Parameters(
        scenario_type=scenario, n_agents=n_agents, num_vmas_envs=B, dt=0.1,
        max_steps=10_000, is_obs_noise=False,
        is_using_cbf_testing=True, is_using_centralized_cbf=True,
    )
    env = make_env(p)
    cbf = CBFSafetyFilter(
        CBFConfig(n_agents=n_agents, dt=0.1, newton_iters=8,
                  adaptive_lambda_cost=True),
        env.cfg, env.tables,
    )
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(42))

    qp_ref = rd.make_reference_filter(n_agents, 3, scenario)

    rec = dict(pos=[], rot=[], speed=[], steering=[], path_id=[], act=[],
               u_ref=[], u_nom_ref=[])
    step = jax.jit(lambda s, a, k: cbf_filtered_step(env, cbf, s, a, k))
    for t in range(T):
        act = jnp.asarray(np.tile(scripted_actions(t, n_agents), (B, 1, 1)))
        rec["pos"].append(np.asarray(state.pos))
        rec["rot"].append(np.asarray(state.rot))
        rec["speed"].append(np.asarray(state.speed))
        rec["steering"].append(np.asarray(state.steering))
        rec["path_id"].append(np.asarray(state.path_id))
        rec["act"].append(np.asarray(act))

        u_ref_t = np.zeros((B, n_agents, 2))
        u_nom_t = np.zeros((B, n_agents, 2))
        for b in range(B):
            states_np = np.stack(
                [rec["pos"][-1][b, :, 0], rec["pos"][-1][b, :, 1],
                 rec["rot"][-1][b], rec["speed"][-1][b],
                 rec["steering"][-1][b]], axis=1,
            ).astype(np.float64)
            u, u_nom = rd.reference_filtered_controls(
                qp_ref, states_np, rec["path_id"][-1][b], np.asarray(act[b])
            )
            u_ref_t[b] = u
            u_nom_t[b] = u_nom
        rec["u_ref"].append(u_ref_t)
        rec["u_nom_ref"].append(u_nom_t)

        state, obs, rew, done, info = step(state, act, jax.random.PRNGKey(t))
        print(f"{name} step {t}: ref solved, |u_ref|max="
              f"{np.abs(u_ref_t).max():.3f}")

    np.savez_compressed(
        os.path.join(OUT, f"control_parity_{name}.npz"),
        **{k: np.stack(v) for k, v in rec.items()},
        n_agents=n_agents, scenario=scenario, dt=0.1,
    )
    print(f"control_parity_{name}.npz written ({T} steps x {B} envs)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["n1", "n4"]
    if "n1" in which:
        run_config("n1", 1)
    if "n4" in which:
        run_config("n4", 4)
