"""Paper-experiment drivers.

Thin runnable equivalents of the reference's per-paper evaluation scripts
(`evaluation_itsc24.py`, `evaluation_icra25.py`, `evaluation_ecc25.py`,
`evaluation_lcss25.py`, `evaluation_itsc25.py`, `evaluation_itsc26.py`):
each function configures the sweep the paper reports and funnels it through
the shared evaluation/rollout machinery. Run as
`python -m sigmarl_tpu.eval.papers <name> [--quick]`.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np


def itsc24_observation_ablation(
    scenarios: List[str] = ("cpm_mixed", "intersection_1"),
    n_sims: int = 32,
    max_steps: int = 1200,
    quick: bool = False,
    out_dir: str = "outputs/itsc24",
) -> Dict:
    """Observation-design ablation M0-M5 (reference `evaluation_itsc24.py`):
    train/evaluate with each observation-design switch disabled in turn."""
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.eval import metrics as M
    from sigmarl_tpu.eval.rollout import rollout
    from sigmarl_tpu.core.controllers import pure_pursuit_on_short_term
    import jax
    import jax.numpy as jnp

    designs = {
        "M0_full": {},
        "M1_bird_view": {"is_ego_view": False},
        "M2_no_vertices": {"is_observe_vertices": False},
        "M3_no_distances_agents": {"is_observe_distance_to_agents": False},
        "M4_boundary_points": {"is_observe_distance_to_boundaries": False},
        "M5_no_center_line_distance": {"is_observe_distance_to_center_line": False},
    }
    if quick:
        n_sims, max_steps = 4, 48

    results = {}
    for scenario in scenarios:
        for name, kw in designs.items():
            p = Parameters(
                scenario_type=scenario, n_agents=4, num_vmas_envs=n_sims, dt=0.1,
                max_steps=max_steps, is_use_mtv_distance=False, is_obs_noise=False,
                is_testing_mode=True, **kw,
            )
            env = make_env(p)

            def policy_fn(obs, key, env=env):
                # Scripted lane-following stand-in exercises the observation
                # design end-to-end; plug trained checkpoints via Evaluation
                # for the full paper protocol.
                return jnp.zeros((n_sims, 4, 2)).at[..., 0].set(0.5)

            record, timings = rollout(env, policy_fn, max_steps, jax.random.PRNGKey(0))
            res = M.basic_metrics(record)
            res["obs_dim"] = env.obs_dim
            results[f"{scenario}/{name}"] = res
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


def icra25_priority_strategies(quick: bool = False, out_dir: str = "outputs/icra25") -> Dict:
    """XP-MARL priority-strategy comparison (reference `evaluation_icra25.py`):
    random vs learned prioritization, short training runs."""
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.rl import MAPPOCAVs

    n_iters = 2 if quick else 50
    results = {}
    for method in ("random", "marl"):
        p = Parameters(
            scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=8 if quick else 32,
            dt=0.1, max_steps=32 if quick else 128, n_iters=n_iters,
            num_epochs=2 if quick else 30, minibatch_size=64 if quick else 512,
            is_use_mtv_distance=False, is_using_prioritized_marl=True,
            prioritization_method=method, where_to_save=out_dir + "/",
        )
        trainer = MAPPOCAVs(p)
        hist = []
        trainer.train(progress_callback=lambda i, m: hist.append(
            float(m["episode_reward_mean"])
        ))
        results[method] = {"episode_reward_history": hist}
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


def ecc25_cbf_grid(out_dir: str = "outputs/ecc25") -> Dict:
    """Scenario x safety-margin-type grid of the standalone 2-agent CBF demo
    (reference `evaluation_ecc25.py`)."""
    from sigmarl_tpu.safety.cbf_demo import CBFDemoConfig, run_demo

    results = {}
    for scen in ("overtaking", "bypassing"):
        for sm in ("c2c",):
            t = run_demo(CBFDemoConfig(scenario=scen, sm_type=sm))
            results[f"{scen}/{sm}"] = {
                "h_min": t["h_min"],
                "collided": t["collided"],
            }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


def lcss25_ttcbf(quick: bool = False, out_dir: str = "outputs/lcss25") -> Dict:
    """TTCBF vs HOCBF sweeps + heatmaps (reference `evaluation_lcss25.py` ->
    `hocbf_taylor.py`)."""
    from sigmarl_tpu.safety import hocbf_taylor as H

    n = 5 if quick else 15
    os.makedirs(out_dir, exist_ok=True)
    results = {}
    for deg in (1, 2):
        for appr in ("taylor", "hocbf"):
            cfg = H.HOCBFConfig(
                relative_degree=deg, approach=appr, num_steps=150 if quick else 400,
                lambda_1=0.5 if appr == "taylor" else 3.0, lambda_2=3.0,
            )
            res = H.run_experiment_multi_parameters(
                cfg,
                np.linspace(0.1, 1.0 if appr == "taylor" else 5.0, n),
                np.linspace(0.005, 0.05, n),
            )
            H.plot_heatmap(res, os.path.join(out_dir, f"heatmap_deg{deg}_{appr}.png"))
            results[f"deg{deg}/{appr}"] = {
                "collision_fraction": float(res["collided"].mean()),
            }
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


def itsc25_safety_filter(quick: bool = False, out_dir: str = "outputs/itsc25") -> Dict:
    """CBF-filter sweep over the number of approximating circles
    (reference `evaluation_itsc25.py:544-690`): collision counts,
    constraint-violation (infeasibility) rate, per-phase timing."""
    import jax
    import jax.numpy as jnp

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.eval import metrics as M
    from sigmarl_tpu.eval.rollout import rollout
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter

    n_sims = 4 if quick else 32
    max_steps = 32 if quick else 600
    circle_sweep = (1, 3) if quick else (1, 2, 3, 4, 5)

    results = {}
    for n_circles in circle_sweep:
        p = Parameters(
            scenario_type="cpm_mixed", n_agents=1, num_vmas_envs=n_sims, dt=0.1,
            max_steps=max_steps, is_use_mtv_distance=False, is_obs_noise=False,
            is_testing_mode=True, n_circles_approximate_vehicle=n_circles,
        )
        env = make_env(p)
        cbf = CBFSafetyFilter(
            CBFConfig(
                n_agents=1, n_circles=n_circles, dt=0.1,
                nom_controller_type="clf", use_windowed_pseudo_distance=True,
            ),
            env.cfg, env.tables,
        )

        def policy_fn(obs, key):
            return jnp.zeros((n_sims, 1, 2)).at[..., 0].set(0.6)

        record, timings = rollout(
            env, policy_fn, max_steps, jax.random.PRNGKey(0), cbf=cbf
        )
        res = M.basic_metrics(record)
        res.update({f"timing_{k}": round(v, 4) for k, v in timings.items()})
        results[f"n_circles={n_circles}"] = res
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


def itsc26_reward_sweep(quick: bool = False, out_dir: str = "outputs/itsc26") -> Dict:
    """CBF-informed reward sweeps (reference `evaluation_itsc26.py`):
    training curves across reward methods and h_nom values."""
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.rl import MAPPOCAVs

    n_iters = 1 if quick else 30
    results = {}
    sweeps = [("distance", None), ("cbf", 0.1), ("cbf", 0.2)] if not quick else [
        ("distance", None), ("cbf", 0.2)
    ]
    for method, h_nom in sweeps:
        p = Parameters(
            scenario_type="cpm_mixed", n_agents=4,
            num_vmas_envs=4 if quick else 32, dt=0.1,
            max_steps=16 if quick else 128, n_iters=n_iters,
            num_epochs=1 if quick else 30, minibatch_size=32 if quick else 512,
            is_use_mtv_distance=False, rew_method=method,
            is_using_cbf_training=method == "cbf", is_solve_qp=False,
            h_nom=h_nom or 0.2, where_to_save=out_dir + "/",
        )
        trainer = MAPPOCAVs(p)
        hist = []
        trainer.train(progress_callback=lambda i, m: hist.append(
            float(m["episode_reward_mean"])
        ))
        results[f"{method}_hnom{h_nom}"] = {"episode_reward_history": hist}
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


EXPERIMENTS = {
    "itsc24": itsc24_observation_ablation,
    "icra25": icra25_priority_strategies,
    "ecc25": ecc25_cbf_grid,
    "lcss25": lcss25_ttcbf,
    "itsc25": itsc25_safety_filter,
    "itsc26": itsc26_reward_sweep,
}


def main():
    ap = argparse.ArgumentParser(description="Run a paper experiment")
    ap.add_argument("name", choices=sorted(EXPERIMENTS))
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--device", default=None, choices=["tpu", "cpu"])
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    fn = EXPERIMENTS[args.name]
    import inspect

    kwargs = {}
    if "quick" in inspect.signature(fn).parameters:
        kwargs["quick"] = args.quick
    results = fn(**kwargs)
    print(json.dumps(results, indent=1, default=str))


if __name__ == "__main__":
    main()
