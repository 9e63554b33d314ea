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

    from sigmarl_tpu.rl import MAPPOCAVs
    from sigmarl_tpu.rl.networks import tanh_normal_mode

    designs = {
        "M0_full": {},
        "M1_bird_view": {"is_ego_view": False},
        "M2_no_vertices": {"is_observe_vertices": False},
        "M3_no_distances_agents": {"is_observe_distance_to_agents": False},
        "M4_boundary_points": {"is_observe_distance_to_boundaries": False},
        "M5_no_center_line_distance": {"is_observe_distance_to_center_line": False},
    }
    n_iters, n_train_envs, epochs, mb = 15, 32, 10, 256
    if quick:
        n_sims, max_steps = 4, 48
        n_iters, n_train_envs, epochs, mb = 1, 8, 2, 64

    results = {}
    for scenario in scenarios:
        for name, kw in designs.items():
            # Train the variant (the reference evaluates per-design trained
            # models, `evaluation_itsc24.py:84-105`); training length is a
            # compute knob, the protocol is the point.
            p_train = Parameters(
                scenario_type=scenario, n_agents=4, num_vmas_envs=n_train_envs,
                dt=0.1, max_steps=32 if quick else 128, n_iters=n_iters,
                num_epochs=epochs, minibatch_size=mb,
                is_use_mtv_distance=False, is_obs_noise=False,
                where_to_save=out_dir + "/train/",
                model_name=f"{scenario}_{name}", **kw,
            )
            trainer = MAPPOCAVs(p_train)
            trainer.train()
            policy_net = trainer.policy_net
            params = trainer._final_state.policy_params

            p = Parameters(
                scenario_type=scenario, n_agents=4, num_vmas_envs=n_sims, dt=0.1,
                max_steps=max_steps, is_use_mtv_distance=False, is_obs_noise=False,
                is_testing_mode=True, **kw,
            )
            env = make_env(p)
            low, high = -env.action_limits, env.action_limits

            def policy_fn(obs, key, policy_net=policy_net, params=params,
                          low=low, high=high):
                loc, _ = policy_net.apply(params, obs)
                return tanh_normal_mode(loc, low, high)

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
    (reference `evaluation_ecc25.py`), with the per-run figure suite
    (trajectory footprints + h(t) + nominal-vs-filtered inputs)."""
    import jax

    from sigmarl_tpu.safety.cbf_demo import (
        CBFDemoConfig,
        fit_rl_nominal,
        plot_demo,
        run_demo,
    )
    from sigmarl_tpu.safety.sm_predictor import SafetyMarginEstimatorModule

    os.makedirs(out_dir, exist_ok=True)
    # The learned MTV safety-margin network for the "mtv" column (the
    # reference loads its released ECC25 checkpoint; trained here on exact
    # MTV data, `sm_predictor.generate_training_data`).
    sm_module = SafetyMarginEstimatorModule()
    sm_module.train(epochs=60, verbose=False)
    from sigmarl_tpu.safety.cbf_demo import animate_demo

    results = {}
    for scen in ("overtaking", "bypassing"):
        for sm in ("c2c", "mtv", "grid"):
            cfg = CBFDemoConfig(scenario=scen, sm_type=sm)
            t = run_demo(cfg, sm_module=sm_module)
            fig = plot_demo(
                t, cfg, os.path.join(out_dir, f"demo_{scen}_{sm}.png")
            )
            results[f"{scen}/{sm}"] = {
                "h_min": t["h_min"],
                "collided": t["collided"],
                "figure": fig,
            }
            if sm == "c2c":
                # One mp4 per scenario (the reference demo is an animation;
                # `cbf.py` FuncAnimation).
                results[f"{scen}/{sm}"]["animation"] = animate_demo(
                    t, cfg, os.path.join(out_dir, f"demo_{scen}_{sm}.mp4")
                )
    # RL-policy nominal controller (reference `cbf.py:445-520`): the same
    # pipeline with a PolicyNet nominal instead of the scripted controller.
    rl_params, bc_loss = fit_rl_nominal(
        CBFDemoConfig(nominal="rl"), jax.random.PRNGKey(0)
    )
    for scen in ("overtaking", "bypassing"):
        cfg = CBFDemoConfig(scenario=scen, sm_type="c2c", nominal="rl")
        t = run_demo(cfg, rl_policy_params=rl_params)
        fig = plot_demo(
            t, cfg, os.path.join(out_dir, f"demo_{scen}_c2c_rlnom.png")
        )
        results[f"{scen}/c2c/rl_nominal"] = {
            "h_min": t["h_min"],
            "collided": t["collided"],
            "figure": fig,
            "bc_fit_loss": bc_loss,
        }
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
                nom_controller_type="clf",
                # pd_topk_chunks (the default) prunes by geometric lower
                # bound and supersedes the index-windowed mode here — the
                # chunked branch takes precedence in _lane_terms anyway.
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


def robust_stats(vals: np.ndarray) -> Dict[str, float]:
    """Summary statistics over finite values (reference
    `evaluation_itsc26.py:317-341`)."""
    vals = np.asarray(vals, float)
    vals = vals[np.isfinite(vals)]
    if vals.size == 0:
        return {k: float("nan") for k in
                ("count", "mean", "std", "q10", "q50", "q90", "min", "max")}
    return {
        "count": float(vals.size),
        "mean": float(vals.mean()),
        "std": float(vals.std()),
        "q10": float(np.quantile(vals, 0.10)),
        "q50": float(np.quantile(vals, 0.50)),
        "q90": float(np.quantile(vals, 0.90)),
        "min": float(vals.min()),
        "max": float(vals.max()),
    }


def sobol_from_grid(z: np.ndarray) -> Dict[str, float]:
    """First-order/interaction/total Sobol indices of a metric over a 2-D
    parameter grid z[ta, tb], uniform over the finite cells (textbook
    variance decomposition; reference `evaluation_itsc26.py:344-412`)."""
    z = np.asarray(z, float)
    finite = np.isfinite(z)
    if not finite.any():
        return {k: float("nan") for k in ("V", "S_tb", "S_ta", "S_int", "T_tb", "T_ta")}
    V = float(np.var(z[finite]))
    if V <= 1e-12:
        return {"V": V, "S_tb": 0.0, "S_ta": 0.0, "S_int": 0.0,
                "T_tb": 0.0, "T_ta": 0.0}
    m_tb = np.nanmean(z, axis=0)
    m_ta = np.nanmean(z, axis=1)
    V_tb = float(np.var(m_tb[np.isfinite(m_tb)])) if np.isfinite(m_tb).any() else 0.0
    V_ta = float(np.var(m_ta[np.isfinite(m_ta)])) if np.isfinite(m_ta).any() else 0.0
    V_int = max(0.0, V - V_tb - V_ta)
    return {
        "V": V, "S_tb": V_tb / V, "S_ta": V_ta / V, "S_int": V_int / V,
        "T_tb": 1.0 - V_ta / V, "T_ta": 1.0 - V_tb / V,
    }


def itsc26_robustness(quick: bool = False, out_dir: str = "outputs/itsc26") -> Dict:
    """Threshold-sweep robustness report (reference
    `evaluation_itsc26.py:344-447` + the h_nom/threshold colormaps
    `:1185-1394`): the mean episode reward of short CBF-informed training
    runs over a 2-D (t_a = agent-proximity threshold, t_b = boundary-
    proximity threshold) grid, with Sobol sensitivity indices and robust
    statistics of the resulting metric surface."""
    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.rl import MAPPOCAVs

    ta_grid = [0.2, 0.3] if quick else [0.15, 0.225, 0.3, 0.375]
    tb_grid = [0.01, 0.02] if quick else [0.01, 0.02, 0.03, 0.04]
    n_iters = 1 if quick else 8

    z = np.full((len(ta_grid), len(tb_grid)), np.nan)
    for a, ta in enumerate(ta_grid):
        for b, tb in enumerate(tb_grid):
            p = Parameters(
                scenario_type="cpm_mixed", n_agents=4,
                num_vmas_envs=4 if quick else 32, dt=0.1,
                max_steps=16 if quick else 128, n_iters=n_iters,
                num_epochs=1 if quick else 10,
                minibatch_size=32 if quick else 256,
                is_use_mtv_distance=False, rew_method="cbf",
                is_using_cbf_training=True, is_solve_qp=False,
                threshold_near_other_agents_c2c_high=ta,
                threshold_near_boundary_high=tb,
                where_to_save=out_dir + "/robustness/",
                model_name=f"ta{ta}_tb{tb}",
                is_save_intermediate_model=False,
            )
            trainer = MAPPOCAVs(p)
            hist = []
            trainer.train(progress_callback=lambda i, m: hist.append(
                float(m["episode_reward_mean"])
            ))
            z[a, b] = hist[-1]

    report = {
        "ta_grid": ta_grid,
        "tb_grid": tb_grid,
        "episode_reward_grid": z.tolist(),
        "robust_stats": robust_stats(z),
        "sobol": sobol_from_grid(z),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "robustness_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def itsc26_footprints(quick: bool = False, out_dir: str = "outputs/itsc26") -> Dict:
    """Footprint rendering from a recorded rollout (reference
    `evaluation_itsc26_footprints.py`)."""
    import jax
    import jax.numpy as jnp

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.eval.rollout import rollout
    from sigmarl_tpu.render import render_footprints

    n_sims = 2
    max_steps = 24 if quick else 300
    p = Parameters(
        scenario_type="cpm_mixed", n_agents=4, num_vmas_envs=n_sims, dt=0.1,
        max_steps=max_steps + 1, is_use_mtv_distance=False, is_obs_noise=False,
        is_testing_mode=True,
    )
    env = make_env(p)

    def policy_fn(obs, key):
        return jnp.zeros((n_sims, 4, 2)).at[..., 0].set(0.5)

    record, _ = rollout(env, policy_fn, max_steps, jax.random.PRNGKey(0))
    os.makedirs(out_dir, exist_ok=True)
    out = render_footprints(
        p.scenario_type, record, os.path.join(out_dir, "footprints.png")
    )
    return {"figure": out}


EXPERIMENTS = {
    "itsc24": itsc24_observation_ablation,
    "icra25": icra25_priority_strategies,
    "ecc25": ecc25_cbf_grid,
    "lcss25": lcss25_ttcbf,
    "itsc25": itsc25_safety_filter,
    "itsc26": itsc26_reward_sweep,
    "itsc26_robustness": itsc26_robustness,
    "itsc26_footprints": itsc26_footprints,
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
