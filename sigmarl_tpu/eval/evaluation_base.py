"""Evaluation harness over trained model directories.

Parity with reference `sigmarl/evaluation_base.py` (`Evaluation:41`): for
each model directory, load the best checkpoint (reward-keyed), re-run (or
load cached) evaluation rollouts, compute the metric suite, and produce
violin/box summary plots. Caching uses .npz rollout records instead of
torch TensorDict files.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.env import make_env
from sigmarl_tpu.eval import metrics as M
from sigmarl_tpu.eval.rollout import rollout
from sigmarl_tpu.rl import checkpoint as ckpt
from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample


@dataclass
class Evaluation:
    """Evaluate a set of trained models (reference `Evaluation.run_evaluation`)."""

    model_paths: List[str]
    n_sims: int = 32  # parallel envs per model (reference: 32 sims)
    max_steps: int = 1200  # reference: 1200 steps per model
    render_titles: Optional[List[str]] = None
    where_to_save_eva_results: str = "outputs/eval"
    is_load_out_td: bool = True  # load cached rollout records when present
    results: Dict[str, Dict] = field(default_factory=dict)

    def _load_model(self, model_path: str):
        sidecars = [f for f in os.listdir(model_path) if f.endswith("_data.json")]
        if not sidecars:
            raise FileNotFoundError(f"no data sidecar in {model_path}")
        with open(os.path.join(model_path, sorted(sidecars)[-1])) as f:
            data = json.load(f)
        parameters = Parameters.from_dict(data["parameters"])
        parameters.where_to_save = os.path.dirname(model_path.rstrip("/")) + "/"
        parameters.model_name = os.path.basename(model_path.rstrip("/"))
        # Test-mode overrides (reference `_adjust_parameters:153-182`).
        parameters.is_testing_mode = True
        parameters.num_vmas_envs = self.n_sims
        parameters.max_steps = self.max_steps
        parameters.is_obs_noise = False
        params = ckpt.load_best(parameters)
        return parameters, params, data.get("episode_reward_mean_list", [])

    def evaluate_model(self, model_path: str, seed: int = 0) -> Dict:
        cache = os.path.join(
            self.where_to_save_eva_results,
            os.path.basename(model_path.rstrip("/")) + f"_seed{seed}.npz",
        )
        parameters, params, reward_hist = self._load_model(model_path)
        if self.is_load_out_td and os.path.exists(cache):
            record = dict(np.load(cache))
            timings = {}
        else:
            env = make_env(parameters)
            policy = PolicyNet(act_dim=2)
            low, high = -env.action_limits, env.action_limits

            def policy_fn(obs, key):
                loc, scale = policy.apply(params["policy"], obs)
                action, _ = tanh_normal_sample(key, loc, scale, low, high)
                return action

            record, timings = rollout(
                env, policy_fn, self.max_steps, jax.random.PRNGKey(seed)
            )
            os.makedirs(self.where_to_save_eva_results, exist_ok=True)
            np.savez_compressed(cache, **record)

        result = M.basic_metrics(record)
        result["collisions_per_100m"] = M.collisions_per_100m(record)
        result["episode_reward_final"] = (
            float(reward_hist[-1]) if reward_hist else float("nan")
        )
        result.update({f"timing_{k}": v for k, v in timings.items()})
        self.results[model_path] = result
        return result

    def run_evaluation(self, seeds: List[int] = (0,)) -> Dict[str, Dict]:
        """Evaluate all model dirs over the given seeds; aggregate with IQM
        and CI95 (reference `run_evaluation:634` + AT25 aggregation)."""
        for path in self.model_paths:
            per_seed = [self.evaluate_model(path, seed=s) for s in seeds]
            agg = {}
            for k in per_seed[0]:
                vals = np.asarray([r[k] for r in per_seed], np.float64)
                agg[k] = float(np.nanmean(vals))
                agg[k + "_iqm"] = M.iqm(vals)
                agg[k + "_ci95"] = M.ci95(vals)
            self.results[path] = agg
        return self.results

    def plot(self, save_path: Optional[str] = None):
        """Bar summary of the headline metrics per model."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = ["collision_rate_total", "center_line_deviation_mean", "average_speed"]
        fig, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3))
        names = [os.path.basename(p.rstrip("/")) for p in self.results]
        for ax, k in zip(axes, keys):
            vals = [self.results[p].get(k, np.nan) for p in self.results]
            ax.bar(range(len(names)), vals)
            ax.set_xticks(range(len(names)))
            ax.set_xticklabels(names, rotation=45, ha="right", fontsize=7)
            ax.set_title(k, fontsize=9)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path, dpi=150)
        return fig
