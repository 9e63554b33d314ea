"""Training entry point.

CLI parity with the reference `main_training.py`: seed, CBF-informed reward
options, reward method selection; loads `sigmarl_tpu/config.json` defaults,
writes an `info.txt` parameter dump next to the checkpoints, then runs
MAPPO training.
"""

from __future__ import annotations

import argparse
import os

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.rl import mappo_cavs

_HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_CONFIG = os.path.join(_HERE, "sigmarl_tpu", "config.json")


def parse_args():
    ap = argparse.ArgumentParser(description="Train MAPPO CAVs (TPU-native)")
    ap.add_argument("--config", type=str, default=DEFAULT_CONFIG)
    ap.add_argument("--random_seed", type=int, default=None)
    ap.add_argument("--scenario_type", type=str, default=None)
    ap.add_argument("--n_agents", type=int, default=None)
    ap.add_argument("--n_iters", type=int, default=None)
    ap.add_argument("--num_vmas_envs", type=int, default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--where_to_save", type=str, default=None)
    ap.add_argument(
        "--rew_method",
        type=str,
        default=None,
        choices=[
            "distance", "cbf", "ttc", "sparse",
            "distance_sparse", "cbf_sparse", "ttc_sparse",
        ],
    )
    ap.add_argument("--reward_progress", type=float, default=None)
    ap.add_argument("--h_nom", type=float, default=None)
    ap.add_argument("--device", type=str, default=None, choices=["tpu", "cpu"])
    return ap.parse_args()


def main():
    args = parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if os.path.exists(args.config):
        parameters = Parameters.from_json(args.config)
    else:
        parameters = Parameters()
    for name in [
        "random_seed", "scenario_type", "n_agents", "n_iters", "num_vmas_envs",
        "max_steps", "where_to_save", "rew_method", "reward_progress", "h_nom",
    ]:
        v = getattr(args, name)
        if v is not None:
            setattr(parameters, name, v)
    parameters.is_continue_train = True
    # Re-derive the model directory name from the final (overridden) values.
    from sigmarl_tpu.config import get_model_name

    parameters.model_name = get_model_name(parameters)

    out_dir = os.path.join(parameters.where_to_save, parameters.model_name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "info.txt"), "w") as f:
        for k, v in parameters.to_dict().items():
            f.write(f"{k}: {v}\n")

    def progress(i, m):
        import numpy as np

        rew = float(m["episode_reward_mean"])
        msg = (
            f"iter {i + 1}/{parameters.n_iters}: episode mean reward = {rew:.2f}"
            if np.isfinite(rew)
            else f"iter {i + 1}/{parameters.n_iters}: no episode finished"
        )
        print(msg, flush=True)

    from sigmarl_tpu.rl import MAPPOCAVs

    trainer = MAPPOCAVs(parameters)
    return trainer.train(progress_callback=progress)


if __name__ == "__main__":
    main()
