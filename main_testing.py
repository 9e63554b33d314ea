"""Testing entry point.

Parity with reference `main_testing.py`: load a trained model directory
(its JSON sidecar restores the full training config), switch to testing
mode, run a recorded rollout, save the record (.npz, the out_td
equivalent) and a summary of metrics; optionally render a video.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="Test a trained MAPPO model")
    ap.add_argument("path", type=str, help="model directory (with reward*.pkl)")
    ap.add_argument("--max_steps", type=int, default=1200)
    ap.add_argument("--num_envs", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--deterministic", action="store_true")
    ap.add_argument("--save_video", action="store_true")
    ap.add_argument("--device", type=str, default=None, choices=["tpu", "cpu"])
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.eval import metrics as M
    from sigmarl_tpu.eval.rollout import rollout
    from sigmarl_tpu.rl import checkpoint as ckpt
    from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_mode, tanh_normal_sample

    sidecars = sorted(f for f in os.listdir(args.path) if f.endswith("_data.json"))
    with open(os.path.join(args.path, sidecars[-1])) as f:
        data = json.load(f)
    parameters = Parameters.from_dict(data["parameters"])
    parameters.where_to_save = os.path.dirname(args.path.rstrip("/")) + "/"
    parameters.model_name = os.path.basename(args.path.rstrip("/"))
    parameters.is_testing_mode = True
    parameters.num_vmas_envs = args.num_envs
    parameters.max_steps = args.max_steps
    parameters.is_obs_noise = False

    params = ckpt.load_best(parameters)
    env = make_env(parameters)
    policy = PolicyNet(act_dim=2)
    low, high = -env.action_limits, env.action_limits

    def policy_fn(obs, key):
        loc, scale = policy.apply(params["policy"], obs)
        if args.deterministic:
            return tanh_normal_mode(loc, low, high)
        action, _ = tanh_normal_sample(key, loc, scale, low, high)
        return action

    record, timings = rollout(env, policy_fn, args.max_steps, jax.random.PRNGKey(args.seed))

    out_file = os.path.join(args.path, f"out_td_seed{args.seed}.npz")
    np.savez_compressed(out_file, **record)
    result = M.basic_metrics(record)
    result["collisions_per_100m"] = M.collisions_per_100m(record)
    result.update({f"timing_{k}": round(v, 3) for k, v in timings.items()})
    print(json.dumps(result, indent=1))
    print(f"rollout record saved to {out_file}")

    if args.save_video:
        from sigmarl_tpu.render import save_rollout_video

        video_file = os.path.join(args.path, f"video_seed{args.seed}.mp4")
        save_rollout_video(parameters.scenario_type, record, video_file)
        print(f"video saved to {video_file}")


if __name__ == "__main__":
    main()
