"""CBF safety-filter evaluation entry point.

Parity with reference `main_eval.py`: rollout with the CBF-QP controllers
(centralized / decentralized; RL or CLF nominal controller), saving a
trimmed rollout record, the per-phase computation-time JSON
(`computation_t_*.json`), and metrics incl. QP "infeasibility"
(constraint-penetration) rate.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="Evaluate the CBF-QP safety filter")
    ap.add_argument("--model_path", type=str, default=None,
                    help="trained model dir (omit for the CLF nominal controller)")
    ap.add_argument("--scenario_type", type=str, default="cpm_mixed")
    ap.add_argument("--n_agents", type=int, default=4)
    ap.add_argument("--num_envs", type=int, default=32)
    ap.add_argument("--max_steps", type=int, default=600)
    ap.add_argument("--n_circles", type=int, default=3)
    ap.add_argument("--nom_controller_type", choices=["rl", "clf"], default="clf")
    ap.add_argument("--is_grouping_agents", action="store_true")
    ap.add_argument("--max_group_size", type=int, default=2)
    ap.add_argument("--decentralized", action="store_true")
    ap.add_argument("--no_cbf", action="store_true", help="baseline without filter")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out_dir", type=str, default="outputs/eval_cbf")
    ap.add_argument("--save_video", action="store_true",
                    help="render an mp4 with CBF-vs-nominal action arrows")
    ap.add_argument("--device", type=str, default=None, choices=["tpu", "cpu"])
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.env import make_env
    from sigmarl_tpu.eval import metrics as M
    from sigmarl_tpu.eval.rollout import rollout
    from sigmarl_tpu.safety import CBFConfig, CBFSafetyFilter

    parameters = Parameters(
        scenario_type=args.scenario_type,
        n_agents=args.n_agents,
        num_vmas_envs=args.num_envs,
        max_steps=args.max_steps,
        dt=0.1,
        is_testing_mode=True,
        is_obs_noise=False,
        is_use_mtv_distance=False,
        n_circles_approximate_vehicle=args.n_circles,
        nom_controller_type=args.nom_controller_type,
        is_using_cbf_testing=not args.no_cbf,
        is_using_centralized_cbf=not args.decentralized,
    )
    env = make_env(parameters)

    cbf = None
    if not args.no_cbf:
        cbf = CBFSafetyFilter(
            CBFConfig(
                n_agents=args.n_agents,
                n_circles=args.n_circles,
                dt=parameters.dt,
                nom_controller_type=args.nom_controller_type,
                use_windowed_pseudo_distance=True,
            ),
            env.cfg,
            env.tables,
            decentralized=args.decentralized,
            max_group_size=args.max_group_size if args.is_grouping_agents else 0,
        )

    if args.model_path:
        from sigmarl_tpu.rl import checkpoint as ckpt
        from sigmarl_tpu.rl.networks import PolicyNet, tanh_normal_sample

        parameters.where_to_save = os.path.dirname(args.model_path.rstrip("/")) + "/"
        parameters.model_name = os.path.basename(args.model_path.rstrip("/"))
        params = ckpt.load_best(parameters)
        policy = PolicyNet(act_dim=2)
        low, high = -env.action_limits, env.action_limits

        def policy_fn(obs, key):
            loc, scale = policy.apply(params["policy"], obs)
            action, _ = tanh_normal_sample(key, loc, scale, low, high)
            return action

    else:
        # Pure-pursuit nominal actions; with nom_controller_type="clf" the
        # CBF layer replaces them with its own CLF nominal controller.
        def policy_fn(obs, key):
            return jnp.zeros((args.num_envs, args.n_agents, 2)).at[..., 0].set(0.5)

    record, timings = rollout(
        env, policy_fn, args.max_steps, jax.random.PRNGKey(args.seed), cbf=cbf
    )

    os.makedirs(args.out_dir, exist_ok=True)
    tag = (
        f"{args.scenario_type}_n{args.n_agents}_c{args.n_circles}_"
        f"{args.nom_controller_type}_{'nocbf' if args.no_cbf else 'cbf'}_s{args.seed}"
    )
    np.savez_compressed(os.path.join(args.out_dir, f"out_td_{tag}.npz"), **record)

    if args.save_video:
        from sigmarl_tpu.render import save_rollout_video

        # The record carries nominal + applied actions, so the frames show
        # the filter interventions as arrow pairs (reference
        # `road_traffic.py:2007-2226`).
        save_rollout_video(
            args.scenario_type, record,
            os.path.join(args.out_dir, f"video_{tag}.mp4"),
        )

    result = M.basic_metrics(record)
    result["collisions_per_100m"] = M.collisions_per_100m(record)
    result.update({f"timing_{k}": round(v, 4) for k, v in timings.items()})
    with open(os.path.join(args.out_dir, f"computation_t_{tag}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
