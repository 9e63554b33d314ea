"""Real MAPPO training run producing the committed learning-curve
artifact (VERDICT r3 item 5): episode reward improving and collision rate
falling from the initial (random) policy to the trained one.

Writes LEARNING_CURVE.json (+ .png) at the repo root;
tests/test_learning_curve.py asserts the artifact's claims. Run on the
TPU chip (minutes); pass --quick for a smoke run.

Reference contract: `mappo_cavs.py:468-515` (best-model tracking over an
improving reward curve)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def eval_policy(env, policy_net, params, key, steps=200):
    """Deterministic eval rollout: mean step reward + collision metrics.

    Collision comparison uses the DISTANCE-NORMALIZED event rate (the
    reference's AT25 lab metric, collisions/100 m): raw per-step collision
    rates reward standing still — the random initial policy barely moves,
    so it rarely reaches a boundary at all."""
    from sigmarl_tpu.eval import metrics as M
    from sigmarl_tpu.eval.rollout import rollout
    from sigmarl_tpu.rl.networks import tanh_normal_mode

    low, high = -env.action_limits, env.action_limits

    def policy_fn(obs, k):
        loc, _ = policy_net.apply(params, obs)
        return tanh_normal_mode(loc, low, high)

    record, _ = rollout(env, policy_fn, steps, key)
    pos = np.asarray(record["pos"])
    dist_m = float(np.linalg.norm(np.diff(pos, axis=0), axis=-1).sum())
    return {
        "reward_mean": float(np.mean(record["reward"])),
        "collision_rate_agents": float(np.mean(record["is_collision_with_agents"])),
        "collision_rate_lanelets": float(np.mean(record["is_collision_with_lanelets"])),
        "collisions_per_100m": M.collisions_per_100m(record),
        "meters_driven": round(dist_m, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n_iters", type=int, default=250)
    ap.add_argument("--num_envs", type=int, default=128)
    # The reference's torchrl default entropy_eps=1e-4 lets the policy's
    # scale collapse under the 30-epoch batch reuse (measured: entropy
    # +0.4 -> -11 with reward peaking at iter ~30 then decaying); 4e-3
    # holds entropy near -1 and the curve climbs monotonically through
    # 250 iterations. Exposed Parameters knob, not a trainer divergence.
    ap.add_argument("--entropy_eps", type=float, default=4e-3)
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "LEARNING_CURVE.json"))
    args = ap.parse_args()
    if args.quick:
        args.n_iters, args.num_envs = 3, 8

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.rl.mappo_cavs import MAPPOCAVs

    p = Parameters(
        scenario_type="cpm_mixed",
        n_agents=4,
        num_vmas_envs=args.num_envs,
        max_steps=128,
        n_iters=args.n_iters,
        dt=0.1,
        is_use_mtv_distance=False,
        is_obs_noise=True,
        is_save_intermediate_model=False,
        where_to_save="outputs/learning_curve/",
        random_seed=0,
        entropy_eps=args.entropy_eps,
    )
    trainer = MAPPOCAVs(p)
    env = trainer.env
    policy_net = trainer.policy_net
    init_params = jax.tree.map(lambda x: x.copy(), trainer.policy_params)

    t0 = time.time()
    history = []

    def cb(i, metrics):
        rew = float(metrics["episode_reward_mean"])
        history.append(rew)
        if i % 5 == 0:
            print(f"iter {i:3d} episode_reward_mean {rew:8.3f}", flush=True)

    trainer.train(progress_callback=cb)
    train_s = time.time() - t0
    final_params = trainer._final_state.policy_params

    ev_init = eval_policy(env, policy_net, init_params, jax.random.PRNGKey(100))
    ev_final = eval_policy(env, policy_net, final_params, jax.random.PRNGKey(100))
    print("initial policy:", ev_init)
    print("trained policy:", ev_final)

    w = max(1, min(5, len(history) // 4))
    art = {
        "scenario": p.scenario_type,
        "n_agents": p.n_agents,
        "num_envs": p.num_vmas_envs,
        "n_iters": p.n_iters,
        "entropy_eps": p.entropy_eps,
        "frames_per_batch": p.frames_per_batch,
        "total_env_steps": p.frames_per_batch * p.n_iters,
        "train_wall_s": round(train_s, 1),
        "backend": jax.default_backend(),
        "reward_history": [round(r, 3) for r in history],
        "initial_window_mean": round(float(np.mean(history[:w])), 3),
        "final_window_mean": round(float(np.mean(history[-w:])), 3),
        "eval_initial": ev_init,
        "eval_final": ev_final,
    }
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {args.out} ({train_s:.0f}s)")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 3.2), dpi=120)
        ax.plot(history, lw=1.2)
        ax.set_xlabel("training iteration")
        ax.set_ylabel("episode reward (mean)")
        ax.set_title(
            f"MAPPO {p.scenario_type} N={p.n_agents} B={p.num_vmas_envs} "
            f"({art['total_env_steps']:,} env steps)"
        )
        fig.tight_layout()
        fig.savefig(os.path.splitext(args.out)[0] + ".png")
    except Exception as e:  # pragma: no cover
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
