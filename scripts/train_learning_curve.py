"""Real MAPPO training runs producing the committed learning-curve
artifact: episode reward improving and the distance-normalized collision
rate falling from the initial (random) policy to the trained one,
aggregated over seeds (mean +/- CI95 — the reference's aggregation
protocol, `eva_at25/marl_aggregated_evaluation.py:29-53`).

Writes LEARNING_CURVE.json (+ .png) at the repo root;
tests/test_learning_curve.py asserts the artifact's claims. Run on the
TPU chip (a few minutes for 3 seeds x 250 iters); pass --quick for a
smoke run.

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

    Collision comparison uses a DISTANCE-NORMALIZED rate (colliding
    agent-steps per 100 m driven, after the reference's AT25 per-distance
    normalization `marl_evaluation.py:212-230`): raw per-step collision
    rates reward standing still — the random initial policy barely moves,
    so it rarely reaches a boundary at all. The AT25 debounced EVENT count
    is not usable here: the training-mode env auto-resets on any
    collision, so no collision ever survives the 3-consecutive-step
    debounce."""
    from sigmarl_tpu.eval.rollout import rollout
    from sigmarl_tpu.rl.networks import tanh_normal_mode

    low, high = -env.action_limits, env.action_limits

    def policy_fn(obs, k):
        loc, _ = policy_net.apply(params, obs)
        return tanh_normal_mode(loc, low, high)

    record, _ = rollout(env, policy_fn, steps, key)
    pos = np.asarray(record["pos"])
    dist_m = float(np.linalg.norm(np.diff(pos, axis=0), axis=-1).sum())
    coll_agents = np.asarray(record["is_collision_with_agents"], bool)
    coll_lane = np.asarray(record["is_collision_with_lanelets"], bool)
    coll_steps = float((coll_agents | coll_lane).sum())
    return {
        "reward_mean": float(np.mean(record["reward"])),
        "collision_rate_agents": float(coll_agents.mean()),
        "collision_rate_lanelets": float(coll_lane.mean()),
        "collision_steps_per_100m": round(coll_steps / max(dist_m, 1e-9) * 100, 3),
        "meters_driven": round(dist_m, 1),
    }


def run_seed(args, seed: int):
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
        # Reference protocol: keep the BEST-reward checkpoint and evaluate
        # it, not the final iterate (`mappo_cavs.py:489-515` +
        # `helper_training.py:932-944` delete-worse retention) — MAPPO's
        # final iterate can sit below its own best (policy churn after the
        # reward peaks), and the deployed model is always the best one.
        is_save_intermediate_model=True,
        where_to_save=f"outputs/learning_curve/seed{seed}/",
        random_seed=seed,
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
        if i % 25 == 0:
            print(f"seed {seed} iter {i:3d} episode_reward_mean {rew:8.3f}", flush=True)

    trainer.train(progress_callback=cb)
    train_s = time.time() - t0
    # Evaluate the best-reward checkpoint (reference deployment protocol),
    # falling back to the final iterate if no intermediate improved.
    from sigmarl_tpu.rl import checkpoint as ckpt

    try:
        final_params = jax.tree.map(
            jnp.asarray, ckpt.load_best(p)["policy"]
        )
    except FileNotFoundError:
        final_params = trainer._final_state.policy_params

    # Eval key varies with the seed; initial vs final share it (paired).
    k_eval = jax.random.PRNGKey(100 + seed)
    ev_init = eval_policy(env, policy_net, init_params, k_eval)
    ev_final = eval_policy(env, policy_net, final_params, k_eval)
    print(f"seed {seed} initial:", ev_init)
    print(f"seed {seed} trained:", ev_final)
    return p, {
        "seed": seed,
        "train_wall_s": round(train_s, 1),
        "reward_history": [round(r, 3) for r in history],
        "eval_initial": ev_init,
        "eval_final": ev_final,
    }


def _ci95(x):
    """Mean +/- CI95 half-width over the seed axis (t-approx at tiny n:
    1.96 * s / sqrt(n) is the reference's formula,
    `marl_aggregated_evaluation.py:29-53`)."""
    x = np.asarray(x, float)
    n = x.shape[0]
    half = 1.96 * x.std(axis=0, ddof=1) / np.sqrt(n) if n > 1 else np.zeros(x.shape[1:])
    return x.mean(axis=0), half


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n_iters", type=int, default=250)
    ap.add_argument("--num_envs", type=int, default=128)
    ap.add_argument("--seeds", type=int, default=3)
    # The reference's torchrl default entropy_eps=1e-4 lets the policy's
    # scale collapse under the 30-epoch batch reuse (measured: entropy
    # +0.4 -> -11 with reward peaking at iter ~30 then decaying); 4e-3
    # holds entropy near -1 and the curve climbs monotonically through
    # 250 iterations. Exposed Parameters knob, not a trainer divergence.
    ap.add_argument("--entropy_eps", type=float, default=4e-3)
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "LEARNING_CURVE.json"))
    args = ap.parse_args()
    if args.quick:
        args.n_iters, args.num_envs, args.seeds = 3, 8, 2

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    runs = []
    p = None
    for seed in range(args.seeds):
        p, r = run_seed(args, seed)
        runs.append(r)

    histories = np.array([r["reward_history"] for r in runs])  # [S, I]
    hist_mean, hist_ci = _ci95(histories)
    w = max(1, min(5, histories.shape[1] // 4))

    def agg_eval(which):
        """Across-seed mean + CI95 half-width per eval metric."""
        out = {}
        for k in runs[0][which]:
            m, c = _ci95(np.array([[r[which][k]] for r in runs]))
            out[k] = round(float(m[0]), 4)
            out[k + "_ci95"] = round(float(c[0]), 4)
        return out

    agg_init = agg_eval("eval_initial")
    agg_final = agg_eval("eval_final")

    art = {
        "scenario": p.scenario_type,
        "n_agents": p.n_agents,
        "num_envs": p.num_vmas_envs,
        "n_iters": p.n_iters,
        "n_seeds": args.seeds,
        "entropy_eps": p.entropy_eps,
        "frames_per_batch": p.frames_per_batch,
        "total_env_steps": p.frames_per_batch * p.n_iters,
        "train_wall_s": round(sum(r["train_wall_s"] for r in runs), 1),
        "backend": jax.default_backend(),
        # Seed-aggregated curve (mean +/- CI95 half-width per iteration).
        "reward_history": [round(float(r), 3) for r in hist_mean],
        "reward_history_ci95": [round(float(c), 3) for c in hist_ci],
        "initial_window_mean": round(float(hist_mean[:w].mean()), 3),
        "final_window_mean": round(float(hist_mean[-w:].mean()), 3),
        "final_window_mean_per_seed": [
            round(float(h[-w:].mean()), 3) for h in histories
        ],
        "eval_initial": agg_init,
        "eval_final": agg_final,
        "per_seed": runs,
    }
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {args.out}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 3.2), dpi=120)
        x = np.arange(len(hist_mean))
        ax.plot(x, hist_mean, lw=1.2)
        ax.fill_between(x, hist_mean - hist_ci, hist_mean + hist_ci, alpha=0.25, lw=0)
        ax.set_xlabel("training iteration")
        ax.set_ylabel("episode reward (mean +/- CI95)")
        ax.set_title(
            f"MAPPO {p.scenario_type} N={p.n_agents} B={p.num_vmas_envs} "
            f"{args.seeds} seeds ({art['total_env_steps']:,} env steps each)"
        )
        fig.tight_layout()
        fig.savefig(os.path.splitext(args.out)[0] + ".png")
    except Exception as e:  # pragma: no cover
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
