"""Minimal debug scenario: a few bicycle agents under scripted control.

Parity with reference `scenarios/debug/kinematic_bicycle.py` (an interactive
VMAS smoke scenario); here it runs headless on the chosen map, exercising
WorldCustom-equivalent command dynamics, and optionally renders frames.
Run: python -m sigmarl_tpu.env.debug_demo [--render]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario_type", default="cpm_mixed")
    ap.add_argument("--n_agents", type=int, default=2)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--device", default="cpu", choices=["tpu", "cpu"])
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.core.controllers import pure_pursuit_on_short_term
    from sigmarl_tpu.env import make_env

    p = Parameters(
        scenario_type=args.scenario_type, n_agents=args.n_agents,
        num_vmas_envs=1, dt=0.1, is_use_mtv_distance=False, is_obs_noise=False,
    )
    env = make_env(p)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    traj = []
    for i in range(args.steps):
        acts = pure_pursuit_on_short_term(
            state.pos, state.rot, state.short_term, 0.5, env.cfg.max_steering
        )
        state, obs, rew, done, info = step(state, acts, jax.random.PRNGKey(i))
        traj.append(np.asarray(state.pos[0]))
        if i % 10 == 0:
            print(
                f"step {i}: pos {np.asarray(state.pos[0, 0]).round(3)} "
                f"reward {float(rew[0, 0]):.3f}"
            )
    if args.render:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from sigmarl_tpu.render import draw_map

        fig, ax = plt.subplots(figsize=(6, 5))
        draw_map(ax, args.scenario_type)
        t = np.stack(traj)
        for a in range(args.n_agents):
            ax.plot(t[:, a, 0], t[:, a, 1], linewidth=1.2)
        fig.savefig("debug_demo.png", dpi=130)
        print("saved debug_demo.png")


if __name__ == "__main__":
    main()
