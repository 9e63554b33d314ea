"""Interactive keyboard-controlled scenario session.

Capability parity with the reference's `render_interactively` entry
(`scenarios/road_traffic.py:2229-2235` -> vmas's pyglet window): a human
drives agent 0 (and optionally agent 1) with the keyboard while the
remaining agents follow the scripted pure-pursuit nominal; the env steps
at the control period and redraws each frame.

The session logic (`InteractiveSession`) is a plain object driven by
`key(name)` / `step()` so it is fully testable headless; the
`render_interactively` wrapper attaches it to a matplotlib window
(any interactive backend) and runs the draw loop.

Controls (reference vmas bindings):
    agent 0 — arrow keys: Up/Down speed target +-, Left/Right steering.
    agent 1 — W/S speed, A/D steering (with `control_two_agents=True`).
    R resets the episode, Q quits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.constants import AGENTS

SPEED_STEP = 0.1
STEER_STEP = 0.1


class InteractiveSession:
    """Headless-drivable interactive env session (agent 0 [and 1] manual)."""

    def __init__(
        self,
        scenario_type: str = "cpm_entire",
        n_agents: int = 4,
        control_two_agents: bool = False,
        seed: int = 0,
    ):
        from sigmarl_tpu.env import make_env

        self.p = Parameters(
            scenario_type=scenario_type, n_agents=n_agents, num_vmas_envs=1,
            dt=0.1, is_use_mtv_distance=False, is_obs_noise=False,
        )
        self.env = make_env(self.p)
        self.control_two_agents = control_two_agents
        self._reset_key = jax.random.PRNGKey(seed)
        self._step = jax.jit(self.env.step)
        self._reset = jax.jit(self.env.reset)
        self.state, self.obs = self._reset(self._reset_key)
        self.n_agents = n_agents
        # Manual (speed, steering) targets per controlled agent.
        self.targets = np.zeros((2, 2), np.float32)
        self.t = 0
        self.done = False
        self.quit = False

    # ---------------------------------------------------------------- input
    def key(self, name: str) -> None:
        """Apply one key event (matplotlib key names)."""
        lim_v = (AGENTS["min_speed"], AGENTS["max_speed"])
        lim_s = (AGENTS["min_steering"], AGENTS["max_steering"])
        k = name.lower()
        if k == "up":
            self.targets[0, 0] += SPEED_STEP
        elif k == "down":
            self.targets[0, 0] -= SPEED_STEP
        elif k == "left":
            self.targets[0, 1] += STEER_STEP
        elif k == "right":
            self.targets[0, 1] -= STEER_STEP
        elif self.control_two_agents and k == "w":
            self.targets[1, 0] += SPEED_STEP
        elif self.control_two_agents and k == "s":
            self.targets[1, 0] -= SPEED_STEP
        elif self.control_two_agents and k == "a":
            self.targets[1, 1] += STEER_STEP
        elif self.control_two_agents and k == "d":
            self.targets[1, 1] -= STEER_STEP
        elif k == "r":
            self.reset()
            return
        elif k == "q":
            self.quit = True
            return
        self.targets[:, 0] = np.clip(self.targets[:, 0], *lim_v)
        self.targets[:, 1] = np.clip(self.targets[:, 1], *lim_s)

    def reset(self) -> None:
        self._reset_key = jax.random.fold_in(self._reset_key, 1)
        self.state, self.obs = self._reset(self._reset_key)
        self.targets[:] = 0.0
        self.t = 0
        self.done = False

    # ---------------------------------------------------------------- step
    def actions(self) -> jnp.ndarray:
        """[1, N, 2] actions: manual targets for the controlled agents,
        pure-pursuit for the rest."""
        from sigmarl_tpu.core.controllers import pure_pursuit_on_short_term

        acts = pure_pursuit_on_short_term(
            self.state.pos, self.state.rot, self.state.short_term,
            0.5, self.env.cfg.max_steering,
        )
        n_manual = 2 if self.control_two_agents else 1
        manual = jnp.asarray(self.targets[:n_manual])
        return acts.at[0, :n_manual].set(manual)

    def step(self):
        """Advance one control period; returns (reward[N], done)."""
        # Env-noise stream derived from the CURRENT reset key: it varies
        # with the session seed and across R-key resets (fold_in(1) advances
        # _reset_key), so a replayed episode does not see a repeated stream.
        self.state, self.obs, rew, done, info = self._step(
            self.state, self.actions(), jax.random.fold_in(self._reset_key, self.t)
        )
        self.t += 1
        self.done = bool(done[0])
        return np.asarray(rew[0]), self.done


def render_interactively(
    scenario_type: str = "cpm_entire",
    n_agents: int = 4,
    control_two_agents: bool = False,
    max_steps: Optional[int] = None,
    interval_ms: int = 100,
):
    """Open a matplotlib window and drive the session with the keyboard.

    Requires an interactive backend (TkAgg/QtAgg/macosx); on headless
    machines use `python -m sigmarl_tpu.env.debug_demo` for the scripted
    equivalent.
    """
    import matplotlib
    import matplotlib.pyplot as plt

    from sigmarl_tpu.render import render_frame

    if matplotlib.get_backend().lower() == "agg":
        raise RuntimeError(
            "render_interactively needs an interactive matplotlib backend "
            "(got Agg). On headless machines run env/debug_demo.py instead."
        )

    sess = InteractiveSession(scenario_type, n_agents, control_two_agents)
    fig, ax = plt.subplots(figsize=(7, 6))
    fig.canvas.mpl_connect("key_press_event", lambda ev: sess.key(ev.key or ""))

    while not sess.quit and (max_steps is None or sess.t < max_steps):
        sess.step()
        ax.clear()
        render_frame(
            ax, scenario_type,
            np.asarray(sess.state.pos[0]), np.asarray(sess.state.rot[0]),
            short_term=np.asarray(sess.state.short_term[0]),
        )
        ax.set_title(
            f"t={sess.t * sess.p.dt:.1f}s  agent0 target "
            f"v={sess.targets[0, 0]:+.2f} steer={sess.targets[0, 1]:+.2f}  "
            "(arrows; R reset; Q quit)"
        )
        plt.pause(interval_ms / 1000.0)
    plt.close(fig)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario_type", default="cpm_entire")
    ap.add_argument("--n_agents", type=int, default=4)
    ap.add_argument("--control_two_agents", action="store_true")
    args = ap.parse_args()
    render_interactively(
        args.scenario_type, args.n_agents, args.control_two_agents
    )
