"""Parallel CBF-evaluation sweep launcher.

Parity with reference `main_eval_parallel.py:1-189`: builds the config grid
(seeds x grouping x scenario x CBF on/off) and launches `main_eval.py`
runs. On a single chip the runs execute sequentially (the chip is the
bottleneck, unlike the reference's CPU process fan-out); pass --jobs > 1 to
fan out across processes on CPU.
"""

from __future__ import annotations

import argparse
import itertools
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor


def build_grid(args):
    grid = []
    for seed, scenario, cbf in itertools.product(
        range(args.n_seeds), args.scenarios, [False, True] if args.sweep_cbf else [True]
    ):
        cmd = [
            sys.executable, "main_eval.py",
            "--scenario_type", scenario,
            "--n_agents", str(args.n_agents),
            "--num_envs", str(args.num_envs),
            "--max_steps", str(args.max_steps),
            "--seed", str(seed),
            "--out_dir", args.out_dir,
        ]
        if not cbf:
            cmd.append("--no_cbf")
        if args.jobs > 1:
            cmd += ["--device", "cpu"]
        grid.append(cmd)
    return grid


def run(cmd):
    print("[RUN]", " ".join(cmd), flush=True)
    return subprocess.run(cmd).returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_seeds", type=int, default=3)
    ap.add_argument("--scenarios", nargs="+", default=["cpm_mixed"])
    ap.add_argument("--n_agents", type=int, default=4)
    ap.add_argument("--num_envs", type=int, default=32)
    ap.add_argument("--max_steps", type=int, default=600)
    ap.add_argument("--sweep_cbf", action="store_true")
    ap.add_argument("--jobs", type=int, default=1)
    ap.add_argument("--out_dir", type=str, default="outputs/eval_cbf")
    args = ap.parse_args()

    grid = build_grid(args)
    if args.jobs > 1:
        with ProcessPoolExecutor(max_workers=args.jobs) as ex:
            codes = list(ex.map(run, grid))
    else:
        codes = [run(c) for c in grid]
    bad = [c for c in codes if c != 0]
    print(f"{len(grid) - len(bad)}/{len(grid)} runs succeeded")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
