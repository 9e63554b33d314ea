"""Pseudo-distance concept figures.

Parity with the reference's `sigmarl/pseudo_distance_example.py` and the
colormap visualizer in `sigmarl/pseudo_distance.py:249-393`: evaluate the
pseudo-distance field to the left/right shared lane boundaries on a dense
grid over the example map and render colormaps with the boundary polylines
and pseudo tangent vectors overlaid.

Run: `python -m sigmarl_tpu.safety.pseudo_distance_example [out_dir]`.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from sigmarl_tpu.maps.manager import load_map
from sigmarl_tpu.safety.pseudo_distance import pseudo_distance_to_polyline


def compute_field(
    boundary: np.ndarray,
    tangents: np.ndarray,
    xlim,
    ylim,
    resolution: int = 200,
):
    """Pseudo-distance field on a regular grid. Returns (X, Y, D)."""
    xs = np.linspace(*xlim, resolution)
    ys = np.linspace(*ylim, resolution)
    X, Y = np.meshgrid(xs, ys)
    pts = jnp.asarray(np.stack([X.ravel(), Y.ravel()], -1))
    d = jax.jit(pseudo_distance_to_polyline)(
        pts, jnp.asarray(boundary), jnp.asarray(tangents)
    )
    return X, Y, np.asarray(d).reshape(resolution, resolution)


def make_figures(out_dir: str, scenario: str = "pseudo_distance_example"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = load_map(scenario)
    path = m.reference_paths[0]
    allpts = np.concatenate([path.left_boundary_shared, path.right_boundary_shared])
    pad = 0.15
    xlim = (allpts[:, 0].min() - pad, allpts[:, 0].max() + pad)
    ylim = (allpts[:, 1].min() - pad, allpts[:, 1].max() + pad)

    os.makedirs(out_dir, exist_ok=True)
    sides = [
        ("left", path.left_boundary_shared, path.left_boundary_shared_pseudo_vector),
        ("right", path.right_boundary_shared, path.right_boundary_shared_pseudo_vector),
    ]
    paths_out = []
    for name, bnd, tan in sides:
        X, Y, D = compute_field(bnd, tan, xlim, ylim)
        D = np.where(D >= 999.0, np.nan, D)
        fig, ax = plt.subplots(figsize=(5, 4))
        pc = ax.pcolormesh(X, Y, D, shading="auto", cmap="viridis")
        fig.colorbar(pc, ax=ax, label="pseudo distance [m]")
        ax.plot(bnd[:, 0], bnd[:, 1], "k-", lw=1.5)
        # Pseudo tangent vectors at the vertices (reference overlay).
        ax.quiver(
            bnd[:, 0], bnd[:, 1], tan[:, 0], tan[:, 1],
            angles="xy", scale_units="xy", scale=12, width=0.004, color="w",
        )
        ax.set_title(f"pseudo distance to {name} boundary")
        ax.set_aspect("equal")
        fig.tight_layout()
        out = os.path.join(out_dir, f"pseudo_distance_{name}.png")
        fig.savefig(out, dpi=150)
        plt.close(fig)
        paths_out.append(out)
    return paths_out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "outputs/pseudo_distance_example"
    for p in make_figures(out):
        print(p)
