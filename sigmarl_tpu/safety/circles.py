"""Circle over-approximation of the vehicle rectangle.

Parity with reference `sigmarl/rectangle_approximation.py`: n circles of
minimal common radius placed along the length axis covering the rectangle,
plus the batched rotation of circle centers into the world frame
(`cbf_qp.py:527-573` `get_circle_centers`, vectorized over `[B, N]`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class CircleApproximation:
    length: float
    width: float
    n_circles: int

    @property
    def radius(self) -> float:
        """Minimal radius reaching the far corners of each length segment."""
        segment = self.length / self.n_circles
        return math.hypot(segment / 2, self.width / 2)

    @property
    def centers_local(self) -> np.ndarray:
        """[n_circles, 2] circle centers in the vehicle frame (y = 0)."""
        step = self.length / self.n_circles
        start = -self.length / 2 + step / 2
        xs = start + np.arange(self.n_circles) * step
        return np.stack([xs, np.zeros_like(xs)], axis=-1).astype(np.float32)

    def extra_area(self) -> float:
        """Covered area beyond the rectangle (reference `:72-102`)."""
        r, w, n = self.radius, self.width, self.n_circles
        circle_area = math.pi * r**2
        d = 2 * math.sqrt(max(0.0, r**2 - (w / 2) ** 2))
        theta1 = 2 * math.acos((w / 2) / r)
        extra1 = (theta1 / (2 * math.pi)) * circle_area - 0.5 * d * (w / 2)
        theta2 = math.pi - theta1
        extra2 = (theta2 / (2 * math.pi)) * circle_area - w * (d / 2) / 2
        return 2 * n * extra1 + 2 * extra2


def circle_centers_world(
    approx: CircleApproximation, pos: Array, rot: Array
) -> Array:
    """Rotate local circle centers into the world frame.

    pos: [..., 2]; rot: [...]. Returns [..., n_circles, 2].
    """
    local = jnp.asarray(approx.centers_local)  # [C, 2]
    c, s = jnp.cos(rot), jnp.sin(rot)
    x = local[..., 0] * c[..., None] - local[..., 1] * s[..., None]
    y = local[..., 0] * s[..., None] + local[..., 1] * c[..., None]
    return jnp.stack([x, y], axis=-1) + pos[..., None, :]
