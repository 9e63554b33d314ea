"""Host-side rendering: map + agents to matplotlib frames / video.

Replaces the reference's pyglet/VMAS in-loop renderer
(`road_traffic.py:1637-2226`) with an out-of-hot-path matplotlib renderer
over recorded rollouts (the TPU step never renders; rendering consumes the
saved record — same division as the reference's video saving in
`helper_common.py:464-552` via OpenCV).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from sigmarl_tpu.constants import AGENTS
from sigmarl_tpu.maps.manager import load_map


def _rect(center, yaw, length=AGENTS["length"], width=AGENTS["width"]):
    lh, wh = length / 2, width / 2
    local = np.array([[lh, wh], [lh, -wh], [-lh, -wh], [-lh, wh]])
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s], [s, c]])
    return local @ R.T + center


def draw_map(ax, scenario_type: str, show_boundaries: bool = True):
    m = load_map(scenario_type)
    for lane in m.lanelets:
        for bnd, marking in (
            (lane.left_boundary, lane.left_line_marking),
            (lane.right_boundary, lane.right_line_marking),
        ):
            ax.plot(
                bnd[:, 0], bnd[:, 1],
                linestyle="--" if marking == "dashed" else "-",
                color="grey", linewidth=0.5,
            )
    ax.set_aspect("equal")
    ax.set_xticks([])
    ax.set_yticks([])
    return m


def render_frame(
    ax,
    scenario_type: str,
    pos: np.ndarray,  # [N, 2]
    rot: np.ndarray,  # [N]
    short_term: Optional[np.ndarray] = None,  # [N, S, 2]
    colors=None,
):
    import matplotlib.pyplot as plt

    draw_map(ax, scenario_type)
    N = pos.shape[0]
    cmap = colors or [plt.cm.tab20(i % 20) for i in range(N)]
    for i in range(N):
        poly = plt.Polygon(
            _rect(pos[i], rot[i]), closed=True, facecolor=cmap[i],
            edgecolor="black", linewidth=0.4, zorder=3,
        )
        ax.add_patch(poly)
        if short_term is not None:
            ax.plot(
                short_term[i, :, 0], short_term[i, :, 1],
                color=cmap[i], linewidth=0.6, linestyle=":", zorder=2,
            )


def save_rollout_video(
    scenario_type: str,
    record: Dict[str, np.ndarray],
    out_file: str,
    env_index: int = 0,
    fps: int = 10,
    stride: int = 1,
    max_frames: int = 600,
):
    """Render one env of a recorded rollout to an mp4 (OpenCV encoder)."""
    import matplotlib

    matplotlib.use("Agg")
    import cv2
    import matplotlib.pyplot as plt

    pos = np.asarray(record["pos"])[:, env_index]  # [T, N, 2]
    rot = np.asarray(record["rot"])[:, env_index]
    T = min(pos.shape[0], max_frames * stride)

    fig, ax = plt.subplots(figsize=(6, 5.3), dpi=110)
    writer = None
    for t in range(0, T, stride):
        ax.clear()
        render_frame(ax, scenario_type, pos[t], rot[t])
        ax.set_title(f"t = {t}")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frame = cv2.cvtColor(buf, cv2.COLOR_RGB2BGR)
        if writer is None:
            h, w = frame.shape[:2]
            writer = cv2.VideoWriter(
                out_file, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
            )
        writer.write(frame)
    if writer is not None:
        writer.release()
    plt.close(fig)
    return out_file
