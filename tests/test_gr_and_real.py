"""Goal-reaching world state + real-world (lab) pose-matching reset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigmarl_tpu.config import Parameters
from sigmarl_tpu.env import make_env
from sigmarl_tpu.env.goal_reaching import (
    goal_reached,
    init_goal_reaching,
    update_goal_reaching,
)


def test_goal_reaching_state_updates():
    B, N = 4, 1
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (B, N, 2), minval=-1, maxval=1)
    rot = jnp.zeros((B, N))
    goal = pos + jnp.asarray([1.0, 0.0])

    state = init_goal_reaching(pos, rot, goal)
    # On the segment start: distance to the spawn->goal segment is 0.
    np.testing.assert_allclose(np.asarray(state.d_ref), 0.0, atol=1e-6)
    assert state.vertices.shape == (B, N, 5, 2)
    assert not bool(goal_reached(state, 0.05).any())

    # Move perpendicular to the segment: d_ref equals the offset.
    newpos = pos + jnp.asarray([0.5, 0.2])
    state = update_goal_reaching(state, newpos, rot)
    np.testing.assert_allclose(np.asarray(state.d_ref), 0.2, atol=1e-5)

    # Move onto the goal: reached.
    state = update_goal_reaching(state, goal, rot)
    assert bool(goal_reached(state, 0.05).all())
    np.testing.assert_allclose(np.asarray(state.d_agents[:, 0, 0]), 0.0)


def test_reset_from_poses_matches_path():
    """An agent placed exactly on a center line with the path's yaw must be
    matched to a path that passes through that pose (reference
    `world_state_rt_real.py:47-90`).

    The CPM loop paths are rotations of the same physical loops, so several
    candidate paths contain the same pose with identical cost; the
    reference's `torch.argmin` tie-breaks to the lowest index, and so do we.
    The behavioral contract is therefore *invariant-based*: the matched
    path's cost is minimal and (distance, relative yaw) at the matched
    point are ~0 — not a specific path index."""
    p = Parameters(
        scenario_type="cpm_entire",
        n_agents=2,
        num_vmas_envs=3,
        dt=0.1,
        max_steps=100,
    )
    env = make_env(p)
    t = env.tables
    long_term = np.asarray(t.long_term)
    yaw_tab = np.asarray(t.center_line_yaw)
    n_pts = np.asarray(t.n_points_long_term)

    # Pick two distinct paths and a mid-path point on each.
    pids = [0, 7]
    pt_idx = 40
    pos = np.zeros((3, 2, 2), np.float32)
    rot = np.zeros((3, 2), np.float32)
    for a, k in enumerate(pids):
        pos[:, a] = long_term[k, pt_idx]
        rot[:, a] = yaw_tab[k, pt_idx]

    state, obs = env.reset_from_poses(
        jax.random.PRNGKey(1), jnp.asarray(pos), jnp.asarray(rot)
    )
    assert obs.shape == (3, 2, env.obs_dim)
    got = np.asarray(state.path_id)
    pt = np.asarray(state.point_id)
    for a in range(2):
        for b in range(3):
            k, i = got[b, a], pt[b, a]
            # The matched path passes through the queried pose: the closest
            # center-line point is within one sample of the pose...
            d = np.linalg.norm(long_term[k, : n_pts[k]] - pos[b, a], axis=-1)
            assert d.min() < 0.06, (a, k, d.min())
            # ...and its yaw agrees with the queried yaw there.
            rel = (yaw_tab[k, max(i - 1, 0)] - rot[b, a] + np.pi) % (
                2 * np.pi
            ) - np.pi
            assert abs(rel) < 0.15, (a, k, rel)
    # The matched pose is exactly preserved (no snapping).
    np.testing.assert_allclose(np.asarray(state.pos), pos, atol=1e-6)
