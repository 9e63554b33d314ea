"""Reward-keyed checkpointing.

Parity with the reference's retention policy
(`helper_training.py:886-1026`, `mappo_cavs.py:489-515`): checkpoints are
named `reward{mean:.2f}_*` and written only when the mean episode reward
improves; older lower-reward files are deleted; a JSON sidecar stores the
full run `Parameters` plus the reward history so saved models are
self-describing; `final_*` files are written at the end of training.
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from sigmarl_tpu.config import Parameters

_REWARD_RE = re.compile(r"reward(-?\d+\.\d+)_")


def model_dir(parameters: Parameters) -> str:
    return os.path.join(parameters.where_to_save, parameters.model_name or "model")


def _to_numpy(params: Any) -> Any:
    return jax.tree.map(np.asarray, params)


def save_params(path: str, params: Any) -> None:
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(params), f)


def load_params(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def find_highest_reward(directory: str) -> Optional[float]:
    """Highest reward among saved checkpoints
    (reference `find_the_highest_reward_among_all_models:947-964`)."""
    rewards = [
        float(m.group(1))
        for p in glob.glob(os.path.join(directory, "reward*_policy.pkl"))
        if (m := _REWARD_RE.search(os.path.basename(p)))
    ]
    return max(rewards) if rewards else None


def delete_files_with_lower_reward(directory: str, keep_reward: float) -> None:
    """Reference `delete_files_with_lower_mean_reward:932-944`."""
    for p in glob.glob(os.path.join(directory, "reward*")):
        m = _REWARD_RE.search(os.path.basename(p))
        if m and float(m.group(1)) < keep_reward:
            os.remove(p)


class RewardKeyedCheckpointer:
    def __init__(self, parameters: Parameters):
        self.parameters = parameters
        self.dir = model_dir(parameters)
        os.makedirs(self.dir, exist_ok=True)
        self.best = parameters.episode_reward_intermediate

    def _sidecar(self, reward_history: List[float]) -> Dict:
        p = self.parameters.to_dict()
        p["episode_reward_intermediate"] = self.best
        return {"parameters": p, "episode_reward_mean_list": reward_history}

    def maybe_save(self, reward: float, params: Any, reward_history: List[float]) -> bool:
        """Save a checkpoint if `reward` beats the best so far; always refresh
        the JSON sidecar. Returns True if model files were written."""
        improved = np.isfinite(reward) and reward > self.best
        if improved:
            self.best = reward
            tag = f"reward{reward:.2f}"
            save_params(os.path.join(self.dir, f"{tag}_policy.pkl"), params["policy"])
            save_params(os.path.join(self.dir, f"{tag}_critic.pkl"), params["critic"])
            delete_files_with_lower_reward(self.dir, reward)
        tag = f"reward{self.best:.2f}" if np.isfinite(self.best) else "reward0.00"
        with open(os.path.join(self.dir, f"{tag}_data.json"), "w") as f:
            json.dump(self._sidecar(reward_history), f)
        return bool(improved)

    def save_final(self, params: Any, reward_history: List[float]) -> None:
        save_params(os.path.join(self.dir, "final_policy.pkl"), params["policy"])
        save_params(os.path.join(self.dir, "final_critic.pkl"), params["critic"])
        with open(os.path.join(self.dir, "final_data.json"), "w") as f:
            json.dump(self._sidecar(reward_history), f)


def load_sidecar(parameters: Parameters) -> Optional[Dict]:
    """Load the JSON sidecar matching the checkpoint `load_best` would pick
    (used by continue-training to restore the best reward + history)."""
    d = model_dir(parameters)
    if parameters.is_load_final_model:
        path = os.path.join(d, "final_data.json")
    else:
        best = find_highest_reward(d)
        if best is None:
            return None
        path = os.path.join(d, f"reward{best:.2f}_data.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_best(parameters: Parameters) -> Dict[str, Any]:
    """Load the best (or final) checkpoint per the load flags
    (reference `mappo_cavs.py:219-307`)."""
    d = model_dir(parameters)
    if parameters.is_load_final_model:
        return {
            "policy": load_params(os.path.join(d, "final_policy.pkl")),
            "critic": load_params(os.path.join(d, "final_critic.pkl")),
        }
    best = find_highest_reward(d)
    if best is None:
        raise FileNotFoundError(f"no reward-keyed checkpoints in {d}")
    tag = f"reward{best:.2f}"
    return {
        "policy": load_params(os.path.join(d, f"{tag}_policy.pkl")),
        "critic": load_params(os.path.join(d, f"{tag}_critic.pkl")),
    }
