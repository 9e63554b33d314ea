"""MTV safety-margin neural predictor (ECC25).

Parity with reference `sigmarl/mtv_based_sm_predictor.py`: a small
twice-differentiable MLP (3 -> 64 -> 64 -> 1, Tanh) that predicts the
SAT/MTV-based distance between two rectangles from the relative pose
(x_rel, y_rel, psi_rel), trained on a grid of exact MTV distances.
Used by the ECC25 standalone CBF controller (`cbf.py` `mtv_based_sm:711`)
where the barrier needs first and second derivatives of the safety margin —
provided here by JAX autodiff instead of torch autograd.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sigmarl_tpu.core.geometry import mtv_distances, rectangle_vertices

Array = jax.Array


class DistancePredictor(nn.Module):
    """3 -> 64 -> 64 -> 1 Tanh MLP (second-order differentiable)."""

    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h)(x))
        return nn.Dense(1)(x)


@dataclass
class SafetyMarginEstimatorModule:
    """Train/evaluate the rectangle safety-margin predictor.

    Feature normalization and sampling ranges follow the reference
    (`mtv_based_sm_predictor.py:64-110`): positions normalized by the
    rectangle length, heading by pi; samples cover a square of side
    2*(2r + l/2) excluding the always-overlapping inner rectangle.
    """

    length: float = 0.16
    width: float = 0.08
    path_nn: str = "checkpoints/sm_predictor.pkl"
    params: Optional[dict] = None
    error_upper_bound: Optional[float] = None
    train_losses_history: list = field(default_factory=list)
    val_losses_history: list = field(default_factory=list)

    def __post_init__(self):
        self.net = DistancePredictor()
        self.radius = float(np.sqrt(self.length**2 + self.width**2) / 2)
        offset = 0.5 * self.length
        self.x_max = 2 * self.radius + offset
        self.y_max = 2 * self.radius + offset
        self.feature_normalizer = jnp.asarray(
            [self.length, self.length, np.pi], jnp.float32
        )
        self.label_normalizer = self.length

    # ------------------------------------------------------------------ data
    def exact_mtv(self, features: Array) -> Array:
        """Exact MTV distance for relative poses [..., 3] = (x, y, psi)."""
        zeros = jnp.zeros(features.shape[:-1])
        v1 = rectangle_vertices(
            jnp.zeros(features.shape[:-1] + (2,)), zeros, self.width, self.length, True
        )
        v2 = rectangle_vertices(
            features[..., 0:2], features[..., 2], self.width, self.length, True
        )
        pair = jnp.stack([v1, v2], axis=-3)  # [..., 2, 5, 2]
        return mtv_distances(pair)[..., 0, 1]

    def generate_training_data(self, num_values: int = 41) -> Tuple[Array, Array]:
        """Grid of relative poses with exact MTV labels
        (reference `generate_training_data:181-235`)."""
        xs = np.linspace(-self.x_max, self.x_max, num_values)
        ys = np.linspace(-self.y_max, self.y_max, num_values)
        hs = np.linspace(-np.pi, np.pi, num_values)
        X, Y, H = np.meshgrid(xs, ys, hs, indexing="ij")
        features = jnp.asarray(
            np.column_stack([X.ravel(), Y.ravel(), H.ravel()]), jnp.float32
        )
        labels = self.exact_mtv(features)[..., None]
        return features / self.feature_normalizer, labels / self.label_normalizer

    # ----------------------------------------------------------------- train
    def train(
        self,
        num_values: int = 41,
        epochs: int = 200,
        batch_size: int = 4096,
        lr: float = 1e-3,
        val_fraction: float = 0.1,
        seed: int = 0,
        verbose: bool = False,
    ) -> float:
        features, labels = self.generate_training_data(num_values)
        n = features.shape[0]
        key = jax.random.PRNGKey(seed)
        key, k_perm, k_init = jax.random.split(key, 3)
        perm = jax.random.permutation(k_perm, n)
        features, labels = features[perm], labels[perm]
        n_val = int(n * val_fraction)
        f_val, l_val = features[:n_val], labels[:n_val]
        f_tr, l_tr = features[n_val:], labels[n_val:]

        params = self.net.init(k_init, f_tr[:1])
        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, f, l):
            def loss_fn(p):
                pred = self.net.apply(p, f)
                return jnp.mean((pred - l) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        n_tr = f_tr.shape[0]
        steps_per_epoch = max(1, n_tr // batch_size)
        for epoch in range(epochs):
            key, k_e = jax.random.split(key)
            perm = jax.random.permutation(k_e, n_tr)
            ep_loss = 0.0
            for i in range(steps_per_epoch):
                idx = perm[i * batch_size : (i + 1) * batch_size]
                params, opt_state, loss = step(params, opt_state, f_tr[idx], l_tr[idx])
                ep_loss += float(loss)
            self.train_losses_history.append(ep_loss / steps_per_epoch)
            val_loss = float(jnp.mean((self.net.apply(params, f_val) - l_val) ** 2))
            self.val_losses_history.append(val_loss)
            if verbose and epoch % 20 == 0:
                print(f"epoch {epoch}: train {self.train_losses_history[-1]:.6f} val {val_loss:.6f}")

        self.params = params
        # Error upper bound over the validation set, in meters — used by the
        # ECC25 controller to tighten h (reference usage).
        err = jnp.abs(self.net.apply(params, f_val) - l_val) * self.label_normalizer
        self.error_upper_bound = float(err.max())
        return self.error_upper_bound

    # ------------------------------------------------------------- inference
    def predict(self, rel_pose: Array) -> Array:
        """Predicted safety margin [m] for relative poses [..., 3]."""
        f = rel_pose / self.feature_normalizer
        return self.net.apply(self.params, f)[..., 0] * self.label_normalizer

    def margin_grad_hess(self, rel_pose: Array) -> Tuple[Array, Array, Array]:
        """(margin, gradient [3], Hessian [3, 3]) w.r.t. the relative pose —
        exact autodiff replacing the reference's torch.autograd chains."""

        def f(x):
            return self.predict(x)

        grad = jax.grad(f)
        hess = jax.hessian(f)
        if rel_pose.ndim == 1:
            return f(rel_pose), grad(rel_pose), hess(rel_pose)
        return (
            jax.vmap(f)(rel_pose),
            jax.vmap(grad)(rel_pose),
            jax.vmap(hess)(rel_pose),
        )

    # ----------------------------------------------------------------- io
    def save(self, path: Optional[str] = None):
        path = path or self.path_nn
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as fh:
            pickle.dump(
                {
                    "params": jax.tree.map(np.asarray, self.params),
                    "error_upper_bound": self.error_upper_bound,
                    "length": self.length,
                    "width": self.width,
                },
                fh,
            )

    def load(self, path: Optional[str] = None) -> bool:
        path = path or self.path_nn
        if not os.path.exists(path):
            return False
        with open(path, "rb") as fh:
            data = pickle.load(fh)
        self.params = data["params"]
        self.error_upper_bound = data["error_upper_bound"]
        return True
