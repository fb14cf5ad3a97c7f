"""Local trainer — TPU-native replacement for the fl-analysis adapter
(analysis_wrapper/analysis_client.py:14-55): set_weights by unflattening a
param vector, train for local epochs, return the flattened new weights.

The train step is one jitted SGD scan; with an IntrinsicWrapper the FL
parameter vector is the low-dim z (reference's *_intrinsic models).
Multi-chip: the step is written with plain jnp — sharding in
rofl_tpu.parallel shards the batch (DP) over the mesh with psum'd grads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from . import data as D
from .intrinsic import IntrinsicWrapper, project, project_transpose
from .networks import build_model


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def accuracy(logits, labels):
    return jnp.mean(jnp.argmax(logits, axis=1) == labels)


class Trainer:
    """Full-parameter local trainer (one FL client's local work)."""

    def __init__(self, model_name: str, dataset: str, client_id: int = 0,
                 num_clients: int = 1, batch_size: int = 32,
                 local_epochs: int = 1, lr: float = 0.1, seed: int = 0,
                 intrinsic_dim: int | None = None):
        self.module, in_shape = build_model(model_name)
        self.batch_size = batch_size
        self.local_epochs = local_epochs
        self.lr = lr
        x, y = D.load_dataset(dataset, "train")
        self.x, self.y = D.client_shard(x, y, client_id, num_clients)
        params = self.module.init(jax.random.PRNGKey(seed),
                                  jnp.zeros(in_shape, self.x.dtype if
                                            self.x.dtype == np.int32 else jnp.float32))
        flat, self.unravel = ravel_pytree(params)
        self.full_dim = int(flat.shape[0])
        self.intrinsic = (
            IntrinsicWrapper(flat, intrinsic_dim, seed=seed + 1)
            if intrinsic_dim else None
        )
        self.weights = (np.zeros(intrinsic_dim, np.float32) if intrinsic_dim
                        else np.asarray(flat, np.float32))
        self._step = self._build_step()

    @property
    def num_params(self) -> int:
        return len(self.weights)

    def _loss_from_flat(self, flat, xb, yb):
        logits = self.module.apply(self.unravel(flat), xb)
        return cross_entropy(logits, yb)

    def _build_step(self):
        intrinsic = self.intrinsic
        lr = self.lr

        @jax.jit
        def step(w, xb, yb):
            if intrinsic is not None:
                def loss_z(z):
                    return self._loss_from_flat(intrinsic.theta(z), xb, yb)
                loss, g = jax.value_and_grad(loss_z)(w)
            else:
                loss, g = jax.value_and_grad(
                    lambda f: self._loss_from_flat(f, xb, yb))(w)
            return w - lr * g, loss

        return step

    def set_weights(self, flat: np.ndarray):
        self.weights = np.asarray(flat, np.float32)

    def get_weights(self) -> np.ndarray:
        return np.asarray(self.weights, np.float32)

    def train(self, round_id: int = 0) -> np.ndarray:
        """Run local_epochs of minibatch SGD; returns new flat weights
        (service.py:46-80 computes the delta outside)."""
        w = jnp.asarray(self.weights)
        n = len(self.x)
        rng = np.random.default_rng(round_id)
        order = rng.permutation(n)
        for _ in range(self.local_epochs):
            for s in range(0, n - self.batch_size + 1, self.batch_size):
                idx = order[s:s + self.batch_size]
                w, _ = self._step(w, jnp.asarray(self.x[idx]),
                                  jnp.asarray(self.y[idx]))
        self.weights = np.asarray(w, np.float32)
        return self.weights

    def evaluate(self, split: str = "test") -> tuple[float, float]:
        x, y = D.load_dataset(
            "mnist" if self.x.shape[1:] == (28, 28, 1) else "cifar10", split)
        w = jnp.asarray(self.weights)
        flat = self.intrinsic.theta(w) if self.intrinsic else w
        logits = self.module.apply(self.unravel(flat), jnp.asarray(x[:512]))
        loss = float(cross_entropy(logits, jnp.asarray(y[:512])))
        acc = float(accuracy(logits, jnp.asarray(y[:512])))
        return loss, acc
