"""Model zoo — TPU-native (flax) counterparts of the reference model set.

The reference delegates training to the external pps-lab/fl-analysis
repo (TF/Keras; SURVEY.md §2.3) and ships initial weight files for:
mnist_dev (19166 params), mnist 5k-intrinsic, cifar_lenet5 12k-intrinsic,
resnet18 {25,40,45,50,55}k-intrinsic (models/*.txt, loaded by
params.rs:984-997). Here the same families are native JAX/flax modules;
intrinsic-dimension training lives in rofl_tpu.models.intrinsic.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MnistMLP(nn.Module):
    """Small MNIST MLP (the mnist_dev family: ~19k params at hidden=24)."""

    hidden: int = 24
    n_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.Dense(self.n_classes)(x)
        return x


class MnistCNN(nn.Module):
    """Conv net for MNIST/EMNIST experiments."""

    n_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (5, 5), strides=2)(x)
        x = nn.relu(x)
        x = nn.Conv(32, (5, 5), strides=2)(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.n_classes)(x)
        return x


class LeNet5(nn.Module):
    """LeNet5 (the cifar_lenet5 family)."""

    n_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        # canonical LeNet-5 uses VALID convs: 32→28→14→10→5, flatten 5·5·16
        # = 400 → 62006 total params, matching the reference's
        # models/cifar_lenet5 weight count
        x = nn.Conv(6, (5, 5), padding="VALID")(x)
        x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (5, 5), padding="VALID")(x)
        x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(120)(x)
        x = nn.relu(x)
        x = nn.Dense(84)(x)
        x = nn.relu(x)
        x = nn.Dense(self.n_classes)(x)
        return x


class ResNetBlock(nn.Module):
    filters: int
    strides: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), self.strides, use_bias=False)(x)
        y = nn.GroupNorm(num_groups=min(32, self.filters))(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), use_bias=False)(y)
        y = nn.GroupNorm(num_groups=min(32, self.filters))(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), self.strides,
                               use_bias=False)(residual)
            residual = nn.GroupNorm(num_groups=min(32, self.filters))(residual)
        return nn.relu(residual + y)


class ResNet18(nn.Module):
    """ResNet-18 (GroupNorm instead of BatchNorm: no mutable batch stats →
    a pure functional train step, the idiomatic JAX choice for FL where
    client updates must be plain parameter vectors)."""

    n_classes: int = 10
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.width, (3, 3), use_bias=False)(x)
        x = nn.GroupNorm(num_groups=32)(x)
        x = nn.relu(x)
        for i, n_blocks in enumerate(self.stage_sizes):
            filters = self.width * (2 ** i)
            for b in range(n_blocks):
                strides = (2, 2) if b == 0 and i > 0 else (1, 1)
                x = ResNetBlock(filters, strides)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.n_classes)(x)
        return x


class CharLSTM(nn.Module):
    """Character-level LSTM for the Shakespeare next-char task (LEAF:
    80-char window → 81st char; e2e_table.csv:15-16). A real 2-layer
    stacked LSTM scanned over time with lax.scan (one compiled cell body),
    final hidden state → vocab logits."""

    vocab: int = 90
    hidden: int = 128
    layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = nn.Embed(self.vocab, 8)(x)  # (B, T, 8)
        h = emb
        for _ in range(self.layers):
            cell = nn.OptimizedLSTMCell(features=self.hidden)
            scan = nn.RNN(cell)
            h = scan(h)  # (B, T, hidden)
        return nn.Dense(self.vocab)(h[:, -1])


MODEL_REGISTRY: dict[str, Any] = {
    "mnist_dev": lambda: (MnistMLP(), (1, 28, 28, 1)),
    "mnist_cnn": lambda: (MnistCNN(), (1, 28, 28, 1)),
    "cifar_lenet5": lambda: (LeNet5(), (1, 32, 32, 3)),
    "resnet18": lambda: (ResNet18(), (1, 32, 32, 3)),
    "shakespeare": lambda: (CharLSTM(), (1, 80)),
}


def build_model(name: str):
    """(module, example_input_shape) by family name (model_loader.py:5-13
    equivalent)."""
    base = name.split("_intrinsic")[0]
    if base not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name}")
    return MODEL_REGISTRY[base]()
