"""Dataset loading — .npy files when present, deterministic synthetic
fallback otherwise (the environment has no network egress; mirrors the
reference's data_loader.py:6-44 which also ships MNIST/EMNIST/CIFAR
dummies)."""

from __future__ import annotations

import os

import numpy as np

DATA_DIRS = [os.environ.get("ROFL_DATA_DIR", ""), "data", "/root/data"]


def _find(name: str):
    for d in DATA_DIRS:
        if not d:
            continue
        x_path = os.path.join(d, f"{name}_x.npy")
        y_path = os.path.join(d, f"{name}_y.npy")
        if os.path.exists(x_path) and os.path.exists(y_path):
            return np.load(x_path), np.load(y_path)
    return None


def _synthetic(shape, n_classes: int, n: int, seed: int):
    """Deterministic learnable synthetic data: class-dependent means + noise
    so accuracy signals are meaningful without real datasets."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, n_classes, size=n)
    protos = rng.normal(0, 1, size=(n_classes,) + shape).astype(np.float32)
    x = protos[y] + rng.normal(0, 0.8, size=(n,) + shape).astype(np.float32)
    return x.astype(np.float32), y.astype(np.int32)


def load_dataset(name: str, split: str = "train", n_synth: int = 2048,
                 seed: int = 1234):
    """(x, y) for 'mnist' | 'emnist' | 'cifar10' | 'shakespeare'."""
    found = _find(f"{name}_{split}")
    if found is not None:
        return found[0].astype(np.float32), found[1].astype(np.int32)
    seed = seed + (1 if split != "train" else 0)
    if name in ("mnist", "emnist"):
        n_cls = 47 if name == "emnist" else 10
        return _synthetic((28, 28, 1), n_cls, n_synth, seed)
    if name in ("cifar10", "cifar"):
        return _synthetic((32, 32, 3), 10, n_synth, seed)
    if name == "shakespeare":
        # synthetic char stream with LEAF-style windows: order-1 Markov
        # text, y = next char AFTER the 80-char window (requires actually
        # modelling the sequence, unlike a copy-last-char task)
        rng = np.random.default_rng(seed)
        vocab = 90
        trans = rng.dirichlet(np.full(vocab, 0.05), size=vocab)
        stream = np.empty(n_synth + 81, np.int32)
        stream[0] = rng.integers(0, vocab)
        for i in range(1, len(stream)):
            stream[i] = rng.choice(vocab, p=trans[stream[i - 1]])
        idx = np.arange(n_synth)[:, None] + np.arange(80)[None, :]
        x = stream[idx].astype(np.int32)
        y = stream[np.arange(n_synth) + 80]
        return x, y.astype(np.int32)
    raise KeyError(f"unknown dataset {name}")


def client_shard(x, y, client_id: int, num_clients: int):
    """IID shard for client i."""
    n = len(x)
    per = n // num_clients
    sl = slice(client_id * per, (client_id + 1) * per)
    return x[sl], y[sl]
