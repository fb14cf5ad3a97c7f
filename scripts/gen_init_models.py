#!/usr/bin/env python
"""Generate initial global-model weight files (one float per line) —
counterparts of the reference's models/*.txt (loaded by params.rs:984-997).

Intrinsic-dimension files are all-zeros like the reference's (the intrinsic
offset z starts at 0; theta = theta0 + P z), full-model files are real
flax initializations flattened.

Usage: python scripts/gen_init_models.py [--out models]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def write_vec(path: str, vec):
    with open(path, "w") as f:
        for v in vec:
            f.write(f"{float(v)}\n")
    print(f"wrote {path} ({len(vec)} params)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="models")
    ap.add_argument("--full", action="store_true",
                    help="also generate full-model (non-intrinsic) inits")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import numpy as np

    # intrinsic files: zeros (training starts at theta0, z=0)
    for name, d in [
        ("mnist_dev_intrinsic_5k.txt", 5000),
        ("cifar_lenet5_intrinsic_12k.txt", 12000),
        ("resnet18_intrinsic_25k.txt", 25000),
        ("resnet18_intrinsic_40k.txt", 40000),
        ("resnet18_intrinsic_45k.txt", 45000),
        ("resnet18_intrinsic_50k.txt", 50000),
        ("resnet18_intrinsic_55k.txt", 55000),
    ]:
        write_vec(os.path.join(args.out, name), np.zeros(d, np.float32))

    if args.full:
        import jax
        import jax.numpy as jnp
        from jax.flatten_util import ravel_pytree

        from rofl_tpu.models.networks import build_model

        for name, fname in [("mnist_dev", "mnist_dev_initialized.txt"),
                            ("cifar_lenet5", "cifar_lenet5_initialized.txt")]:
            module, in_shape = build_model(name)
            params = module.init(jax.random.PRNGKey(0), jnp.zeros(in_shape))
            flat, _ = ravel_pytree(params)
            write_vec(os.path.join(args.out, fname), np.asarray(flat))


if __name__ == "__main__":
    main()
