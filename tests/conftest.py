"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-chip sharding is validated on virtual CPU devices (no pod slice in CI);
the driver separately dry-runs `__graft_entry__.dryrun_multichip`.
"""

import os

# The environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and a
# sitecustomize imports jax at interpreter startup, so the env var alone is
# too late — override the live config as well. Tests run on a virtual
# 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent cache: XLA:CPU AOT entries reload across processes (see
# rofl_tpu/utils/cache.py) — repeated suite runs skip recompiles.
from rofl_tpu.utils.cache import setup_cache  # noqa: E402

setup_cache()
