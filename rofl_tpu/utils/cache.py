"""Compilation-cache policy — one place, applied by every entry point.

Round-4 measurements (2-core box, jax 0.9 / XLA:CPU thunk runtime):

  * TPU (axon) entries reload across processes (measured round 3:
    point_add Mosaic kernel 45.6 s cold → 3.7 s warm) — cache kept,
    keyed by platform + TPU generation.
  * XLA:CPU AOT entries NOW RELOAD TOO.  ``cpu_aot_loader`` logs an
    error-level complaint about the compile-time tuning pseudo-features
    ``+prefer-no-scatter``/``+prefer-no-gather`` not being host
    features, but proceeds with the load (measured: ``curve.compress``
    26.6 s cold → 5.4 s warm incl. trace time).  Round 3 disabled the
    CPU cache based on the then-observed failed loads; with loads
    succeeding, a pre-warmed cache is the difference between the
    multichip dryrun finishing in minutes vs tens of minutes on a small
    host.  → the persistent cache is ENABLED on every platform.

The reference has no analogue (cargo builds are AOT by construction);
this is the TPU-native equivalent of shipping prebuilt kernels.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def cache_dir_for(platform: str) -> str:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    tag = f"{platform}-{gen}" if gen and platform != "cpu" else platform
    return os.path.join(_REPO_ROOT, ".jax_cache", tag)


def setup_cache() -> None:
    """Configure the persistent compilation cache for the current backend.

    Call AFTER the backend choice is final (jax imported, platform set).
    """
    import jax

    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir_for(platform))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass
