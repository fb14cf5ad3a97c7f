"""Compilation-cache policy — one place, applied by every entry point.

Two empirically-established facts drive this (round-3 measurements):

  * XLA:CPU persistent-cache entries NEVER reload: the AOT result records
    compile-time tuning pseudo-features (``+prefer-no-scatter``,
    ``+prefer-no-gather``) that host feature detection can't report, so
    ``cpu_aot_loader`` rejects every entry — even on the machine that
    wrote it.  A populated CPU cache is therefore pure overhead (failed
    load + error spam per executable) and was a root cause of the round-2
    MULTICHIP timeout.  → the persistent cache is DISABLED on CPU.
  * TPU (axon) entries DO reload across processes (measured: point_add
    Mosaic kernel 45.6 s cold → 3.7 s warm), so the cache is kept for
    TPU runs, keyed by platform + TPU generation so entries from
    different backends never collide in one directory.

The reference has no analogue (cargo builds are AOT by construction);
this is the TPU-native equivalent of shipping prebuilt kernels.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def cache_dir_for(platform: str) -> str:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    tag = f"{platform}-{gen}" if gen else platform
    return os.path.join(_REPO_ROOT, ".jax_cache", tag)


def setup_cache() -> None:
    """Configure the persistent compilation cache for the current backend.

    Call AFTER the backend choice is final (jax imported, platform set).
    CPU: cache disabled (see module docstring). Other platforms: cache
    under .jax_cache/<platform>[-<gen>]/.
    """
    import jax

    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    if platform == "cpu":
        try:
            jax.config.update("jax_enable_compilation_cache", False)
        except Exception:
            pass
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir_for(platform))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass
