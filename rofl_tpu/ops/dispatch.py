"""Backend routing: fused Pallas kernels on TPU, pure-jnp limb ops on CPU.

ROFL_PALLAS env values:
  unset  — auto: Pallas whenever the default backend is not CPU
  "1"    — force Pallas (real TPU lowering)
  "interp" — force Pallas in interpreter mode (CPU conformance tests)
  "0"    — force the jnp path even on TPU
"""

from __future__ import annotations

import os


def use_pallas() -> bool:
    v = os.environ.get("ROFL_PALLAS", "")
    if v == "0":
        return False
    if v in ("1", "interp"):
        return True
    import jax

    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False
