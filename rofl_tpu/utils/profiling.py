"""Device-level tracing — the TPU counterpart of the reference's manual
wall-clock phase logging (rofl_service logs.rs:42-108 `TimeState`, which
fl/logs.py reproduces format-compatibly). This adds what the reference
never had: XLA/TPU traces viewable in TensorBoard/Perfetto.

Enable by setting ROFL_TRACE_DIR (any bench/e2e process) or by passing
--trace to rofl_tpu.bench_suite. Traces capture kernel launches, HBM
transfers and host callbacks for every jitted crypto kernel.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def device_trace(logdir: str | None = None):
    """Context manager: jax.profiler.trace into `logdir` (or ROFL_TRACE_DIR);
    no-op when neither is set, so hot paths can wrap unconditionally."""
    logdir = logdir or os.environ.get("ROFL_TRACE_DIR", "")
    if not logdir:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """jax.profiler.TraceAnnotation for labeling protocol phases inside a
    trace (prove/verify/accumulate/extract)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
