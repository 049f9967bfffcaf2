"""Device profiling: jax.profiler trace capture + named annotations.

The reference's only profiling is the wall-clock gTimer (timer.h:33-42)
plus kd-tree stat counters.  The TPU-native equivalent is an XLA device
trace (xprof): per-op device times, HBM traffic and fusion boundaries.
This module wraps `jax.profiler` so render code and the CLI can capture
traces without importing profiler APIs everywhere:

    with profile_trace("/tmp/trace"):        # or cli --profile DIR
        render_image(scene, opts)

    with annotate("photon_pass"):            # named region in the trace
        ...

Traces are written as <dir>/plugins/profile/... and the vm.trace.json.gz
inside is directly parseable (per-op device times live in the
"[/device:TPU:0]" pid's X events) — the workflow the round-1/2 kernel
optimization used by hand, now a supported surface.
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a device trace for the enclosed block into log_dir."""
    import jax
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation); usable as a
    context manager.  No-op cost when no trace is active."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def save_device_memory_profile(path: str):
    """Snapshot current device memory (pprof format)."""
    import jax
    jax.profiler.save_device_memory_profile(path)
