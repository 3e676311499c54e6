"""Profiling helpers.

The reference's observability is ``jax.named_scope`` annotations on every
public API function (SURVEY.md §5) — this framework does the same (see
:func:`jaxsim_tpu.api.common.named_scope`) and adds a convenience wrapper
around the JAX profiler for capturing device traces of simulation rollouts.
"""

from __future__ import annotations

import contextlib
import pathlib
import time


@contextlib.contextmanager
def trace(log_dir: str | pathlib.Path = "/tmp/jaxsim_tpu_trace"):
    """Capture a JAX profiler trace (view with TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(label: str = "block"):
    """Host-side wall timer printing on exit (remember to block_until_ready
    inside the block — async dispatch otherwise returns immediately)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        print(f"[{label}] {(time.perf_counter() - t0) * 1e3:.2f} ms")
