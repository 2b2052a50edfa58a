"""Device profiling: one-line access to XLA/TPU traces.

The reference has no profiler at all (SURVEY §5).  Usage:

    with trace_to("/tmp/dudf-trace"):
        state, logs = chunk_fn(state, sampler, epochs)
        jax.block_until_ready(state.params)

then open the trace in TensorBoard (Profile plugin) or xprof.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def trace_to(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
