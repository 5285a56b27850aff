"""Device profiling helpers (jax.profiler wrappers).

Usage:
    with device_trace("/tmp/raweditor-trace"):
        engine.preview(params)
Then open the trace in TensorBoard / Perfetto. SURVEY.md §5 lists this
as a rebuild requirement (the reference has no profiling at all).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def device_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: wrap a function in a named profiler span."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            import jax

            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco
