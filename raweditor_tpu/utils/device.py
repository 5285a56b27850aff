"""JAX backend initialization.

Some PJRT plugin transports (notably the tunneled dev-TPU 'axon'
platform) fail to register if the first backend initialization happens
after worker threads exist in the process. Anything in this framework
that spawns threads (the batch exporter's decode/encode pools) calls
``ensure_backend()`` first, from the main thread.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_initialized = False


def apply_platform_override() -> None:
    """Apply the RAWEDITOR_TPU_PLATFORM backend pin, if set.

    JAX_PLATFORMS as an env var is consumed before some site hooks
    re-pin the platform (the axon sitecustomize does), so this knob is
    applied via jax.config after import, where it always wins. Safe to
    call repeatedly; must run BEFORE anything initializes the backend
    (``ensure_backend`` calls it, but paths that touch the backend
    earlier — e.g. ``jax.distributed.initialize`` bootstrap — must call
    it themselves first)."""
    import os

    import jax

    platform = os.environ.get("RAWEDITOR_TPU_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass  # unknown platform string → default discovery


def ensure_backend() -> None:
    """Idempotently force JAX backend discovery + initialization, and
    enable the persistent compilation cache (first compiles of big
    develop shapes can take minutes on tunneled dev chips; cached
    executables load in seconds). Opt out with
    RAWEDITOR_TPU_NO_COMPILE_CACHE=1 or override the directory with
    RAWEDITOR_TPU_COMPILE_CACHE."""
    global _initialized
    if _initialized:
        return
    with _lock:
        if _initialized:
            return
        import os

        import jax

        # CI smoke and CPU verification drives use
        # RAWEDITOR_TPU_PLATFORM=cpu.
        apply_platform_override()

        if not os.environ.get("RAWEDITOR_TPU_NO_COMPILE_CACHE"):
            cache_dir = os.environ.get(
                "RAWEDITOR_TPU_COMPILE_CACHE",
                os.path.join(
                    os.environ.get("XDG_CACHE_HOME")
                    or os.path.join(os.path.expanduser("~"), ".cache"),
                    "raweditor-tpu", "jax-cache",
                ),
            )
            try:
                os.makedirs(cache_dir, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0
                )
            except Exception:
                pass  # cache is an optimization, never a requirement

        jax.devices()  # triggers plugin discovery and backend init
        _initialized = True
