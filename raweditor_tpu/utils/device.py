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


def ensure_backend() -> None:
    """Idempotently force JAX backend discovery + initialization."""
    global _initialized
    if _initialized:
        return
    with _lock:
        if _initialized:
            return
        import jax

        jax.devices()  # triggers plugin discovery and backend init
        _initialized = True
