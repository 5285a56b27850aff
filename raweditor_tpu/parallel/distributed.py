"""Multi-host bootstrap for batch export on real pod slices.

The reference is a single-process desktop app (SURVEY.md §2 — no
distributed layer of any kind); this module is the TPU-native
multi-host analogue for the one workload that scales past a host:
batch export (BASELINE "1,000 NEFs across chips" config).

Design: per-image develop is embarrassingly parallel, so multi-host
export does NOT build one global mesh or global arrays. Instead:

1. ``init_distributed()`` wires the JAX coordination service
   (``jax.distributed.initialize``) so every process sees the slice
   topology (required on multi-host TPU pods before using devices).
2. ``partition_jobs()`` deals the job list round-robin by process id
   (round-robin, not contiguous chunks, so same-shape bursts spread
   across hosts and every host's shape buckets stay warm).
3. Each process runs the ordinary ``run_batch_export`` over a mesh of
   its OWN addressable devices (``local_export_mesh``). All
   collectives (row-halo ppermute, histogram psum) stay inside the
   host's chips — ICI only; nothing crosses DCN, matching
   ``host_batch_row_mesh``'s documented layout contract without
   needing cross-host arrays at all.

This is exercised for real by tests/test_distributed.py: two actual
OS processes, a localhost coordinator, 4 virtual CPU devices each,
byte-identical outputs vs the single-process run.
"""

from __future__ import annotations

from typing import Optional, Sequence

_initialized = None  # (coordinator, n_proc, proc_id, device_ids) once set


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int,
                     local_device_ids: Optional[Sequence[int]] = None):
    """Idempotent ``jax.distributed.initialize`` wrapper.

    ``coordinator`` is ``host:port`` of process 0. Must run before any
    other JAX use in the process (JAX rejects late initialization).
    Re-calling with the SAME topology is a no-op; a different topology
    raises (a silent no-op would partition work against a stale
    world). Returns (process_index, process_count) as JAX reports
    them.
    """
    global _initialized
    import jax

    from raweditor_tpu.utils.device import (
        apply_platform_override,
        ensure_backend,
    )

    if num_processes <= 0:
        raise ValueError(f"num_processes must be positive: {num_processes}")
    if not 0 <= process_id < num_processes:
        raise ValueError(
            f"process_id {process_id} out of range for "
            f"{num_processes} processes")
    topology = (coordinator, num_processes, process_id,
                tuple(local_device_ids) if local_device_ids is not None
                else None)
    if _initialized is not None and _initialized != topology:
        raise RuntimeError(
            f"jax.distributed already initialized with {_initialized}; "
            f"cannot re-initialize with {topology}")
    if _initialized is None:
        # jax.process_index() below initializes the backend, so the
        # RAWEDITOR_TPU_PLATFORM pin must land first — otherwise a
        # CPU-pinned multi-host run silently initializes on the real
        # accelerator platform.
        apply_platform_override()
        if num_processes > 1 or local_device_ids is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids,
            )
        _initialized = topology
    ensure_backend()
    return jax.process_index(), jax.process_count()


def partition_jobs(jobs: Sequence, process_id: int,
                   num_processes: int) -> list:
    """This process's share of the export list: round-robin by index
    (keeps shape buckets balanced when folders group by camera)."""
    if not 0 <= process_id < num_processes:
        raise ValueError(
            f"process_id {process_id} out of range for "
            f"{num_processes} processes")
    return list(jobs[process_id::num_processes])


def local_export_mesh(row: int = 1):
    """A ('batch', 'row') mesh over THIS process's addressable devices
    — the per-host mesh of the multi-host export design (module
    docstring). Falls back to mesh=None (plain vmap path) when the
    host has a single chip and no row sharding is requested."""
    import jax

    from raweditor_tpu.parallel.mesh import batch_row_mesh

    local = jax.local_devices()
    if len(local) == 1 and row <= 1:
        return None
    return batch_row_mesh(row=row, devices=local)
