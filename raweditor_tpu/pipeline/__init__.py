"""Host orchestration: develop sessions, tier caches, batch export."""

from raweditor_tpu.pipeline.engine import DevelopEngine
from raweditor_tpu.pipeline.export import ExportJob, ExportReport, run_batch_export
from raweditor_tpu.pipeline.tiers import generate_tiers, process_pending_cache

__all__ = [
    "DevelopEngine",
    "ExportJob",
    "ExportReport",
    "run_batch_export",
    "generate_tiers",
    "process_pending_cache",
]
