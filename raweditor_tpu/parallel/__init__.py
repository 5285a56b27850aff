"""Multi-chip execution: device meshes, sharded batch develop, spatial
(row-block) sharding of a single mosaic with halo exchange.

The reference is a single-process, single-GPU app with no distributed
layer (SURVEY.md §2); these are the TPU-native first-class equivalents:
data-parallel batch export across a slice, and context-parallel-style
row sharding of one mosaic for lowest-latency single-image develop.
"""

from raweditor_tpu.parallel.mesh import (
    make_mesh,
    batch_row_mesh,
    host_batch_row_mesh,
)
from raweditor_tpu.parallel.batch import (
    pack_params,
    batch_develop,
    batch_develop_sharded,
)
from raweditor_tpu.parallel.spatial import spatial_develop
from raweditor_tpu.parallel.distributed import (
    init_distributed,
    local_export_mesh,
    partition_jobs,
)

__all__ = [
    "make_mesh",
    "batch_row_mesh",
    "host_batch_row_mesh",
    "init_distributed",
    "local_export_mesh",
    "partition_jobs",
    "pack_params",
    "batch_develop",
    "batch_develop_sharded",
    "spatial_develop",
]
