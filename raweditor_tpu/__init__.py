"""raweditor_tpu — a TPU-native headless RAW develop engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
HappySlappyFace/RawEditor (a Rust/wgpu desktop RAW editor): RAW decode,
catalog, non-destructive 10-slider develop pipeline, live histogram,
multi-tier preview cache, and full-resolution export — re-designed for
TPU hardware (fused XLA develop kernels, device-resident mosaics,
sharded batch export over a chip mesh).

Reference parity notes are cited as ``reference: <file>:<lines>`` against
the upstream repo mounted at /root/reference.
"""

from raweditor_tpu.version import __version__
from raweditor_tpu.params import EditParams
from raweditor_tpu.color import (
    XYZ_TO_SRGB,
    cam_to_srgb_matrix,
    is_identity_matrix,
)
from raweditor_tpu.ops.develop import (
    develop,
    develop_linear,
    develop_preview,
    develop_rgba,
    develop_u8,
    develop_u16,
    develop_xtrans,
    histogram_256,
    rgba_view,
)
from raweditor_tpu.raw.types import RawImage

__all__ = [
    "__version__",
    "EditParams",
    "XYZ_TO_SRGB",
    "cam_to_srgb_matrix",
    "is_identity_matrix",
    "develop",
    "develop_linear",
    "develop_preview",
    "develop_rgba",
    "develop_u8",
    "develop_u16",
    "develop_xtrans",
    "histogram_256",
    "rgba_view",
    "RawImage",
]
