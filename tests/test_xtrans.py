"""X-Trans (6x6 CFA) support — a capability beyond the Bayer-only
reference."""

import numpy as np
import pytest

from raweditor_tpu.ops.cfa_generic import (
    XTRANS_PATTERN,
    demosaic_xtrans,
    is_xtrans,
    nearest_offsets,
)
from raweditor_tpu.params import EditParams
from raweditor_tpu.pipeline.engine import DevelopEngine
from raweditor_tpu.raw.decode import decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw


def _mosaic_xtrans(r, g, b):
    """Mosaic channel planes through the X-Trans grid."""
    h, w = r.shape
    grid = np.array([{"R": 0, "G": 1, "B": 2}[c] for c in XTRANS_PATTERN]
                    ).reshape(6, 6)
    sites = grid[np.arange(h)[:, None] % 6, np.arange(w)[None, :] % 6]
    return np.where(sites == 0, r, np.where(sites == 1, g, b)).astype(
        np.uint16
    )


def test_pattern_sanity():
    assert len(XTRANS_PATTERN) == 36
    assert is_xtrans(XTRANS_PATTERN)
    assert not is_xtrans("RGGB")
    # Real X-Trans: 20 green, 8 red, 8 blue sites.
    assert XTRANS_PATTERN.count("G") == 20
    assert XTRANS_PATTERN.count("R") == 8
    assert XTRANS_PATTERN.count("B") == 8


def test_nearest_offsets_complete():
    table = nearest_offsets(XTRANS_PATTERN, 6, 6)
    assert len(table) == 36 * 3
    # A site of channel c maps to offset (0, 0) for its own channel.
    grid = np.array([{"R": 0, "G": 1, "B": 2}[c] for c in XTRANS_PATTERN]
                    ).reshape(6, 6)
    for py in range(6):
        for px in range(6):
            assert table[(py, px, grid[py, px])] == (0, 0)


def test_constant_field_uniform(rng):
    """Constant per-channel planes must reconstruct exactly in the
    interior (edge clamping may cross channel sites — a 2-pixel border
    effect inherent to clamp padding on a 6×6 pattern)."""
    h, w = 18, 24
    r = np.full((h, w), 1000)
    g = np.full((h, w), 2000)
    b = np.full((h, w), 3000)
    mosaic = _mosaic_xtrans(r, g, b).astype(np.float32)
    rr, gg, bb = demosaic_xtrans(mosaic)
    inner = (slice(2, -2), slice(2, -2))
    assert (np.asarray(rr)[inner] == 1000).all()
    assert (np.asarray(gg)[inner] == 2000).all()
    assert (np.asarray(bb)[inner] == 3000).all()


def test_engine_end_to_end_xtrans(tmp_path, rng):
    h, w = 24, 36
    r = rng.integers(0, 4096, size=(h, w))
    g = rng.integers(0, 4096, size=(h, w))
    b = rng.integers(0, 4096, size=(h, w))
    mosaic = _mosaic_xtrans(r, g, b)
    path = tmp_path / "xtrans.dng"
    write_synthetic_raw(path, mosaic, cfa=XTRANS_PATTERN)
    raw = decode_raw(path)
    assert raw.cfa_pattern == XTRANS_PATTERN

    eng = DevelopEngine.open(path, mode="accurate")
    assert eng.xtrans_pattern == XTRANS_PATTERN
    full = eng.full(EditParams())
    assert full.shape == (h, w, 3)
    prev = eng.preview(EditParams(exposure=0.5))
    assert prev.shape == (eng.preview_h, eng.preview_w, 3)
    hist = eng.histogram(EditParams())
    assert hist.shape == (3, 256)
    out = eng.export(tmp_path / "x.jpg", EditParams())
    import os

    assert os.path.exists(out)


def test_parity_mode_ignores_xtrans(tmp_path, rng):
    """Parity mode replicates the reference, which would run its Bayer
    stencil regardless — so no xtrans routing."""
    mosaic = rng.integers(0, 4096, size=(12, 12), dtype=np.uint16)
    write_synthetic_raw(tmp_path / "x.dng", mosaic, cfa=XTRANS_PATTERN)
    eng = DevelopEngine.open(tmp_path / "x.dng", mode="parity")
    assert eng.xtrans_pattern is None
