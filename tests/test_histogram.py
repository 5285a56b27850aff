import numpy as np

from raweditor_tpu.params import EditParams
from raweditor_tpu.ops.develop import develop_histogram, develop_preview, histogram_256
from raweditor_tpu.ops.sampling import histogram_shape, preview_shape

import oracle

IDENTITY = np.eye(3, dtype=np.float32)
WB = np.ones(3, dtype=np.float32)


def test_histogram_counts(rng):
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    got = np.asarray(histogram_256(img))
    want = oracle.histogram_256(img)
    assert got.shape == (3, 256)
    assert (got == want).all()
    assert got.sum(axis=1).tolist() == [17 * 23] * 3


def test_develop_histogram_matches_preview_binning(rng):
    mosaic = rng.integers(0, 4096, size=(48, 64), dtype=np.uint16)
    params = EditParams(exposure=0.3)
    ow, oh = histogram_shape(64, 48, width=16)
    img = develop_preview(mosaic, params, WB, IDENTITY, out_w=ow, out_h=oh)
    want = oracle.histogram_256(np.asarray(img))
    got = np.asarray(develop_histogram(mosaic, params, WB, IDENTITY,
                                       out_w=ow, out_h=oh))
    assert (got == want).all()


def test_preview_and_histogram_shapes():
    # reference: gpu/pipeline.rs:125-133 — width-capped, truncated height.
    assert preview_shape(6016, 4016) == (1280, 854)
    assert preview_shape(800, 600) == (800, 600)
    assert histogram_shape(6016, 4016) == (128, 85)


def test_xtrans_histogram_fused_matches_two_step(rng):
    """develop_xtrans_histogram (one jit program) == separate render +
    bin (VERDICT r1 item 9: all three sensor types now fuse)."""
    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
    from raweditor_tpu.ops.develop import (develop_xtrans_histogram,
                                           develop_xtrans_preview,
                                           histogram_256)
    from raweditor_tpu.params import EditParams

    mosaic = rng.integers(0, 4096, size=(36, 48), dtype=np.uint16)
    wb = np.array([1.8, 1.0, 1.4], np.float32)
    cm = np.eye(3, dtype=np.float32)
    p = EditParams(exposure=0.4, saturation=15.0)
    fused = develop_xtrans_histogram(
        mosaic, p, wb, cm, out_w=16, out_h=12, pattern=XTRANS_PATTERN)
    img = develop_xtrans_preview(
        mosaic, p, wb, cm, out_w=16, out_h=12, pattern=XTRANS_PATTERN)
    np.testing.assert_array_equal(np.asarray(fused),
                                  np.asarray(histogram_256(img)))
    assert np.asarray(fused).sum() == 3 * 16 * 12


def test_linear_histogram_fused_matches_two_step(rng):
    from raweditor_tpu.ops.develop import (develop_linear_histogram,
                                           develop_linear_preview,
                                           histogram_256)
    from raweditor_tpu.params import EditParams

    rgb = rng.integers(0, 4096, size=(30, 40, 3), dtype=np.uint16)
    wb = np.ones(3, np.float32)
    cm = np.eye(3, dtype=np.float32)
    p = EditParams(contrast=10.0)
    fused = develop_linear_histogram(rgb, p, wb, cm, out_w=16, out_h=12)
    img = develop_linear_preview(rgb, p, wb, cm, out_w=16, out_h=12)
    np.testing.assert_array_equal(np.asarray(fused),
                                  np.asarray(histogram_256(img)))


def test_engine_histogram_xtrans_and_linear(tmp_path, rng):
    """The engine's histogram() path works for all three sensor types
    and sums to the render size."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.raw.synth import (write_synthetic_linear_dng,
                                         write_synthetic_raw)

    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN

    m = rng.integers(0, 4096, size=(36, 48), dtype=np.uint16)
    path = tmp_path / "x.dng"
    write_synthetic_raw(path, m, cfa=XTRANS_PATTERN)
    eng = DevelopEngine.open(path)
    hist = eng.histogram(EditParams())
    assert hist.shape == (3, 256)
    assert hist.sum() == 3 * eng.histogram_w * eng.histogram_h

    rgb = rng.integers(0, 65535, size=(24, 32, 3), dtype=np.uint16)
    lpath = tmp_path / "l.dng"
    write_synthetic_linear_dng(lpath, rgb)
    eng = DevelopEngine.open(lpath)
    hist = eng.histogram(EditParams())
    assert hist.shape == (3, 256)
    assert hist.sum() == 3 * eng.histogram_w * eng.histogram_h
