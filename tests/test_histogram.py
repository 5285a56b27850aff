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
