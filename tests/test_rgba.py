"""Packed-RGBA output path: must carry exactly the same bytes as the
channel-last u8 path."""

import numpy as np
import pytest

from raweditor_tpu.params import EditParams
from raweditor_tpu.ops.develop import develop, develop_rgba, rgba_view

IDENTITY = np.eye(3, dtype=np.float32)
WB = np.array([2.0, 1.0, 1.4], dtype=np.float32)


def test_rgba_matches_hwc(rng):
    mosaic = rng.integers(0, 4096, size=(24, 32), dtype=np.uint16)
    p = EditParams(exposure=0.7, saturation=30.0, contrast=-5.0)
    hwc = np.asarray(develop(mosaic, p, WB, IDENTITY))
    words = np.asarray(develop_rgba(mosaic, p, WB, IDENTITY))
    assert words.dtype == np.uint32
    view = rgba_view(words)
    assert view.shape == (24, 32, 4)
    assert (view[..., :3] == hwc).all()
    assert (view[..., 3] == 255).all()


def test_batch_rgba_matches_hwc(rng):
    from raweditor_tpu.parallel.batch import (
        batch_develop,
        batch_develop_rgba,
        pack_params,
    )

    n = 3
    mosaics = rng.integers(0, 4096, size=(n, 16, 24), dtype=np.uint16)
    params = pack_params([EditParams(exposure=0.2 * i) for i in range(n)])
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))
    hwc = np.asarray(batch_develop(mosaics, params, wbs, cms))
    words = np.asarray(batch_develop_rgba(mosaics, params, wbs, cms))
    assert (rgba_view(words)[..., :3] == hwc).all()


@pytest.mark.parametrize("with_histogram", [False, True])
def test_sharded_rgba(rng, with_histogram):
    from raweditor_tpu.parallel import batch_row_mesh, pack_params
    from raweditor_tpu.parallel.batch import (
        batch_develop_sharded,
        batch_sharding,
    )
    from raweditor_tpu.ops.develop import histogram_256
    import jax

    mesh = batch_row_mesh(row=2)
    n = 4
    mosaics = rng.integers(0, 4096, size=(n, 32, 24), dtype=np.uint16)
    params = pack_params([EditParams(exposure=0.1 * i) for i in range(n)])
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))
    staged = jax.device_put(mosaics, batch_sharding(mesh))
    out = batch_develop_sharded(staged, params, wbs, cms, mesh,
                                rgba=True, with_histogram=with_histogram)
    words = np.asarray(out[0] if with_histogram else out)
    for i in range(n):
        want = np.asarray(
            develop(mosaics[i], EditParams(exposure=0.1 * i), WB, IDENTITY)
        )
        assert (rgba_view(words[i])[..., :3] == want).all()
    if with_histogram:
        hists = np.asarray(out[1])
        want_h = np.asarray(histogram_256(rgba_view(words[0])[..., :3]))
        assert (hists[0] == want_h).all()


def test_engine_export_rgba_path_bit_exact(tmp_path, rng):
    from PIL import Image

    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.raw.synth import write_synthetic_raw

    mosaic = rng.integers(0, 4096, size=(20, 28), dtype=np.uint16)
    write_synthetic_raw(tmp_path / "a.nef", mosaic)
    eng = DevelopEngine.open(tmp_path / "a.nef")
    p = EditParams(exposure=0.5)
    out = eng.export(tmp_path / "out.png", p)
    with Image.open(out) as im:
        got = np.asarray(im.convert("RGB"))
    want = eng.full(p)
    assert (got == want).all()
