"""DNG LinearRaw (photometric 34892): already-demosaiced RGB sources."""

import numpy as np
import pytest
from PIL import Image

from raweditor_tpu.params import EditParams
from raweditor_tpu.pipeline.engine import DevelopEngine
from raweditor_tpu.raw.decode import decode_raw
from raweditor_tpu.raw.synth import write_synthetic_linear_dng


def _expected_gamma(rgb):
    v = rgb.astype(np.float32) / np.float32(4096.0)
    enc = np.minimum(
        np.maximum(v, np.float32(0)) ** np.float32(1 / 2.2), np.float32(1)
    )
    return np.floor(enc * np.float32(255) + np.float32(0.5)).astype(np.uint8)


@pytest.mark.parametrize("compression", ["none", "ljpeg"])
def test_round_trip(tmp_path, rng, compression):
    rgb = rng.integers(0, 65536, size=(14, 18, 3), dtype=np.uint16)
    path = tmp_path / "lin.dng"
    write_synthetic_linear_dng(path, rgb, compression=compression)
    raw = decode_raw(path)
    assert raw.is_linear
    assert (raw.mosaic == rgb).all()


def test_engine_linear_paths(tmp_path, rng):
    rgb = rng.integers(0, 4096, size=(40, 60, 3), dtype=np.uint16)
    path = tmp_path / "lin.dng"
    write_synthetic_linear_dng(path, rgb, bpp=12,
                               wb_neutral=(1.0, 1.0, 1.0))
    eng = DevelopEngine.open(path)
    assert eng.linear

    # Identity params: develop == gamma(normalized rgb) — no demosaic
    # artifacts possible. Compute the expectation in f32 end-to-end
    # (f64 normalization flips rounding-boundary pixels by 1 LSB).
    full = eng.full(EditParams())
    expect = _expected_gamma(rgb)
    # numpy's pow differs from XLA's by ~1 ulp, which flips pixels that
    # land exactly on quantization boundaries — same ≤1 LSB budget as
    # the oracle parity suite.
    diff = np.abs(full.astype(int) - expect.astype(int))
    assert diff.max() <= 1 and (diff == 0).mean() > 0.99

    prev = eng.preview(EditParams(exposure=0.5))
    assert prev.shape == (eng.preview_h, eng.preview_w, 3)
    hist = eng.histogram(EditParams())
    assert hist.shape == (3, 256)
    out = eng.export(tmp_path / "lin.jpg", EditParams())
    with Image.open(out) as im:
        assert im.size == (60, 40)


def test_batch_export_linear(tmp_path, rng):
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    rgb = rng.integers(0, 4096, size=(16, 24, 3), dtype=np.uint16)
    lin = tmp_path / "lin.dng"
    write_synthetic_linear_dng(lin, rgb, bpp=12,
                               wb_neutral=(1.0, 1.0, 1.0))
    bayer = tmp_path / "b.dng"
    write_synthetic_raw(
        bayer, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
    )
    jobs = [
        ExportJob(raw_path=str(lin),
                  out_path=str(tmp_path / "out" / "lin.png")),
        ExportJob(raw_path=str(bayer),
                  out_path=str(tmp_path / "out" / "b.png")),
    ]
    report = run_batch_export(jobs, batch_size=2)
    assert report.succeeded == 2 and not report.failed
    with Image.open(tmp_path / "out" / "lin.png") as im:
        got = np.asarray(im.convert("RGB"))
    diff = np.abs(got.astype(int) - _expected_gamma(rgb).astype(int))
    assert diff.max() <= 1 and (diff == 0).mean() > 0.99
