"""Engine, tier-cache, and batch-export pipeline tests."""

import os

import numpy as np
import pytest
from PIL import Image

from raweditor_tpu.catalog import Library
from raweditor_tpu.params import EditParams
from raweditor_tpu.ops.develop import develop
from raweditor_tpu.pipeline import (
    DevelopEngine,
    ExportJob,
    generate_tiers,
    process_pending_cache,
    run_batch_export,
)
from raweditor_tpu.pipeline.export import jobs_from_catalog
from raweditor_tpu.raw.synth import make_preview_jpeg, write_synthetic_raw

import oracle


@pytest.fixture
def synth_file(tmp_path, rng):
    mosaic = rng.integers(0, 4096, size=(40, 60), dtype=np.uint16)
    path = tmp_path / "shot.nef"
    write_synthetic_raw(path, mosaic, preview_jpeg=make_preview_jpeg(640, 420))
    return path, mosaic


# --- engine ----------------------------------------------------------------


def test_engine_preview_full_histogram(synth_file):
    path, mosaic = synth_file
    eng = DevelopEngine.open(path)
    assert (eng.preview_w, eng.preview_h) == (60, 40)  # smaller than cap
    p = EditParams(exposure=0.5)
    full = eng.full(p)
    assert full.shape == (40, 60, 3) and full.dtype == np.uint8
    want = np.asarray(develop(mosaic, p, eng.wb, eng.cam_matrix))
    assert (full == want).all()
    hist = eng.histogram(p)
    assert hist.shape == (3, 256)
    assert hist.sum(axis=1).tolist() == [eng.histogram_w * eng.histogram_h] * 3


def test_engine_aot_preview_matches_jit_path(synth_file):
    """compile_preview()'s AOT executables must be bit-identical to
    the jit-cached path across sliders and zoom/pan, and the true-sync
    preview_tick returns the same frame (VERDICT r2 item 3: the
    interactive path carries the AOT discipline, not just bench.py)."""
    path, _ = synth_file
    eng = DevelopEngine.open(path)
    p = EditParams(exposure=0.4, contrast=2.0, vibrance=0.3)
    base_prev = eng.preview(p, zoom=1.5, pan=(0.1, -0.05))
    base_hist = eng.histogram(p, zoom=1.5, pan=(0.1, -0.05))
    assert eng._aot_preview is None  # nothing compiled yet
    eng.compile_preview()
    assert eng._aot_preview is not None
    aot_prev = eng.preview(p, zoom=1.5, pan=(0.1, -0.05))
    aot_hist = eng.histogram(p, zoom=1.5, pan=(0.1, -0.05))
    np.testing.assert_array_equal(aot_prev, base_prev)
    np.testing.assert_array_equal(aot_hist, base_hist)
    tick = np.asarray(eng.preview_tick(p, zoom=1.5, pan=(0.1, -0.05)))
    np.testing.assert_array_equal(tick, base_prev)
    # int zoom / default params exercise the arg coercion
    np.testing.assert_array_equal(
        np.asarray(eng.preview_tick(EditParams(), zoom=1)),
        eng.preview(EditParams()))
    # integer-valued params are legal for the jit path and must not
    # aval-mismatch the AOT executables
    np.testing.assert_array_equal(
        eng.preview(EditParams(exposure=1)),
        eng.preview(EditParams(exposure=1.0)))
    eng.histogram(EditParams(exposure=1))


def test_engine_parity_uses_identity_matrix(synth_file):
    path, _ = synth_file
    eng = DevelopEngine.open(path, mode="parity")
    assert np.allclose(eng.cam_matrix, np.eye(3))
    assert eng.white_level == 4096.0


def test_engine_accurate_mode(tmp_path, rng):
    mosaic = rng.integers(10, 16000, size=(16, 24), dtype=np.uint16)
    xyz_to_cam = np.array(
        [[0.6988, -0.1384, -0.0714], [-0.5631, 1.3410, 0.2447],
         [-0.1485, 0.2204, 0.7318]], dtype=np.float32)
    path = tmp_path / "a.dng"
    write_synthetic_raw(path, mosaic, bpp=14, xyz_to_cam=xyz_to_cam,
                        black_level=8, white_level=16000)
    eng = DevelopEngine.open(path, mode="accurate")
    assert eng.white_level == 16000 and eng.black_level == 8
    assert not np.allclose(eng.cam_matrix, np.eye(3))
    assert not eng.matrix_transpose
    out = eng.full(EditParams())
    assert out.shape == (16, 24, 3)


def test_engine_export_jpeg_png(synth_file, tmp_path):
    path, _ = synth_file
    eng = DevelopEngine.open(path)
    for name in ("out.jpg", "out.png"):
        out = eng.export(tmp_path / name, EditParams(exposure=1.0))
        with Image.open(out) as im:
            assert im.size == (60, 40)


def test_engine_jpeg_native_path_close_to_pil(synth_file, tmp_path):
    """Single-image JPEG export rides the device-YCbCr + native
    encoder path when available; pixels must stay close to the PIL
    RGBA route (PNG of the same develop is the lossless reference)."""
    import pytest

    from raweditor_tpu.native import get_rawkit

    if get_rawkit() is None or not hasattr(get_rawkit(),
                                           "encode_jpeg_420"):
        pytest.skip("native JPEG encoder not built")
    # Smooth scene: 4:2:0 chroma subsampling (which BOTH JPEG routes
    # apply) is only comparable to the lossless PNG there — the noise
    # fixture's per-pixel checkerboard has no stable chroma to keep.
    h, w = 40, 60
    yy, xx = np.mgrid[0:h, 0:w]
    mosaic = ((xx + yy) / (w + h) * 4095).astype(np.uint16)
    path = tmp_path / "smooth.dng"
    write_synthetic_raw(path, mosaic)
    eng = DevelopEngine.open(path)
    p = EditParams(exposure=0.4)
    jpg = eng.export(tmp_path / "n.jpg", p, quality=92)
    png = eng.export(tmp_path / "n.png", p)
    a = np.asarray(Image.open(jpg).convert("RGB"), np.float64)
    b = np.asarray(Image.open(png).convert("RGB"), np.float64)
    assert float(np.sqrt(np.mean((a - b) ** 2))) < 6.0


def test_engine_before_after(synth_file):
    path, _ = synth_file
    eng = DevelopEngine.open(path)
    before, after = eng.before_after(EditParams(exposure=2.0))
    assert (before != after).any()
    base = eng.preview(EditParams())
    assert (before == base).all()


# --- tiers -----------------------------------------------------------------


def test_export_carries_exif_metadata(tmp_path, rng):
    """Exports carry camera Make/Model + the Orientation tag so
    viewers rotate (the reference writes no metadata at all,
    main.rs:1765-1791); auto_orient bakes the rotation and writes
    orientation 1 instead. Covers the PIL JPEG/PNG paths, the native
    planes JPEG path, the 16-bit TIFF tags, and the batch exporter."""
    mosaic = rng.integers(0, 4096, size=(40, 60), dtype=np.uint16)
    path = tmp_path / "rot.nef"
    write_synthetic_raw(path, mosaic, make="NIKON CORPORATION",
                        model="NIKON D3300", orientation=6)
    eng = DevelopEngine.open(path)
    p = EditParams(exposure=0.2)
    for name in ("a.jpg", "a.png"):
        out = tmp_path / name
        eng.export(out, p)
        with Image.open(out) as im:
            ex = im.getexif()
            assert ex[271] == "NIKON CORPORATION"
            assert ex[272] == "NIKON D3300"
            assert ex[274] == 6
    # auto_orient: pixels rotated -> orientation tag 1
    eng_rot = DevelopEngine.open(path, auto_orient=True)
    out = tmp_path / "rot.jpg"
    eng_rot.export(out, p)
    with Image.open(out) as im:
        assert im.getexif()[274] == 1
        assert im.size == (40, 60)  # 90° rotation swapped the axes
    # 16-bit TIFF tags (via our own walker)
    from raweditor_tpu.raw import tiff as T

    eng.export(tmp_path / "a.tif", p)
    tf = T.TiffFile((tmp_path / "a.tif").read_bytes())
    ifd = next(iter(tf.all_ifds()))
    assert ifd.get(T.MAKE) == "NIKON CORPORATION"
    assert ifd.get_scalar(T.ORIENTATION) == 6
    # batch exporter (PIL path; the planes path shares the splice
    # helper and is covered when the native encoder is present)
    rep = run_batch_export(
        [ExportJob(str(path), str(tmp_path / "b.jpg")),
         ExportJob(str(path), str(tmp_path / "b.png"))])
    assert rep.succeeded == 2, rep.as_dict()
    for name in ("b.jpg", "b.png"):
        with Image.open(tmp_path / name) as im:
            ex = im.getexif()
            assert ex[272] == "NIKON D3300" and ex[274] == 6


def test_generate_tiers(synth_file, tmp_path):
    path, _ = synth_file
    thumb, instant, working = generate_tiers(str(path), 7,
                                             cache_dir=tmp_path / "cache")
    for p, w in [(thumb, 256), (instant, 384), (working, 1280)]:
        assert os.path.exists(p)
        with Image.open(p) as im:
            assert im.width == w
    assert thumb.endswith(os.path.join("thumb", "7.jpg"))


def test_process_pending_cache_with_quarantine(tmp_path, rng):
    d = tmp_path / "photos"
    d.mkdir()
    mosaic = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
    write_synthetic_raw(d / "good.nef", mosaic)
    (d / "bad.nef").write_bytes(b"not a raw file at all")

    lib = Library(tmp_path / "cat.db")
    lib.import_folder(d)
    stats = process_pending_cache(lib, cache_dir=tmp_path / "cache")
    assert stats == {"cached": 1, "failed": 1}
    assert lib.get_pending_cache() == []
    good = [i for i in lib.get_all_images() if i.filename == "good.nef"][0]
    assert good.cache_path_working is not None


# --- batch export ----------------------------------------------------------


def test_batch_export_end_to_end(tmp_path, rng):
    n = 5
    jobs = []
    mosaics = {}
    for i in range(n):
        mosaic = rng.integers(0, 4096, size=(24, 32), dtype=np.uint16)
        path = tmp_path / f"s{i}.nef"
        write_synthetic_raw(path, mosaic)
        mosaics[i] = mosaic
        jobs.append(
            ExportJob(
                raw_path=str(path),
                out_path=str(tmp_path / "out" / f"s{i}.png"),
                params=EditParams(exposure=0.1 * i),
            )
        )
    jobs.append(
        ExportJob(raw_path=str(tmp_path / "missing.nef"),
                  out_path=str(tmp_path / "out" / "missing.png"))
    )

    report = run_batch_export(jobs, batch_size=2)
    assert report.total == 6
    assert report.succeeded == 5
    assert len(report.failed) == 1 and "decode" in report.failed[0][1]

    # PNG outputs must be bit-exact vs the single-image develop (PNG
    # keeps the alpha plane, like the reference's Rgba8 PNG export,
    # reference: main.rs:1765-1771).
    for i in range(n):
        with Image.open(tmp_path / "out" / f"s{i}.png") as im:
            got = np.asarray(im.convert("RGB"))
        from raweditor_tpu.raw.decode import decode_raw

        raw = decode_raw(str(tmp_path / f"s{i}.nef"))
        want = np.asarray(
            develop(mosaics[i], EditParams(exposure=0.1 * i), raw.wb_rgb(),
                    np.eye(3, dtype=np.float32))
        )
        assert (got == want).all()


def test_jpeg_planes_path_matches_pil_path(tmp_path, rng):
    """All-JPEG exports take the device YCbCr 4:2:0 + native encoder
    path (1.5 B/px fetched instead of 4); pixels must stay close to
    the PIL RGBA path (both are 8-bit JPEG pipelines — bitstreams
    differ, images must not)."""
    import pytest

    from raweditor_tpu.native import get_rawkit

    rk = get_rawkit()
    if rk is None or not hasattr(rk, "encode_jpeg_420"):
        pytest.skip("native JPEG encoder not built")
    # Smooth scene, even dims (the planes-path requirement).
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    mosaic = ((xx + yy) / (w + h) * 4095).astype(np.uint16)
    path = tmp_path / "s.nef"
    write_synthetic_raw(path, mosaic)

    def job(name):
        return [ExportJob(raw_path=str(path), out_path=str(tmp_path / name),
                          params=EditParams(exposure=0.2))]

    rep = run_batch_export(job("planes.jpg"), batch_size=1, quality=92)
    assert rep.succeeded == 1
    # Planes path fetches 1.5 B/px (Y + Cb/4 + Cr/4).
    assert rep.fetch_bytes == h * w + 2 * (h // 2) * (w // 2)
    # Force the PIL path by exporting PNG alongside (mixed run).
    rep2 = run_batch_export(
        job("pil.jpg") + [ExportJob(raw_path=str(path),
                                    out_path=str(tmp_path / "x.png"))],
        batch_size=1, quality=92)
    assert rep2.succeeded == 2
    a = np.asarray(Image.open(tmp_path / "planes.jpg").convert("RGB"),
                   np.float64)
    b = np.asarray(Image.open(tmp_path / "pil.jpg").convert("RGB"),
                   np.float64)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < 3.0, rmse
    assert float(np.abs(a - b).max()) <= 24.0  # isolated chroma edges


def test_jpeg_planes_chroma444(tmp_path, rng):
    """chroma='444' exports full-resolution chroma planes through the
    device path (3 B/px fetched) and writes a 1x1-sampled JPEG; odd
    dimensions are legal in this mode (no 2x2 subsample)."""
    import pytest

    from raweditor_tpu.native import get_rawkit

    rk = get_rawkit()
    if rk is None or not hasattr(rk, "encode_jpeg_444"):
        pytest.skip("native JPEG encoder not built")
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    mosaic = ((xx + yy) / (w + h) * 4095).astype(np.uint16)
    path = tmp_path / "s.nef"
    write_synthetic_raw(path, mosaic)
    rep = run_batch_export(
        [ExportJob(raw_path=str(path), out_path=str(tmp_path / "f.jpg"),
                   params=EditParams(exposure=0.2))],
        batch_size=1, quality=92, chroma="444")
    assert rep.succeeded == 1
    assert rep.fetch_bytes == 3 * h * w  # full-res Y + Cb + Cr
    with Image.open(tmp_path / "f.jpg") as im:
        assert im.layer[0][1:3] == (1, 1)
        a = np.asarray(im.convert("RGB"), np.float64)
    # Same image as the 4:2:0 path to within JPEG tolerance.
    rep2 = run_batch_export(
        [ExportJob(raw_path=str(path), out_path=str(tmp_path / "s.jpg"),
                   params=EditParams(exposure=0.2))],
        batch_size=1, quality=92)
    assert rep2.succeeded == 1
    b = np.asarray(Image.open(tmp_path / "s.jpg").convert("RGB"),
                   np.float64)
    assert float(np.sqrt(np.mean((a - b) ** 2))) < 3.0
    # Odd dims stay on the planes path in 444 mode.
    odd = rng.integers(0, 4096, size=(23, 31), dtype=np.uint16)
    opath = tmp_path / "odd.nef"
    write_synthetic_raw(opath, odd)
    rep3 = run_batch_export(
        [ExportJob(raw_path=str(opath),
                   out_path=str(tmp_path / "odd.jpg"))],
        batch_size=1, chroma="444")
    assert rep3.succeeded == 1
    assert rep3.fetch_bytes == 3 * 23 * 31


def test_jpeg_planes_odd_dims_fall_back(tmp_path, rng):
    """Odd-sized frames can't 2x2-subsample on device; the RGBA path
    must kick in transparently."""
    import pytest

    from raweditor_tpu.native import get_rawkit

    rk = get_rawkit()
    if rk is None or not hasattr(rk, "encode_jpeg_420"):
        pytest.skip("native JPEG encoder not built")
    mosaic = rng.integers(0, 4096, size=(23, 31), dtype=np.uint16)
    path = tmp_path / "odd.nef"
    write_synthetic_raw(path, mosaic)
    rep = run_batch_export(
        [ExportJob(raw_path=str(path),
                   out_path=str(tmp_path / "odd.jpg"))], batch_size=1)
    assert rep.succeeded == 1
    with Image.open(tmp_path / "odd.jpg") as im:
        assert im.size == (31, 23)


def test_pil_fallback_honors_chroma_and_optimize(tmp_path, rng,
                                                 monkeypatch):
    """Without the native encoder, the PIL fallback must still honor
    chroma='444' (subsampling=0) and jpeg_optimize — not silently write
    4:2:0 against the user's flag (code-review r3 finding)."""
    mosaic = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
    path = tmp_path / "f.nef"
    write_synthetic_raw(path, mosaic)
    monkeypatch.setattr("raweditor_tpu.native.get_rawkit", lambda: None)
    rep = run_batch_export(
        [ExportJob(raw_path=str(path),
                   out_path=str(tmp_path / "f.jpg"))],
        batch_size=1, quality=92, chroma="444", jpeg_optimize=True,
        jpeg_restart_rows=1)
    assert rep.succeeded == 1
    with Image.open(tmp_path / "f.jpg") as im:
        assert im.layer[0][1:3] == (1, 1)  # 1x1 sampling = 4:4:4
    with open(tmp_path / "f.jpg", "rb") as f:
        assert b"\xff\xdd" in f.read()  # restart markers survive too
    rep2 = run_batch_export(
        [ExportJob(raw_path=str(path),
                   out_path=str(tmp_path / "s.jpg"))],
        batch_size=1, quality=92)
    assert rep2.succeeded == 1
    with Image.open(tmp_path / "s.jpg") as im:
        assert im.layer[0][1:3] == (2, 2)  # default stays 4:2:0


def test_device_failure_quarantines_batch(tmp_path, rng, monkeypatch):
    """A device-side failure (OOM, transport) on one batch quarantines
    that batch's images and the run continues — it must not kill a
    long export."""
    import raweditor_tpu.pipeline.export as ex

    jobs = []
    for i in range(4):
        path = tmp_path / f"q{i}.nef"
        write_synthetic_raw(
            path, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
        jobs.append(ExportJob(raw_path=str(path),
                              out_path=str(tmp_path / f"q{i}.png")))

    real = ex.batch_develop_rgba
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:  # first batch dies on "the device"
            raise RuntimeError("RESOURCE_EXHAUSTED: injected")
        return real(*a, **k)

    monkeypatch.setattr(ex, "batch_develop_rgba", flaky)
    rep = ex.run_batch_export(jobs, batch_size=2)
    assert rep.succeeded == 2
    assert len(rep.failed) == 2
    assert all("develop:" in msg for _, msg in rep.failed)
    assert ex._stage_used == 0  # budget returned despite the failure


def test_batch_export_sharded_mesh(tmp_path, rng):
    from raweditor_tpu.parallel import batch_row_mesh

    mesh = batch_row_mesh(row=2)
    jobs = []
    for i in range(5):
        mosaic = rng.integers(0, 4096, size=(32, 16), dtype=np.uint16)
        path = tmp_path / f"s{i}.nef"
        write_synthetic_raw(path, mosaic)
        jobs.append(ExportJob(raw_path=str(path),
                              out_path=str(tmp_path / "out" / f"s{i}.jpg")))
    report = run_batch_export(jobs, mesh=mesh, batch_size=4)
    assert report.succeeded == 5 and not report.failed


def test_mesh_row_sharded_planes_matches_single_chip(tmp_path, rng):
    """Row-sharded meshes take the YCbCr 4:2:0 planes path too (r3):
    GSPMD inserts the chroma boundary exchange, and the JPEGs must be
    byte-identical to the mesh=None planes path."""
    import pytest

    from raweditor_tpu.native import get_rawkit
    from raweditor_tpu.parallel import batch_row_mesh

    if get_rawkit() is None or not hasattr(get_rawkit(),
                                           "encode_jpeg_420"):
        pytest.skip("native JPEG encoder not built")
    mesh = batch_row_mesh(row=2)
    h, w = 32, 16
    mesh_jobs, solo_jobs = [], []
    for i in range(3):
        path = tmp_path / f"r{i}.nef"
        write_synthetic_raw(
            path, rng.integers(0, 4096, size=(h, w), dtype=np.uint16))
        params = EditParams(exposure=0.2 * i)
        mesh_jobs.append(ExportJob(str(path),
                                   str(tmp_path / "m" / f"r{i}.jpg"),
                                   params))
        solo_jobs.append(ExportJob(str(path),
                                   str(tmp_path / "s" / f"r{i}.jpg"),
                                   params))
    rep = run_batch_export(mesh_jobs, mesh=mesh, batch_size=2)
    assert rep.succeeded == 3 and not rep.failed
    # planes fetch: 1.5 B/px, not 4 B/px RGBA — and only the REAL
    # images cross the link (padding is sliced off on device, r3)
    assert rep.fetch_bytes == 3 * (h * w + 2 * (h // 2) * (w // 2))
    solo = run_batch_export(solo_jobs, batch_size=2)
    assert solo.succeeded == 3
    for i in range(3):
        assert (tmp_path / "m" / f"r{i}.jpg").read_bytes() == \
            (tmp_path / "s" / f"r{i}.jpg").read_bytes()


def test_mesh_xtrans_and_linear_match_single_chip(tmp_path, rng):
    """8-bit X-Trans and LinearRaw buckets shard over the mesh like
    every other bucket (they previously ran single-device under a
    mesh — code-review r3) and must stay byte-identical to mesh=None
    (PNG: lossless)."""
    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
    from raweditor_tpu.parallel import batch_row_mesh
    from raweditor_tpu.raw.synth import write_synthetic_linear_dng

    mesh = batch_row_mesh(row=2)
    h, w = 24, 24
    xt = tmp_path / "x.dng"
    write_synthetic_raw(
        xt, rng.integers(0, 4096, size=(h, w), dtype=np.uint16),
        cfa=XTRANS_PATTERN)
    lin = tmp_path / "l.dng"
    write_synthetic_linear_dng(
        lin, rng.integers(0, 4096, size=(h, w, 3), dtype=np.uint16),
        bpp=12, wb_neutral=(1.0, 1.0, 1.0))
    for src, name in ((xt, "x"), (lin, "l")):
        p = EditParams(exposure=0.2, contrast=4.0)
        rep = run_batch_export(
            [ExportJob(str(src), str(tmp_path / "m" / f"{name}.png"), p)],
            mesh=mesh, batch_size=2)
        assert rep.succeeded == 1 and not rep.failed, rep.as_dict()
        solo = run_batch_export(
            [ExportJob(str(src), str(tmp_path / "s" / f"{name}.png"), p)],
            batch_size=2)
        assert solo.succeeded == 1
        assert (tmp_path / "m" / f"{name}.png").read_bytes() == \
            (tmp_path / "s" / f"{name}.png").read_bytes()


def test_mesh_grad_demosaic_matches_single_chip(tmp_path, rng):
    """grad's receptive field exceeds the row-shard halo; it must
    route through the GSPMD dp path and stay byte-identical to
    mesh=None (it previously went through the 2-row-halo shard_map
    and corrupted every shard seam — code-review r3)."""
    from raweditor_tpu.parallel import batch_row_mesh

    mesh = batch_row_mesh(row=2)
    h, w = 32, 24
    path = tmp_path / "g.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(h, w), dtype=np.uint16))
    p = EditParams(exposure=0.3)
    rep = run_batch_export(
        [ExportJob(str(path), str(tmp_path / "m" / "g.png"), p)],
        mesh=mesh, batch_size=2, demosaic_method="grad")
    assert rep.succeeded == 1 and not rep.failed, rep.as_dict()
    solo = run_batch_export(
        [ExportJob(str(path), str(tmp_path / "s" / "g.png"), p)],
        batch_size=2, demosaic_method="grad")
    assert solo.succeeded == 1
    assert (tmp_path / "m" / "g.png").read_bytes() == \
        (tmp_path / "s" / "g.png").read_bytes()
    # The shard_map path itself refuses grad outright.
    import pytest

    from raweditor_tpu.parallel.batch import batch_develop_sharded

    with pytest.raises(ValueError, match="row-sharded develop"):
        batch_develop_sharded(
            rng.integers(0, 4096, (4, 16, 16), np.uint16),
            None, None, None, mesh, demosaic_method="grad")


def test_mesh_builders_validate(rng):
    """No silent truncation when more devices are requested than
    exist; non-positive axis sizes error cleanly (code-review r3)."""
    import pytest

    from raweditor_tpu.parallel import batch_row_mesh

    with pytest.raises(ValueError, match="available"):
        batch_row_mesh(n_devices=64)
    with pytest.raises(ValueError, match="row must be positive"):
        batch_row_mesh(row=0)
    with pytest.raises(ValueError, match="row must be positive"):
        batch_row_mesh(row=-2)


def test_export_rejects_bad_transfer_and_mesh(tmp_path, rng):
    """Unknown transfers and meshes without the expected axes fail
    up front with clear errors instead of quarantining every batch
    (code-review r3)."""
    import pytest
    from jax.sharding import Mesh

    import jax

    path = tmp_path / "v.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
    jobs = [ExportJob(str(path), str(tmp_path / "v.jpg"))]
    with pytest.raises(ValueError, match="unknown transfer"):
        run_batch_export(jobs, transfer="bogus")
    with pytest.raises(ValueError, match="unknown transfer"):
        run_batch_export(jobs, transfer="bogus", use_pallas=True)
    batch_only = Mesh(np.array(jax.devices()[:2]).reshape(2), ("batch",))
    with pytest.raises(ValueError, match="'batch' and 'row'"):
        run_batch_export(jobs, mesh=batch_only)


def test_mesh_dp_tiff16_matches_single_chip(tmp_path, rng):
    """16-bit TIFF export on a data-parallel mesh (allowed since r3)
    produces byte-identical archives to mesh=None; row-sharded meshes
    still reject with a clear error."""
    import pytest

    from raweditor_tpu.parallel import batch_row_mesh

    mesh = batch_row_mesh(row=1)
    h, w = 16, 24
    mesh_jobs, solo_jobs = [], []
    for i in range(3):
        path = tmp_path / f"t{i}.nef"
        write_synthetic_raw(
            path, rng.integers(0, 4096, size=(h, w), dtype=np.uint16))
        params = EditParams(contrast=1.0 * i)
        mesh_jobs.append(ExportJob(str(path),
                                   str(tmp_path / "m" / f"t{i}.tif"),
                                   params))
        solo_jobs.append(ExportJob(str(path),
                                   str(tmp_path / "s" / f"t{i}.tif"),
                                   params))
    rep = run_batch_export(mesh_jobs, mesh=mesh, batch_size=2, bits=16)
    assert rep.succeeded == 3 and not rep.failed, rep.as_dict()
    solo = run_batch_export(solo_jobs, batch_size=2, bits=16)
    assert solo.succeeded == 3
    for i in range(3):
        assert (tmp_path / "m" / f"t{i}.tif").read_bytes() == \
            (tmp_path / "s" / f"t{i}.tif").read_bytes()
    with pytest.raises(ValueError, match="row axis"):
        run_batch_export(mesh_jobs, mesh=batch_row_mesh(row=2), bits=16)


def test_mesh_dp_only_takes_planes_path(tmp_path, rng):
    """A pure data-parallel mesh (row=1) qualifies for the YCbCr 4:2:0
    planes fetch — each image lives whole on one chip. Row-sharded
    meshes (test above) qualify too since r3."""
    import pytest

    from raweditor_tpu.native import get_rawkit
    from raweditor_tpu.parallel import batch_row_mesh

    if get_rawkit() is None or not hasattr(get_rawkit(),
                                           "encode_jpeg_420"):
        pytest.skip("native JPEG encoder not built")
    mesh = batch_row_mesh(row=1)
    h, w = 16, 24
    jobs = []
    for i in range(8):
        path = tmp_path / f"d{i}.nef"
        write_synthetic_raw(
            path, rng.integers(0, 4096, size=(h, w), dtype=np.uint16))
        jobs.append(ExportJob(raw_path=str(path),
                              out_path=str(tmp_path / f"d{i}.jpg")))
    report = run_batch_export(jobs, mesh=mesh, batch_size=8)
    assert report.succeeded == 8 and not report.failed
    assert report.fetch_bytes == 8 * (h * w + 2 * (h // 2) * (w // 2))
    with Image.open(tmp_path / "d0.jpg") as im:
        assert im.size == (w, h)


def test_watch_folder_ingests_new_files(tmp_path, rng):
    """Tethered ingest: a file imports only once its size/mtime is
    stable across two polls (a shot still streaming from the camera
    must not be decoded half-written); re-polls are idempotent."""
    from raweditor_tpu.pipeline.tiers import watch_folder

    photos = tmp_path / "ingest"
    photos.mkdir()
    write_synthetic_raw(
        photos / "first.nef",
        rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
    lib = Library(tmp_path / "cat.db")

    cycles = []

    def on_cycle(stats):
        cycles.append(stats)
        if stats["cycle"] == 1:  # a new shot lands mid-watch
            write_synthetic_raw(
                photos / "second.nef",
                rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))

    totals = watch_folder(lib, photos, cache_dir=tmp_path / "cache",
                          interval=0.01, iterations=4,
                          on_cycle=on_cycle)
    assert totals == {"cycles": 4, "imported": 2, "cached": 2,
                      "failed": 0}
    assert cycles[0]["imported"] == 0  # first sighting: not yet stable
    assert cycles[1]["imported"] == 1  # first.nef stable now
    assert cycles[2]["imported"] == 1  # second.nef stable
    assert cycles[3]["imported"] == 0  # idempotent final poll
    assert len(lib.get_all_images()) == 2
    lib.close()


def test_watch_folder_retries_failed_after_rewrite(tmp_path, rng):
    """A truncated shot that failed tier generation is retried once
    the file changes on disk (the reference never retries a 'failed'
    image)."""
    import os

    from raweditor_tpu.pipeline.tiers import watch_folder

    photos = tmp_path / "ingest"
    photos.mkdir()
    good = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
    full = write_synthetic_raw(None, good)
    # A truncated copy: imports fine (import is metadata-free) but
    # fails tier generation.
    (photos / "shot.nef").write_bytes(full[: len(full) // 3])
    lib = Library(tmp_path / "cat.db")

    def on_cycle(stats):
        if stats["cycle"] == 3:  # the camera finishes writing
            (photos / "shot.nef").write_bytes(full)
            os.utime(photos / "shot.nef", (1, 1))  # force mtime change

    totals = watch_folder(lib, photos, cache_dir=tmp_path / "cache",
                          interval=0.01, iterations=6,
                          on_cycle=on_cycle)
    assert totals["imported"] == 1
    assert totals["failed"] == 1  # the truncated attempt
    assert totals["cached"] == 1  # the retry succeeded
    lib.close()


def test_jobs_from_catalog_replays_edits(tmp_path, rng):
    d = tmp_path / "photos"
    d.mkdir()
    for i in range(2):
        write_synthetic_raw(
            d / f"s{i}.nef",
            rng.integers(0, 4096, size=(8, 8), dtype=np.uint16),
        )
    lib = Library(tmp_path / "cat.db")
    lib.import_folder(d)
    images = lib.get_all_images()
    lib.save_edit_params(images[0].id, EditParams(exposure=1.5))

    jobs = jobs_from_catalog(lib, tmp_path / "out")
    assert len(jobs) == 2
    by_id = {j.image_id: j for j in jobs}
    assert by_id[images[0].id].params.exposure == 1.5
    assert by_id[images[1].id].params == EditParams()


def test_tiers_fallback_develop_when_no_preview(tmp_path, rng):
    """No embedded JPEG → tiers are developed from the sensor data
    (improvement over the reference, which quarantines)."""
    mosaic = rng.integers(0, 4096, size=(40, 60), dtype=np.uint16)
    path = tmp_path / "nopreview.nef"
    write_synthetic_raw(path, mosaic, preview_jpeg=b"")
    thumb, instant, working = generate_tiers(
        str(path), 3, cache_dir=tmp_path / "cache"
    )
    with Image.open(working) as im:
        assert im.width == 1280
    # Strict parity mode still raises.
    import pytest as _pytest

    with _pytest.raises(ValueError):
        generate_tiers(str(path), 4, cache_dir=tmp_path / "cache",
                       fallback_develop=False)


def test_engine_develop_tiers_on_device(synth_file):
    """Device-side XLA lanczos3 tier resize of the developed image."""
    path, _ = synth_file
    eng = DevelopEngine.open(path)
    tiers = eng.develop_tiers(EditParams(exposure=0.5), widths=(16, 24))
    assert [t.shape for t in tiers] == [(11, 16, 3), (16, 24, 3)]
    assert all(t.dtype == np.uint8 for t in tiers)
    # Downsampled tiers preserve the overall brightness ordering vs a
    # darker develop.
    dark = eng.develop_tiers(EditParams(exposure=-2.0), widths=(16,))[0]
    assert tiers[0].mean() > dark.mean()


def test_batch_export_resume_skips_existing(tmp_path, rng):
    jobs = []
    for i in range(3):
        path = tmp_path / f"s{i}.nef"
        write_synthetic_raw(
            path, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
        )
        jobs.append(ExportJob(raw_path=str(path),
                              out_path=str(tmp_path / "out" / f"s{i}.jpg")))
    first = run_batch_export(jobs[:2], batch_size=2)
    assert first.succeeded == 2
    resumed = run_batch_export(jobs, batch_size=2, skip_existing=True)
    assert resumed.skipped == 2 and resumed.succeeded == 1
    assert (tmp_path / "out" / "s2.jpg").exists()


def test_batch_export_encode_failure_quarantined(tmp_path, rng):
    """An unwritable output path quarantines that image, not the run.
    (Failure injected via a regular file used as a directory — chmod
    tricks don't block root.)"""
    good = tmp_path / "g.nef"
    write_synthetic_raw(
        good, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
    )
    (tmp_path / "afile").write_bytes(b"x")
    jobs = [
        ExportJob(raw_path=str(good),
                  out_path=str(tmp_path / "out" / "ok.jpg")),
        ExportJob(raw_path=str(good),
                  out_path=str(tmp_path / "afile" / "sub" / "nope.jpg")),
    ]
    report = run_batch_export(jobs, batch_size=2)
    assert report.succeeded == 1
    assert len(report.failed) == 1 and "encode" in report.failed[0][1]
    assert (tmp_path / "out" / "ok.jpg").exists()


def test_auto_orient_export(tmp_path, rng):
    """EXIF orientation 6 (90° CW) rotates the exported image when
    auto_orient is on; default preserves reference behavior (as-stored)."""
    mosaic = rng.integers(0, 4096, size=(20, 30), dtype=np.uint16)
    path = tmp_path / "rot.nef"
    write_synthetic_raw(path, mosaic, orientation=6)

    eng = DevelopEngine.open(path)
    assert eng.raw.orientation == 6
    out = eng.export(tmp_path / "as_stored.png", EditParams())
    with Image.open(out) as im:
        assert im.size == (30, 20)  # unrotated (parity default)

    eng2 = DevelopEngine.open(path, auto_orient=True)
    out2 = eng2.export(tmp_path / "rotated.png", EditParams())
    with Image.open(out2) as im:
        assert im.size == (20, 30)  # rotated to portrait
    # Pixel correspondence: rotated[y, x] == stored[H-1-x, y] for rot90 CW.
    a = np.asarray(Image.open(out).convert("RGB"))
    b = np.asarray(Image.open(out2).convert("RGB"))
    assert (b == np.rot90(a, k=-1)).all()


def test_export_use_pallas_falls_back_on_cpu(tmp_path, rng):
    """use_pallas on a backend without Mosaic support must fall back to
    the XLA path and still produce byte-identical outputs."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    raws = []
    for i in range(2):
        path = tmp_path / f"p{i}.dng"
        mosaic = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
        write_synthetic_raw(path, mosaic)
        raws.append(path)

    jobs_a = [ExportJob(raw_path=str(p), params=EditParams(exposure=0.3),
                        out_path=str(tmp_path / f"a{i}.png"))
              for i, p in enumerate(raws)]
    jobs_b = [ExportJob(raw_path=str(p), params=EditParams(exposure=0.3),
                        out_path=str(tmp_path / f"b{i}.png"))
              for i, p in enumerate(raws)]
    rep_a = run_batch_export(jobs_a, batch_size=2, use_pallas=True)
    rep_b = run_batch_export(jobs_b, batch_size=2)
    assert rep_a.succeeded == 2 and rep_b.succeeded == 2
    for i in range(2):
        a = (tmp_path / f"a{i}.png").read_bytes()
        b = (tmp_path / f"b{i}.png").read_bytes()
        assert a == b


def test_export_16bit_tiff(tmp_path, rng):
    """bits=16 batch export writes valid 16-bit TIFFs whose top byte
    matches the 8-bit export."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw import tiff as T
    from raweditor_tpu.raw.synth import write_synthetic_raw
    from raweditor_tpu.raw.tiff import TiffFile

    raws = []
    for i in range(2):
        path = tmp_path / f"s{i}.dng"
        write_synthetic_raw(
            path, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
        raws.append(path)
    jobs = [ExportJob(raw_path=str(p), params=EditParams(exposure=0.3),
                      out_path=str(tmp_path / f"o{i}.tif"))
            for i, p in enumerate(raws)]
    rep = run_batch_export(jobs, batch_size=2, bits=16)
    assert rep.succeeded == 2 and not rep.failed
    for i in range(2):
        data = (tmp_path / f"o{i}.tif").read_bytes()
        tf = TiffFile(data)
        ifd = tf.ifds[0]
        assert ifd.get(T.BITS_PER_SAMPLE) == (16, 16, 16)
        off = ifd.get_scalar(T.STRIP_OFFSETS)
        cnt = ifd.get_scalar(T.STRIP_BYTE_COUNTS)
        rgb = np.frombuffer(data[off:off + cnt], "<u2").reshape(16, 24, 3)
        assert rgb.max() > 255  # true 16-bit values


def test_export_16bit_rejects_mesh(tmp_path):
    from raweditor_tpu.pipeline.export import run_batch_export
    from raweditor_tpu.parallel import batch_row_mesh

    mesh = batch_row_mesh(row=2)
    with pytest.raises(ValueError, match="16-bit"):
        run_batch_export([], mesh=mesh, bits=16)


def test_export_16bit_ignores_poly_gamma(tmp_path, rng):
    """fast_gamma must not leak the u8-accuracy polynomial into 16-bit
    output: with and without fast_gamma the TIFF bytes are identical."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    path = tmp_path / "s.dng"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))

    def job(name):
        return [ExportJob(raw_path=str(path),
                          params=EditParams(exposure=0.3),
                          out_path=str(tmp_path / name))]

    run_batch_export(job("a.tif"), batch_size=1, bits=16)
    run_batch_export(job("b.tif"), batch_size=1, bits=16,
                     fast_gamma=True)
    assert (tmp_path / "a.tif").read_bytes() == \
        (tmp_path / "b.tif").read_bytes()
    # Same contract for the accurate-mode sRGB transfer: fast_gamma maps
    # it to srgb_poly for u8 but 16-bit output must stay exact sRGB.
    run_batch_export(job("c.tif"), batch_size=1, bits=16,
                     transfer="srgb")
    run_batch_export(job("d.tif"), batch_size=1, bits=16,
                     transfer="srgb", fast_gamma=True)
    assert (tmp_path / "c.tif").read_bytes() == \
        (tmp_path / "d.tif").read_bytes()
    assert (tmp_path / "c.tif").read_bytes() != \
        (tmp_path / "a.tif").read_bytes()


def test_unsupported_container_still_gets_tiers(tmp_path, rng):
    """CR3-style ISO-BMFF files can't be sensor-decoded, but the tier
    cache must still extract the embedded JPEG preview — matching the
    reference's thumbnailer, which worked even where rawloader failed."""
    import io

    from PIL import Image

    from raweditor_tpu.pipeline.tiers import generate_tiers
    from raweditor_tpu.raw.decode import UnsupportedRawError, decode_raw

    buf = io.BytesIO()
    Image.fromarray(
        (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    ).save(buf, format="JPEG")
    data = (b"\x00\x00\x00\x18ftypcrx \x00\x00\x00\x01crx isom"
            + b"\x00" * 64 + buf.getvalue() + b"\x00" * 32)
    path = tmp_path / "fake.cr3"
    path.write_bytes(data)

    with pytest.raises(UnsupportedRawError):
        decode_raw(str(path))
    tiers = generate_tiers(str(path), 1, cache_dir=tmp_path / "cache")
    sizes = [Image.open(t).size for t in tiers]
    assert sizes == [(256, 192), (384, 288), (1280, 960)]


def test_cr3_sensor_tiers_without_preview(tmp_path, rng):
    """A CR3 with a CRAW track but NO embedded previews tiers through
    the develop fallback off the decoded CRX sensor data — beyond the
    reference, which quarantines preview-less files."""
    from PIL import Image

    from raweditor_tpu.pipeline.tiers import generate_tiers
    from raweditor_tpu.raw.bmff import write_synthetic_cr3

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    mosaic = ((xx + yy) / (w + h) * 16383).astype(np.uint16)
    path = tmp_path / "sensor_only.cr3"
    write_synthetic_cr3(path, mosaic=mosaic)

    tiers = generate_tiers(str(path), 1, cache_dir=tmp_path / "cache")
    for t in tiers:
        with Image.open(t) as im:
            arr = np.asarray(im.convert("RGB"))
        assert arr.std() > 1  # a real developed gradient, not black


def test_long_edge_shape_math():
    from raweditor_tpu.ops.resize import long_edge_shape

    assert long_edge_shape(400, 600, 300) == (200, 300)  # landscape
    assert long_edge_shape(600, 400, 300) == (300, 200)  # portrait
    assert long_edge_shape(100, 150, 300) == (100, 150)  # never upscale
    assert long_edge_shape(100, 150, 150) == (100, 150)  # exact fit
    assert long_edge_shape(100, 150, 0) == (100, 150)    # disabled
    assert long_edge_shape(2, 1000, 10) == (1, 10)       # short side >= 1


def test_resize_rgba_words_constant_and_shape():
    """Lanczos3 of a constant field is constant (weights normalize to
    1), and the packing survives the round trip."""
    from raweditor_tpu.ops.resize import resize_rgba_words

    words = np.full((2, 16, 24), 0xFF20B060, dtype=np.uint32)
    out = np.asarray(resize_rgba_words(words, 12, 8))
    assert out.shape == (2, 8, 12)
    assert (out == 0xFF20B060).all()


def test_export_long_edge(tmp_path, rng):
    """--long-edge resizes on device: JPEG (even dims ride the native
    YCbCr planes path), odd target dims fall back to the RGBA path,
    16-bit TIFF resizes too, and a target >= the image is a no-op."""
    mosaic = rng.integers(0, 4096, size=(24, 32), dtype=np.uint16)
    path = tmp_path / "s.nef"
    write_synthetic_raw(path, mosaic)

    def job(name):
        return [ExportJob(raw_path=str(path),
                          out_path=str(tmp_path / name))]

    # Even target: 32x24 -> 16x12.
    rep = run_batch_export(job("even.jpg"), batch_size=1, long_edge=16)
    assert rep.succeeded == 1
    with Image.open(tmp_path / "even.jpg") as im:
        assert im.size == (16, 12)

    # Odd target: 32x24 -> 15x11 (JPEG planes path declines odd dims;
    # the RGBA fallback must produce the file transparently).
    rep = run_batch_export(job("odd.jpg"), batch_size=1, long_edge=15)
    assert rep.succeeded == 1
    with Image.open(tmp_path / "odd.jpg") as im:
        assert im.size == (15, 11)

    # No upscale: target beyond the image keeps full size.
    rep = run_batch_export(job("full.jpg"), batch_size=1, long_edge=999)
    assert rep.succeeded == 1
    with Image.open(tmp_path / "full.jpg") as im:
        assert im.size == (32, 24)

    # PNG keeps RGBA; 16-bit TIFF resizes through the u16 lane.
    rep = run_batch_export(job("small.png"), batch_size=1, long_edge=16)
    assert rep.succeeded == 1
    with Image.open(tmp_path / "small.png") as im:
        assert im.size == (16, 12) and im.mode == "RGBA"
    rep = run_batch_export(job("small.tif"), batch_size=1, long_edge=16,
                           bits=16)
    assert rep.succeeded == 1
    with Image.open(tmp_path / "small.tif") as im:
        assert im.size == (16, 12)

    # Content sanity: the resized export is the full-size export's
    # scene, not noise — mean brightness within a couple of LSB.
    with Image.open(tmp_path / "full.jpg") as im:
        full_mean = np.asarray(im.convert("RGB"), dtype=np.float64).mean()
    with Image.open(tmp_path / "even.jpg") as im:
        small_mean = np.asarray(im.convert("RGB"), dtype=np.float64).mean()
    assert abs(full_mean - small_mean) < 4.0


def test_engine_export_long_edge(synth_file, tmp_path):
    """Engine-level long_edge: JPEG planes path, PIL fallback (odd
    dims), and 16-bit TIFF all resize; session 'full <path> <N>'
    drives it."""
    path, _ = synth_file
    eng = DevelopEngine.open(path)
    p = EditParams(exposure=0.2)

    out = eng.export(tmp_path / "le.jpg", p, long_edge=30)
    with Image.open(out) as im:
        assert im.size == (30, 20)
    out = eng.export(tmp_path / "le_odd.jpg", p, long_edge=21)
    with Image.open(out) as im:
        assert im.size == (21, 14)
    out = eng.export(tmp_path / "le.png", p, long_edge=30)
    with Image.open(out) as im:
        assert im.size == (30, 20) and im.mode == "RGBA"
    out = eng.export(tmp_path / "le.tif", p, long_edge=30)
    with Image.open(out) as im:
        assert im.size == (30, 20)

    from raweditor_tpu.pipeline.session import DevelopSession

    sess = DevelopSession(eng)
    res = sess.handle(f"full {tmp_path / 'sess.jpg'} 30")
    assert res["ok"]
    with Image.open(tmp_path / "sess.jpg") as im:
        assert im.size == (30, 20)


def test_engine_export_rejects_unknown_extension(synth_file, tmp_path):
    """Same contract as the batch exporter's _encode_one: JPEG bytes
    must not be written under an unrecognized name (code-review r3)."""
    from raweditor_tpu.pipeline.engine import DevelopEngine

    path, _ = synth_file
    eng = DevelopEngine.open(str(path))
    with pytest.raises(ValueError, match="extension"):
        eng.export(tmp_path / "x.webp", EditParams())


def test_export_16bit_wrong_extension_quarantined(tmp_path, rng):
    """bits=16 with a .jpg out_path must fail the job (TIFF bytes under
    a .jpg name would poison skip_existing reruns — code-review r3)."""
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export

    p = tmp_path / "w.dng"
    write_synthetic_raw(
        p, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
    rep = run_batch_export(
        [ExportJob(raw_path=str(p), out_path=str(tmp_path / "w.jpg"))],
        bits=16)
    assert rep.succeeded == 0 and len(rep.failed) == 1
    assert not (tmp_path / "w.jpg").exists()


def test_engine_pallas_failure_memoized(synth_file, monkeypatch):
    """A non-ValueError kernel failure (the VMEM-overflow class) must
    fall back to the XLA lane AND not be retried on the next call — a
    failed Mosaic compile can take minutes over the tunnel
    (code-review r3; mirrors the X-Trans grad memo)."""
    import raweditor_tpu.ops.pallas_develop as pd
    from raweditor_tpu.pipeline.engine import DevelopEngine

    path, _ = synth_file
    eng = DevelopEngine.open(str(path), use_pallas=True)
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("simulated Mosaic VMEM overflow")

    monkeypatch.setattr(pd, "pallas_develop_rgba", boom)
    a = np.asarray(eng.full_rgba_device(EditParams()))
    b = np.asarray(eng.full_rgba_device(EditParams()))
    assert calls["n"] == 1
    want = np.asarray(
        DevelopEngine.open(str(path)).full_rgba_device(EditParams()))
    assert (a == want).all() and (b == want).all()


def test_tiers_prefer_develop_over_tiny_preview(tmp_path, rng):
    """An embedded thumb smaller than the working tier must not be
    upscaled into a blurry 1280 px cache entry when the sensor develop
    yields more real pixels (code-review r3)."""
    import io as _io

    from PIL import Image as PILImage

    red = PILImage.new("RGB", (64, 42), (220, 30, 30))
    buf = _io.BytesIO()
    red.save(buf, "JPEG", quality=90)
    # Near-black wide sensor: the develop is dark, the thumb is red.
    path = tmp_path / "thumbonly.nef"
    write_synthetic_raw(path, np.zeros((40, 200), dtype=np.uint16),
                        preview_jpeg=buf.getvalue())
    _, _, working = generate_tiers(str(path), 9, cache_dir=tmp_path / "c")
    with Image.open(working) as im:
        assert im.width == 1280  # tier layout contract unchanged
        arr = np.asarray(im.convert("RGB"))
    assert arr[..., 0].mean() < 60, "working tier came from the thumb"
    # Strict parity mode keeps the reference behavior (tier the JPEG).
    _, _, working_p = generate_tiers(str(path), 10,
                                     cache_dir=tmp_path / "cp",
                                     fallback_develop=False)
    with Image.open(working_p) as im:
        arr_p = np.asarray(im.convert("RGB"))
    assert arr_p[..., 0].mean() > 120


def test_batch_develop_linear_planes_match_separate_pass(rng):
    """The linear lane's fused ycbcr420 output equals the old separate
    conversion pass bit-for-bit (code-review r3)."""
    import jax

    from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr420
    from raweditor_tpu.parallel.batch import (batch_develop_linear_rgba,
                                              pack_params)

    frames = rng.integers(0, 4096, size=(2, 16, 24, 3), dtype=np.uint16)
    params = pack_params([EditParams(exposure=0.2), EditParams()])
    wbs = np.tile(np.array([2.0, 1.0, 1.4], np.float32), (2, 1))
    cms = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    words = batch_develop_linear_rgba(frames, params, wbs, cms)
    planes = batch_develop_linear_rgba(frames, params, wbs, cms,
                                       output="ycbcr420")
    want = jax.jit(rgba_words_to_ycbcr420)(words)
    assert isinstance(planes, tuple) and len(planes) == len(want)
    for a, b in zip(planes, want):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_generate_tiers_corrupt_embedded_jpeg_falls_back(tmp_path, rng):
    """A corrupt embedded JPEG (e.g. a marker-scan hit inside a
    damaged file) must not quarantine an image whose sensor data
    decodes fine — the develop fallback takes over (regression: the
    PIL failure propagated out of generate_tiers)."""
    mosaic = rng.integers(0, 4096, size=(24, 32), dtype=np.uint16)
    bad_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 64 + b"\xff\xd9"
    path = tmp_path / "shot.nef"
    write_synthetic_raw(path, mosaic, preview_jpeg=bad_jpeg)

    thumb, instant, working = generate_tiers(
        path, 1, cache_dir=tmp_path / "cache")
    with Image.open(working) as im:
        assert im.width == 1280  # developed, tiered, usable

    with pytest.raises(Exception):
        generate_tiers(path, 2, cache_dir=tmp_path / "cache",
                       fallback_develop=False)


def test_watch_folder_retries_pre_run_failure_once(tmp_path, rng):
    """An image quarantined before this watcher started (e.g. the file
    finished writing while no watcher was up) gets exactly one retry
    on its first stable poll; if the file is still bad it stays
    quarantined without further churn."""
    from raweditor_tpu.pipeline.tiers import watch_folder

    photos = tmp_path / "ingest"
    photos.mkdir()
    good = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
    full = write_synthetic_raw(None, good)
    shot = photos / "shot.nef"
    shot.write_bytes(full[: len(full) // 3])  # truncated
    lib = Library(tmp_path / "cat.db")
    lib.import_image(str(shot), "shot.nef")
    pre = process_pending_cache(lib, cache_dir=tmp_path / "cache")
    assert pre == {"cached": 0, "failed": 1}

    # The camera finished writing while the watcher was down.
    shot.write_bytes(full)
    totals = watch_folder(lib, photos, cache_dir=tmp_path / "cache",
                          interval=0.01, iterations=3)
    assert totals["cached"] == 1  # the startup retry healed it
    assert totals["failed"] == 0

    # A still-broken pre-run failure retries once, then stays put.
    bad = photos / "bad.nef"
    bad.write_bytes(full[: len(full) // 3])
    lib.import_image(str(bad), "bad.nef")
    assert process_pending_cache(
        lib, cache_dir=tmp_path / "cache")["failed"] == 1
    totals = watch_folder(lib, photos, cache_dir=tmp_path / "cache",
                          interval=0.01, iterations=4)
    assert totals["failed"] == 1  # exactly one retry, no per-poll churn


def test_watch_folder_survives_symlink_cycle(tmp_path, rng):
    """A directory symlink cycle in the watched tree must not make the
    poll walk recurse forever (same realpath guard as
    Library.import_folder)."""
    from raweditor_tpu.pipeline.tiers import watch_folder

    photos = tmp_path / "ingest"
    sub = photos / "sub"
    sub.mkdir(parents=True)
    (sub / "loop").symlink_to(photos, target_is_directory=True)
    mosaic = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
    write_synthetic_raw(photos / "a.nef", mosaic)
    lib = Library(tmp_path / "cat.db")

    totals = watch_folder(lib, photos, cache_dir=tmp_path / "cache",
                          interval=0.01, iterations=3)
    assert totals["imported"] == 1
    assert len(lib.get_all_images()) == 1
    lib.close()


def test_tiff16_rejects_non_u16_and_sanitizes_strings(tmp_path):
    """write_tiff16 must reject non-uint16 input (a silent cast turned
    normalized float RGB into an all-black 'successful' export) and
    survive non-ASCII camera strings like write_dng does."""
    from raweditor_tpu.raw.tiff_out import write_tiff16

    with pytest.raises(ValueError, match="uint16"):
        write_tiff16(tmp_path / "f.tif",
                     np.zeros((4, 5, 3), np.float32))
    with pytest.raises(ValueError, match="uint16"):
        write_tiff16(tmp_path / "b.tif", np.zeros((4, 5, 3), np.uint8))

    out = write_tiff16(tmp_path / "ok.tif",
                       np.full((4, 5, 3), 1000, np.uint16),
                       make="NI�KON", model="Zé 8")
    with Image.open(out) as im:
        assert im.size == (5, 4)


def test_export_progress_callback(tmp_path, rng):
    """on_progress fires as images complete (rate-limited, forced at
    the end) and callback exceptions never fail the run."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    jobs = []
    for i in range(3):
        p = tmp_path / f"pg{i}.nef"
        write_synthetic_raw(p, rng.integers(0, 4095, (40, 64),
                                            dtype=np.uint16))
        jobs.append(ExportJob(raw_path=str(p),
                              out_path=str(tmp_path / f"pg{i}.jpg"),
                              params=EditParams()))
    calls = []

    def on_progress(done, failed, total, seconds):
        calls.append((done, failed, total))
        raise RuntimeError("observability must not fail the run")

    rep = run_batch_export(jobs, batch_size=2, decode_threads=1,
                           encode_threads=1, on_progress=on_progress)
    assert rep.succeeded == 3 and not rep.failed
    assert calls, "no progress callbacks fired"
    assert calls[-1] == (3, 0, 3)  # forced final call sees everything
    assert all(t == 3 for _, _, t in calls)
