"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Bit-equality bar: sharded execution must produce byte-identical output
to the single-device fused develop — halo exchange replaces
clamp-at-shard-edge with the true neighbor rows.
"""

import jax
import numpy as np
import pytest

from raweditor_tpu.params import EditParams
from raweditor_tpu.ops.develop import develop, histogram_256
from raweditor_tpu.parallel import (
    batch_develop,
    batch_develop_sharded,
    batch_row_mesh,
    make_mesh,
    pack_params,
    spatial_develop,
)
from raweditor_tpu.parallel.batch import batch_sharding

IDENTITY = np.eye(3, dtype=np.float32)
WB = np.array([2.0, 1.0, 1.4], dtype=np.float32)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_infers_axis():
    mesh = make_mesh({"batch": -1, "row": 2})
    assert mesh.shape == {"batch": 4, "row": 2}


def test_make_mesh_rejects_bad_product():
    with pytest.raises(ValueError):
        make_mesh({"batch": 3, "row": 2})


def test_spatial_develop_matches_single_device(rng):
    mosaic = rng.integers(0, 4096, size=(64, 48), dtype=np.uint16)
    params = EditParams(exposure=0.7, shadows=0.3, saturation=25.0)
    mesh = make_mesh({"row": 8})
    want = np.asarray(develop(mosaic, params, WB, IDENTITY))
    got = np.asarray(spatial_develop(mosaic, params, WB, IDENTITY, mesh))
    assert (want == got).all()


def test_spatial_develop_rejects_indivisible_height(rng):
    mosaic = rng.integers(0, 4096, size=(36, 48), dtype=np.uint16)
    mesh = make_mesh({"row": 8})
    with pytest.raises(ValueError):
        spatial_develop(mosaic, EditParams(), WB, IDENTITY, mesh)


def test_batch_develop_matches_individual(rng):
    n = 4
    mosaics = rng.integers(0, 4096, size=(n, 16, 24), dtype=np.uint16)
    plist = [EditParams(exposure=0.2 * i, contrast=float(i)) for i in range(n)]
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))
    got = np.asarray(batch_develop(mosaics, pack_params(plist), wbs, cms))
    for i in range(n):
        want = np.asarray(develop(mosaics[i], plist[i], WB, IDENTITY))
        assert (got[i] == want).all()


@pytest.mark.parametrize("with_histogram", [False, True])
def test_batch_develop_sharded_dp_x_sp(rng, with_histogram):
    mesh = batch_row_mesh(row=2)  # 4 batch × 2 row
    n = 8
    mosaics = rng.integers(0, 4096, size=(n, 32, 24), dtype=np.uint16)
    plist = [EditParams(exposure=0.1 * i) for i in range(n)]
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))

    staged = jax.device_put(mosaics, batch_sharding(mesh))
    out = batch_develop_sharded(
        staged, pack_params(plist), wbs, cms, mesh,
        with_histogram=with_histogram,
    )
    imgs = out[0] if with_histogram else out
    imgs = np.asarray(imgs)
    for i in range(n):
        want = np.asarray(develop(mosaics[i], plist[i], WB, IDENTITY))
        assert (imgs[i] == want).all()
    if with_histogram:
        hists = np.asarray(out[1])
        for i in range(n):
            want_h = np.asarray(histogram_256(imgs[i]))
            assert (hists[i] == want_h).all()


def test_batch_develop_auto_partitioned(rng):
    """jit auto-partitioning (NamedSharding inputs, no shard_map): the
    dp-only fast path must match unsharded output bit-for-bit."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from raweditor_tpu.parallel.batch import batch_develop

    mesh = make_mesh({"batch": 8})
    n = 8
    mosaics = rng.integers(0, 4096, size=(n, 16, 24), dtype=np.uint16)
    plist = [EditParams(exposure=0.1 * i) for i in range(n)]
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))

    staged = jax.device_put(mosaics, NamedSharding(mesh, P("batch")))
    out = batch_develop(staged, pack_params(plist), wbs, cms)
    assert len(out.sharding.device_set) == 8  # stayed partitioned
    got = np.asarray(out)
    want = np.asarray(batch_develop(mosaics, pack_params(plist), wbs, cms))
    assert (got == want).all()


def test_batch_develop_demosaic_method_matches_single(rng):
    """batch_develop(demosaic_method=...) matches the per-image develop
    with the same kernel."""
    n = 3
    mosaics = rng.integers(0, 4096, size=(n, 16, 24), dtype=np.uint16)
    plist = [EditParams(exposure=0.2 * i) for i in range(n)]
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))
    for method in ("bilinear", "malvar"):
        got = np.asarray(batch_develop(
            mosaics, pack_params(plist), wbs, cms,
            demosaic_method=method))
        for i in range(n):
            want = np.asarray(develop(mosaics[i], plist[i], WB, IDENTITY,
                                      demosaic_method=method))
            assert (got[i] == want).all(), method


@pytest.mark.parametrize("method", ["bilinear", "malvar"])
def test_sharded_5x5_demosaic_bit_identical(rng, method):
    """Row-sharded 5×5 demosaic (2-row halo exchange) must match the
    single-device develop bit-for-bit, including the global edges."""
    mesh = batch_row_mesh(row=2)
    n = 4
    mosaics = rng.integers(0, 4096, size=(n, 32, 24), dtype=np.uint16)
    plist = [EditParams(exposure=0.1 * i, contrast=4.0 * i)
             for i in range(n)]
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))
    staged = jax.device_put(mosaics, batch_sharding(mesh))
    out = np.asarray(batch_develop_sharded(
        staged, pack_params(plist), wbs, cms, mesh,
        demosaic_method=method))
    for i in range(n):
        want = np.asarray(develop(mosaics[i], plist[i], WB, IDENTITY,
                                  demosaic_method=method))
        assert (out[i] == want).all(), (method, i)


def test_host_batch_row_mesh_dcn_layout(rng):
    """The ('host','batch','row') multi-host layout: images shard over
    host x batch, collectives stay on 'row', outputs bit-match the
    single-device develop (VERDICT r1 item 8)."""
    from raweditor_tpu.parallel import host_batch_row_mesh

    mesh = host_batch_row_mesh(host=2, row=2)  # 2 host x 2 batch x 2 row
    assert mesh.shape == {"host": 2, "batch": 2, "row": 2}
    n = 8
    mosaics = rng.integers(0, 4096, size=(n, 32, 24), dtype=np.uint16)
    plist = [EditParams(exposure=0.1 * i) for i in range(n)]
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))

    staged = jax.device_put(
        mosaics, batch_sharding(mesh, host_axis="host"))
    imgs, hists = batch_develop_sharded(
        staged, pack_params(plist), wbs, cms, mesh, host_axis="host",
        with_histogram=True,
    )
    imgs = np.asarray(imgs)
    for i in range(n):
        want = np.asarray(develop(mosaics[i], plist[i], WB, IDENTITY))
        assert (imgs[i] == want).all()
    hists = np.asarray(hists)
    for i in range(n):
        assert (hists[i] == np.asarray(histogram_256(imgs[i]))).all()


def test_host_mesh_rejects_bad_divisor():
    from raweditor_tpu.parallel import host_batch_row_mesh

    with pytest.raises(ValueError):
        host_batch_row_mesh(host=3, row=2)  # 8 % 6 != 0


def test_sharded_develop_collective_pattern_is_designed_one():
    """Compiler guard: the row-sharded develop must lower to exactly
    the designed communication — 1-row halo exchange as
    collective-permutes and the histogram psum as an all-reduce,
    with NO all-gather of the mosaic/RGBA (a GSPMD or refactor
    regression to full re-gather would be a silent ~10x slowdown at
    24 MP, not a wrong answer)."""
    import functools
    import re

    mesh = batch_row_mesh(row=2)
    n = 4
    mosaics = np.zeros((n, 32, 48), np.uint16)
    staged = jax.device_put(mosaics, batch_sharding(mesh))
    params = pack_params([EditParams() for _ in range(n)])
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))
    fn = functools.partial(batch_develop_sharded, mesh=mesh, rgba=True,
                           with_histogram=True)
    hlo = jax.jit(lambda m, p, w, c: fn(m, p, w, c)).lower(
        staged, params, wbs, cms).compile().as_text()

    def count(op):
        return len(re.findall(op + r"\(", hlo)) + \
            len(re.findall(op + r"-start", hlo))

    assert count("collective-permute") >= 2  # up + down halos
    assert count("all-reduce") >= 1          # histogram psum
    assert count("all-gather") == 0
    assert count("all-to-all") == 0

    # The row-sharded YCbCr 4:2:0 pass (r3 planes transport) needs no
    # collectives at all when per-shard heights are chroma-aligned.
    from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr420

    out = fn(staged, params, wbs, cms)[0]
    hlo2 = jax.jit(rgba_words_to_ycbcr420).lower(
        out).compile().as_text()
    for op in ("all-gather", "collective-permute", "all-reduce",
               "all-to-all"):
        assert op not in hlo2, op


@pytest.mark.parametrize("output", ["ycbcr420", "ycbcr444"])
def test_sharded_ycbcr_output_matches_single_chip(rng, output):
    """JPEG planes composed INTO the sharded develop program (r3 late:
    no separate conversion pass) must equal the single-chip composed
    program exactly, and stay collective-free beyond the designed halo
    pattern."""
    import functools
    import re

    from raweditor_tpu.parallel.batch import batch_develop_rgba

    mesh = batch_row_mesh(row=2)
    n = 4
    mosaics = rng.integers(0, 4096, size=(n, 32, 48), dtype=np.uint16)
    params = pack_params([EditParams(exposure=0.1 * i) for i in range(n)])
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))

    staged = jax.device_put(mosaics, batch_sharding(mesh))
    sharded = batch_develop_sharded(staged, params, wbs, cms, mesh,
                                    rgba=True, output=output)
    single = batch_develop_rgba(mosaics, params, wbs, cms, output=output)
    assert len(sharded) == 3
    for s, t, name in zip(sharded, single, ("y", "cb", "cr")):
        assert s.dtype == np.uint8
        assert np.array_equal(np.asarray(s), np.asarray(t)), name

    # Collective guard: the composed program still has exactly the
    # halo collective-permutes — the in-shard conversion adds none.
    fn = functools.partial(batch_develop_sharded, mesh=mesh, rgba=True,
                           output=output)
    hlo = jax.jit(lambda m, p, w, c: fn(m, p, w, c)).lower(
        staged, params, wbs, cms).compile().as_text()
    assert len(re.findall(r"all-gather\(", hlo)) == 0
    assert len(re.findall(r"all-to-all\(", hlo)) == 0


def test_sharded_ycbcr_rejects_histogram(rng):
    mesh = batch_row_mesh(row=2)
    n = 4
    mosaics = np.zeros((n, 32, 48), np.uint16)
    staged = jax.device_put(mosaics, batch_sharding(mesh))
    params = pack_params([EditParams() for _ in range(n)])
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))
    with pytest.raises(ValueError, match="ycbcr"):
        batch_develop_sharded(staged, params, wbs, cms, mesh, rgba=True,
                              with_histogram=True, output="ycbcr420")


def test_exporter_extras_lanes_mesh_vs_solo_byte_identical(rng, tmp_path):
    """Every remaining lane the exporter routes on a mesh (VERDICT r3
    item 5): grad demosaic (data-parallel route), mixer/grading/locals
    params (the extras flush), all-JPEG ycbcr420 planes, and --long-edge
    device resize — each byte-identical to the solo run."""
    import os

    from raweditor_tpu.ops.local_adjust import LocalAdjust
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    mesh = batch_row_mesh(row=2)
    n_batch = mesh.shape["batch"]
    variants = [
        EditParams(exposure=0.2),
        EditParams(sat_orange=40.0, lum_blue=-25.0),
        EditParams(grade_mid_sat=30.0, grade_mid_hue=200.0,
                   grade_balance=0.2),
        EditParams(locals=(LocalAdjust(kind="radial", exposure=0.5),)),
        EditParams(exposure=0.1, sat_red=20.0, grade_shadow_sat=15.0),
    ]
    n_jobs = max(len(variants), n_batch)
    jobs, solo_jobs = [], []
    for i in range(n_jobs):
        path = str(tmp_path / f"img{i}.nef")
        write_synthetic_raw(
            path, rng.integers(0, 4096, size=(16, 48), dtype=np.uint16),
            compression="nikon")
        p = variants[i % len(variants)]
        jobs.append(ExportJob(path, str(tmp_path / "mesh" / f"{i}.jpg"),
                              p))
        solo_jobs.append(ExportJob(
            path, str(tmp_path / "solo" / f"{i}.jpg"), p))
    kwargs = dict(batch_size=n_batch, demosaic_method="grad",
                  mode="accurate", transfer="srgb", long_edge=24,
                  decode_threads=2, encode_threads=2)
    report = run_batch_export(jobs, mesh=mesh, **kwargs)
    assert report.succeeded == n_jobs, report.as_dict()
    solo = run_batch_export(solo_jobs, mesh=None, **kwargs)
    assert solo.succeeded == n_jobs
    for i in range(n_jobs):
        got = open(jobs[i].out_path, "rb").read()
        want = open(solo_jobs[i].out_path, "rb").read()
        assert got == want, f"lane {i % len(variants)} differs"
        assert os.path.getsize(jobs[i].out_path) > 0
