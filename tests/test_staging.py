"""Bit-packed H2D staging (ops/staging.py + the export pipeline)."""

import numpy as np

from raweditor_tpu.ops.staging import pack12_rows, unpack12_rows
from raweditor_tpu.params import EditParams
from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
from raweditor_tpu.raw.synth import write_synthetic_raw


def test_pack12_round_trip(rng):
    m = rng.integers(0, 4096, size=(10, 16), dtype=np.uint16)
    p = pack12_rows(m)
    assert p.dtype == np.uint8 and p.nbytes == m.nbytes * 3 // 4
    assert np.array_equal(np.asarray(unpack12_rows(p)), m)
    # batched
    b = np.stack([p, p, p])
    u = np.asarray(unpack12_rows(b))
    assert u.shape == (3, 10, 16) and np.array_equal(u[0], m)


def test_pack12_extremes():
    for fill in (0, 4095):
        m = np.full((4, 8), fill, np.uint16)
        assert np.array_equal(
            np.asarray(unpack12_rows(pack12_rows(m))), m)


def test_pack14_round_trip(rng):
    from raweditor_tpu.ops.staging import pack14_rows, unpack14_rows

    m = rng.integers(0, 16384, size=(10, 16), dtype=np.uint16)
    p = pack14_rows(m)
    assert p.dtype == np.uint8 and p.nbytes == m.nbytes * 7 // 8
    assert np.array_equal(np.asarray(unpack14_rows(p)), m)
    for fill in (0, 16383):
        c = np.full((4, 8), fill, np.uint16)
        assert np.array_equal(
            np.asarray(unpack14_rows(pack14_rows(c))), c)


def test_native_pack_matches_numpy(rng, monkeypatch):
    """The C++ pack fast paths must be byte-identical to the numpy
    reference — including non-contiguous inputs and odd heights."""
    import pytest

    from raweditor_tpu.native import get_rawkit
    from raweditor_tpu.ops.staging import pack14_rows

    if get_rawkit() is None or not hasattr(get_rawkit(), "pack12_rows"):
        pytest.skip("native extension not built")
    cases = [
        rng.integers(0, 4096, size=(11, 24), dtype=np.uint16),
        np.asfortranarray(
            rng.integers(0, 4096, size=(6, 8), dtype=np.uint16)),
        rng.integers(0, 4096, size=(32, 64), dtype=np.uint16)[::2, :],
    ]
    for m in cases:
        a12 = pack12_rows(m)
        a14 = pack14_rows(m)
        monkeypatch.setattr("raweditor_tpu.native.get_rawkit",
                            lambda: None)
        b12 = pack12_rows(m)
        b14 = pack14_rows(m)
        monkeypatch.undo()
        assert np.array_equal(a12, b12)
        assert np.array_equal(a14, b14)


def test_pack_rejects_out_of_range_and_misaligned(rng):
    """Out-of-contract inputs must raise, not wrap silently — a >=2^bits
    sample would truncate on the u8 assignment and reconstruct as a
    DIFFERENT pixel on device (code-review r3)."""
    import pytest

    from raweditor_tpu.ops.staging import pack14_rows

    wild = rng.integers(16384, 65536, size=(7, 16), dtype=np.uint16)
    with pytest.raises(ValueError):
        pack12_rows(wild)
    with pytest.raises(ValueError):
        pack14_rows(wild)
    odd = rng.integers(0, 4096, size=(4, 3), dtype=np.uint16)
    with pytest.raises(ValueError):
        pack12_rows(odd)
    with pytest.raises(ValueError):
        pack14_rows(rng.integers(0, 4096, size=(4, 6), dtype=np.uint16))
    with pytest.raises(ValueError):
        pack12_rows(rng.integers(0, 4096, size=(8,), dtype=np.uint16))


def test_export_stages_14bit_packed(tmp_path, rng):
    h, w = 16, 24
    m = rng.integers(4096, 16384, size=(h, w), dtype=np.uint16)
    rep = _export(tmp_path, [m], "b14")
    assert rep.succeeded == 1
    assert rep.upload_bytes == h * w * 2 * 7 // 8  # 1.75 B/px


def _export(tmp_path, mosaics, tag):
    jobs = []
    for i, m in enumerate(mosaics):
        p = tmp_path / f"{tag}{i}.nef"
        write_synthetic_raw(p, m, bpp=16 if m.max() > 4095 else 12)
        jobs.append(ExportJob(raw_path=str(p),
                              params=EditParams(exposure=0.2),
                              out_path=str(tmp_path / f"{tag}{i}.png")))
    return run_batch_export(jobs, batch_size=len(jobs))


def test_export_stages_12bit_packed(tmp_path, rng):
    """12-bit mosaics stage at 1.5 B/px; the decoded pixels match the
    output of a host-staged run bit-for-bit."""
    h, w = 16, 24
    mosaics = [rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
               for _ in range(2)]
    rep = _export(tmp_path, mosaics, "a")
    assert rep.succeeded == 2
    assert rep.upload_bytes == 2 * h * w * 2 * 3 // 4  # 1.5 B/px
    # Same files through the unstaged path (budget 0 via env is
    # process-wide; instead compare against fresh default-path PNGs
    # from a second run — determinism pins equality).
    rep2 = _export(tmp_path, mosaics, "b")
    for i in range(2):
        assert (tmp_path / f"a{i}.png").read_bytes() == \
            (tmp_path / f"b{i}.png").read_bytes()


def test_partial_staging_under_budget(tmp_path, rng, monkeypatch):
    """A budget smaller than the batch must still use the staged
    buffers that fit (no all-or-nothing discard) and produce outputs
    identical to the unconstrained run."""
    import raweditor_tpu.pipeline.export as ex

    h, w = 16, 24
    per_packed = h * w * 2 * 3 // 4
    mosaics = [rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
               for _ in range(4)]
    rep_full = _export(tmp_path, mosaics, "full")
    assert rep_full.upload_bytes == 4 * per_packed

    monkeypatch.setattr(ex, "_STAGE_BUDGET", 2 * per_packed + 8)
    rep_small = _export(tmp_path, mosaics, "small")
    assert rep_small.succeeded == 4
    # 2 staged packed + 2 uploaded raw at flush.
    assert rep_small.upload_bytes == 2 * per_packed + 2 * h * w * 2
    for i in range(4):
        assert (tmp_path / f"full{i}.png").read_bytes() == \
            (tmp_path / f"small{i}.png").read_bytes()
    assert ex._stage_used == 0  # budget fully returned


def test_concurrent_exports_share_budget_cleanly(tmp_path, rng):
    """Two run_batch_export calls on separate threads share the
    process-wide staging budget; both must succeed and the budget must
    return to zero (the self-heal must not clobber an active peer)."""
    from concurrent.futures import ThreadPoolExecutor

    import raweditor_tpu.pipeline.export as ex

    h, w = 16, 24
    # Pre-generate on the main thread (numpy Generators aren't
    # thread-safe); the workers only run the exports.
    sets = {tag: [rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
                  for _ in range(3)]
            for tag in ("ca", "cb")}

    def one(tag):
        return _export(tmp_path, sets[tag], tag)

    with ThreadPoolExecutor(2) as pool:
        ra, rb = pool.map(one, ["ca", "cb"])
    assert ra.succeeded == 3 and rb.succeeded == 3
    assert ex._stage_used == 0
    assert ex._stage_runs == 0


def test_export_16bit_values_stage_unpacked(tmp_path, rng):
    """Samples above 4095 can't pack to 12 bits — staging falls back
    to the raw u16 buffer transparently."""
    h, w = 16, 24
    m = rng.integers(0, 65535, size=(h, w), dtype=np.uint16)
    m[0, 0] = 65535
    rep = _export(tmp_path, [m], "wide")
    assert rep.succeeded == 1
    assert rep.upload_bytes == h * w * 2  # full u16
