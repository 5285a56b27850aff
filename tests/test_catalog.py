import os
import sqlite3

import pytest

from raweditor_tpu.catalog import Image, Library, RAW_EXTENSIONS
from raweditor_tpu.params import EditParams


@pytest.fixture
def lib(tmp_path):
    with Library(tmp_path / "cat.db") as library:
        yield library


def test_schema_matches_reference(lib):
    cols = {
        row[1]
        for row in lib.conn.execute("PRAGMA table_info(images)").fetchall()
    }
    # reference: state/library.rs:56-64 + ALTERs :95-112
    assert cols == {
        "id", "path", "filename", "width", "height", "imported_at",
        "cache_status", "cache_path_thumb", "cache_path_instant",
        "cache_path_working", "file_status",
    }
    edit_cols = {
        row[1]
        for row in lib.conn.execute("PRAGMA table_info(edits)").fetchall()
    }
    assert edit_cols == {"id", "image_id", "settings_json"}
    indexes = {
        row[0]
        for row in lib.conn.execute(
            "SELECT name FROM sqlite_master WHERE type='index'"
        ).fetchall()
    }
    assert {"idx_images_imported_at", "idx_edits_image_id",
            "idx_images_cache_status"} <= indexes


def test_reopen_is_idempotent(tmp_path):
    path = tmp_path / "cat.db"
    Library(path).close()
    Library(path).close()  # migrations must not fail on existing columns


def test_import_and_duplicate_skip(lib, tmp_path):
    f = tmp_path / "a.nef"
    f.write_bytes(b"x")
    image_id = lib.import_image(str(f), "a.nef")
    assert image_id == 1
    with pytest.raises(sqlite3.IntegrityError):
        lib.import_image(str(f), "a.nef")  # UNIQUE path


def test_import_folder_filters_extensions(lib, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.nef").write_bytes(b"x")
    (tmp_path / "sub" / "b.CR2").write_bytes(b"x")  # case-insensitive
    (tmp_path / "c.jpg").write_bytes(b"x")  # not RAW
    (tmp_path / "d.txt").write_bytes(b"x")
    stats = lib.import_folder(tmp_path)
    assert stats == {"imported": 2, "skipped": 0}
    stats = lib.import_folder(tmp_path)  # re-import: all dupes
    assert stats == {"imported": 0, "skipped": 2}
    assert lib.image_count() == 2


def test_sixteen_reference_extensions():
    # reference: main.rs:1852-1855 — the 16 reference extensions, plus
    # "crw" (decoded by the reference's rawloader backend but missing
    # from its own import filter; raw/loader.rs:50-54).
    assert len(RAW_EXTENSIONS) == 17
    assert "nef" in RAW_EXTENSIONS and "rwl" in RAW_EXTENSIONS
    assert "crw" in RAW_EXTENSIONS


def test_edit_store_round_trip(lib, tmp_path):
    f = tmp_path / "a.nef"
    f.write_bytes(b"x")
    image_id = lib.import_image(str(f), "a.nef")

    assert not lib.has_edits(image_id)
    assert lib.load_edit_params(image_id) == EditParams()

    p = EditParams(exposure=1.25, tint=-0.5)
    lib.save_edit_params(image_id, p)
    assert lib.has_edits(image_id)
    assert lib.load_edit_params(image_id) == p

    # Upsert keeps exactly one row (reference: state/library.rs:310-337).
    lib.save_edit_params(image_id, p.replace(contrast=9.0))
    n = lib.conn.execute(
        "SELECT COUNT(*) FROM edits WHERE image_id = ?", (image_id,)
    ).fetchone()[0]
    assert n == 1

    lib.delete_edits(image_id)
    assert not lib.has_edits(image_id)


def test_edit_json_is_serde_compatible(lib, tmp_path):
    """A row written by the reference app must replay byte-for-byte."""
    f = tmp_path / "a.nef"
    f.write_bytes(b"x")
    image_id = lib.import_image(str(f), "a.nef")
    serde_json = (
        '{"exposure":1.5,"contrast":20.0,"highlights":0.0,"shadows":0.0,'
        '"whites":1.0,"blacks":0.0,"vibrance":0.0,"saturation":-10.0,'
        '"temperature":0.0,"tint":0.0}'
    )
    lib.conn.execute(
        "INSERT INTO edits (image_id, settings_json) VALUES (?, ?)",
        (image_id, serde_json),
    )
    lib.conn.commit()
    p = lib.load_edit_params(image_id)
    assert p.exposure == 1.5 and p.saturation == -10.0


def test_cache_state_machine(lib, tmp_path):
    f = tmp_path / "a.nef"
    f.write_bytes(b"x")
    image_id = lib.import_image(str(f), "a.nef")
    assert [i.id for i in lib.get_pending_cache()] == [image_id]

    tiers = []
    for tier in ("thumb", "instant", "working"):
        t = tmp_path / f"{tier}.jpg"
        t.write_bytes(b"j")
        tiers.append(str(t))
    lib.set_image_cache_paths(image_id, *tiers)
    assert lib.get_pending_cache() == []
    img = lib.get_image(image_id)
    assert img.cache_path_working == tiers[2]

    # Tier file vanishes → verify_cache resets to pending
    # (reference: state/library.rs:240-270).
    os.remove(tiers[0])
    assert lib.verify_cache() == 1
    assert [i.id for i in lib.get_pending_cache()] == [image_id]


def test_failed_quarantine(lib, tmp_path):
    f = tmp_path / "bad.nef"
    f.write_bytes(b"x")
    image_id = lib.import_image(str(f), "bad.nef")
    lib.set_cache_status(image_id, "failed")
    assert lib.get_pending_cache() == []  # not retried


def test_verify_files_tombstones(lib, tmp_path):
    f = tmp_path / "a.nef"
    f.write_bytes(b"x")
    image_id = lib.import_image(str(f), "a.nef")
    assert lib.verify_files() == 0
    os.remove(f)
    assert lib.verify_files() == 1
    assert lib.get_image(image_id).is_deleted()


def test_delete_cascade(lib, tmp_path):
    f = tmp_path / "a.nef"
    f.write_bytes(b"x")
    image_id = lib.import_image(str(f), "a.nef")
    lib.save_edit_params(image_id, EditParams(exposure=1.0))
    lib.conn.execute("DELETE FROM images WHERE id = ?", (image_id,))
    lib.conn.commit()
    n = lib.conn.execute("SELECT COUNT(*) FROM edits").fetchone()[0]
    assert n == 0  # FK cascade


def test_concurrent_libraries_one_file(tmp_path):
    """SQLite file locking coordinates one-Library-per-thread access,
    the same discipline the reference uses (its Connection is not Send,
    reference: main.rs:125-126)."""
    from concurrent.futures import ThreadPoolExecutor

    db = tmp_path / "cat.db"
    Library(db).close()  # init schema once

    def worker(i):
        with Library(db) as lib:
            f = tmp_path / f"t{i}.nef"
            f.write_bytes(b"x")
            image_id = lib.import_image(str(f), f.name)
            lib.save_edit_params(image_id, EditParams(exposure=float(i)))
            return image_id

    with ThreadPoolExecutor(4) as ex:
        ids = list(ex.map(worker, range(8)))
    with Library(db) as lib:
        assert lib.image_count() == 8
        for i, image_id in enumerate(ids):
            assert lib.load_edit_params(image_id).exposure == float(i)


def test_edit_history_and_undo(lib, tmp_path):
    """Append-mode history + undo (beyond the reference's single-row
    upsert; schema-compatible — the reference reads the latest row)."""
    f = tmp_path / "a.nef"
    f.write_bytes(b"x")
    image_id = lib.import_image(str(f), "a.nef")

    lib.save_edit_params(image_id, EditParams(exposure=1.0), append=True)
    lib.save_edit_params(image_id, EditParams(exposure=2.0), append=True)
    lib.save_edit_params(image_id, EditParams(exposure=3.0), append=True)

    hist = lib.edit_history(image_id)
    assert [p.exposure for p in hist] == [1.0, 2.0, 3.0]
    # Latest wins for normal loads (reference semantics).
    assert lib.load_edit_params(image_id).exposure == 3.0

    assert lib.undo_edit(image_id).exposure == 2.0
    assert lib.undo_edit(image_id).exposure == 1.0
    assert lib.undo_edit(image_id) == EditParams()
    assert lib.undo_edit(image_id) == EditParams()  # empty: no-op


def test_migrates_reference_created_db(tmp_path):
    """A database created by the ORIGINAL reference schema (pre-Phase-28:
    no cache-path/file_status columns) must open and migrate cleanly
    (reference: state/library.rs:52-124)."""
    import sqlite3 as sq

    db = tmp_path / "old.db"
    conn = sq.connect(db)
    conn.execute(
        """CREATE TABLE images (
            id              INTEGER PRIMARY KEY AUTOINCREMENT,
            path            TEXT NOT NULL UNIQUE,
            filename        TEXT NOT NULL,
            width           INTEGER,
            height          INTEGER,
            imported_at     INTEGER NOT NULL,
            cache_status    TEXT DEFAULT 'pending'
        )"""
    )
    conn.execute(
        """CREATE TABLE edits (
            id              INTEGER PRIMARY KEY AUTOINCREMENT,
            image_id        INTEGER NOT NULL,
            settings_json   TEXT NOT NULL,
            FOREIGN KEY(image_id) REFERENCES images(id) ON DELETE CASCADE
        )"""
    )
    conn.execute(
        "INSERT INTO images (path, filename, imported_at) "
        "VALUES ('/x/a.nef', 'a.nef', 123)"
    )
    conn.execute(
        "INSERT INTO edits (image_id, settings_json) VALUES (1, "
        "'{\"exposure\":1.5,\"contrast\":0.0,\"highlights\":0.0,"
        "\"shadows\":0.0,\"whites\":1.0,\"blacks\":0.0,\"vibrance\":0.0,"
        "\"saturation\":0.0,\"temperature\":0.0,\"tint\":0.0}')"
    )
    conn.commit()
    conn.close()

    with Library(db) as lib:
        imgs = lib.get_all_images()
        assert len(imgs) == 1
        assert imgs[0].file_status == "exists"  # COALESCE default
        assert imgs[0].cache_path_thumb is None
        assert lib.load_edit_params(1).exposure == 1.5
        assert [i.id for i in lib.get_pending_cache()] == [1]


class TestRatings:
    def test_set_get_filter(self, tmp_path, rng):
        import numpy as np

        from raweditor_tpu.catalog import Library
        from raweditor_tpu.raw.synth import write_synthetic_raw

        for i in range(3):
            write_synthetic_raw(
                tmp_path / f"r{i}.nef",
                rng.integers(0, 4096, size=(8, 12), dtype=np.uint16))
        with Library(tmp_path / "cat.db") as lib:
            lib.import_folder(tmp_path)
            ids = [img.id for img in lib.get_all_images()]
            assert lib.get_rating(ids[0]) == (0, "none")
            lib.set_rating(ids[0], rating=5, flag="pick")
            lib.set_rating(ids[1], rating=2)
            lib.set_rating(ids[2], flag="reject")
            assert lib.get_rating(ids[0]) == (5, "pick")
            assert lib.get_rating(ids[1]) == (2, "none")
            assert lib.get_rating(ids[2]) == (0, "reject")
            # Partial update keeps the other field.
            lib.set_rating(ids[0], rating=4)
            assert lib.get_rating(ids[0]) == (4, "pick")
            assert {i.id for i in lib.filter_images(min_rating=2)} == {
                ids[0], ids[1]}
            assert [i.id for i in lib.filter_images(flag="reject")] == [
                ids[2]]
            with pytest.raises(ValueError):
                lib.set_rating(ids[0], rating=9)
            with pytest.raises(ValueError):
                lib.set_rating(ids[0], flag="bogus")
            with pytest.raises(ValueError):
                lib.set_rating(99999, rating=1)

    def test_reference_tables_untouched(self, tmp_path):
        """The ratings side table must not alter the reference-compatible
        images/edits schema."""
        import sqlite3

        from raweditor_tpu.catalog import Library

        with Library(tmp_path / "cat.db") as lib:
            pass
        conn = sqlite3.connect(tmp_path / "cat.db")
        cols = [r[1] for r in conn.execute("PRAGMA table_info(images)")]
        assert "rating" not in cols and "flag" not in cols
        tables = {r[0] for r in conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        assert "ratings" in tables
        conn.close()


class TestCollectionsAndSearch:
    def test_collection_crud(self, tmp_path):
        from raweditor_tpu.catalog import Library

        lib = Library(tmp_path / "c.db")
        ids = [lib.import_image(f"/x/img{i}.nef", f"img{i}.nef")
               for i in range(4)]
        assert lib.add_to_collection("trip", ids[:3]) == 3
        assert lib.add_to_collection("trip", ids[:3]) == 0  # dupes
        assert lib.list_collections() == [("trip", 3)]
        got = {i.id for i in lib.filter_images(collection="trip")}
        assert got == set(ids[:3])
        assert lib.remove_from_collection("trip", [ids[0]]) == 1
        assert lib.list_collections() == [("trip", 2)]
        assert lib.delete_collection("trip") is True
        assert lib.delete_collection("trip") is False
        assert lib.list_collections() == []
        lib.close()

    def test_collection_rejects_unknown_image(self, tmp_path):
        from raweditor_tpu.catalog import Library

        lib = Library(tmp_path / "c.db")
        with pytest.raises(ValueError):
            lib.add_to_collection("x", [999])
        with pytest.raises(ValueError):
            lib.create_collection("   ")
        lib.close()

    def test_text_search(self, tmp_path):
        from raweditor_tpu.catalog import Library

        lib = Library(tmp_path / "c.db")
        a = lib.import_image("/shoots/alps/IMG_001.nef", "IMG_001.nef")
        b = lib.import_image("/shoots/beach/IMG_002.nef", "IMG_002.nef")
        assert {i.id for i in lib.filter_images(search="alps")} == {a}
        assert {i.id for i in lib.filter_images(search="img_00")} == {a, b}
        assert lib.filter_images(search="nothere") == []
        # Composes with collections.
        lib.add_to_collection("keep", [b])
        got = lib.filter_images(search="img", collection="keep")
        assert {i.id for i in got} == {b}
        lib.close()

    def test_search_escapes_like_metacharacters(self, tmp_path):
        """% and _ in a search string are literals, not wildcards
        (code-review r3)."""
        from raweditor_tpu.catalog import Library

        lib = Library(tmp_path / "c.db")
        a = lib.import_image("/x/IMG_001.nef", "IMG_001.nef")
        lib.import_image("/x/IMGX001.nef", "IMGX001.nef")
        pct = lib.import_image("/x/100%.nef", "100%.nef")
        assert {i.id for i in lib.filter_images(search="IMG_0")} == {a}
        assert {i.id for i in lib.filter_images(search="0%")} == {pct}
        assert lib.filter_images(search="%nothere%") == []
        with pytest.raises(ValueError):
            lib.filter_images(flag="picked")  # typo must error
        lib.close()

    def test_collection_add_is_atomic(self, tmp_path):
        """A bad id anywhere in the list leaves the catalog untouched
        (no half-applied membership, no empty collection created —
        code-review r3)."""
        from raweditor_tpu.catalog import Library

        lib = Library(tmp_path / "c.db")
        i = lib.import_image("/x/a.nef", "a.nef")
        with pytest.raises(ValueError):
            lib.add_to_collection("sel", [i, 999])
        assert lib.list_collections() == []
        lib.close()

    def test_import_folder_survives_symlink_cycle(self, tmp_path):
        """A directory symlink loop must not re-import files forever
        (code-review r3)."""
        from raweditor_tpu.catalog import Library

        root = tmp_path / "tree"
        (root / "sub").mkdir(parents=True)
        (root / "a.nef").write_bytes(b"x")
        (root / "sub" / "b.nef").write_bytes(b"x")
        try:
            (root / "sub" / "loop").symlink_to(root,
                                               target_is_directory=True)
        except OSError:
            pytest.skip("symlinks unavailable")
        lib = Library(tmp_path / "c.db")
        stats = lib.import_folder(root)
        assert stats == {"imported": 2, "skipped": 0}
        assert lib.image_count() == 2
        lib.close()

    def test_collections_survive_reopen(self, tmp_path):
        from raweditor_tpu.catalog import Library

        lib = Library(tmp_path / "c.db")
        i = lib.import_image("/x/a.nef", "a.nef")
        lib.add_to_collection("sel", [i])
        lib.close()
        lib = Library(tmp_path / "c.db")
        assert lib.list_collections() == [("sel", 1)]
        lib.close()
