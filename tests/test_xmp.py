"""XMP sidecar interchange (raweditor_tpu/xmp.py): packet round trip,
third-party tolerance, strictness, naming conventions, and the CLI
write/apply cycle."""

import json
import os

import numpy as np
import pytest

from raweditor_tpu.params import EditParams
from raweditor_tpu.xmp import (
    RWT_NS,
    find_sidecar,
    params_to_xmp,
    read_sidecar,
    sidecar_path_for,
    write_sidecar,
    xmp_to_params,
)


def test_roundtrip_params_rating_label():
    p = EditParams(exposure=0.8, contrast=12.0, grade_shadow_sat=40.0,
                   sat_blue=-30.0, sharpen=55.0)
    text = params_to_xmp(p, rating=4, label="keeper")
    q, rating, flag, label = xmp_to_params(text)
    assert q == p
    assert rating == 4 and flag == "none" and label == "keeper"


def test_reject_flag_uses_negative_rating_convention():
    text = params_to_xmp(EditParams(), rating=3, flag="reject")
    assert 'Rating="-1"' in text
    _, rating, flag, _ = xmp_to_params(text)
    assert flag == "reject" and rating is None


def test_pick_flag_carried_in_rwt_namespace():
    text = params_to_xmp(EditParams(), rating=5, flag="pick")
    assert 'Rating="5"' in text  # pick does not distort the stars
    _, rating, flag, _ = xmp_to_params(text)
    assert rating == 5 and flag == "pick"


def test_locals_survive_the_packet():
    from raweditor_tpu.ops.local_adjust import LocalAdjust

    mask = LocalAdjust.from_dict({
        "kind": "radial", "x0": 0.4, "y0": 0.5, "x1": 0.3, "y1": 0.2,
        "exposure": 0.8})
    p = EditParams(exposure=0.2, locals=(mask,))
    q, _, _, _ = xmp_to_params(params_to_xmp(p))
    assert q == p


def test_unknown_rwt_field_rejected():
    text = params_to_xmp(EditParams()).replace(
        "rwt:exposure", "rwt:wibble")
    with pytest.raises(ValueError, match="wibble"):
        xmp_to_params(text)


def test_malformed_xml_raises_valueerror():
    with pytest.raises(ValueError, match="malformed"):
        xmp_to_params("<x:xmpmeta oops")


def test_third_party_rating_only_packet():
    """A packet a third-party tool might write just to rate the file:
    no rwt payload at all. Parses to default edits + the rating."""
    text = (
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">'
        '<rdf:RDF xmlns:rdf='
        '"http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        '<rdf:Description rdf:about=""'
        ' xmlns:xmp="http://ns.adobe.com/xap/1.0/"'
        ' xmp:Rating="2" xmp:Label="Blue"/>'
        "</rdf:RDF></x:xmpmeta>")
    p, rating, flag, label = xmp_to_params(text)
    assert p == EditParams()
    assert rating == 2 and flag == "none" and label == "Blue"


def test_attribute_fallback_without_json_payload():
    """The ten readable rwt slider attributes are honored when the
    authoritative <rwt:EditParams> element is absent (e.g. a script
    that wrote attributes only)."""
    text = (
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">'
        '<rdf:RDF xmlns:rdf='
        '"http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        f'<rdf:Description rdf:about="" xmlns:rwt="{RWT_NS}"'
        ' rwt:exposure="0.5" rwt:whites="1.1"/>'
        "</rdf:RDF></x:xmpmeta>")
    p, _, _, _ = xmp_to_params(text)
    assert float(p.exposure) == 0.5 and float(p.whites) == 1.1
    assert float(p.contrast) == 0.0


def test_sidecar_naming(tmp_path):
    raw = tmp_path / "IMG_0001.NEF"
    raw.write_bytes(b"x")
    assert sidecar_path_for(raw) == str(tmp_path / "IMG_0001.xmp")
    assert find_sidecar(raw) is None
    # The darktable-style appended form is found on read ...
    appended = tmp_path / "IMG_0001.NEF.xmp"
    appended.write_text(params_to_xmp(EditParams()))
    assert find_sidecar(raw) == str(appended)
    # ... but the Adobe basename form wins when both exist.
    base = tmp_path / "IMG_0001.xmp"
    base.write_text(params_to_xmp(EditParams()))
    assert find_sidecar(raw) == str(base)


def test_write_and_read_sidecar(tmp_path):
    raw = tmp_path / "a.dng"
    raw.write_bytes(b"x")
    p = EditParams(exposure=-0.4, vignette=25.0)
    path = write_sidecar(raw, p, rating=1, flag="none", label=None)
    assert path == str(tmp_path / "a.xmp")
    assert not os.path.exists(path + ".tmp")
    q, rating, flag, label = read_sidecar(path)
    assert q == p and rating == 1 and flag == "none" and label is None


# -- CLI integration ---------------------------------------------------------


class TestSidecarCli:
    @pytest.fixture
    def catalog(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        for i in range(2):
            mosaic = rng.integers(0, 4095, (32, 48)).astype(np.uint16)
            write_synthetic_raw(str(tmp_path / f"i{i}.dng"), mosaic)
        return tmp_path

    def _run(self, tmp_path, *argv):
        from raweditor_tpu.cli import main

        return main(["--db", str(tmp_path / "cat.db"), *argv])

    def test_write_apply_cycle(self, catalog, capsys):
        from raweditor_tpu.catalog.library import Library

        assert self._run(catalog, "import", str(catalog),
                         "--no-tiers") == 0
        assert self._run(catalog, "edit", "1", "--exposure", "0.9") == 0
        assert self._run(catalog, "rate", "1", "--stars", "5") == 0
        assert self._run(catalog, "sidecar", "write") == 0
        out = json.loads(capsys.readouterr().out.splitlines()[-1])
        assert out["written"] == 2
        assert os.path.exists(catalog / "i0.xmp")

        # Fresh catalog: import --sidecars restores edits + rating.
        os.remove(catalog / "cat.db")
        assert self._run(catalog, "import", str(catalog), "--no-tiers",
                         "--sidecars") == 0
        out = json.loads(capsys.readouterr().out.splitlines()[-1])
        assert out["sidecars_applied"] == 2
        with Library(catalog / "cat.db") as lib:
            # Import order is stable (sorted filenames): i0 -> id 1.
            assert float(lib.load_edit_params(1).exposure) == 0.9
            assert lib.get_rating(1) == (5, "none")
            assert float(lib.load_edit_params(2).exposure) == 0.0

    def test_apply_respects_catalog_edits_without_force(self, catalog,
                                                        capsys):
        from raweditor_tpu.catalog.library import Library

        assert self._run(catalog, "import", str(catalog),
                         "--no-tiers") == 0
        assert self._run(catalog, "edit", "1", "--exposure", "0.9") == 0
        assert self._run(catalog, "sidecar", "write", "1") == 0
        # Newer catalog work must not be clobbered by a stale sidecar.
        assert self._run(catalog, "edit", "1", "--exposure",
                         "-1.5") == 0
        assert self._run(catalog, "sidecar", "apply", "1") == 0
        out = json.loads(capsys.readouterr().out.splitlines()[-1])
        assert out["skipped_edits"] == 1
        with Library(catalog / "cat.db") as lib:
            assert float(lib.load_edit_params(1).exposure) == -1.5
        # --force overwrites.
        assert self._run(catalog, "sidecar", "apply", "1",
                         "--force") == 0
        with Library(catalog / "cat.db") as lib:
            assert float(lib.load_edit_params(1).exposure) == 0.9

    def test_apply_reports_corrupt_sidecar(self, catalog, capsys):
        assert self._run(catalog, "import", str(catalog),
                         "--no-tiers") == 0
        (catalog / "i0.xmp").write_text("<not xmp")
        assert self._run(catalog, "sidecar", "apply") == 1
        out = json.loads(capsys.readouterr().out.splitlines()[-1])
        assert out["errors"] and "i0.xmp" in out["errors"][0]["path"]
