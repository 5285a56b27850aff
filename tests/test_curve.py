"""Point tone curve (ops/curve.py): PCHIP math vs a NumPy reference,
monotonicity, validation, and the develop-chain integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raweditor_tpu.ops.curve import (
    MAX_POINTS,
    apply_point_curve,
    validate_points,
)


def _np_pchip(xs, ys, q):
    """Independent NumPy PCHIP (Fritsch–Carlson weighted-harmonic
    tangents), float64 — the oracle for the f32 production op."""
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    n = len(xs)
    h = np.diff(xs)
    d = np.diff(ys) / h
    m = np.empty(n)
    m[0], m[-1] = d[0], d[-1]
    for i in range(1, n - 1):
        if d[i - 1] * d[i] > 0:
            w1 = 2 * h[i] + h[i - 1]
            w2 = h[i] + 2 * h[i - 1]
            m[i] = (w1 + w2) / (w1 / d[i - 1] + w2 / d[i])
        else:
            m[i] = 0.0
    out = np.empty_like(q, np.float64)
    for j, c in enumerate(q):
        if c <= xs[0]:
            out[j] = ys[0]
        elif c >= xs[-1]:
            out[j] = ys[-1]
        else:
            i = int(np.searchsorted(xs, c, "right") - 1)
            t = (c - xs[i]) / h[i]
            out[j] = ((2 * t**3 - 3 * t**2 + 1) * ys[i]
                      + (t**3 - 2 * t**2 + t) * h[i] * m[i]
                      + (3 * t**2 - 2 * t**3) * ys[i + 1]
                      + (t**3 - t**2) * h[i] * m[i + 1])
    return np.clip(out, 0.0, 1.0)


CURVES = [
    ((0.0, 0.0), (1.0, 1.0)),                          # identity-ish
    ((0.0, 0.05), (0.25, 0.15), (0.75, 0.85), (1.0, 0.98)),  # S-curve
    ((0.0, 0.0), (0.5, 0.8), (1.0, 1.0)),              # strong lift
    ((0.0, 1.0), (1.0, 0.0)),                          # inversion
    ((0.1, 0.2), (0.4, 0.2), (0.9, 0.7)),              # flat segment
]


@pytest.mark.parametrize("pts", CURVES)
def test_matches_numpy_pchip(pts):
    q = np.linspace(-0.1, 1.1, 241).astype(np.float32)
    got = np.asarray(apply_point_curve(jnp.asarray(q), pts))
    want = _np_pchip([p[0] for p in pts], [p[1] for p in pts],
                     q.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_two_point_diagonal_is_identity_within_f32():
    q = np.linspace(0, 1, 513).astype(np.float32)
    got = np.asarray(apply_point_curve(jnp.asarray(q),
                                       ((0.0, 0.0), (1.0, 1.0))))
    np.testing.assert_allclose(got, q, atol=1e-6)


@pytest.mark.parametrize("pts", CURVES)
def test_monotone_when_points_are(pts):
    ys = [p[1] for p in pts]
    increasing = all(b >= a for a, b in zip(ys, ys[1:]))
    decreasing = all(b <= a for a, b in zip(ys, ys[1:]))
    if not (increasing or decreasing):
        pytest.skip("non-monotone control points")
    q = np.linspace(0, 1, 1001).astype(np.float32)
    got = np.asarray(apply_point_curve(jnp.asarray(q), pts))
    dg = np.diff(got)
    if increasing:
        assert (dg >= -1e-6).all()
    else:
        assert (dg <= 1e-6).all()


def test_empty_is_passthrough_object():
    q = jnp.linspace(0, 1, 7)
    assert apply_point_curve(q, ()) is q


def test_traced_coordinates_no_recompile():
    """Dragging a point = same structure = cache hit; the coordinates
    are traced leaves."""
    calls = {"n": 0}

    @jax.jit
    def run(c, pts):
        calls["n"] += 1
        return apply_point_curve(c, pts)

    q = jnp.linspace(0, 1, 32)
    a = run(q, ((0.0, 0.0), (0.5, 0.6), (1.0, 1.0)))
    b = run(q, ((0.0, 0.1), (0.5, 0.4), (1.0, 0.9)))
    assert calls["n"] == 1
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_validate_points_contract():
    assert validate_points(()) == ()
    assert validate_points([[0, 0], [1, 1]]) == ((0.0, 0.0), (1.0, 1.0))
    with pytest.raises(ValueError, match="at least 2"):
        validate_points([(0.5, 0.5)])
    with pytest.raises(ValueError, match="strictly increasing"):
        validate_points([(0.5, 0.1), (0.5, 0.9)])
    with pytest.raises(ValueError, match="strictly increasing"):
        validate_points([(0.9, 0.1), (0.1, 0.9)])
    with pytest.raises(ValueError, match="finite in"):
        validate_points([(0.0, 0.0), (1.2, 1.0)])
    with pytest.raises(ValueError, match="finite in"):
        validate_points([(0.0, float("nan")), (1.0, 1.0)])
    with pytest.raises(ValueError, match="pairs"):
        validate_points([(0.0, 0.0, 0.0), (1.0, 1.0)])
    # Non-sequence entries must be rejected even when they'd
    # float-convert elementwise: a digit string like "00" iterates to
    # two chars and previously passed as (0.0, 0.0) (advisor r4).
    with pytest.raises(ValueError, match="pairs"):
        validate_points(["00", (1.0, 1.0)])
    with pytest.raises(ValueError, match="pairs"):
        validate_points([(0.0, 0.0), 5.0])
    with pytest.raises(ValueError, match="pairs"):
        validate_points([None, (1.0, 1.0)])
    # Numeric-string coordinates inside a real pair still convert
    # (JSON round-trips sometimes stringify numbers).
    assert validate_points([["0", "0"], ["1", "1"]]) == \
        ((0.0, 0.0), (1.0, 1.0))
    too_many = [(i / (MAX_POINTS + 1), 0.5) for i in range(MAX_POINTS + 1)]
    with pytest.raises(ValueError, match="at most"):
        validate_points(too_many)


# --- integration -----------------------------------------------------------


S_CURVE = ((0.0, 0.02), (0.3, 0.2), (0.7, 0.82), (1.0, 0.99))


def test_params_serde_and_unedited():
    from raweditor_tpu.params import EditParams

    p = EditParams(point_curve=S_CURVE)
    assert not p.is_unedited()
    back = EditParams.from_json(p.to_json())
    assert back == p
    # Default params emit no point_curve key (serde-compatible with
    # the reference's ten-field schema).
    assert "point_curve" not in EditParams().to_json()
    with pytest.raises(ValueError, match="strictly increasing"):
        EditParams.from_json(
            '{"point_curve": [[0.5, 0.1], [0.5, 0.9]]}')


def test_engine_preview_and_export_apply_curve(tmp_path):
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.raw.synth import write_synthetic_raw

    rng = np.random.default_rng(3)
    path = tmp_path / "c.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16))
    eng = DevelopEngine.open(path)
    base = eng.preview(EditParams())
    lifted = eng.preview(EditParams(
        point_curve=((0.0, 0.0), (0.5, 0.8), (1.0, 1.0))))
    assert lifted.shape == base.shape
    assert lifted.astype(int).mean() > base.astype(int).mean()
    # The AOT/pipelined hot path must fall back (compiled curve-free).
    eng.compile_preview()
    aot_base = np.asarray(eng.preview_device(EditParams()))
    assert (aot_base[..., :3] == base[..., :3]).all() or \
        (aot_base == base).all()
    curved_again = eng.preview(EditParams(
        point_curve=((0.0, 0.0), (0.5, 0.8), (1.0, 1.0))))
    assert (curved_again == lifted).all()
    # 16-bit export uses the exact transfer AND the curve.
    out16 = eng.export_tiff16(tmp_path / "c.tiff", EditParams(
        point_curve=((0.0, 0.0), (0.5, 0.8), (1.0, 1.0))))
    from PIL import Image

    arr16 = np.asarray(Image.open(out16))
    base16 = np.asarray(Image.open(
        eng.export_tiff16(tmp_path / "b.tiff", EditParams())))
    assert arr16.dtype == base16.dtype and arr16.mean() > base16.mean()


def test_session_curve_command_persists(tmp_path):
    from raweditor_tpu.catalog import Library
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.pipeline.session import DevelopSession
    from raweditor_tpu.raw.synth import write_synthetic_raw

    rng = np.random.default_rng(4)
    path = tmp_path / "s.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16))
    lib = Library(tmp_path / "cat.db")
    image_id = lib.import_image(str(path), "s.nef")
    s = DevelopSession(DevelopEngine.open(path), lib, image_id)
    out = s.handle("curve set 0,0".replace(",", " ") + " 0.5 0.75 1 1")
    assert out["ok"] and out["points"] == [[0.0, 0.0], [0.5, 0.75],
                                           [1.0, 1.0]]
    assert lib.load_edit_params(image_id).point_curve == (
        (0.0, 0.0), (0.5, 0.75), (1.0, 1.0))
    assert s.handle("curve list")["points"] == out["points"]
    bad = s.handle("curve set 0.5 0.1 0.5 0.9")
    assert not bad["ok"] and "increasing" in bad["error"]
    cleared = s.handle("curve clear")
    assert cleared["ok"] and cleared["points"] == []
    assert lib.load_edit_params(image_id).point_curve == ()
    lib.close()


def test_batch_export_buckets_and_applies_curves(tmp_path):
    """Mixed curve structures split buckets (pack_params needs a
    uniform point count); outputs are byte-equal to solo engine
    exports of the same params."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    rng = np.random.default_rng(5)
    mosaics = [rng.integers(0, 4096, size=(40, 64), dtype=np.uint16)
               for _ in range(3)]
    plist = [
        EditParams(point_curve=S_CURVE),
        EditParams(point_curve=((0.0, 0.1), (1.0, 0.9))),
        EditParams(),
    ]
    jobs = []
    for i, m in enumerate(mosaics):
        p = tmp_path / f"b{i}.nef"
        write_synthetic_raw(p, m)
        jobs.append(ExportJob(raw_path=str(p),
                              out_path=str(tmp_path / f"b{i}.png"),
                              params=plist[i]))
    rep = run_batch_export(jobs, batch_size=3, decode_threads=1,
                           encode_threads=1)
    assert rep.succeeded == 3 and not rep.failed
    from PIL import Image

    for i, m in enumerate(mosaics):
        solo = DevelopEngine.open(tmp_path / f"b{i}.nef").export(
            tmp_path / f"solo{i}.png", plist[i])
        a = np.asarray(Image.open(tmp_path / f"b{i}.png"))
        b = np.asarray(Image.open(solo))
        assert (a == b).all(), f"image {i} diverged"


def test_preset_round_trip_with_curve(tmp_path, monkeypatch):
    from raweditor_tpu import presets
    from raweditor_tpu.params import EditParams

    monkeypatch.setattr(presets, "presets_dir",
                        lambda: tmp_path / "presets")
    p = EditParams(clarity=20.0, point_curve=S_CURVE)
    presets.save_preset("filmcurve", p)
    got = presets.apply_preset(EditParams(), "filmcurve")
    assert got.point_curve == S_CURVE and got.clarity == 20.0


def test_xmp_round_trip_with_curve(tmp_path):
    from raweditor_tpu import xmp
    from raweditor_tpu.params import EditParams

    p = EditParams(exposure=0.5, point_curve=S_CURVE)
    side = tmp_path / "img.xmp"
    side.write_text(xmp.params_to_xmp(p))
    back = xmp.xmp_to_params(side.read_text())[0]
    assert back.point_curve == S_CURVE and back.exposure == 0.5


def test_validate_points_non_pair_entries_are_valueerror():
    """Flat numbers / None entries must keep the ValueError contract —
    sidecar/catalog parsing quarantines per file on ValueError, and a
    TypeError escape aborted whole sidecar runs (code-review r4)."""
    for bad in ([0.5, 0.9], [None, (1.0, 1.0)], ["ab", (1.0, 1.0)]):
        with pytest.raises(ValueError, match="pairs"):
            validate_points(bad)
    from raweditor_tpu.params import EditParams

    with pytest.raises(ValueError):
        EditParams.from_json('{"point_curve": [0.5, 0.9]}')


def test_cli_curve_empty_string_clears(tmp_path):
    """--curve '' is an explicit clear of a stored curve
    (code-review r4: truthiness silently ignored it)."""
    import argparse

    from raweditor_tpu.cli._shared import _params_from_args
    from raweditor_tpu.params import EditParams

    base = EditParams(point_curve=S_CURVE)
    ns = argparse.Namespace(curve="", preset=None, local=None)
    got = _params_from_args(ns, base)
    assert got.point_curve == ()
    ns = argparse.Namespace(curve=None, preset=None, local=None)
    assert _params_from_args(ns, base).point_curve == S_CURVE
