import json

import jax
import pytest

from raweditor_tpu.params import EditParams


def test_default_is_unedited():
    # reference: state/edit.rs:129-133
    assert EditParams().is_unedited()
    assert EditParams().whites == 1.0


def test_json_round_trip():
    # reference: state/edit.rs:135-150
    p = EditParams(exposure=1.5, contrast=20.0, saturation=-10.0)
    restored = EditParams.from_json(p.to_json())
    assert restored == p
    assert not restored.is_unedited()


def test_json_keys_match_serde_field_names():
    payload = json.loads(EditParams().to_json())
    assert set(payload) == {
        "exposure", "contrast", "highlights", "shadows", "whites",
        "blacks", "vibrance", "saturation", "temperature", "tint",
    }


def test_from_json_rejects_unknown_keys():
    with pytest.raises(ValueError):
        EditParams.from_json('{"exposure": 1.0, "bogus": 2.0}')


def test_from_json_missing_keys_default():
    p = EditParams.from_json('{"exposure": 2.0}')
    assert p.exposure == 2.0
    assert p.whites == 1.0


def test_reset():
    # reference: state/edit.rs:152-163
    p = EditParams(exposure=2.0, contrast=50.0)
    assert not p.is_unedited()
    assert p.reset().is_unedited()


def test_pytree_leaves_match_field_registry():
    # The reference's ten sliders (state/edit.rs:15-96) + the finish
    # extras (sharpen/denoise, 4 tone-curve regions, vignette — beyond
    # the reference) — the pytree must track the field registry
    # exactly, and the registry must lead with the reference's ten.
    leaves = jax.tree.leaves(EditParams())
    names = EditParams.field_names()
    assert len(leaves) == len(names)
    assert names[:10] == ("exposure", "contrast", "highlights",
                          "shadows", "whites", "blacks", "vibrance",
                          "saturation", "temperature", "tint")


def test_slider_change_does_not_recompile():
    trace_count = 0

    @jax.jit
    def f(p: EditParams):
        nonlocal trace_count
        trace_count += 1
        return p.exposure * 2.0 + p.whites

    f(EditParams(exposure=1.0))
    f(EditParams(exposure=2.0, contrast=5.0))
    f(EditParams(whites=1.1, blacks=0.05))
    assert trace_count == 1
