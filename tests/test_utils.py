import json
import time

import pytest

from raweditor_tpu.utils.config import Config
from raweditor_tpu.utils.timing import LatencyStats, StageTimer


def test_config_defaults_match_reference_constants():
    cfg = Config().validate()
    # reference: gpu/pipeline.rs:125,131; raw/processor.rs:13-15;
    # main.rs:803.
    assert cfg.max_preview_width == 1280
    assert cfg.histogram_width == 128
    assert (cfg.tier_thumb, cfg.tier_instant, cfg.tier_working) == (
        256, 384, 1280)
    assert (cfg.zoom_min, cfg.zoom_max) == (0.1, 10.0)


def test_config_env_overlay(monkeypatch):
    monkeypatch.setenv("RAWEDITOR_TPU_BATCH_SIZE", "32")
    monkeypatch.setenv("RAWEDITOR_TPU_MODE", "accurate")
    monkeypatch.setenv("RAWEDITOR_TPU_USE_PALLAS_KERNEL", "true")
    cfg = Config.from_env()
    assert cfg.batch_size == 32
    assert cfg.mode == "accurate"
    assert cfg.use_pallas_kernel is True


def test_config_validation():
    with pytest.raises(ValueError):
        Config(mode="bogus").validate()
    with pytest.raises(ValueError):
        Config(jpeg_quality=0).validate()
    with pytest.raises(ValueError):
        Config(zoom_min=5.0, zoom_max=1.0).validate()


def test_config_json_round_trip(tmp_path):
    cfg = Config(batch_size=16, mode="accurate")
    p = tmp_path / "cfg.json"
    p.write_text(cfg.to_json())
    restored = Config.from_json(p)
    assert restored == cfg
    p.write_text(json.dumps({"bogus_key": 1}))
    with pytest.raises(ValueError):
        Config.from_json(p)


def test_stage_timer():
    t = StageTimer()
    with t.stage("decode"):
        time.sleep(0.01)
    with t.stage("decode"):
        pass
    t.add("device", 0.5)
    rep = t.report()
    assert rep["decode"]["count"] == 2
    assert rep["decode"]["total_s"] >= 0.01
    assert rep["device"]["total_s"] == 0.5


def test_latency_stats():
    s = LatencyStats()
    for ms in (1, 2, 3, 4, 100):
        s.record(ms / 1000)
    summary = s.summary()
    assert summary["count"] == 5
    assert summary["p50_ms"] == pytest.approx(3.0, rel=0.01)
    assert summary["max_ms"] == pytest.approx(100.0, rel=0.01)
    with s.measure():
        pass
    assert s.summary()["count"] == 6


def test_device_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    from raweditor_tpu.utils.profiling import annotate, device_trace

    @annotate("smoke-op")
    def op():
        return jax.jit(lambda x: x * 2)(jnp.ones((8, 8)))

    with device_trace(str(tmp_path / "trace")):
        op().block_until_ready()
    import os

    found = []
    for root, _dirs, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found, "no profiler artifacts written"


def test_profile_module_durations_parses_device_plane():
    """Parse a synthetic xspace: only device-plane events matching the
    prefix count (host planes and other modules are ignored)."""
    pytest.importorskip("jax.profiler")
    from jax.profiler import ProfileData

    from raweditor_tpu.utils.profiling import profile_module_durations

    text = """
planes {
  name: "/device:TPU:0"
  lines {
    events { metadata_id: 1 offset_ps: 0 duration_ps: 440000000 }
    events { metadata_id: 1 offset_ps: 500000000 duration_ps: 460000000 }
    events { metadata_id: 2 offset_ps: 0 duration_ps: 10000000 }
  }
  event_metadata { key: 1 value { id: 1 name: "jit_develop_preview(7)" } }
  event_metadata { key: 2 value { id: 2 name: "copy.5" } }
}
planes {
  name: "/host:CPU"
  lines {
    events { metadata_id: 1 offset_ps: 0 duration_ps: 990000000 }
  }
  event_metadata { key: 1 value { id: 1 name: "jit_develop_preview(7)" } }
}
"""
    durs = profile_module_durations(
        ProfileData.from_text_proto(text), "jit_develop_preview"
    )
    assert durs == [0.44, 0.46]


def test_device_execution_times_empty_on_cpu(tmp_path):
    """The CPU backend records no device plane; the helper must return
    [] (bench.py falls back to the amortized number)."""
    import jax
    import jax.numpy as jnp

    from raweditor_tpu.utils.profiling import (
        device_execution_times, device_trace)

    f = jax.jit(lambda x: x + 1)
    f(jnp.ones((4,))).block_until_ready()
    with device_trace(str(tmp_path / "t")):
        f(jnp.ones((4,))).block_until_ready()
    assert device_execution_times(str(tmp_path / "t"), "jit_") == []


def test_config_mesh_rows_validation():
    import pytest

    with pytest.raises(ValueError):
        Config(mesh_rows=-1).validate()
    Config(mesh_rows=0).validate()


def test_config_file_base_plus_env_overlay(tmp_path, monkeypatch):
    """RAWEDITOR_TPU_CONFIG names a JSON base config; env variables
    still win over the file (deploy-file + per-run-env layering)."""
    import json

    import pytest

    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(
        {"tier_working": 640, "jpeg_quality": 80, "mode": "accurate"}))
    monkeypatch.setenv("RAWEDITOR_TPU_CONFIG", str(path))
    cfg = Config.from_env()
    assert cfg.tier_working == 640
    assert cfg.jpeg_quality == 80
    assert cfg.mode == "accurate"
    monkeypatch.setenv("RAWEDITOR_TPU_JPEG_QUALITY", "70")
    assert Config.from_env().jpeg_quality == 70  # env wins
    # Explicit base still bypasses the file layer.
    assert Config.from_env(Config()).tier_working == 1280

    monkeypatch.setenv("RAWEDITOR_TPU_CONFIG", str(tmp_path / "no.json"))
    with pytest.raises(ValueError):
        Config.from_env()
    path.write_text(json.dumps({"bogus_key": 1}))
    monkeypatch.setenv("RAWEDITOR_TPU_CONFIG", str(path))
    with pytest.raises(ValueError):
        Config.from_env()
