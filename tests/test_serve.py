"""TCP develop service (pipeline/serve.py)."""

import json
import socket

import numpy as np
import pytest

from raweditor_tpu.catalog import Library
from raweditor_tpu.pipeline.serve import DevelopServer
from raweditor_tpu.raw.synth import write_synthetic_raw


@pytest.fixture
def server(tmp_path, rng):
    path = tmp_path / "a.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16))
    lib = Library(tmp_path / "cat.db")
    image_id = lib.import_image(str(path), "a.nef")
    lib.close()
    srv = DevelopServer(db_path=str(tmp_path / "cat.db"))
    srv.serve_background()
    yield srv, image_id, path
    srv.shutdown()
    srv.server_close()


class _Client:
    def __init__(self, address):
        self.sock = socket.create_connection(address, timeout=30)
        self.rfile = self.sock.makefile("r")
        self.greeting = json.loads(self.rfile.readline())

    def ask(self, line: str) -> dict:
        self.sock.sendall((line + "\n").encode())
        return json.loads(self.rfile.readline())

    def close(self):
        self.sock.sendall(b"quit\n")
        self.sock.close()


def test_serve_session_over_tcp(server, tmp_path):
    srv, image_id, _ = server
    c = _Client(srv.address)
    assert c.greeting["ok"] and "open" in c.greeting["commands"]
    # Commands before open are rejected cleanly.
    out = c.ask("set exposure 1.0")
    assert not out["ok"] and "open" in out["error"]
    out = c.ask(f"open {image_id}")
    assert out["ok"] and out["size"] == [32, 24]
    out = c.ask("set exposure 1.0")
    assert out["ok"] and out["render_ms"] > 0
    out = c.ask(f"render {tmp_path / 'served.png'}")
    assert out["ok"]
    assert (tmp_path / "served.png").exists()
    out = c.ask("histogram")
    assert out["ok"] and len(out["r"]) == 256
    # Inline-JPEG frame: the remote-client preview transport.
    out = c.ask("frame 70")
    assert out["ok"] and out["size"] == [32, 24]
    import base64
    import io

    from PIL import Image

    with Image.open(io.BytesIO(
            base64.b64decode(out["jpeg_base64"]))) as im:
        assert im.size == (32, 24)
    # Per-tick persistence reaches the catalog.
    lib = Library(tmp_path / "cat.db")
    assert lib.load_edit_params(image_id).exposure == 1.0
    lib.close()
    c.close()


def test_serve_stats_and_reset_before_open(server):
    """stats/reset don't touch the engine — they must work before an
    image is open, as the greeting advertises (code-review r3)."""
    srv, image_id, path = server
    c = _Client(srv.address)
    out = c.ask("stats")
    assert out["ok"] and out["latency"]["count"] == 0
    assert c.ask("reset")["ok"]
    out = c.ask("set exposure 1.0")  # engine commands still gated
    assert not out["ok"] and "no image open" in out["error"]
    out = c.ask("wb 0.5 0.5")  # the eyedropper is gated too
    # (it was missing from _COMMANDS and dereferenced a None engine;
    # code-review r4)
    assert not out["ok"] and "no image open" in out["error"]
    assert c.ask(f"open {image_id}")["ok"]
    c.close()


def test_serve_concurrent_clients_isolated(server):
    srv, image_id, path = server
    a = _Client(srv.address)
    b = _Client(srv.address)
    assert a.ask(f"open {image_id}")["ok"]
    assert b.ask(f"open {path}")["ok"]  # by path: no catalog binding
    a.ask("set exposure 2.0")
    out_b = b.ask("stats")
    assert out_b["latency"]["count"] == 0  # b saw none of a's ticks
    assert b.ask("set contrast 5.0")["ok"]
    assert a.ask("stats")["latency"]["count"] == 1
    a.close()
    b.close()


def test_serve_survives_garbage_bytes(server, rng):
    """Binary garbage, huge lines, and abrupt disconnects must never
    take the server down — later clients still get service."""
    srv, image_id, _ = server
    for _ in range(5):
        sock = socket.create_connection(srv.address, timeout=30)
        sock.makefile("r").readline()  # greeting
        blob = bytes(rng.integers(0, 256, size=int(rng.integers(1, 4096)),
                                  dtype=np.uint8))
        try:
            sock.sendall(blob + b"\n")
            sock.sendall(b"\xff" * 70000 + b"\n")  # oversized line
        except OSError:
            pass
        sock.close()  # abrupt, no quit
    # A fresh, well-behaved client still works.
    c = _Client(srv.address)
    assert c.ask(f"open {image_id}")["ok"]
    assert c.ask("histogram")["ok"]
    c.close()


def test_serve_bad_lines_keep_connection(server):
    srv, image_id, _ = server
    c = _Client(srv.address)
    c.ask(f"open {image_id}")
    assert not c.ask("set exposure notanumber")["ok"]
    assert not c.ask("frobnicate")["ok"]
    assert c.ask("set exposure 0.5")["ok"]  # still alive
    c.close()
