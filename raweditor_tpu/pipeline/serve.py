"""TCP develop service: the session line protocol over a socket.

The reference is a single-user desktop app; this is the deployment
shape the rebuild targets instead — a headless develop service. Each
connection gets its own :class:`DevelopSession` (own image, edit
state, view transform, latency stats) speaking exactly the stdin
protocol (pipeline/session.py), so anything that can drive the REPL
can drive the service. A connection starts image-less: the first
command is normally ``open <catalog-id|path>``.

Concurrency: one thread per connection (ThreadingTCPServer). JAX
dispatch is thread-safe; engines are per-connection, so sessions
never share mutable state. Catalog access opens one Library per
connection (the one-Library-per-thread discipline,
tests/test_catalog.py).

This is a trusted-network protocol (no auth, plain text) — bind to
loopback or a private interface, like the SQLite catalog itself.
"""

from __future__ import annotations

import json
import socketserver
import threading
from typing import Optional

# Every verb session.handle dispatches — the greeting advertises these
# and the engine guard below recognizes them.
_COMMANDS = ("open", "prefetch", "set", "zoom", "pan", "render",
             "frame", "full", "histogram", "wb", "before", "auto",
             "preset", "local", "curve", "checkpoint", "undo",
             "history", "rate", "reset", "stats", "quit")


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one connection
        srv = self.server
        library = None
        if srv.db_path is not None:
            from raweditor_tpu.catalog import Library

            library = Library(srv.db_path)
        session = None
        try:
            self._send({"ok": True, "service": "raweditor-tpu",
                        "protocol": "session/1",
                        "commands": " ".join(_COMMANDS)})
            for raw_line in self.rfile:
                line = raw_line.decode("utf-8", "replace").strip()
                if not line:
                    continue
                toks = line.split()
                if toks[0] == "quit":
                    break
                if session is None:
                    session = self._make_session(srv, library)
                # stats (latency summary) and reset work without an
                # engine — only engine-touching commands need an image
                # (the greeting advertises all of them). `preset list`
                # needs no engine either (a client picks a look before
                # opening). Unknown verbs fall through to
                # session.handle so a typo gets the accurate 'unknown
                # command' diagnostic, not 'no image open'
                # (code-review r3).
                if (session.engine is None
                        and toks[0] in _COMMANDS
                        and toks[0] not in ("open", "prefetch", "stats",
                                            "reset")
                        and toks[:2] != ["preset", "list"]):
                    self._send({"ok": False,
                                "error": "no image open — "
                                         "open <id|path> first"})
                    continue
                try:
                    result = session.handle(line)
                except Exception as e:  # noqa: BLE001 - keep serving
                    result = {"ok": False,
                              "error": f"{type(e).__name__}: {e}"}
                if result is not None:
                    self._send(result)
        finally:
            if session is not None:
                # Retire the pipelined-syncer thread + device frames
                # on connection teardown, not just on image switch
                # (advisor r4; session.close is best-effort).
                session.close()
            if library is not None:
                library.close()

    def _make_session(self, srv, library):
        from raweditor_tpu.pipeline.session import DevelopSession

        # Image-less start: a session shell whose engine arrives with
        # the first `open`, configured from the server defaults.
        return DevelopSession(None, library,
                              config=srv.session_config,
                              engine_defaults=srv.engine_kwargs)

    def _send(self, obj: dict) -> None:
        self.wfile.write((json.dumps(obj) + "\n").encode())
        self.wfile.flush()


class DevelopServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 db_path: Optional[str] = None,
                 engine_kwargs: Optional[dict] = None,
                 session_config=None):
        self.db_path = db_path
        self.engine_kwargs = engine_kwargs or {}
        # None → each session uses Config() defaults (pipelined slider
        # ticks); the CLI's --no-pipeline passes an explicit config.
        self.session_config = session_config
        super().__init__((host, port), _Handler)

    @property
    def address(self):
        return self.server_address[:2]

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


def serve(host: str, port: int, db_path: Optional[str],
          engine_kwargs: Optional[dict] = None,
          session_config=None) -> None:
    """Blocking entry point for the CLI."""
    import sys

    with DevelopServer(host, port, db_path, engine_kwargs,
                       session_config=session_config) as srv:
        print(json.dumps({"listening": list(srv.address)}), flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            print("bye", file=sys.stderr)
