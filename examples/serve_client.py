#!/usr/bin/env python
"""Remote-GUI client tour of the TCP develop service.

The reference is a desktop GUI; this framework's deployment shape is a
headless service (`raweditor-tpu serve`) that any frontend drives over
a line protocol. This example IS that frontend, minus the pixels: it
starts an in-process server, then as a plain TCP client

  1. opens an image (and `prefetch`es the next one),
  2. drags a slider 20 times — ticks ride the DEFAULT pipelined mode,
     so each answers at dispatch cost,
  3. polls `frame <q> latest` — the newest checksum-proven frame with
     zero device wait (lags the newest tick; the GUI trade),
  4. fetches a true-sync `frame` (flushes the pipeline first),
  5. sets a point tone curve, picks white balance, reads the
     histogram, rates the image, and switches to the prefetched one.

Run: PYTHONPATH=/root/repo python examples/serve_client.py
     [--platform cpu]
"""

import argparse
import json
import os
import socket
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="cpu forces the CPU backend (no TPU needed)")
    args = ap.parse_args()
    if args.platform:
        os.environ["RAWEDITOR_TPU_PLATFORM"] = args.platform

    import numpy as np

    from raweditor_tpu.catalog import Library
    from raweditor_tpu.pipeline.serve import DevelopServer
    from raweditor_tpu.raw.synth import write_synthetic_raw

    tmp = tempfile.mkdtemp(prefix="raweditor-serve-client-")
    rng = np.random.default_rng(7)
    shots = []
    for name in ("one.nef", "two.nef"):
        p = os.path.join(tmp, name)
        write_synthetic_raw(p, rng.integers(0, 4096, (96, 128),
                                            dtype=np.uint16),
                            compression="nikon")
        shots.append(p)
    lib = Library(os.path.join(tmp, "cat.db"))
    ids = [lib.import_image(p, os.path.basename(p)) for p in shots]
    lib.close()

    srv = DevelopServer(db_path=os.path.join(tmp, "cat.db"))
    srv.serve_background()
    host, port = srv.address
    sock = socket.create_connection((host, port))
    rfile = sock.makefile("r")

    def send(line):
        sock.sendall((line + "\n").encode())
        return json.loads(rfile.readline())

    greeting = json.loads(rfile.readline())
    print("greeting:", greeting["service"], "|",
          len(greeting["commands"].split()), "commands")

    out = send(f"open {ids[0]}")
    assert out["ok"], out
    print("opened image", out["image_id"], "size", out["size"])
    assert send(f"prefetch {ids[1]}")["ok"]

    for i in range(20):
        out = send(f"set exposure {0.2 + 0.02 * i:.3f}")
        assert out["ok"], out
    print(f"20 slider ticks, last render_ms={out['render_ms']:.2f} "
          "(pipelined: dispatch cost, not a round trip)")

    out = send("frame 80 latest")
    print(f"frame latest: {out['bytes']} JPEG bytes, "
          f"lagged={out['lagged']}")
    out = send("frame 80")
    print(f"frame (true-sync): {out['bytes']} JPEG bytes")

    assert send("curve set 0 0 0.45 0.55 1 1")["ok"]
    wb = send("wb 0.5 0.5")
    print("wb eyedropper:", {k: wb[k] for k in ("temperature", "tint")}
          if wb.get("ok") else wb["error"])
    hist = send("histogram")
    assert hist["ok"] and len(hist["r"]) == 256
    print("histogram: 3x256 bins, peak bin count",
          max(max(hist[c]) for c in "rgb"))

    out = send("rate 5 pick")
    print("rated:", out["rating"], "stars,", out["flag"])

    out = send(f"open {ids[1]}")
    assert out["ok"], out
    print("switched to prefetched image", out["image_id"])
    sock.sendall(b"quit\n")
    sock.close()
    srv.shutdown()
    print("serve client tour complete")


if __name__ == "__main__":
    main()
