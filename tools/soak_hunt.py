#!/usr/bin/env python
"""Decoder soak-fuzz with crash localization and C++/Python
differential checking.

    PYTHONPATH=/root/repo:$PYTHONPATH \
        python tools/soak_hunt.py <seed> <seconds> [--differential]

Deterministic per seed: regenerates the same bases and mutation
sequence, and writes the in-flight (round, base-index) to
/tmp/soak_pos_<seed>.txt before every decode, so a crash (e.g. the
one SIGSEGV observed in round 2's time-seeded soak, unreproduced in
60k+ fixed-seed rounds) pinpoints the exact blob: re-run the seed,
skip to the recorded position, and dump the bytes.

``--differential`` decodes every mutated blob twice — native
preferred, then with the C++ extension disabled — and asserts the
same outcome (identical mosaic/metadata, or the same rejection
class). This is the cross-implementation oracle for every native
decode entry point: LJPEG, Nikon, ARW2, ORF, RW2, PEF, Kodak 65000,
RADC, CRW, SRW v1/v3, CRX (both codepaths of tiled and banded CR3).

``--encode`` fuzzes the JPEG encoder instead: random dims × content
class × quality × optimize × both chroma modes, every case encoded
through BOTH the AVX2 and forced-scalar (RAWKIT_JPEG_NO_AVX2) paths
with byte equality required. Run it under the ASan build below for
memory-safety coverage of the encoder.

Soak record:
- round 2: ~1M mutated files through the native-preferred path. One
  SIGSEGV (seed 25, round 233: SOF3 width 0 -> NULL planes read in
  the native LJPEG decoder) reproduced, fixed, regression-pinned in
  tests/test_golden.py; two more hardening fixes (SOS ns OOB read,
  marker+EOF negative shift) from the same audit. Post-fix: ~200k
  decodes clean under an AddressSanitizer build.
- round 3: bases extended with SRW v3 + RADC; differential mode
  added; see docs/performance.md "soak record" for the recorded
  clean runs (plain, differential, and ASan).

ASan recipe (gdb is not installed in this image):

    g++ -O1 -g -fsanitize=address -fno-omit-frame-pointer -std=c++17 \
        -fPIC -I$PYINC -shared raweditor_tpu/native/rawkit.cpp \
        -o /tmp/asan/_rawkit.cpython-312-x86_64-linux-gnu.so
    LD_PRELOAD="$(g++ -print-file-name=libasan.so) \
                $(g++ -print-file-name=libstdc++.so.6)" \
        ASAN_OPTIONS=detect_leaks=0 python <driver injecting the .so \
        into sys.modules as raweditor_tpu.native._rawkit>

(Both preloads are required: libasan alone aborts on the first C++
throw with "real___cxa_throw != 0".)
"""

import sys
import time

import numpy as np

import raweditor_tpu.native as native_mod
from raweditor_tpu.raw.bmff import write_synthetic_cr3
from raweditor_tpu.raw.ciff import write_crw
from raweditor_tpu.raw.decode import RawDecodeError, decode_raw
from raweditor_tpu.raw.kodak_radc import radc_representable
from raweditor_tpu.raw.panasonic import rw2_representable
from raweditor_tpu.raw.raf import write_raf
from raweditor_tpu.raw.synth import (write_synthetic_orf,
                                     write_synthetic_raw,
                                     write_synthetic_rw2)

SEED = int(sys.argv[1])
SECONDS = float(sys.argv[2])
DIFFERENTIAL = "--differential" in sys.argv[3:]
ENCODE = "--encode" in sys.argv[3:]
rng = np.random.default_rng(SEED)


def encode_fuzz() -> None:
    """JPEG-encoder fuzz: random dims × content class × quality ×
    optimize × both chroma modes, each case encoded through BOTH the
    AVX2 and the forced-scalar path (RAWKIT_JPEG_NO_AVX2) with byte
    equality required. Run under the ASan build (docstring recipe) to
    cover memory safety; deterministic per seed."""
    import os

    rk = native_mod.get_rawkit()
    if rk is None:
        raise SystemExit("--encode needs the native extension")
    t_end = time.time() + SECONDS
    n = 0
    while time.time() < t_end:
        w = int(rng.integers(1, 97))
        h = int(rng.integers(1, 97))
        q = int(rng.integers(1, 101))
        opt = bool(rng.integers(0, 2))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            y = rng.integers(0, 256, (h, w), np.uint8)
        elif kind == 1:
            y = np.full((h, w), rng.integers(0, 256), np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            y = ((xx * 255 // max(w - 1, 1)) ^ (yy * 3)).astype(np.uint8)
        cw, ch = (w + 1) // 2, (h + 1) // 2
        cb = rng.integers(0, 256, (ch, cw), np.uint8)
        cr = rng.integers(0, 256, (ch, cw), np.uint8)
        rr = int(rng.integers(0, 5))       # restart rows (0 = off)
        threads = int(rng.integers(1, 5))  # segment encode threads
        with open(f"/tmp/soak_pos_{SEED}.txt", "w") as f:
            f.write(f"encode {n} {w}x{h} q={q} opt={opt} kind={kind} "
                    f"rr={rr} threads={threads}")
        a420 = rk.encode_jpeg_420(y.tobytes(), cb.tobytes(), cr.tobytes(),
                                  w, h, q, opt, rr, threads)
        a444 = rk.encode_jpeg_444(y.tobytes(), y.tobytes(), y.tobytes(),
                                  w, h, q, opt, rr, threads)
        # Thread-count invariance of the segmented streams (both MCU
        # geometries: 4:2:0 h2v2 and 4:4:4 h1v1).
        if threads != 1:
            if (rk.encode_jpeg_420(y.tobytes(), cb.tobytes(), cr.tobytes(),
                                   w, h, q, opt, rr, 1) != a420
                    or rk.encode_jpeg_444(y.tobytes(), y.tobytes(),
                                          y.tobytes(), w, h, q, opt,
                                          rr, 1) != a444):
                raise SystemExit(f"THREAD VARIANCE seed={SEED} case {n}")
        os.environ["RAWKIT_JPEG_NO_AVX2"] = "1"
        try:
            b420 = rk.encode_jpeg_420(y.tobytes(), cb.tobytes(),
                                      cr.tobytes(), w, h, q, opt, rr,
                                      threads)
            b444 = rk.encode_jpeg_444(y.tobytes(), y.tobytes(),
                                      y.tobytes(), w, h, q, opt, rr,
                                      threads)
        finally:
            del os.environ["RAWKIT_JPEG_NO_AVX2"]
        if a420 != b420 or a444 != b444:
            raise SystemExit(f"AVX2/scalar MISMATCH seed={SEED} "
                             f"{w}x{h} q={q} opt={opt} kind={kind}")
        n += 4
    print(f"seed {SEED}: {n} encodes (AVX2+scalar differential) clean")


if ENCODE:
    encode_fuzz()
    sys.exit(0)
m = rng.integers(0, 4096, size=(12, 16), dtype=np.uint16)
m32 = rng.integers(0, 4096, size=(8, 32), dtype=np.uint16)
m14 = rw2_representable(rng.integers(0, 4096, size=(8, 28),
                                     dtype=np.uint16))
bases = ([write_synthetic_raw(None, m, compression=c)
          for c in ("none", "ljpeg", "nikon", "ljpeg4", "pentax",
                    "kodak65000")]
         + [write_synthetic_raw(None, m32, compression="arw2"),
            write_synthetic_raw(None, m, compression="srw1",
                                srw_wb=True),
            write_synthetic_raw(None, m, compression="srw3",
                                srw_wb=True),
            write_synthetic_raw(None, m, compression="srw3",
                                srw3_optflags=7),
            write_synthetic_raw(None, radc_representable(m), bpp=14,
                                compression="radc"),
            write_synthetic_orf(None, m), write_synthetic_rw2(None, m14),
            write_crw(None, m), write_synthetic_cr3(None, mosaic=m),
            write_synthetic_cr3(None, mosaic=m, levels=2, q_detail=8),
            bytes(write_raf(m))])


def outcome(blob: bytes):
    """(kind, payload) for comparison across implementations."""
    try:
        raw = decode_raw(blob)
    except RawDecodeError:
        return ("reject", None)
    return ("ok", (raw.mosaic.tobytes(), raw.mosaic.shape,
                   raw.wb_multipliers.tobytes(), float(raw.black_level),
                   float(raw.white_level), raw.cfa_pattern))


def decode_native_then_python(blob: bytes, bi: int) -> None:
    native = native_mod.get_rawkit()
    a = outcome(blob)
    if not DIFFERENTIAL or native is None:
        return
    native_mod._cached = None
    try:
        b = outcome(blob)
    finally:
        native_mod._cached = native
    if a != b:
        with open(f"/tmp/soak_diff_{SEED}.bin", "wb") as f:
            f.write(blob)
        raise SystemExit(
            f"DIFFERENTIAL MISMATCH seed={SEED} base={bi}: "
            f"native={a[0]} python={b[0]} "
            f"(blob dumped to /tmp/soak_diff_{SEED}.bin)")


pos_file = open(f"/tmp/soak_pos_{SEED}.txt", "w")
t_end = time.time() + SECONDS
rounds = 0
decodes = 0
while time.time() < t_end:
    rounds += 1
    for bi, base in enumerate(bases):
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 20))):
            op = rng.integers(0, 4)
            pos = int(rng.integers(0, len(blob)))
            if op == 0:
                blob[pos] = int(rng.integers(0, 256))
            elif op == 1:
                blob[pos] ^= 1 << int(rng.integers(0, 8))
            elif op == 2 and len(blob) > 16:
                del blob[pos:pos + int(rng.integers(1, 16))]
            else:
                blob[pos:pos] = bytes(
                    rng.integers(0, 256, size=int(rng.integers(1, 8)),
                                 dtype=np.uint8))
        pos_file.seek(0)
        pos_file.write(f"{rounds} {bi}      ")
        pos_file.flush()
        decode_native_then_python(bytes(blob), bi)
        decodes += 1
print(f"seed {SEED}: {rounds} rounds ({decodes} decodes"
      f"{', differential' if DIFFERENTIAL else ''}) clean")
