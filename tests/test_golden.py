"""Hand-authored golden bitstreams (VERDICT r1 item 6).

The round-trip suites validate decode(encode(x)) == x, which a shared
misreading of a format would pass. These fixtures break the circle:
the byte strings below were derived BY HAND from the published format
descriptions (ITU-T T.81 for lossless JPEG; the dcraw-lineage Nikon
and Sony layouts) — none of them was produced by this repo's
encoders — and the expected sample values were computed on paper from
the spec's prediction/categorisation rules. Both the Python reference
decoders and the C++ fast paths must reproduce them exactly.
"""

import struct

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw import nikon
from raweditor_tpu.raw.arw2 import decode_arw2
from raweditor_tpu.raw.ljpeg import decode_lossless

rk = get_rawkit()


# --- ITU-T T.81 Annex H: lossless JPEG, predictors 1-7 --------------------
#
# One 8-bit component, 2 rows x 3 cols, samples:
#     128 129 131
#     127 126 124
# DHT: BITS=[0,4,0,...], VALUES=[0,1,2,3] -> canonical 2-bit codes
# (F.2.2.1): sym0=00 sym1=01 sym2=10 sym3=11.
# Prediction (H.1.2.1): first sample 2^(P-1)=128; rest of first line
# use Ra; first column of later lines uses Rb; interior samples use
# the selected predictor Px. Differences category-coded per H.2.
#
# Worked example, predictor 1 (diff -> category/code + raw bits):
#   (0,0) 128-128=0  -> cat0: 00
#   (0,1) 129-128=+1 -> cat1: 01 + '1'
#   (0,2) 131-129=+2 -> cat2: 10 + '10'
#   (1,0) 127-128=-1 -> cat1: 01 + '0'   (raw = d + 2^cat - 1)
#   (1,1) 126-127=-1 -> cat1: 01 + '0'
#   (1,2) 124-126=-2 -> cat2: 10 + '01'
#   bits 00 011 1010 010 010 1001 -> pad0 -> 0x1D 0x25 0x20
# The other predictors change only the interior diffs; each stream
# below was derived the same way from the T.81 predictor table.

_LJPEG_GOLDENS = {
    1: "1d2520",
    2: "1d28c0",
    3: "1d29d0",
    4: "1d29d8",
    5: "1d2500",
    6: "1d29d0",
    7: "1d29d8",
}
_LJPEG_WANT = np.array([[128, 129, 131], [127, 126, 124]], np.uint16)


def _ljpeg_container(pred: int, entropy_hex: str) -> bytes:
    """Wrap hand-derived entropy bytes in the minimal SOI/DHT/SOF3/SOS
    framing (byte-for-byte the layout of T.81 Annex B)."""
    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes([0, 4] + [0] * 14) + bytes([0, 1, 2, 3])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sof = struct.pack(">BHHB", 8, 2, 3, 1) + bytes([0, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([1, 0, 0x00, pred, 0, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes.fromhex(entropy_hex)
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("pred", sorted(_LJPEG_GOLDENS))
def test_ljpeg_predictor_goldens_python(pred):
    planes, prec = decode_lossless(_ljpeg_container(pred,
                                                    _LJPEG_GOLDENS[pred]))
    assert prec == 8
    np.testing.assert_array_equal(planes[0], _LJPEG_WANT)


@pytest.mark.skipif(rk is None, reason="native ext not built")
@pytest.mark.parametrize("pred", sorted(_LJPEG_GOLDENS))
def test_ljpeg_predictor_goldens_native(pred):
    raw, nc, h, w, prec = rk.decode_ljpeg(
        _ljpeg_container(pred, _LJPEG_GOLDENS[pred]))
    assert (nc, h, w, prec) == (1, 2, 3, 8)
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.uint16).reshape(2, 3), _LJPEG_WANT)


# --- Nikon lossless NEF (compression 34713) --------------------------------
#
# Published layout: MakerNote 0x0096 carries ver bytes 0x46 0x30
# (lossless), vpred[2][2], a curve size, and the curve; the entropy
# stream category-codes residuals with the fixed trees. Tree 2
# (12-bit lossless) canonical codes, derived from the published BITS
# (0,1,4,2,3,1,2) / VALUES (5,4,6,3,7,2,8,1,9,0,10,11,12):
#   cat5=00 cat4=010 cat6=011 cat3=100 cat7=101 cat2=1100 cat8=1101
#   cat1=11100 cat9=11101 cat0=11110 cat10=111110 ...
# Prediction: cols 0-1 chain vertically from vpred (rows alternate);
# cols >= 2 predict from two columns left (hpred persists across row
# ends). Residual decode: raw = getbits(cat); if the top bit is 0,
# diff = raw - (2^cat - 1).
#
# 4x2 @ 12-bit, vpred all 600, identity curve. Pixels / residuals:
#   (0,0) 608: +8   cat4 010 +1000      (0,1) 620: +20  cat5 00 +10100
#   (0,2) 610: +2   cat2 1100 +10       (0,3) 605: -15  cat4 010 +0000
#   (1,0) 580: -20  cat5 00 +01011      (1,1) 590: -10  cat4 010 +0101
#   (1,2) 615: +35  cat6 011 +100011    (1,3) 620: +30  cat5 00 +11110
#   -> 50 53 24 02 D2 B8 CF 00 (57 bits, zero-padded)
_NEF12_STRIP = bytes.fromhex("50532402d2b8cf00")
_NEF12_WANT = [[608, 620, 610, 605], [580, 590, 615, 620]]

# Tree 5 (14-bit lossless), BITS (0,1,4,2,2,3,1,2) / VALUES
# (7,6,8,5,9,4,10,3,11,12,2,0,1,13,14):
#   cat7=00 cat6=010 cat8=011 cat5=100 cat9=101 cat4=1100 cat10=1101
#   cat3=11100 cat11=11101 cat12=111100 cat2=111101 cat0=111110
#   cat1=1111110 cat13=11111110 cat14=11111111
# 4x2 @ 14-bit, vpred all 2000. Pixels / residuals:
#   (0,0) 2100: +100 cat7 00 +1100100   (0,1) 2050: +50 cat6 010 +110010
#   (0,2) 2200: +100 cat7 00 +1100100   (0,3) 2010: -40 cat6 010 +010111
#   (1,0) 1800: -200 cat8 011 +00110111 (1,1) 1900: -100 cat7 00 +0011011
#   (1,2) 1799: -1  cat1 1111110 +0     (1,3) 1901: +1  cat1 1111110 +1
#   -> 32 2C 8C 89 76 6E 1B FC FD (72 bits exactly)
_NEF14_STRIP = bytes.fromhex("322c8c89766e1bfcfd")
_NEF14_WANT = [[2100, 2050, 2200, 2010], [1800, 1900, 1799, 1901]]


def _nef_meta(bps: int, vpred: int) -> bytes:
    top = 1 << bps
    return (bytes([0x46, 0x30])
            + struct.pack("<4H", vpred, vpred, vpred, vpred)
            + struct.pack("<H", top)
            + np.arange(top, dtype="<u2").tobytes())


@pytest.mark.parametrize("bps,vpred,strip,want,tree", [
    (12, 600, _NEF12_STRIP, _NEF12_WANT, 2),
    (14, 2000, _NEF14_STRIP, _NEF14_WANT, 5),
])
def test_nef_lossless_goldens(bps, vpred, strip, want, tree):
    info = nikon.parse_linearization(_nef_meta(bps, vpred), bps)
    assert info.tree_index == tree and info.split == 0
    out = nikon.decode_nikon(strip, 4, 2, bps, info)
    assert out.tolist() == want
    if rk is not None:
        raw = rk.decode_nikon(strip, 4, 2, bps, info.tree_index, 0,
                              info.vpred.astype(np.int32).tobytes(),
                              info.curve.astype(np.uint16).tobytes())
        assert np.frombuffer(raw, np.uint16).reshape(2, 4).tolist() == want


# --- Sony ARW2 block row ----------------------------------------------------
#
# Published 16-byte block layout: 32-bit LE header = vmax(11) |
# vmin<<11 | imax<<22 | imin<<26, then 14 seven-bit deltas LSB-first
# from bit 30. sh = smallest s in 0..4 with (0x80<<s) > vmax-vmin;
# pixel_i = vmax at imax, vmin at imin, else (delta<<sh)+vmin clamped
# to 0x7FF; stored <<1 into 12-bit space. Two consecutive blocks
# interleave even/odd columns of a 32-column span.


def _arw2_block() -> bytes:
    """Built inline from the header/delta arithmetic above (spec math
    only — never touches the repo encoder)."""
    hdr = 1000 | (200 << 11) | (0 << 22) | (1 << 26)
    block = bytearray(16)
    block[0:4] = hdr.to_bytes(4, "little")
    bit = 30
    for k in range(14):
        d = 5 * (k + 2)
        byte, off = bit >> 3, bit & 7
        word = block[byte] | (block[byte + 1] << 8 if byte + 1 < 16 else 0)
        word |= d << off
        block[byte] = word & 0xFF
        if byte + 1 < 16:
            block[byte + 1] = (word >> 8) & 0xFF
        bit += 7
    return bytes(block)


def _arw2_expected() -> np.ndarray:
    # vmax-vmin = 800 -> sh = 3 (0x80<<3 = 1024 > 800).
    expected = np.zeros(32, np.int64)
    for parity in range(2):
        for i in range(16):
            if i == 0:
                pix = 1000
            elif i == 1:
                pix = 200
            else:
                pix = min((5 * i << 3) + 200, 0x7FF)
            expected[2 * i + parity] = pix << 1
    return expected.astype(np.uint16)


def test_arw2_block_golden_python():
    out = decode_arw2(_arw2_block() * 2, 32, 1)
    np.testing.assert_array_equal(out[0], _arw2_expected())


@pytest.mark.skipif(rk is None, reason="native ext not built")
def test_arw2_block_golden_native():
    raw = np.frombuffer(rk.decode_arw2(_arw2_block() * 2, 32, 1),
                        np.uint16)
    np.testing.assert_array_equal(raw, _arw2_expected())


# --- Pentax PEF: MakerNote-spec Huffman + vpred/hpred chain ---------------
#
# Spec (little-endian): u16 8 -> dep = (8+12)&15 = 4 categories; 12
# skipped bytes; 12-bit-aligned prefixes for codes 0 (len1, cat0),
# 10 (len2, cat1), 110 (len3, cat2), 111 (len3, cat3); length bytes.
#
# 2x4 @ 8bps. Diffs derived on paper from the prediction rules (cols
# 0-1 chain vertically from zero vpred, later cols predict two left):
#   (0,0) +5 -> cat3 '111'+raw 101     (0,1) +3 -> cat2 '110'+raw 11
#   (0,2) +1 -> cat1 '10'+raw 1        (0,3) -1 -> cat1 '10'+raw 0
#   (1,0) +4 -> '111'+100              (1,1) +6 -> '111'+110
#   (1,2) +1 -> '10'+1                 (1,3) +1 -> '10'+1
# Bit-serial: 111101 11011 101 100 111100 111110 101 101 -> F7 76 79 F5 A0

_PEF_SPEC = (b"\x08\x00" + b"\x00" * 12
             + b"\x00\x00" + b"\x00\x08" + b"\x00\x0c" + b"\x00\x0e"
             + bytes([1, 2, 3, 3]))
_PEF_STREAM = bytes.fromhex("f77679f5a0")
_PEF_EXPECTED = np.array([[5, 3, 6, 2], [4, 6, 5, 7]], np.uint16)


def test_pef_golden_python():
    from raweditor_tpu.raw.pentax import decode_pentax

    out = decode_pentax(_PEF_STREAM, 4, 2, 8, _PEF_SPEC)
    np.testing.assert_array_equal(out, _PEF_EXPECTED)


@pytest.mark.skipif(rk is None, reason="native ext not built")
def test_pef_golden_native():
    raw = np.frombuffer(
        rk.decode_pentax(_PEF_STREAM, 4, 2, 8, _PEF_SPEC, 0), np.uint16
    ).reshape(2, 4)
    np.testing.assert_array_equal(raw, _PEF_EXPECTED)


# --- Olympus ORF: unary + adaptive-carry scheme ---------------------------
#
# 2x2 mosaic, per-row/per-parity carry state all zero at each sample
# (fresh row + fresh parity), so nbits = 4 throughout. Derived on
# paper from the published scheme (3 sign/low bits, unary high,
# nbits raw; value = pred + (diff<<2 | low), pred = 0 for row<2,col<2):
#   (0,0) 300: low 0, diff 75  -> 000 00001 1011
#   (0,1) 101: low 1, diff 25  -> 001 01    1001
#   (1,0) 284: low 0, diff 71  -> 000 00001 0111
#   (1,1)  97: low 1, diff 24  -> 001 01    1000
# Serial -> 01 B2 C8 0B 96 00, after the 7 padding bytes.

_ORF_STREAM = b"\x00" * 7 + bytes.fromhex("01b2c80b9600")
_ORF_EXPECTED = np.array([[300, 101], [284, 97]], np.uint16)


def test_orf_golden_python():
    from raweditor_tpu.raw.olympus import decode_olympus

    out = decode_olympus(_ORF_STREAM, 2, 2)
    np.testing.assert_array_equal(out, _ORF_EXPECTED)


@pytest.mark.skipif(rk is None, reason="native ext not built")
def test_orf_golden_native():
    raw = np.frombuffer(
        rk.decode_olympus(_ORF_STREAM, 2, 2), np.uint16).reshape(2, 2)
    np.testing.assert_array_equal(raw, _ORF_EXPECTED)


# --- Panasonic RW2 v4: group-reversed blocked bit addressing --------------
#
# One 14-pixel group (128 bits), derived BY HAND from the published
# scheme. Field sequence (value, width) in write order:
#   leaders: (18,8)(3,4) -> 291   (36,8)(5,4) -> 581
#   i=2:  sh bits (3,2) -> sh=4;  j=16  -> (291&15) + 16<<4  = 259
#   i=3:  j=0   -> 581
#   i=4:  j=2   -> 3+32   = 35
#   i=5:  sh(3,2); j=1 -> 5+16   = 21
#   i=6,7: j=0
#   i=8:  sh(3,2); j=255 -> 3+4080 = 4083
#   i=9,10: j=0
#   i=11: sh(3,2); j=2 -> 5+32   = 37
#   i=12,13: j=0
# Walking vbits=(vbits-n)&0x1FFFF, byte=(vbits>>3)^0x3FF0, LE word
# insert at bit (vbits&7) gives buffer bytes
#   {2:02, 3:03, 5:FC, 6:0F, 8:10, 9:B0, 12:C4, 13:45, 14:32, 15:12};
# the file stores buf[0x2008:] first, so buffer index b < 0x2008 lands
# at file offset 0x1FF8+b.

_RW2_BUFBYTES = {2: 0x02, 3: 0x03, 5: 0xFC, 6: 0x0F, 8: 0x10,
                 9: 0xB0, 12: 0xC4, 13: 0x45, 14: 0x32, 15: 0x12}
_RW2_EXPECTED = np.array(
    [[291, 581, 259, 581, 35, 21, 35, 21, 4083, 21, 4083, 37,
      4083, 37]], np.uint16)


def _rw2_golden_payload() -> bytes:
    block = bytearray(0x4000)
    for b, v in _RW2_BUFBYTES.items():
        block[0x1FF8 + b] = v
    return bytes(block)


def test_rw2_group_golden_python():
    from raweditor_tpu.raw.panasonic import decode_rw2

    out = decode_rw2(_rw2_golden_payload(), 14, 1)
    np.testing.assert_array_equal(out, _RW2_EXPECTED)


@pytest.mark.skipif(rk is None, reason="native ext not built")
def test_rw2_group_golden_native():
    raw = np.frombuffer(
        rk.decode_rw2(_rw2_golden_payload(), 14, 1), np.uint16)
    np.testing.assert_array_equal(raw.reshape(1, 14), _RW2_EXPECTED)


# --- Samsung SRW v1: one 16-pixel block, derived by hand -------------------
#
# Row 0 (group lengths start at 7), first block (horizontal mode:
# every pixel predicts from the 128 row-start base). Stream, MSB-first
# into 32-bit LE words:
#   '0' direction, '00'x4 opcodes (keep len 7), then sixteen 7-bit
#   two's-complement residuals, evens first then odds:
#   evens +5 -3 0 +63 -64 +1 -1 +10; odds -5 +20 0 -20 +33 -33 +7 -7.
# Packing the 121 bits by hand gives words 0x0005FA01 0xFC003FC5
# 0x7B280362 0x1BE1FC80 (7 pad zeros).  Height 1 -> the CFA swap is
# a no-op.

_SRW1_GOLDEN = bytes.fromhex("01fa0500c53f00fc6203287b80fce11b")
_SRW1_EXPECTED = np.array(
    [[133, 123, 125, 148, 128, 128, 191, 108, 64, 161, 129, 95,
      127, 135, 138, 121]], np.uint16)


def test_srw1_block_golden_python():
    from raweditor_tpu.raw.samsung import decode_srw1

    out = decode_srw1(_SRW1_GOLDEN, [0], 16, 1)
    np.testing.assert_array_equal(out, _SRW1_EXPECTED)


@pytest.mark.skipif(rk is None, reason="native ext not built")
def test_srw1_block_golden_native():
    offs = (0).to_bytes(4, "little")
    raw = np.frombuffer(
        rk.decode_srw1(_SRW1_GOLDEN, offs, 16, 1), np.uint16)
    np.testing.assert_array_equal(raw.reshape(1, 16), _SRW1_EXPECTED)


# --- Canon CRX: MED + adaptive Golomb-Rice plane --------------------------
#
# A second decoder-only CRX fixture (tests/test_crx.py has the 2x2
# one) exercising the k escape growth path: 1x4 plane, 8-bit, k=0.
#   (0,0) pred 128 (half), value 200: err +72, u 144.
#         k=0: unary 144 zeros would exceed the 41 escape -> 41 zeros
#         + 21-bit literal 144. k adapts 0->2 (grow twice).
#   (0,1) pred 200, value 199: err -1, u 1. k=2: q=0 -> '1' + '01'.
#         k shrinks 2->1 (2*1 < 2^2).
#   (0,2) pred 199, value 201: err +2, u 4. k=1: q=2 -> '001' + '0'.
#         k stays 1 (4>>1 = 2, not > 2; 8 not < 2).
#   (0,3) pred 201, value 201: err 0, u 0. k=1: q=0 -> '1' + '0'.
# Serial: 41x'0', 0000000000000 10010000, 101, 0010, 10 + pad
#   -> 00 00 00 00 00 00 02 42 94.

_CRX_GOLDEN = bytes.fromhex("000000000000024294")  # 71 bits
_CRX_EXPECTED = [[200, 199, 201, 201]]


def test_crx_escape_golden_python():
    from raweditor_tpu.raw.crx import _decode_plane

    out = _decode_plane(_CRX_GOLDEN, 4, 1, 8, 0)
    assert out.tolist() == _CRX_EXPECTED


@pytest.mark.skipif(rk is None or not hasattr(rk, "decode_crx_plane"),
                    reason="native CRX not built")
def test_crx_escape_golden_native():
    raw = np.frombuffer(
        rk.decode_crx_plane(_CRX_GOLDEN, 4, 1, 8, 0), np.uint16)
    assert raw.tolist() == _CRX_EXPECTED[0]


# --- soak-fuzz SIGSEGV regression -------------------------------------------
#
# tools/soak_hunt.py seed 25, round 233, base ljpeg4: a mutated SOF3
# with width 0 left the native decoder's planes vector empty, and the
# predictor-1 loop read through its NULL data() — a segfault when the
# mutation also kept h > 0. The exact strip bytes are preserved here;
# both implementations must quarantine (never crash).

_SIGSEGV_STRIP = __import__("base64").b64decode(
    "/9j/xAAkAAADAQEBAQEBAQEBAQEBAQEAAQIDBAUGBwgJCgsMDQ4PEP/DABQMAAYAAAQA"
    "EQABEQACEQADEQD/2gAOBAAAAQACAAMAAQAA/wCQT0f+oT/yf/8AzZ//ACgP+h7/AJh/"
    "+m7/AOsa/wCgf/6YL/0Vv/iVP5p/8Yv/AI//APuz+x/0M/8Arwvgv/kB/wD67j/Cr/1N"
    "/wBu/wDDg/8Akkf+TT/1rP8Avc/+oo/61P8AOz/o/wD/AJUz/wCcK/8AkkP7q/8Af0/1"
    "N/8ArXf+MT/5fL9f/wDlbf8A6iT/AOp4/wCdz/qF/wDI5/hH/wCrL/6CP/OL/wCYT/5C"
    "3/qC/wDotf8A1If/ALjn/rB/5nP/ADuv+Fv/AKlfN/7Yf+kv/wCPl/1X/wDnL/8Ae7/u"
    "i/6sP/pmf9Kf/o8//F//AOcj/wAh3/xPf+mP/wAkH/mz/wDAW/8AY5/7nf8A3yf9AP8A"
    "t2/7cv8AyX8//Kj/APAa/wBcv/iP/wDNv/JP+Zf/ALOD/UL/AOut/wCJX/z7v+u3/wA2"
    "r/1Vv/Ca/wAu/wDxLf6w/wC1b/3S/wDer/Pn/wBg7/5UP/Zb/wAOj/5OT/Uf9w/yS/8A"
    "o9f/AHPv8nP+Hn/ar/6z/wD+5W/9Zz/6Nr/5R7+dP86vvP8A0hP/AD2/+pH/AOWK++/+"
    "fa/hz/6kr/kp/wB2f/k3/wDPr/zaf+YXH/5XD5D/AOgn/wBU/wD6ub/7cj/6G3/0L/8A"
    "Yv8A+Gb/AOH/AP8AnHPN/wDXG/8AbS/9J3/6u7/2+v8AzT//AFBv/mB/6f8A/Ip/jT/m"
    "j/4Mf/sAP+uH/V//AMsP/Qr/AM1//wChO/8AaM/8UT/cb/oe/wDnsf/Z")


def test_sof3_zero_width_strip_quarantines():
    from raweditor_tpu.raw.ljpeg import decode_lossless

    with pytest.raises(Exception):
        decode_lossless(_SIGSEGV_STRIP)
    if rk is not None:
        with pytest.raises(ValueError):
            rk.decode_ljpeg(_SIGSEGV_STRIP)


@pytest.mark.skipif(rk is None, reason="native ext not built")
@pytest.mark.parametrize("h,w,prec", [(0, 3, 8), (2, 0, 8), (2, 3, 0),
                                      (2, 3, 17)])
def test_sof3_degenerate_headers_quarantine(h, w, prec):
    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes([0, 4] + [0] * 14) + bytes([0, 1, 2, 3])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sof = struct.pack(">BHHB", prec, h, w, 1) + bytes([0, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([1, 0, 0x00, 1, 0, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += b"\x00" * 8 + b"\xff\xd9"
    with pytest.raises(ValueError):
        rk.decode_ljpeg(bytes(out))
