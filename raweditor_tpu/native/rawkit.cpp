// rawkit: native host-side RAW decode kernels.
//
// The reference app gets its decode hot paths from the Rust `rawloader`
// crate and byte-window scans (reference: raw/loader.rs:50-54,
// raw/processor.rs:92-125). This extension is the C++ equivalent for
// the TPU rebuild's host pipeline:
//
//   - scan_jpeg_spans:  SOI/EOI embedded-preview scan (memchr-driven)
//   - unpack_bits:      MSB-first 8..16-bit packed CFA strips
//   - decode_ljpeg:     lossless JPEG (ITU T.81 SOF3), LUT Huffman
//
// All entry points release the GIL around the heavy loops so the batch
// exporter's decode thread pool scales across cores. The Python modules
// in raweditor_tpu/raw/ are the behavioral reference; tests assert
// byte-identical outputs between the two implementations.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Embedded JPEG scan
// ---------------------------------------------------------------------------

struct Span {
  int64_t start;
  int64_t end;  // exclusive
};

// Matches raweditor_tpu.raw.jpeg_scan.find_jpeg_spans: every SOI paired
// with the first EOI at/after it; next SOI search resumes at start+1.
std::vector<Span> scan_spans(const uint8_t* d, int64_t n) {
  std::vector<int64_t> sois, eois;
  const uint8_t* p = d;
  const uint8_t* endp = d + n;
  while (p < endp - 1) {
    const uint8_t* hit =
        static_cast<const uint8_t*>(memchr(p, 0xFF, endp - p - 1));
    if (!hit) break;
    if (hit[1] == 0xD8) sois.push_back(hit - d);
    else if (hit[1] == 0xD9) eois.push_back(hit - d);
    p = hit + 1;
  }
  std::vector<Span> out;
  size_t ei = 0;
  for (int64_t soi : sois) {
    while (ei < eois.size() && eois[ei] < soi) ei++;
    // First EOI at/after this SOI (eois is sorted; earlier SOIs can
    // share the same EOI, so don't consume it).
    size_t j = ei;
    if (j < eois.size()) out.push_back({soi, eois[j] + 2});
  }
  return out;
}

// ---------------------------------------------------------------------------
// Packed-bit unpack
// ---------------------------------------------------------------------------

void unpack_rows(const uint8_t* src, int64_t src_len, uint16_t* dst,
                 int64_t width, int64_t height, int bpp,
                 bool big_endian = true) {
  if (bpp == 16) {
    // Whole-sample data follows the TIFF container byte order.
    if (big_endian) {
      for (int64_t i = 0; i < width * height; i++)
        dst[i] = (uint16_t(src[2 * i]) << 8) | src[2 * i + 1];
    } else {
      for (int64_t i = 0; i < width * height; i++)
        dst[i] = uint16_t(src[2 * i]) | (uint16_t(src[2 * i + 1]) << 8);
    }
    return;
  }
  if (bpp == 8) {
    for (int64_t i = 0; i < width * height; i++) dst[i] = src[i];
    return;
  }
  const int64_t row_bytes = (width * bpp + 7) / 8;
  for (int64_t y = 0; y < height; y++) {
    const uint8_t* row = src + y * row_bytes;
    uint32_t acc = 0;
    int nbits = 0;
    int64_t byte_idx = 0;
    for (int64_t x = 0; x < width; x++) {
      while (nbits < bpp) {
        acc = (acc << 8) | row[byte_idx++];
        nbits += 8;
      }
      dst[y * width + x] = uint16_t((acc >> (nbits - bpp)) & ((1u << bpp) - 1));
      nbits -= bpp;
    }
  }
}

// Staging packs (ops/staging.py fast paths): bit-pack u16 mosaics for
// the H2D link — 12-bit: 2 samples -> 3 bytes; 14-bit: 4 -> 7. Byte
// semantics identical to the numpy reference (uint8 truncation), and
// the GIL is released so decode workers keep streaming.
void pack12_impl(const uint16_t* src, int64_t h, int64_t w, uint8_t* dst) {
  const int64_t pairs = w / 2;
  for (int64_t y = 0; y < h; y++) {
    const uint16_t* s = src + y * w;
    uint8_t* d = dst + y * pairs * 3;
    for (int64_t i = 0; i < pairs; i++) {
      uint32_t e = s[2 * i], o = s[2 * i + 1];
      d[3 * i] = uint8_t(e >> 4);
      d[3 * i + 1] = uint8_t(((e & 0xF) << 4) | (o >> 8));
      d[3 * i + 2] = uint8_t(o);
    }
  }
}

void pack14_impl(const uint16_t* src, int64_t h, int64_t w, uint8_t* dst) {
  const int64_t quads = w / 4;
  for (int64_t y = 0; y < h; y++) {
    const uint16_t* s = src + y * w;
    uint8_t* d = dst + y * quads * 7;
    for (int64_t i = 0; i < quads; i++) {
      uint32_t a = s[4 * i], b = s[4 * i + 1], c = s[4 * i + 2],
               e = s[4 * i + 3];
      d[7 * i] = uint8_t(a >> 6);
      d[7 * i + 1] = uint8_t(((a & 0x3F) << 2) | (b >> 12));
      d[7 * i + 2] = uint8_t(b >> 4);
      d[7 * i + 3] = uint8_t(((b & 0xF) << 4) | (c >> 10));
      d[7 * i + 4] = uint8_t(c >> 2);
      d[7 * i + 5] = uint8_t(((c & 0x3) << 6) | (e >> 8));
      d[7 * i + 6] = uint8_t(e);
    }
  }
}

// ---------------------------------------------------------------------------
// Lossless JPEG (SOF3)
// ---------------------------------------------------------------------------

inline uint64_t bswap64u(uint64_t v) {
#if defined(__GNUC__) || defined(__clang__)
  return __builtin_bswap64(v);
#else
  uint64_t s = 0;
  for (int i = 0; i < 8; i++) s = (s << 8) | ((v >> (8 * i)) & 0xFF);
  return s;
#endif
}

// Branchless flat-window bit reader over an UNSTUFFED byte stream: one
// unaligned 8-byte load + bswap yields the next >=57 bits top-justified;
// consuming is a single `bitpos += k`. Replaces the refill-accumulator
// readers (BitReader/NikonBits) on the per-sample hot paths — the
// refill's `nbits` bookkeeping and its two branches per sample were
// most of the decode overhead. Reads past the end saturate into a
// 16-byte tail image whose padding byte reproduces the stream's EOF
// convention exactly (0xFF = the T.81 all-ones marker/EOF padding the
// LJPEG reader used; 0x00 = NikonBits' zero padding), so outputs stay
// bit-identical to the accumulator readers (pinned by the Python↔C++
// differential soak and the golden tests).
struct FlatBits {
  const uint8_t* d;
  int64_t n;
  int64_t bitpos = 0;
  int64_t tail_base;  // byte index tail[0] mirrors
  uint8_t tail[16];

  FlatBits(const uint8_t* data, int64_t len, uint8_t pad) : d(data), n(len) {
    tail_base = n >= 8 ? n - 8 : 0;
    for (int i = 0; i < 16; i++) {
      int64_t idx = tail_base + i;
      tail[i] = idx < n ? d[idx] : pad;
    }
  }

  // Next >=57 bits, top-justified. Valid for any bitpos >= 0, including
  // far past the end (the window is then entirely padding).
  inline uint64_t window() const {
    int64_t byte = bitpos >> 3;
    uint64_t v;
    if (byte + 8 <= n) {
      memcpy(&v, d + byte, 8);
    } else {
      int64_t off = byte - tail_base;
      if (off > 8) off = 8;  // fully-padded region
      if (off < 0) off = 0;  // n < 8 streams
      memcpy(&v, tail + off, 8);
    }
    return bswap64u(v) << (bitpos & 7);
  }

  inline int32_t read_bits(int k) {
    if (k == 0) return 0;
    int32_t v = int32_t(window() >> (64 - k));
    bitpos += k;
    return v;
  }
};

struct HuffLUT {
  // peek16 >> shift -> len << 8 | symbol. The LUT is sized to the
  // longest code actually present (2^max_len entries), not 2^16 —
  // real tables top out around 7-12 bits, so the whole table stays
  // L1-resident (the 2x64 KB full-window layout measurably thrashed
  // the cache on narrow cores).
  std::vector<uint16_t> lut;
  int shift = 0;
  bool valid = false;

  void build(const uint8_t* bits, const uint8_t* values) {
    int max_len = 1;
    for (int length = 1; length <= 16; length++)
      if (bits[length - 1]) max_len = length;
    shift = 16 - max_len;
    lut.assign(size_t(1) << max_len, 0);
    uint32_t code = 0;
    int k = 0;
    for (int length = 1; length <= max_len; length++) {
      for (int i = 0; i < bits[length - 1]; i++) {
        // A canonical code of this length must fit in `length` bits;
        // fuzzed/corrupt DHTs violate this and would otherwise index
        // past the LUT (heap corruption).
        if (code >= (1u << length))
          throw std::runtime_error("invalid Huffman table: code overflow");
        uint32_t lo = code << (max_len - length);
        uint32_t hi = lo + (1u << (max_len - length));
        uint16_t entry = uint16_t(length << 8 | values[k]);
        for (uint32_t c = lo; c < hi; c++) lut[c] = entry;
        code++;
        k++;
      }
      code <<= 1;
    }
    valid = true;
  }

  // decode_diff over a FlatBits window: the ssss code and its raw
  // magnitude bits (<=32 bits total) both come out of one 8-byte load.
  // Bit-identical to decode_diff on the accumulator reader, including
  // the all-ones EOF/marker padding (FlatBits pad = 0xFF).
  inline int32_t decode_diff(FlatBits& fb) const {
    uint64_t v = fb.window();
    uint16_t e = lut[uint32_t(v >> 48) >> shift];
    if (e == 0) throw std::runtime_error("invalid Huffman code");
    int len = e >> 8;
    int s = e & 0xFF;
    if (s == 0) {
      fb.bitpos += len;
      return 0;
    }
    if (s >= 16) {
      if (s > 16)  // T.81: ssss is 0..16; larger = corrupt DHT
        throw std::runtime_error("invalid ssss category in scan");
      fb.bitpos += len;
      return 32768;  // SSSS=16: no raw bits, fixed +32768
    }
    int32_t raw = int32_t((v << len) >> (64 - s));
    fb.bitpos += len + s;
    if (raw < (1 << (s - 1))) return raw - (1 << s) + 1;
    return raw;
  }
};

struct LJpegResult {
  std::vector<uint16_t> planes;  // (nc, h, w)
  int nc = 0, h = 0, w = 0, precision = 0;
};

uint16_t rd16(const uint8_t* p) { return (uint16_t(p[0]) << 8) | p[1]; }

LJpegResult decode_ljpeg_impl(const uint8_t* d, int64_t n) {
  if (n < 4 || d[0] != 0xFF || d[1] != 0xD8)
    throw std::runtime_error("not a JPEG: missing SOI");
  int64_t pos = 2;
  HuffLUT tables[4];
  int precision = 0, h = 0, w = 0, nc = 0;
  int comp_table[4] = {0, 0, 0, 0};
  int predictor = 1, pt = 0;
  bool have_sof = false, have_sos = false;

  while (pos + 4 <= n && !have_sos) {
    uint16_t marker = rd16(d + pos);
    if (marker == 0xFFD9) break;
    if ((marker >> 8) != 0xFF) throw std::runtime_error("bad marker");
    if (marker == 0xFFD8) { pos += 2; continue; }
    uint16_t seg_len = rd16(d + pos + 2);
    const uint8_t* seg = d + pos + 4;
    int64_t seg_n = int64_t(seg_len) - 2;
    if (pos + 2 + seg_len > n) throw std::runtime_error("truncated segment");
    switch (marker) {
      case 0xFFC4: {  // DHT
        int64_t off = 0;
        while (off < seg_n) {
          if (off + 17 > seg_n)
            throw std::runtime_error("truncated DHT header");
          int id = seg[off] & 0x0F;
          const uint8_t* bits = seg + off + 1;
          int nvals = 0;
          for (int i = 0; i < 16; i++) nvals += bits[i];
          if (off + 17 + nvals > seg_n)
            throw std::runtime_error("truncated DHT values");
          tables[id & 3].build(bits, seg + off + 17);
          off += 17 + nvals;
        }
        break;
      }
      case 0xFFC3: {  // SOF3
        if (seg_n < 6) throw std::runtime_error("truncated SOF3");
        precision = seg[0];
        h = rd16(seg + 1);
        w = rd16(seg + 3);
        nc = seg[5];
        if (nc < 1 || nc > 4) throw std::runtime_error("bad component count");
        // h/w of 0 left planes empty and the predictor loop read
        // through the vector's NULL data() (a soak-fuzz SIGSEGV);
        // precision 0 shifted by -1.
        if (h < 1 || w < 1) throw std::runtime_error("bad SOF3 dimensions");
        if (precision < 2 || precision > 16)
          throw std::runtime_error("bad SOF3 precision");
        have_sof = true;
        break;
      }
      case 0xFFDA: {  // SOS
        // ns is attacker-controlled: unvalidated it indexed up to
        // ~513 bytes past the buffer (a soak-fuzz SIGSEGV when the
        // allocation ended near a page boundary).
        if (seg_n < 1) throw std::runtime_error("truncated SOS");
        int ns = seg[0];
        if (ns < 1 || ns > 4)
          throw std::runtime_error("bad scan component count");
        if (seg_n < 1 + 2 * ns + 3)
          throw std::runtime_error("truncated SOS");
        for (int i = 0; i < ns; i++)
          comp_table[i] = (seg[2 + 2 * i] >> 4) & 0x0F;
        predictor = seg[1 + 2 * ns];
        pt = seg[3 + 2 * ns] & 0x0F;
        have_sos = true;
        break;
      }
      default:
        break;  // APPn/COM etc: skip
    }
    pos += 2 + seg_len;
  }
  if (!have_sof || !have_sos) throw std::runtime_error("missing SOF3/SOS");
  if (pt != 0) throw std::runtime_error("point transform not supported");
  if (predictor < 1 || predictor > 7)
    throw std::runtime_error("unsupported predictor");

  LJpegResult res;
  res.nc = nc; res.h = h; res.w = w; res.precision = precision;
  res.planes.assign(size_t(nc) * h * w, 0);

  // Unstuff the entropy stream once (0xFF 0x00 -> 0xFF; 0xFF + anything
  // else is a marker or trailing-0xFF EOF, both of which terminate the
  // stream and hand over to the all-ones padding — the same semantics
  // the accumulator reader applied byte by byte). 0xFF bytes are ~1/256
  // of the stream, so this is a handful of memcpy spans.
  std::vector<uint8_t> ebuf;
  {
    const uint8_t* p = d + pos;
    int64_t m = n - pos;
    ebuf.reserve(size_t(m > 0 ? m : 0) + 8);
    int64_t i = 0;
    while (i < m) {
      const uint8_t* ff = static_cast<const uint8_t*>(
          memchr(p + i, 0xFF, size_t(m - i)));
      if (!ff) {
        ebuf.insert(ebuf.end(), p + i, p + m);
        break;
      }
      int64_t j = ff - p;
      ebuf.insert(ebuf.end(), p + i, p + j + 1);  // include the 0xFF
      if (j + 1 < m && p[j + 1] == 0x00) {
        i = j + 2;  // stuffed data byte
      } else {
        break;  // marker / trailing 0xFF: entropy data ends here
      }
    }
  }
  FlatBits br(ebuf.data(), int64_t(ebuf.size()), 0xFF);
  const int default_pred = 1 << (precision - 1);

  for (int ci = 0; ci < nc; ci++)
    if (!tables[comp_table[ci] & 3].valid)
      throw std::runtime_error("missing Huffman table");

  if (predictor == 1) {
    // Predictor 1 (the layout every RAW in scope uses) as a tight
    // loop: the prediction is a per-component running value — no
    // plane reloads, no per-sample predictor switch. ~1.5x.
    const HuffLUT* tb[4];
    uint16_t* pl[4];
    for (int ci = 0; ci < nc; ci++) {
      tb[ci] = &tables[comp_table[ci] & 3];
      pl[ci] = res.planes.data() + size_t(ci) * h * w;
    }
    int32_t run[4];
    for (int y = 0; y < h; y++) {
      for (int ci = 0; ci < nc; ci++)
        run[ci] = (y == 0) ? default_pred : pl[ci][size_t(y - 1) * w];
      if (nc == 2) {
        // The dominant RAW layout (row-pair component interleave):
        // unrolled so run[] lives in registers across the row.
        const HuffLUT& t0 = *tb[0];
        const HuffLUT& t1 = *tb[1];
        int32_t r0 = run[0], r1 = run[1];
        uint16_t* p0 = pl[0] + size_t(y) * w;
        uint16_t* p1 = pl[1] + size_t(y) * w;
        for (int x = 0; x < w; x++) {
          r0 = (r0 + t0.decode_diff(br)) & 0xFFFF;
          p0[x] = uint16_t(r0);
          r1 = (r1 + t1.decode_diff(br)) & 0xFFFF;
          p1[x] = uint16_t(r1);
        }
        continue;
      }
      for (int x = 0; x < w; x++) {
        for (int ci = 0; ci < nc; ci++) {
          run[ci] = (run[ci] + tb[ci]->decode_diff(br)) & 0xFFFF;
          pl[ci][size_t(y) * w + x] = uint16_t(run[ci]);
        }
      }
    }
    return res;
  }

  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      for (int ci = 0; ci < nc; ci++) {
        const HuffLUT& t = tables[comp_table[ci] & 3];
        int32_t diff = t.decode_diff(br);
        uint16_t* plane = res.planes.data() + size_t(ci) * h * w;
        int32_t pred;
        if (y == 0 && x == 0) pred = default_pred;
        else if (y == 0) pred = plane[x - 1];
        else if (x == 0) pred = plane[(y - 1) * w];
        else {
          int32_t a = plane[y * w + x - 1];
          int32_t b = plane[(y - 1) * w + x];
          int32_t c = plane[(y - 1) * w + x - 1];
          switch (predictor) {
            case 1: pred = a; break;
            case 2: pred = b; break;
            case 3: pred = c; break;
            case 4: pred = a + b - c; break;
            case 5: pred = a + ((b - c) >> 1); break;
            case 6: pred = b + ((a - c) >> 1); break;
            default: pred = (a + b) >> 1; break;
          }
        }
        plane[y * w + x] = uint16_t((pred + diff) & 0xFFFF);
      }
    }
  }
  return res;
}

// ---------------------------------------------------------------------------
// Nikon compressed NEF (TIFF compression 34713)
// ---------------------------------------------------------------------------

// Hard-coded code-length trees (see raw/nikon.py for provenance and the
// behavioral reference).
static const uint8_t kNikonTrees[6][32] = {
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     5, 4, 3, 6, 2, 7, 1, 0, 8, 9, 11, 10, 12},
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     0x39, 0x5A, 0x38, 0x27, 0x16, 5, 4, 3, 2, 1, 0, 11, 12, 12},
    {0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12},
    {0, 1, 4, 3, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     5, 6, 4, 7, 8, 3, 9, 2, 1, 0, 10, 11, 12, 13, 14},
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0,
     8, 0x5C, 0x4B, 0x3A, 0x29, 7, 6, 5, 4, 3, 2, 1, 0, 13, 14},
    {0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0,
     7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14},
};

struct NikonBits {
  const uint8_t* d;
  int64_t n;
  int64_t pos = 0;
  uint64_t acc = 0;
  int nbits = 0;

  NikonBits(const uint8_t* data, int64_t len) : d(data), n(len) {}

  inline void fill() {
    if (pos + 8 <= n) {
      // Bulk refill: append whole bytes from one 64-bit load (the
      // Nikon stream has no byte stuffing). 2.3x over the byte loop.
      uint64_t chunk;
      memcpy(&chunk, d + pos, 8);
      chunk = bswap64u(chunk);
      int take = (64 - nbits) >> 3;  // bytes that fit in the acc
      if (take >= 8) {
        acc = chunk;
        nbits = 64;
        pos += 8;
      } else {
        acc = (acc << (8 * take)) | (chunk >> (64 - 8 * take));
        nbits += 8 * take;
        pos += take;
      }
      return;
    }
    while (nbits <= 56) {
      uint8_t b = (pos < n) ? d[pos] : 0;  // zero-pad past end
      pos++;
      acc = (acc << 8) | b;
      nbits += 8;
    }
  }

  inline uint32_t peek16() {
    // Refill to >=32 so the code peek AND its raw bits come out of
    // one fill in the common case (max code 16 + max raw 16).
    if (nbits < 32) fill();
    return uint32_t((acc >> (nbits - 16)) & 0xFFFF);
  }

  inline void drop(int k) { nbits -= k; }

  inline int32_t read_bits(int k) {
    if (k == 0) return 0;
    if (nbits < k) fill();
    int32_t v = int32_t((acc >> (nbits - k)) & ((1u << k) - 1));
    nbits -= k;
    return v;
  }
};

void decode_nikon_impl(const uint8_t* strip, int64_t strip_len,
                       uint16_t* out, int width, int height, int tree_index,
                       int split, const int32_t* vpred_in,
                       const uint16_t* curve, int curve_len) {
  HuffLUT tables[2];
  tables[0].build(kNikonTrees[tree_index], kNikonTrees[tree_index] + 16);
  if (split > 0 && tree_index + 1 < 6)
    tables[1].build(kNikonTrees[tree_index + 1],
                    kNikonTrees[tree_index + 1] + 16);

  // The Nikon stream has no byte stuffing and zero-pads past the end.
  // (A FlatBits load-per-sample variant measured ~8% SLOWER here than
  // this accumulator — short codes mean the refill amortizes over ~2
  // samples, beating one window load per sample on the narrow core.)
  NikonBits br(strip, strip_len);
  int32_t vpred[2][2] = {{vpred_in[0], vpred_in[1]},
                         {vpred_in[2], vpred_in[3]}};
  int32_t hpred[2] = {0, 0};
  const HuffLUT* t = &tables[0];

  const uint16_t* lut = t->lut.data();
  int shift = t->shift;
  auto next_diff = [&]() -> int32_t {
    uint16_t e = lut[br.peek16() >> shift];
    if (e == 0) throw std::runtime_error("invalid Nikon Huffman code");
    br.drop(e >> 8);
    int leaf = e & 0xFF;
    int len = leaf & 15;
    int shl = leaf >> 4;
    if (!len) return 0;
    int32_t raw = br.read_bits(len - shl);
    int32_t diff = ((raw << 1) + 1) << shl >> 1;
    if ((diff & (1 << (len - 1))) == 0)
      diff -= (1 << len) - (shl ? 0 : 1);
    return diff;
  };
  auto lookup = [&](int32_t v) -> uint16_t {
    int32_t idx = v < 0 ? 0 : (v >= curve_len ? curve_len - 1 : v);
    return curve[idx];
  };

  for (int row = 0; row < height; row++) {
    if (split > 0 && row == split) {
      t = &tables[1];
      lut = t->lut.data();
      shift = t->shift;
    }
    uint16_t* orow = out + int64_t(row) * width;
    // Columns 0-1: the vertical vpred chains seed the row pair.
    for (int col = 0; col < 2 && col < width; col++) {
      vpred[row & 1][col] += next_diff();
      hpred[col] = vpred[row & 1][col];
      orow[col] = lookup(hpred[col]);
    }
    // Columns >= 2: tight alternating-accumulator loop (no per-pixel
    // col<2 branch; ~10% on the narrow bench core).
    int32_t h0 = hpred[0], h1 = hpred[1];
    int col = 2;
    for (; col + 1 < width; col += 2) {
      h0 += next_diff();
      orow[col] = lookup(h0);
      h1 += next_diff();
      orow[col + 1] = lookup(h1);
    }
    if (col < width) {
      h0 += next_diff();
      orow[col] = lookup(h0);
    }
    hpred[0] = h0;
    hpred[1] = h1;
  }
}

// ---------------------------------------------------------------------------
// Sony ARW2 (TIFF compression 32767)
// ---------------------------------------------------------------------------

// See raw/arw2.py (the behavioral reference) for the block layout.
void decode_arw2_impl(const uint8_t* data, int64_t n, uint16_t* out,
                      int width, int height) {
  if (width % 32)
    throw std::runtime_error("ARW2 width not a multiple of 32");
  if (n < int64_t(width) * height)
    throw std::runtime_error("ARW2 data too short");
  const int blocks_per_row = width / 16;
  for (int row = 0; row < height; row++) {
    const uint8_t* rp = data + int64_t(row) * width;
    for (int blk = 0; blk < blocks_per_row; blk++) {
      const uint8_t* dp = rp + blk * 16;
      uint32_t hdr = uint32_t(dp[0]) | (uint32_t(dp[1]) << 8) |
                     (uint32_t(dp[2]) << 16) | (uint32_t(dp[3]) << 24);
      int32_t vmax = hdr & 0x7FF;
      int32_t vmin = (hdr >> 11) & 0x7FF;
      int imax = (hdr >> 22) & 0x0F;
      int imin = (hdr >> 26) & 0x0F;
      int sh = 0;
      while (sh < 4 && (0x80 << sh) <= vmax - vmin) sh++;
      // Column interleave: block pairs cover 32 columns (even / odd).
      int base = 32 * (blk / 2) + (blk % 2);
      int bit = 30;
      for (int i = 0; i < 16; i++) {
        int32_t pix;
        if (i == imax) {
          pix = vmax;
        } else if (i == imin && imin != imax) {
          pix = vmin;
        } else if (bit + 7 <= 128) {
          int byte = bit >> 3;
          uint32_t word = uint32_t(dp[byte]);
          if (byte + 1 < 16) word |= uint32_t(dp[byte + 1]) << 8;
          int32_t d = (word >> (bit & 7)) & 0x7F;
          pix = (d << sh) + vmin;
          if (pix > 0x7FF) pix = 0x7FF;
          bit += 7;
        } else {
          pix = vmin;  // degenerate imax==imin: 15th slot, no bits left
        }
        out[int64_t(row) * width + base + 2 * i] = uint16_t(pix << 1);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Olympus ORF compressed sensor codec
// ---------------------------------------------------------------------------
// The published dcraw-lineage Olympus scheme (see raw/olympus.py — the
// Python behavioral reference; tests assert array equality). MSB-first
// stream after 7 padding bytes; unary "Huffman" (s zeros + 1, 12 zeros
// = escape to a 16-nbits literal); per-parity adaptive carry state.

struct MsbReader {
  const uint8_t* d;
  int64_t n;
  int64_t bit = 0;

  inline int get1() {
    int64_t byte = bit >> 3;
    int v = byte < n ? (d[byte] >> (7 - (bit & 7))) & 1 : 0;
    bit++;
    return v;
  }
  inline uint32_t get(int k) {
    uint32_t out = 0;
    for (int i = 0; i < k; i++) out = (out << 1) | get1();
    return out;
  }
  inline int unary12() {
    for (int z = 0; z < 12; z++)
      if (get1()) return z;
    return 12;
  }
};

struct MsbWriter {
  std::vector<uint8_t> out;
  uint64_t acc = 0;
  int n = 0;
  inline void put(uint32_t v, int len) {
    if (len <= 0) return;
    acc = (acc << len) | (v & ((1ull << len) - 1));
    n += len;
    while (n >= 8) {
      n -= 8;
      out.push_back(uint8_t(acc >> n));
    }
  }
  void flush() {
    if (n) {
      out.push_back(uint8_t(acc << (8 - n)));
      n = 0;
    }
  }
};

// Bulk-refill MSB-first reader (64-bit accumulator, CLZ unary scans)
// for streams without byte stuffing. Past-EOF bits read as zeros for
// get()/peek() — same contract as MsbReader and the Python reference
// readers; zeros41_strict additionally raises when a unary run would
// consume zero bits past EOF (the CRX contract).
struct FastMsb {
  const uint8_t* d;
  int64_t nbytes;
  int64_t bytepos = 0;
  uint64_t acc = 0;
  int navail = 0;

  inline int64_t bitpos() const { return bytepos * 8 - navail; }
  inline void refill() {
    while (navail <= 56) {
      acc = (acc << 8) | (bytepos < nbytes ? d[bytepos] : 0);
      bytepos++;
      navail += 8;
    }
  }
  inline uint32_t get(int k) {  // k <= 24
    if (k == 0) return 0;
    if (navail < k) refill();
    navail -= k;
    return uint32_t((acc >> navail) & ((1ull << k) - 1));
  }
  inline int peek12() {
    if (navail < 12) refill();
    return int((acc >> (navail - 12)) & 0xFFF);
  }
  inline void skip(int k) {  // only valid right after a peek covering k
    navail -= k;
  }
  inline uint64_t window() const {
    return navail >= 64 ? acc : (acc & ((1ull << navail) - 1));
  }
  // One refill, then >=57 valid bits top-justified (EOF pads zeros,
  // same as get()). Consume with `navail -= used` — callers must keep
  // used <= 57.
  inline uint64_t win57() {
    if (navail <= 56) refill();
    return acc << (64 - navail);
  }
  // Count zeros until a 1, capped at `limit` (cap reached: exactly
  // `limit` zeros consumed, no 1). Past-EOF reads as zeros.
  inline int zeros_limit(int limit) {
    int count = 0;
    for (;;) {
      if (navail == 0) refill();
      uint64_t w = window();
      if (w == 0) {
        int can = limit - count;
        if (navail < can) can = navail;
        navail -= can;
        count += can;
        if (count >= limit) return limit;
        continue;
      }
      int lead = navail - 1 - (63 - __builtin_clzll(w));
      if (count + lead >= limit) {
        navail -= limit - count;
        return limit;
      }
      navail -= lead + 1;
      return count + lead;
    }
  }
  // CRX variant: cap 41, raising when the zero run crosses EOF.
  inline int zeros41_strict() {
    const int64_t total_bits = nbytes * 8;
    int count = 0;
    for (;;) {
      if (navail == 0) refill();
      uint64_t w = window();
      if (w == 0) {
        int64_t can = 41 - count;
        if (navail < can) can = navail;
        int64_t real = total_bits - bitpos();
        if (real < can) can = real;
        if (can <= 0)
          throw std::runtime_error("crx: bitstream exhausted in unary run");
        navail -= int(can);
        count += int(can);
        if (count >= 41) return 41;
        continue;
      }
      int lead = navail - 1 - (63 - __builtin_clzll(w));
      if (count + lead >= 41) {
        navail -= 41 - count;
        return 41;
      }
      navail -= lead + 1;
      return count + lead;
    }
  }
};

inline int oly_nbits(int carry0, int carry2) {
  // Smallest nbits >= 2+i with (carry0 & 0xFFFF) >> (nbits+i) == 0,
  // i.e. max(2+i, bitlength(carry0 & 0xFFFF) - i) — CLZ instead of the
  // published per-bit while loop.
  int i = carry2 < 3 ? 2 : 0;
  int c = carry0 & 0xFFFF;
  int bl = c ? 32 - __builtin_clz(unsigned(c)) : 0;
  int nbits = bl - i;
  int lo = 2 + i;
  return nbits > lo ? nbits : lo;
}

inline int oly_predict(const uint16_t* out, int64_t width, int64_t row,
                       int64_t col) {
  if (row < 2 && col < 2) return 0;
  if (row < 2) return out[row * width + col - 2];
  if (col < 2) return out[(row - 2) * width + col];
  int w = out[row * width + col - 2];
  int n = out[(row - 2) * width + col];
  int nw = out[(row - 2) * width + col - 2];
  // nw strictly between w and n -> gradient/average, else nearer-of-two.
  // Ternary chains (cmov) instead of nested data-dependent branches:
  // the selector flips pseudo-randomly on sensor noise and mispredicted
  // ~per-pixel.
  int dw = std::abs(w - nw), dn = std::abs(n - nw);
  bool between = ((w < nw) & (nw < n)) | ((n < nw) & (nw < w));
  int grad = (dw > 32 || dn > 32) ? w + n - nw : (w + n) >> 1;
  int sel = dw > dn ? w : n;
  return between ? grad : sel;
}

void decode_olympus_impl(const uint8_t* data, int64_t len, uint16_t* out,
                         int64_t width, int64_t height) {
  if (len < 7) throw std::runtime_error("olympus strip too short");
  FastMsb rdr{data + 7, len - 7};
  for (int64_t row = 0; row < height; row++) {
    int acarry[2][3] = {{0, 0, 0}, {0, 0, 0}};
    for (int64_t col = 0; col < width; col++) {
      int* carry = acarry[col & 1];
      int nbits = oly_nbits(carry[0], carry[2]);
      // A whole sample is <=32 bits (3 sign/low + unary <=13 + escape
      // literal (16-nbits) + nbits raw, with the escape and raw widths
      // summing to 16) — decode it out of ONE refill-checked window
      // instead of 3-4 refilled get()s. Bit-identical to the get()/
      // zeros_limit sequence incl. zero-padded EOF (the differential
      // soak and the Python-reference equality tests pin this).
      uint64_t w = rdr.win57();
      uint32_t sign3 = uint32_t(w >> 61);
      int used = 3;
      w <<= 3;
      int low = sign3 & 3;
      int sign = (sign3 & 4) ? -1 : 0;
      int lead = w ? __builtin_clzll(w) : 64;
      int high;
      if (lead >= 12) {  // 12-zero escape: 16-nbits literal follows
        used += 12;
        w <<= 12;
        int k = 16 - nbits;
        high = k > 0 ? int(w >> (64 - k)) >> 1 : 0;
        used += k;
        w <<= k;
      } else {
        high = lead;
        used += lead + 1;
        w <<= lead + 1;
      }
      carry[0] = (high << nbits) |
                 (nbits > 0 ? int(w >> (64 - nbits)) : 0);
      rdr.navail -= used + nbits;
      int diff = (carry[0] ^ sign) + carry[1];
      carry[1] = (diff * 3 + carry[1]) >> 5;
      carry[2] = carry[0] > 16 ? 0 : carry[2] + 1;
      int pred = oly_predict(out, width, row, col);
      out[row * width + col] = uint16_t(pred + ((diff << 2) | low));
    }
  }
}

std::vector<uint8_t> encode_olympus_impl(const uint16_t* mosaic,
                                         int64_t width, int64_t height) {
  std::vector<uint16_t> out(size_t(width) * height, 0);
  MsbWriter wtr;
  for (int64_t row = 0; row < height; row++) {
    int acarry[2][3] = {{0, 0, 0}, {0, 0, 0}};
    for (int64_t col = 0; col < width; col++) {
      int* carry = acarry[col & 1];
      int nbits = oly_nbits(carry[0], carry[2]);
      int pred = oly_predict(out.data(), width, row, col);
      int delta = int(mosaic[row * width + col]) - pred;
      int low = delta & 3;
      int diff = delta >> 2;
      int d = diff - carry[1];
      int sign, carry0;
      if (d >= 0) {
        sign = 0;
        carry0 = d;
      } else {
        sign = -1;
        carry0 = ~d;
      }
      int high = carry0 >> nbits;
      int raw = carry0 & ((1 << nbits) - 1);
      wtr.put((sign ? 4 : 0) | low, 3);
      if (high < 12) {
        wtr.put(1, high + 1);
      } else {
        if (high >= (1 << (15 - nbits)))
          throw std::runtime_error("olympus residual too large");
        wtr.put(0, 12);
        wtr.put(high << 1, 16 - nbits);
      }
      wtr.put(raw, nbits);
      carry[0] = carry0;
      carry[1] = (diff * 3 + carry[1]) >> 5;
      carry[2] = carry0 > 16 ? 0 : carry[2] + 1;
      out[row * width + col] = uint16_t(pred + ((diff << 2) | low));
    }
  }
  wtr.flush();
  std::vector<uint8_t> result(7, 0);
  result.insert(result.end(), wtr.out.begin(), wtr.out.end());
  return result;
}

// ---------------------------------------------------------------------------
// Panasonic RW2 v4 sensor codec
// ---------------------------------------------------------------------------
// Published dcraw-lineage Panasonic scheme (see raw/panasonic.py, the
// Python behavioral reference): 0x4000-byte blocks rotated by 0x2008,
// group-reversed little-endian bit addressing, 14-pixel prediction
// groups.

struct PanaBits {
  const uint8_t* d;
  int64_t n;
  int64_t off = 0;
  int vbits = 0;
  uint8_t buf[0x4001];

  PanaBits(const uint8_t* data, int64_t len) : d(data), n(len) {
    memset(buf, 0, sizeof buf);
  }
  inline uint32_t get(int nbits) {
    if (nbits == 0) {
      vbits = 0;
      return 0;
    }
    if (!vbits) {
      memset(buf, 0, 0x4000);
      int64_t avail = n - off;
      int64_t first = avail < 0x4000 - 0x2008 ? avail : 0x4000 - 0x2008;
      if (first > 0) memcpy(buf + 0x2008, d + off, first);
      int64_t second = avail - first;
      if (second > 0x2008) second = 0x2008;
      if (second > 0) memcpy(buf, d + off + first, second);
      off += 0x4000;
    }
    vbits = (vbits - nbits) & 0x1FFFF;
    int byte = (vbits >> 3) ^ 0x3FF0;
    uint32_t word = buf[byte] | (uint32_t(buf[byte + 1]) << 8);
    return (word >> (vbits & 7)) & ~(uint32_t(-1) << nbits);
  }
};

void decode_rw2_impl(const uint8_t* data, int64_t len, uint16_t* out,
                     int64_t width, int64_t height) {
  PanaBits bits(data, len);
  bits.get(0);
  int sh = 0, pred[2] = {0, 0}, nonz[2] = {0, 0};
  for (int64_t row = 0; row < height; row++) {
    for (int64_t col = 0; col < width; col++) {
      int i = col % 14;
      if (i == 0) pred[0] = pred[1] = nonz[0] = nonz[1] = 0;
      if (i % 3 == 2) sh = 4 >> (3 - bits.get(2));
      if (nonz[i & 1]) {
        int j = bits.get(8);
        if (j) {
          pred[i & 1] -= 0x80 << sh;
          if (pred[i & 1] < 0 || sh == 4) pred[i & 1] &= ~(-1 << sh);
          pred[i & 1] += j << sh;
        }
      } else {
        nonz[i & 1] = bits.get(8);
        if (nonz[i & 1] || i > 11)
          pred[i & 1] = (nonz[i & 1] << 4) | bits.get(4);
      }
      int v = pred[col & 1];
      if (v > 4098) throw std::runtime_error("RW2 sample out of range");
      out[row * width + col] = uint16_t(v);
    }
  }
}

struct PanaBitWriter {
  std::vector<std::vector<uint8_t>> blocks;
  int vbits = 0;

  inline void put(uint32_t value, int nbits) {
    if (nbits == 0) return;
    if (!vbits) blocks.emplace_back(0x4001, 0);
    std::vector<uint8_t>& buf = blocks.back();
    vbits = (vbits - nbits) & 0x1FFFF;
    int byte = (vbits >> 3) ^ 0x3FF0;
    uint32_t word = (value & ~(uint32_t(-1) << nbits)) << (vbits & 7);
    buf[byte] |= word & 0xFF;
    buf[byte + 1] |= word >> 8;
    if (buf[0x4000])
      throw std::runtime_error("RW2 field crossed a block boundary");
  }
  std::vector<uint8_t> flush() {
    std::vector<uint8_t> out;
    out.reserve(blocks.size() * 0x4000);
    for (auto& buf : blocks) {
      out.insert(out.end(), buf.begin() + 0x2008, buf.begin() + 0x4000);
      out.insert(out.end(), buf.begin(), buf.begin() + 0x2008);
    }
    return out;
  }
};

std::vector<uint8_t> encode_rw2_impl(const uint16_t* mosaic, int64_t width,
                                     int64_t height) {
  if (width % 14)
    throw std::runtime_error("RW2 width must be a multiple of 14");
  PanaBitWriter wtr;
  int pred[2] = {0, 0};
  for (int64_t row = 0; row < height; row++) {
    for (int64_t col = 0; col < width; col++) {
      int v = mosaic[row * width + col];
      if (v < 16 || v > 4095)
        throw std::runtime_error("RW2 samples must be in [16, 4095]");
      int i = col % 14;
      if (i == 0) pred[0] = pred[1] = 0;
      if (i % 3 == 2) wtr.put(3, 2);  // sh = 4
      if (i < 2) {
        wtr.put(v >> 4, 8);
        wtr.put(v & 15, 4);
        pred[i & 1] = v;
      } else {
        int p = pred[i & 1];
        if (v == p) {
          wtr.put(0, 8);
          continue;
        }
        int base = p & 15;
        if ((v - base) % 16 || (v - base) >> 4 < 1 ||
            (v - base) >> 4 > 255)
          throw std::runtime_error(
              "RW2 sample not representable (quantize first)");
        wtr.put((v - base) >> 4, 8);
        pred[i & 1] = v;
      }
    }
  }
  return wtr.flush();
}

// ---------------------------------------------------------------------------
// Pentax PEF compressed sensor codec
// ---------------------------------------------------------------------------
// Published dcraw-lineage Pentax scheme (see raw/pentax.py, the Python
// behavioral reference): MakerNote 0x0220 supplies (12-bit-aligned
// prefix, length) per category; MSB-first stream of category codes +
// T.81 raw bits; Nikon-style vpred/hpred prediction.

void decode_pentax_impl(const uint8_t* data, int64_t len, uint16_t* out,
                        int64_t width, int64_t height, int bps,
                        const uint8_t* spec, int64_t spec_len,
                        bool be_spec) {
  auto rd16 = [&](int64_t off) -> int {
    return be_spec ? (spec[off] << 8) | spec[off + 1]
                   : spec[off] | (spec[off + 1] << 8);
  };
  if (spec_len < 2) throw std::runtime_error("pentax spec too short");
  int dep = (rd16(0) + 12) & 15;
  if (spec_len < 14 + dep * 3)
    throw std::runtime_error("pentax spec truncated");
  // 12-bit window LUT: value = len << 8 | category.
  std::vector<uint16_t> lut(4096, 0xFFFF);
  for (int c = 0; c < dep; c++) {
    int prefix = rd16(14 + 2 * c) & 4095;
    int ln = spec[14 + 2 * dep + c];
    if (ln < 1 || ln > 12)
      throw std::runtime_error("pentax code length out of range");
    for (int k = 0; k < (4096 >> ln); k++)
      lut[(prefix + k) & 4095] = uint16_t(ln << 8 | c);
  }
  FastMsb rdr{data, len};
  int vpred[2][2] = {{0, 0}, {0, 0}};
  int hpred[2] = {0, 0};
  int top = 1 << bps;
  for (int64_t row = 0; row < height; row++) {
    for (int64_t col = 0; col < width; col++) {
      uint16_t hit = lut[rdr.peek12()];
      if (hit == 0xFFFF)
        throw std::runtime_error("pentax stream: no code matches");
      int cat = hit & 0xFF;
      rdr.skip(hit >> 8);
      int diff = 0;
      if (cat) {
        int raw = rdr.get(cat);
        diff = raw >= (1 << (cat - 1)) ? raw : raw - (1 << cat) + 1;
      }
      int v;
      if (col < 2) {
        vpred[row & 1][col] += diff;
        v = hpred[col] = vpred[row & 1][col];
      } else {
        v = hpred[col & 1] += diff;
      }
      if (v < 0 || v >= top)
        throw std::runtime_error("pentax sample out of range");
      out[row * width + col] = uint16_t(v);
    }
  }
}

// ---------------------------------------------------------------------------
// Kodak DCR/KDC compression 65000
// ---------------------------------------------------------------------------
// Published dcraw-lineage scheme (see raw/kodak.py, the Python
// behavioral reference): 256-sample segments, nibble-packed bit
// lengths (>12 escapes to an uncompressed six-u16s-per-eight-values
// layout), LSB-first bit buffer refilled from big-endian u16 words.

void decode_kodak65000_impl(const uint8_t* d, int64_t n, uint16_t* out,
                            int64_t width, int64_t height) {
  int64_t pos = 0;
  auto byte = [&]() -> int {
    if (pos >= n) throw std::runtime_error("kodak65000: stream truncated");
    return d[pos++];
  };
  std::vector<uint8_t> blen(260);
  std::vector<int32_t> vals(260);
  for (int64_t row = 0; row < height; row++) {
    for (int64_t col = 0; col < width; col += 256) {
      int len = int(width - col < 256 ? width - col : 256);
      int bsize = (len + 3) & ~3;
      int64_t save = pos;
      bool absolute = false;
      for (int i = 0; i < bsize; i += 2) {
        int c = byte();
        blen[i] = c & 15;
        blen[i + 1] = c >> 4;
        if (blen[i] > 12 || blen[i + 1] > 12) {
          absolute = true;
          break;
        }
      }
      if (absolute) {
        pos = save;
        for (int i = 0; i < bsize; i += 8) {
          uint16_t raw[6];
          for (int j = 0; j < 6; j++) {
            int lo = byte();
            int hi = byte();
            raw[j] = uint16_t(lo | (hi << 8));
          }
          vals[i] = (raw[0] >> 12 << 8) | (raw[2] >> 12 << 4) |
                    (raw[4] >> 12);
          vals[i + 1] = (raw[1] >> 12 << 8) | (raw[3] >> 12 << 4) |
                        (raw[5] >> 12);
          for (int j = 0; j < 6 && i + 2 + j < bsize; j++)
            vals[i + 2 + j] = raw[j] & 0xFFF;
        }
      } else {
        uint64_t bitbuf = 0;
        int bits = 0;
        if ((bsize & 7) == 4) {
          bitbuf = (uint64_t(byte()) << 8);
          bitbuf += byte();
          bits = 16;
        }
        for (int i = 0; i < bsize; i++) {
          int ln = blen[i];
          if (bits < ln) {
            for (int j = 0; j < 32; j += 8)
              bitbuf += uint64_t(byte()) << (bits + (j ^ 8));
            bits += 32;
          }
          int32_t diff = int32_t(bitbuf & ((1u << ln) - 1));
          bitbuf >>= ln;
          bits -= ln;
          if (ln && !(diff & (1 << (ln - 1))))
            diff -= (1 << ln) - 1;
          vals[i] = diff;
        }
      }
      int32_t pred[2] = {0, 0};
      for (int i = 0; i < len; i++) {
        int32_t pix;
        if (absolute) {
          pix = vals[i];
        } else {
          pred[i & 1] += vals[i];
          pix = pred[i & 1];
        }
        if (pix >> 12)
          throw std::runtime_error("kodak65000 sample out of range");
        out[row * width + col + i] = uint16_t(pix);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Canon CRW (original Canon codec)
// ---------------------------------------------------------------------------
// Published dcraw-lineage scheme (see raw/ciff.py, the Python
// behavioral reference): 64-entry JPEG-style difference blocks under
// two canonical Huffman trees per decoder table (the first entry of a
// block uses the "first" tree and carries an inter-block DC carry),
// even/odd 512-base predictors reset per row, 8-row bands, MSB-first
// bit stream with 0x00 stuffing after 0xff. Tables mirror
// raw/ciff.py:FIRST_TREES/SECOND_TREES (structural provenance and the
// second-tree-1 repair note live there); parity is pinned by a test
// that exercises every leaf of every table.

const uint8_t kCrwFirst[3][16 + 13] = {
    {0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0x04, 0x03, 0x05, 0x06, 0x02, 0x07, 0x01, 0x08, 0x09, 0x00,
     0x0a, 0x0b, 0xff},
    {0, 2, 2, 3, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0, 0,
     0x03, 0x02, 0x04, 0x01, 0x05, 0x00, 0x06, 0x07, 0x09, 0x08,
     0x0a, 0x0b, 0xff},
    {0, 0, 6, 3, 1, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0x06, 0x05, 0x07, 0x04, 0x08, 0x03, 0x09, 0x02, 0x00, 0x0a,
     0x01, 0x0b, 0xff},
};

const uint8_t kCrwSecond[3][16 + 162] = {
    {0, 2, 2, 2, 1, 4, 2, 1, 2, 5, 1, 1, 0, 0, 0, 139,
     0x03, 0x04, 0x02, 0x05, 0x01, 0x06, 0x07, 0x08,
     0x12, 0x13, 0x11, 0x14, 0x09, 0x15, 0x22, 0x00, 0x21, 0x16,
     0x0a, 0xf0,
     0x23, 0x17, 0x24, 0x31, 0x32, 0x18, 0x19, 0x33, 0x25, 0x41,
     0x34, 0x42, 0x35, 0x51, 0x36, 0x37, 0x38, 0x29, 0x79, 0x26,
     0x1a, 0x39, 0x56, 0x57, 0x28, 0x27, 0x52, 0x55, 0x58, 0x43,
     0x76, 0x59, 0x77, 0x54, 0x61, 0xf9, 0x71, 0x78, 0x75, 0x96,
     0x97, 0x49, 0xb7, 0x53, 0xd7, 0x74, 0xb6, 0x98, 0x47, 0x48,
     0x95, 0x69, 0x99, 0x91, 0xfa, 0xb8, 0x68, 0xb5, 0xb9, 0xd6,
     0xf7, 0xd8, 0x67, 0x46, 0x45, 0x94, 0x89, 0xf8, 0x81, 0xd5,
     0xf6, 0xb4, 0x88, 0xb1, 0x2a, 0x44, 0x72, 0xd9, 0x87, 0x66,
     0xd4, 0xf5, 0x3a, 0xa7, 0x73, 0xa9, 0xa8, 0x86, 0x62, 0xc7,
     0x65, 0xc8, 0xc9, 0xa1, 0xf4, 0xd1, 0xe9, 0x5a, 0x92, 0x85,
     0xa6, 0xe7, 0x93, 0xe8, 0xc1, 0xc6, 0x7a, 0x64, 0xe1, 0x4a,
     0x6a, 0xe6, 0xb3, 0xf1, 0xd3, 0xa5, 0x8a, 0xb2, 0x9a, 0xba,
     0x84, 0xa4, 0x63, 0xe5, 0xc5, 0xf3, 0xd2, 0xc4, 0x82, 0xaa,
     0xda, 0xe4, 0xf2, 0xca, 0x83, 0xa3, 0xa2, 0xc3, 0xea, 0xc2,
     0xe2, 0xe3},
    {0, 2, 2, 1, 4, 1, 4, 1, 3, 3, 1, 0, 0, 0, 0, 140,
     0x02, 0x03, 0x01, 0x04, 0x05, 0x12, 0x11, 0x06, 0x13, 0x07,
     0x08, 0x14, 0x22, 0x09, 0x21, 0x00, 0x23, 0x15, 0x31, 0x32,
     0x0a, 0x16, 0xf0, 0x24, 0x33, 0x41, 0x42, 0x19, 0x17, 0x25,
     0x18, 0x51, 0x34, 0x43, 0x52, 0x29, 0x35, 0x61, 0x39, 0x71,
     0x62, 0x36, 0x53, 0x26, 0x38, 0x1a, 0x37, 0x81, 0x27, 0x91,
     0x79, 0x55, 0x45, 0x28, 0x72, 0x59, 0xa1, 0xb1, 0x44, 0x69,
     0x54, 0x58, 0xd1, 0xfa, 0x57, 0xe1, 0xf1, 0xb9, 0x49, 0x47,
     0x63, 0x6a, 0xf9, 0x56, 0x46, 0xa8, 0x2a, 0x4a, 0x78, 0x99,
     0x3a, 0x75, 0x74, 0x86, 0x65, 0xc1, 0x76, 0xb6, 0x96, 0xd6,
     0x89, 0x85, 0xc9, 0xf5, 0x95, 0xb4, 0xc7, 0x73, 0x8a, 0x66,
     0xd8, 0x87, 0xf2, 0xe8, 0xd7, 0x98, 0xb7, 0xe7, 0x48, 0xa6,
     0x67, 0x68, 0xd9, 0x64, 0xba, 0x97, 0xa5, 0xc5, 0x5a, 0xe9,
     0xda, 0xa4, 0xea, 0xf3, 0xca, 0x88, 0xb5, 0x7a, 0xf7, 0x77,
     0xf4, 0x94, 0xe6, 0xf6, 0xc6, 0xaa, 0xa9, 0x82, 0x92, 0x9a,
     0xf8, 0xc4, 0xc3, 0xd5, 0xd4, 0xe4, 0xa7, 0xe5, 0xa2, 0xb2,
     0xe3, 0xb8, 0xb3, 0xe2, 0xc2, 0xa3, 0xc8, 0x93, 0x84, 0xd3,
     0xd2, 0x83},
    {0, 0, 6, 2, 1, 3, 3, 2, 5, 1, 2, 2, 8, 10, 0, 117,
     0x04, 0x05, 0x03, 0x06, 0x02, 0x07, 0x01, 0x08, 0x09, 0x12,
     0x13, 0x14, 0x11, 0x15, 0x0a, 0x16, 0x17, 0xf0, 0x00, 0x22,
     0x21, 0x18, 0x23, 0x19, 0x24, 0x32, 0x31, 0x25, 0x33, 0x38,
     0x37, 0x34, 0x35, 0x36, 0x39, 0x79, 0x57, 0x58, 0x59, 0x28,
     0x56, 0x78, 0x27, 0x41, 0x29, 0x77, 0x26, 0x42, 0x76, 0x99,
     0x1a, 0x55, 0x98, 0x97, 0xf9, 0x48, 0x54, 0x96, 0x89, 0x47,
     0xb7, 0x49, 0xfa, 0x75, 0x68, 0xb6, 0x67, 0x69, 0xb9, 0xb8,
     0xd8, 0x52, 0xd7, 0x88, 0xb5, 0x74, 0x51, 0x46, 0xd9, 0xf8,
     0x3a, 0xd6, 0x87, 0x45, 0x7a, 0x95, 0xd5, 0xf6, 0x86, 0xb4,
     0xa9, 0x94, 0x53, 0x2a, 0xa8, 0x43, 0xf5, 0xf7, 0xd4, 0x66,
     0xa7, 0x5a, 0x44, 0x8a, 0xc9, 0xe8, 0xc8, 0xe7, 0x9a, 0x6a,
     0x73, 0x4a, 0x61, 0xc7, 0xf4, 0xc6, 0x65, 0xe9, 0x72, 0xe6,
     0x71, 0x91, 0x93, 0xa6, 0xda, 0x92, 0x85, 0x62, 0xf3, 0xc5,
     0xb2, 0xa4, 0x84, 0xba, 0x64, 0xa5, 0xb3, 0xd2, 0x81, 0xe5,
     0xd3, 0xaa, 0xc4, 0xca, 0xf2, 0xb1, 0xe4, 0xd1, 0x83, 0x63,
     0xea, 0xc3, 0xe2, 0x82, 0xf1, 0xa3, 0xc2, 0xa1, 0xc1, 0xe3,
     0xa2, 0xe1},
};

struct CrwHuff {
  int maxlen = 0;
  std::vector<uint16_t> lut;  // (code length << 8) | value; 0xFFFF invalid

  void build(const uint8_t* spec) {
    const uint8_t* counts = spec;
    const uint8_t* values = spec + 16;
    maxlen = 16;
    while (maxlen && !counts[maxlen - 1]) maxlen--;
    lut.assign(size_t(1) << maxlen, 0xFFFF);
    unsigned code = 0;
    int k = 0;
    for (int len = 1; len <= maxlen; len++) {
      for (int i = 0; i < counts[len - 1]; i++, k++) {
        unsigned base = code << (maxlen - len);
        unsigned span = 1u << (maxlen - len);
        for (unsigned j = 0; j < span; j++)
          lut[base + j] = uint16_t((len << 8) | values[k]);
        code++;
      }
      code <<= 1;
    }
  }
};

struct CrwBits {
  const uint8_t* d;
  int64_t n;
  int64_t pos = 0;
  uint64_t buf = 0;
  int nbits = 0;

  void fill() {
    while (nbits <= 48 && pos < n) {
      if (pos + 8 <= n) {
        // Bulk refill: a 64-bit window with no 0xFF byte needs no
        // stuffing checks — append it whole (SWAR 0xFF-byte test).
        uint64_t chunk;
        memcpy(&chunk, d + pos, 8);
        uint64_t x = ~chunk;  // 0xFF bytes become 0x00
        if (((x - 0x0101010101010101ull) & ~x &
             0x8080808080808080ull) == 0) {
          chunk = bswap64u(chunk);
          int take = (64 - nbits) >> 3;
          if (take >= 8) {
            buf = chunk;
            nbits = 64;
            pos += 8;
          } else {
            buf = (buf << (8 * take)) | (chunk >> (64 - 8 * take));
            nbits += 8 * take;
            pos += take;
          }
          continue;
        }
      }
      uint8_t c = d[pos++];
      if (c == 0xFF) {
        // 0xff + 0x00 is a stuffed literal; 0xff + non-zero marks the
        // end of data in the published reader.
        if (pos >= n || d[pos] != 0x00) {
          pos = n;
          break;
        }
        pos++;
      }
      buf = (buf << 8) | c;
      nbits += 8;
    }
  }

  int peek(int k) {  // zero-extended
    if (nbits < k) fill();
    if (nbits >= k) return int((buf >> (nbits - k)) & ((1u << k) - 1));
    return int((buf << (k - nbits)) & ((1u << k) - 1));
  }

  void drop(int k) {
    if (k > nbits)
      throw std::runtime_error("canon crw: bit stream truncated");
    nbits -= k;
  }

  int get(int k) {
    if (nbits < k) fill();
    if (k > nbits)
      throw std::runtime_error("canon crw: bit stream truncated");
    nbits -= k;
    return int((buf >> nbits) & ((1u << k) - 1));
  }

  // Approximate stream consumption (buffered-but-unconsumed data bytes
  // subtracted; stuffed zeros in the buffer and partial bits are not —
  // the file-level mode check allows 64 bytes of slack).
  int64_t consumed() const { return pos - nbits / 8; }
};

// Decodes the 10-bit high-order plane; *consumed_out gets the byte
// consumption count used by the file-level mode check.
void decode_canon_crw_impl(const uint8_t* d, int64_t n, uint16_t* out,
                           int64_t width, int64_t height, int table,
                           int64_t* consumed_out) {
  if (table < 0) table = 0;
  if (table > 2) table = 2;
  CrwHuff first, second;
  first.build(kCrwFirst[table]);
  second.build(kCrwSecond[table]);
  {
    int64_t row = 0;
    while (row < height) {
      int64_t band = height - row < 8 ? height - row : 8;
      if ((band * width) & 63)
        throw std::runtime_error("canon crw: band not 64-sample aligned");
      row += band;
    }
  }
  CrwBits bits{d, n};
  int32_t diffbuf[64];
  int32_t base[2] = {0, 0};
  int32_t carry = 0;
  int64_t row_countdown = 0;  // samples until the next row start
  int64_t row = 0;
  while (row < height) {
    int64_t band = height - row < 8 ? height - row : 8;
    int64_t npix = band * width;
    int64_t pos0 = row * width;
    for (int64_t block = 0; block < (npix >> 6); block++) {
      std::memset(diffbuf, 0, sizeof diffbuf);
      for (int i = 0; i < 64; i++) {
        const CrwHuff& h = i ? second : first;
        // Fused fast path: code (<=16 bits) + diff bits (<=15) both
        // come out of one refill check when >=32 bits are buffered.
        // The slow path (peek zero-extends, drop/get throw on
        // truncation) is bit-identical and only runs near EOF.
        int leaf, len = 0, diff = 0;
        if (bits.nbits < 32) bits.fill();
        if (bits.nbits >= 32) {
          uint16_t hit =
              h.lut[(bits.buf >> (bits.nbits - h.maxlen)) &
                    ((1u << h.maxlen) - 1)];
          if (hit == 0xFFFF)
            throw std::runtime_error("canon crw: invalid huffman code");
          bits.nbits -= hit >> 8;
          leaf = hit & 0xFF;
          if (leaf != 0xFF) {
            len = leaf & 15;
            if (len) {
              diff = int((bits.buf >> (bits.nbits - len)) &
                         ((1u << len) - 1));
              bits.nbits -= len;
            }
          }
        } else {
          uint16_t hit = h.lut[bits.peek(h.maxlen)];
          if (hit == 0xFFFF)
            throw std::runtime_error("canon crw: invalid huffman code");
          bits.drop(hit >> 8);
          leaf = hit & 0xFF;
          if (leaf != 0xFF) {
            len = leaf & 15;
            if (len) diff = bits.get(len);
          }
        }
        if (leaf == 0 && i) break;
        if (leaf == 0xFF) continue;
        i += leaf >> 4;
        if (!len) continue;
        if (!(diff & (1 << (len - 1)))) diff -= (1 << len) - 1;
        if (i < 64) diffbuf[i] = diff;
      }
      diffbuf[0] += carry;
      carry = diffbuf[0];
      int64_t boff = pos0 + (int64_t(block) << 6);
      for (int i = 0; i < 64; i++) {
        // Row start resets the even/odd predictors (countdown instead
        // of the published pnum % width — that was a 64-bit integer
        // division per pixel).
        if (row_countdown == 0) {
          base[0] = base[1] = 512;
          row_countdown = width;
        }
        row_countdown--;
        base[i & 1] += diffbuf[i];
        int32_t v = base[i & 1];
        if (v >> 10)
          throw std::runtime_error("canon crw: sample out of 10-bit range");
        out[boff + i] = uint16_t(v);
      }
    }
    row += band;
  }
  if (consumed_out) *consumed_out = bits.consumed();
}

// ---------------------------------------------------------------------------
// Samsung SRW v1 (compression 32770)
// ---------------------------------------------------------------------------
// Published dcraw-lineage scheme (see raw/samsung.py, the Python
// behavioral reference): per-row bit streams addressed by a u32
// offset table, Phase-One style bit getter (64-bit buffer, 32-bit LE
// word refills, MSB-first), 16-pixel blocks with a direction bit and
// four 2-bit length opcodes, even pixels then odd, final same-CFA
// (r,c+1)<->(r+1,c) swap.

// ---------------------------------------------------------------------------
// Baseline JFIF encoder from YCbCr 4:2:0 planes (ITU-T T.81)
// ---------------------------------------------------------------------------
//
// The batch exporter's JPEG back end: the TPU emits JFIF-range YCbCr
// with chroma already box-filtered 2x2 (ops/jpeg.py), this encodes it
// as a baseline sequential JFIF — 8x8 fDCT, Annex K quantization
// scaled by the libjpeg quality formula, and OPTIMAL per-image Huffman
// tables built with the spec's Annex K.2/K.3 procedures (code lengths
// limited to 16, the all-ones code reserved via the pseudo-symbol).
// Using computed tables sidesteps the "typical" Annex K Huffman
// constants entirely and produces strictly smaller files.

const uint8_t kJpegZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

const uint8_t kQuantLuma[64] = {
    16, 11, 10, 16, 24,  40,  51,  61,  12, 12, 14, 19, 26,  58,  60,  55,
    14, 13, 16, 24, 40,  57,  69,  56,  14, 17, 22, 29, 51,  87,  80,  62,
    18, 22, 37, 56, 68,  109, 103, 77,  24, 35, 55, 64, 81,  104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99};

const uint8_t kQuantChroma[64] = {
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99};

struct JpegBitWriter {
  // 64-bit accumulator: individual puts are <=16 bits, so buffering up
  // to 31 bits and draining 4 aligned bytes at a time is safe. The
  // common no-0xFF word appends in one memcpy; stuffing (B.1.1.5)
  // falls back to the per-byte path. Byte stream is identical to the
  // old per-byte writer by construction.
  std::vector<uint8_t>& out;
  uint64_t acc = 0;
  int nbits = 0;
  explicit JpegBitWriter(std::vector<uint8_t>& o) : out(o) {}
  inline void emit_byte(uint8_t b) {
    out.push_back(b);
    if (b == 0xFF) out.push_back(0x00);  // byte stuffing (B.1.1.5)
  }
  inline void put(uint32_t v, int len) {
    acc = (acc << len) | uint64_t(v & ((1u << len) - 1));
    nbits += len;
    if (nbits >= 32) {
      nbits -= 32;
      uint32_t w = uint32_t(acc >> nbits);
      uint32_t nx = ~w;  // any 0xFF byte? (zero-byte scan of ~w)
      if (((nx - 0x01010101u) & ~nx & 0x80808080u) == 0) {
        uint32_t be = __builtin_bswap32(w);
        size_t s = out.size();
        out.resize(s + 4);
        std::memcpy(out.data() + s, &be, 4);
      } else {
        emit_byte(uint8_t(w >> 24));
        emit_byte(uint8_t(w >> 16));
        emit_byte(uint8_t(w >> 8));
        emit_byte(uint8_t(w));
      }
    }
  }
  void pad() {  // pad to byte boundary with 1-bits (F.1.2.3)
    if (nbits & 7) put((1u << (8 - (nbits & 7))) - 1, 8 - (nbits & 7));
    while (nbits >= 8) {
      nbits -= 8;
      emit_byte(uint8_t(acc >> nbits));
    }
  }
};

// Annex K.2 code-length derivation + K.3 16-bit limiting. freq has 257
// slots; slot 256 is the pseudo-symbol that reserves the all-ones code.
// Emits BITS[1..16] and the symbol list in canonical order, and fills
// ehufco/ehufsi (code/size per symbol) for the encoder.
struct HuffTable {
  uint8_t bits[17] = {0};
  std::vector<uint8_t> vals;
  uint16_t code[256] = {0};
  uint8_t size[256] = {0};

  void build(uint32_t freq_in[257]) {
    int32_t freq[257];
    int32_t codesize[257] = {0};
    int32_t others[257];
    for (int i = 0; i < 257; i++) {
      freq[i] = int32_t(freq_in[i]);
      others[i] = -1;
    }
    freq[256] = 1;
    for (;;) {
      int v1 = -1, v2 = -1;
      int32_t f1 = INT32_MAX, f2 = INT32_MAX;
      for (int i = 0; i <= 256; i++) {
        if (freq[i] == 0) continue;
        if (freq[i] <= f1) {
          f2 = f1; v2 = v1;
          f1 = freq[i]; v1 = i;
        } else if (freq[i] <= f2) {
          f2 = freq[i]; v2 = i;
        }
      }
      if (v2 < 0) break;  // one tree left
      freq[v1] += freq[v2];
      freq[v2] = 0;
      codesize[v1]++;
      while (others[v1] >= 0) { v1 = others[v1]; codesize[v1]++; }
      others[v1] = v2;
      codesize[v2]++;
      while (others[v2] >= 0) { v2 = others[v2]; codesize[v2]++; }
    }
    int32_t counts[64] = {0};
    for (int i = 0; i <= 256; i++)
      if (codesize[i]) counts[codesize[i] < 63 ? codesize[i] : 63]++;
    // K.3 Adjust_BITS: fold lengths > 16 upward.
    for (int i = 62; i > 16; i--) {
      while (counts[i] > 0) {
        int j = i - 2;
        while (counts[j] == 0) j--;
        counts[i] -= 2;
        counts[i - 1] += 1;
        counts[j + 1] += 2;
        counts[j] -= 1;
      }
    }
    {  // remove the pseudo-symbol's slot from the longest used length
      int i = 16;
      while (counts[i] == 0) i--;
      counts[i] -= 1;
    }
    for (int i = 1; i <= 16; i++) bits[i] = uint8_t(counts[i]);
    // Symbols sorted by (code length, value), pseudo-symbol dropped.
    vals.clear();
    for (int len = 1; len <= 62; len++)
      for (int i = 0; i < 256; i++)
        if (codesize[i] == len) vals.push_back(uint8_t(i));
    // Canonical code assignment over the ADJUSTED lengths.
    uint16_t c = 0;
    size_t vi = 0;
    for (int len = 1; len <= 16; len++) {
      for (int k = 0; k < bits[len]; k++) {
        uint8_t sym = vals[vi++];
        code[sym] = c++;
        size[sym] = uint8_t(len);
      }
      c <<= 1;
    }
    vals.resize(vi);  // lengths beyond 16 were folded into <=16 slots
  }

  // Build from a fixed (BITS, HUFFVAL) spec — same canonical code
  // assignment as the derived path.
  void build_spec(const uint8_t* bits_in, const uint8_t* vals_in,
                  size_t nvals) {
    for (int i = 1; i <= 16; i++) bits[i] = bits_in[i];
    vals.assign(vals_in, vals_in + nvals);
    uint16_t c = 0;
    size_t vi = 0;
    for (int len = 1; len <= 16; len++) {
      for (int k = 0; k < bits[len]; k++) {
        uint8_t sym = vals[vi++];
        code[sym] = c++;
        size[sym] = uint8_t(len);
      }
      c <<= 1;
    }
  }
};

// ITU-T T.81 Annex K.3.3 "typical" Huffman tables (the tables every
// baseline encoder ships; libjpeg's defaults). Used by the fast
// single-pass mode — per-image optimal tables cost a second full
// DCT+categorize pass for ~3-5% smaller files.
static const uint8_t kDcLumaBits[17] = {0, 0, 1, 5, 1, 1, 1, 1, 1,
                                        1, 0, 0, 0, 0, 0, 0, 0};
static const uint8_t kDcLumaVals[12] = {0, 1, 2, 3, 4,  5,
                                        6, 7, 8, 9, 10, 11};
static const uint8_t kDcChromaBits[17] = {0, 0, 3, 1, 1, 1, 1, 1, 1,
                                          1, 1, 1, 0, 0, 0, 0, 0};
static const uint8_t kDcChromaVals[12] = {0, 1, 2, 3, 4,  5,
                                          6, 7, 8, 9, 10, 11};
static const uint8_t kAcLumaBits[17] = {0, 0, 2, 1, 3, 3, 2, 4,    3,
                                        5, 5, 4, 4, 0, 0, 1, 0x7d};
static const uint8_t kAcLumaVals[162] = {
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};
static const uint8_t kAcChromaBits[17] = {0, 0, 2, 1, 2, 4, 4, 3,    4,
                                          7, 5, 4, 4, 0, 1, 2, 0x77};
static const uint8_t kAcChromaVals[162] = {
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

inline int jpeg_category(int v) {  // size class of a DC diff / AC coeff
  unsigned a = v < 0 ? unsigned(-v) : unsigned(v);
  return a ? 32 - __builtin_clz(a) : 0;
}

// Forward 8x8 scaled DCT-II (Arai–Agui–Nakajima factorization: 5
// multiplies + 29 adds per 1-D pass). The output is the true DCT
// times aan[u]*aan[v]*8; that constant is folded into the caller's
// quantization reciprocals (jpeg_aan_scale), so quantized
// coefficients are exact — same contract as a plain matrix DCT.
struct JpegDct {
  static inline void pass1d(float* d, int stride) {
    float d0 = d[0], d1 = d[stride], d2 = d[2 * stride], d3 = d[3 * stride];
    float d4 = d[4 * stride], d5 = d[5 * stride], d6 = d[6 * stride],
          d7 = d[7 * stride];
    float t0 = d0 + d7, t7 = d0 - d7;
    float t1 = d1 + d6, t6 = d1 - d6;
    float t2 = d2 + d5, t5 = d2 - d5;
    float t3 = d3 + d4, t4 = d3 - d4;
    float t10 = t0 + t3, t13 = t0 - t3;
    float t11 = t1 + t2, t12 = t1 - t2;
    d[0] = t10 + t11;
    d[4 * stride] = t10 - t11;
    float z1 = (t12 + t13) * 0.707106781f;
    d[2 * stride] = t13 + z1;
    d[6 * stride] = t13 - z1;
    t10 = t4 + t5;
    t11 = t5 + t6;
    t12 = t6 + t7;
    float z5 = (t10 - t12) * 0.382683433f;
    float z2 = 0.541196100f * t10 + z5;
    float z4 = 1.306562965f * t12 + z5;
    float z3 = t11 * 0.707106781f;
    float z11 = t7 + z3, z13 = t7 - z3;
    d[5 * stride] = z13 + z2;
    d[3 * stride] = z13 - z2;
    d[stride] = z11 + z4;
    d[7 * stride] = z11 - z4;
  }
  inline void forward(const float in[64], float out[64]) const {
    std::memcpy(out, in, 64 * sizeof(float));
    for (int y = 0; y < 8; y++) pass1d(out + y * 8, 1);  // rows
    for (int x = 0; x < 8; x++) pass1d(out + x, 8);      // columns
  }
};

// aan[u]*aan[v]*8 — the scaled-DCT magnitude the quantizer divides out.
inline double jpeg_aan_scale(int natural_index) {
  static const double aan[8] = {1.0,         1.387039845, 1.306562965,
                                1.175875602, 1.0,         0.785694958,
                                0.541196100, 0.275899379};
  return aan[natural_index >> 3] * aan[natural_index & 7] * 8.0;
}

// Extract one 8x8 block (edge-replicated) from a plane, level-shifted.
inline void jpeg_block(const uint8_t* plane, int64_t pw, int64_t ph,
                       int64_t bx, int64_t by, float out[64]) {
  for (int y = 0; y < 8; y++) {
    int64_t sy = by + y;
    if (sy >= ph) sy = ph - 1;
    const uint8_t* row = plane + sy * pw;
    for (int x = 0; x < 8; x++) {
      int64_t sx = bx + x;
      if (sx >= pw) sx = pw - 1;
      out[y * 8 + x] = float(row[sx]) - 128.0f;
    }
  }
}

// fDCT + quantize one block into NATURAL-order integer coefficients.
// recip_nat is the per-natural-position reciprocal (quant step × AAN
// scale divided out); rounding is half-away-from-zero, matching the
// entropy layer's former inline quantizer bit for bit.
static void jpeg_fdct_quant_scalar(const float in[64],
                                   const float recip_nat[64],
                                   int32_t qnat[64]) {
  float out[64];
  std::memcpy(out, in, sizeof out);
  for (int y = 0; y < 8; y++) JpegDct::pass1d(out + y * 8, 1);  // rows
  for (int x = 0; x < 8; x++) JpegDct::pass1d(out + x, 8);      // cols
  for (int i = 0; i < 64; i++) {
    float v = out[i] * recip_nat[i];
    qnat[i] = int32_t(v < 0 ? v - 0.5f : v + 0.5f);
  }
}

// ---- AVX2 fast path (runtime-dispatched; bit-identical results) -----------
//
// The same AAN butterflies run 8 lanes wide: transpose, vector pass
// over the 8 rows in parallel, transpose, vector pass over the 8
// columns. Every float op matches the scalar path's op (same order,
// no FMA contraction on intrinsics), so outputs — and therefore the
// encoded bytes — are identical; tests assert this by comparing
// whole-file output against the scalar path.
#if defined(__x86_64__) && defined(__GNUC__)
#define RAWKIT_JPEG_AVX2 1
#include <immintrin.h>

static bool rawkit_has_avx2() {
  // RAWKIT_JPEG_NO_AVX2=1 forces the scalar path — used by tests to
  // assert the two paths produce identical bytes on AVX2 hosts. The
  // env check is per call (os.environ toggles work in-process); the
  // CPUID probe is cached.
  static const bool hw = __builtin_cpu_supports("avx2");
  return hw && std::getenv("RAWKIT_JPEG_NO_AVX2") == nullptr;
}

__attribute__((target("avx2"))) static inline void
jpeg_transpose8_avx2(__m256 r[8]) {
  __m256 t0 = _mm256_unpacklo_ps(r[0], r[1]);
  __m256 t1 = _mm256_unpackhi_ps(r[0], r[1]);
  __m256 t2 = _mm256_unpacklo_ps(r[2], r[3]);
  __m256 t3 = _mm256_unpackhi_ps(r[2], r[3]);
  __m256 t4 = _mm256_unpacklo_ps(r[4], r[5]);
  __m256 t5 = _mm256_unpackhi_ps(r[4], r[5]);
  __m256 t6 = _mm256_unpacklo_ps(r[6], r[7]);
  __m256 t7 = _mm256_unpackhi_ps(r[6], r[7]);
  __m256 s0 = _mm256_shuffle_ps(t0, t2, 0x44);
  __m256 s1 = _mm256_shuffle_ps(t0, t2, 0xEE);
  __m256 s2 = _mm256_shuffle_ps(t1, t3, 0x44);
  __m256 s3 = _mm256_shuffle_ps(t1, t3, 0xEE);
  __m256 s4 = _mm256_shuffle_ps(t4, t6, 0x44);
  __m256 s5 = _mm256_shuffle_ps(t4, t6, 0xEE);
  __m256 s6 = _mm256_shuffle_ps(t5, t7, 0x44);
  __m256 s7 = _mm256_shuffle_ps(t5, t7, 0xEE);
  r[0] = _mm256_permute2f128_ps(s0, s4, 0x20);
  r[1] = _mm256_permute2f128_ps(s1, s5, 0x20);
  r[2] = _mm256_permute2f128_ps(s2, s6, 0x20);
  r[3] = _mm256_permute2f128_ps(s3, s7, 0x20);
  r[4] = _mm256_permute2f128_ps(s0, s4, 0x31);
  r[5] = _mm256_permute2f128_ps(s1, s5, 0x31);
  r[6] = _mm256_permute2f128_ps(s2, s6, 0x31);
  r[7] = _mm256_permute2f128_ps(s3, s7, 0x31);
}

// JpegDct::pass1d, 8 independent lanes at a time. r[k] holds pass
// element k across the 8 lanes; output index mapping matches the
// scalar d[0],d[4s],d[2s],d[6s],d[5s],d[3s],d[s],d[7s] stores.
__attribute__((target("avx2"))) static inline void
jpeg_vpass_avx2(__m256 r[8]) {
  __m256 t0 = _mm256_add_ps(r[0], r[7]), t7 = _mm256_sub_ps(r[0], r[7]);
  __m256 t1 = _mm256_add_ps(r[1], r[6]), t6 = _mm256_sub_ps(r[1], r[6]);
  __m256 t2 = _mm256_add_ps(r[2], r[5]), t5 = _mm256_sub_ps(r[2], r[5]);
  __m256 t3 = _mm256_add_ps(r[3], r[4]), t4 = _mm256_sub_ps(r[3], r[4]);
  __m256 t10 = _mm256_add_ps(t0, t3), t13 = _mm256_sub_ps(t0, t3);
  __m256 t11 = _mm256_add_ps(t1, t2), t12 = _mm256_sub_ps(t1, t2);
  r[0] = _mm256_add_ps(t10, t11);
  r[4] = _mm256_sub_ps(t10, t11);
  __m256 z1 = _mm256_mul_ps(_mm256_add_ps(t12, t13),
                            _mm256_set1_ps(0.707106781f));
  r[2] = _mm256_add_ps(t13, z1);
  r[6] = _mm256_sub_ps(t13, z1);
  t10 = _mm256_add_ps(t4, t5);
  t11 = _mm256_add_ps(t5, t6);
  t12 = _mm256_add_ps(t6, t7);
  __m256 z5 = _mm256_mul_ps(_mm256_sub_ps(t10, t12),
                            _mm256_set1_ps(0.382683433f));
  __m256 z2 = _mm256_add_ps(
      _mm256_mul_ps(_mm256_set1_ps(0.541196100f), t10), z5);
  __m256 z4 = _mm256_add_ps(
      _mm256_mul_ps(_mm256_set1_ps(1.306562965f), t12), z5);
  __m256 z3 = _mm256_mul_ps(t11, _mm256_set1_ps(0.707106781f));
  __m256 z11 = _mm256_add_ps(t7, z3), z13 = _mm256_sub_ps(t7, z3);
  r[5] = _mm256_add_ps(z13, z2);
  r[3] = _mm256_sub_ps(z13, z2);
  r[1] = _mm256_add_ps(z11, z4);
  r[7] = _mm256_sub_ps(z11, z4);
}

__attribute__((target("avx2"))) static void
jpeg_extract_avx2(const uint8_t* plane, int64_t pw, int64_t bx,
                  int64_t by, float out[64]) {
  const __m256 c128 = _mm256_set1_ps(128.0f);
  for (int y = 0; y < 8; y++) {
    const uint8_t* p = plane + (by + y) * pw + bx;
    __m128i b;
    std::memcpy(&b, p, 8);  // loadl_epi64 without alignment UB
    __m256 f = _mm256_cvtepi32_ps(_mm256_cvtepu8_epi32(b));
    _mm256_storeu_ps(out + y * 8, _mm256_sub_ps(f, c128));
  }
}

__attribute__((target("avx2"))) static void
jpeg_fdct_quant_avx2(const float in[64], const float recip_nat[64],
                     int32_t qnat[64]) {
  __m256 r[8];
  for (int i = 0; i < 8; i++) r[i] = _mm256_loadu_ps(in + 8 * i);
  jpeg_transpose8_avx2(r);
  jpeg_vpass_avx2(r);  // row pass (lanes = rows)
  jpeg_transpose8_avx2(r);
  jpeg_vpass_avx2(r);  // column pass (lanes = columns)
  const __m256 half = _mm256_set1_ps(0.5f);
  const __m256 sign = _mm256_set1_ps(-0.0f);
  for (int i = 0; i < 8; i++) {
    __m256 v = _mm256_mul_ps(r[i], _mm256_loadu_ps(recip_nat + 8 * i));
    // round half away from zero: trunc(v + copysign(0.5, v))
    __m256 adj = _mm256_or_ps(half, _mm256_and_ps(v, sign));
    _mm256_storeu_si256(
        reinterpret_cast<__m256i*>(qnat + 8 * i),
        _mm256_cvttps_epi32(_mm256_add_ps(v, adj)));
  }
}

__attribute__((target("avx2"))) static uint64_t
jpeg_zigzag_mask_avx2(const int32_t qnat[64], int32_t qzz[64]) {
  static const int32_t zi[64] = {
      0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};
  uint64_t mask = 0;
  const __m256i zero = _mm256_setzero_si256();
  for (int i = 0; i < 8; i++) {
    __m256i idx = _mm256_loadu_si256(
        reinterpret_cast<const __m256i*>(zi + 8 * i));
    __m256i v = _mm256_i32gather_epi32(qnat, idx, 4);
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(qzz + 8 * i), v);
    uint32_t z = uint32_t(_mm256_movemask_ps(
        _mm256_castsi256_ps(_mm256_cmpeq_epi32(v, zero))));
    mask |= uint64_t(~z & 0xFFu) << (8 * i);
  }
  return mask;
}
#endif  // RAWKIT_JPEG_AVX2

struct JpegSymbolSink {  // pass 1: histogram; pass 2: emit
  uint32_t* dc_freq = nullptr;
  uint32_t* ac_freq = nullptr;
  const HuffTable* dc = nullptr;
  const HuffTable* ac = nullptr;
  JpegBitWriter* bw = nullptr;

  // Code + appended magnitude bits fuse into one put (<=16+11 bits):
  // one accumulator round trip per symbol instead of two.
  inline void dc_symbol(int diff) {
    int s = jpeg_category(diff);
    if (dc_freq) {
      dc_freq[s]++;
    } else {
      uint32_t extra = uint32_t(diff < 0 ? diff - 1 : diff)
                       & ((1u << s) - 1);
      bw->put((uint32_t(dc->code[s]) << s) | extra, dc->size[s] + s);
    }
  }
  inline void ac_symbol(int run_size, int coeff) {
    int s = run_size & 0xF;
    if (ac_freq) {
      ac_freq[run_size]++;
    } else {
      uint32_t extra = uint32_t(coeff < 0 ? coeff - 1 : coeff)
                       & ((1u << s) - 1);
      bw->put((uint32_t(ac->code[run_size]) << s) | extra,
              ac->size[run_size] + s);
    }
  }
};

// Zigzag-reorder a quantized block and return its nonzero bitmask
// (bit i = zigzag position i). The mask lets the symbolizer jump
// straight between nonzero coefficients with ctz instead of testing
// all 63 AC positions.
static uint64_t jpeg_zigzag_mask_scalar(const int32_t qnat[64],
                                        int32_t qzz[64]) {
  uint64_t mask = 0;
  for (int i = 0; i < 64; i++) {
    int32_t v = qnat[kJpegZigzag[i]];
    qzz[i] = v;
    mask |= uint64_t(v != 0) << i;
  }
  return mask;
}

// Symbolize one quantized block (zigzag-order coefficients + nonzero
// mask); prev_dc is per-component state.
inline void jpeg_code_block(const int32_t qzz[64], uint64_t nz,
                            int& prev_dc, JpegSymbolSink& sink) {
  int dc = int(qzz[0]);
  sink.dc_symbol(dc - prev_dc);
  prev_dc = dc;
  nz &= ~uint64_t(1);  // AC positions only
  int last = 0;
  while (nz) {
    int i = __builtin_ctzll(nz);
    nz &= nz - 1;
    int run = i - last - 1;
    while (run > 15) {
      sink.ac_symbol(0xF0, 0);  // ZRL
      run -= 16;
    }
    int q = int(qzz[i]);
    sink.ac_symbol((run << 4) | jpeg_category(q), q);
    last = i;
  }
  if (last != 63) sink.ac_symbol(0x00, 0);  // EOB
}

inline void jpeg_marker(std::vector<uint8_t>& o, uint8_t m, size_t len) {
  o.push_back(0xFF);
  o.push_back(m);
  o.push_back(uint8_t((len + 2) >> 8));
  o.push_back(uint8_t((len + 2) & 0xFF));
}

// chroma420=false: 4:4:4 (no chroma subsampling; cb/cr are full-res
// planes, MCU = one 8x8 block per component) — the high-chroma-
// fidelity export mode. Everything else (tables, DCT, entropy layer,
// optimize flag) is shared with the 4:2:0 path.
std::vector<uint8_t> encode_jpeg_420_impl(const uint8_t* yp,
                                          const uint8_t* cbp,
                                          const uint8_t* crp,
                                          int64_t width, int64_t height,
                                          int quality,
                                          bool optimize = true,
                                          bool chroma420 = true,
                                          int64_t restart_rows = 0,
                                          int threads = 1) {
  if (width <= 0 || height <= 0 || width > 65535 || height > 65535)
    throw std::runtime_error("bad dimensions");
  if (quality < 1) quality = 1;
  if (quality > 100) quality = 100;
  const int64_t cw = chroma420 ? (width + 1) / 2 : width;
  const int64_t ch = chroma420 ? (height + 1) / 2 : height;
  // libjpeg quality scaling over the Annex K tables.
  int scale = quality < 50 ? 5000 / quality : 200 - 2 * quality;
  uint8_t qtab[2][64];
  for (int t = 0; t < 2; t++) {
    const uint8_t* base = t ? kQuantChroma : kQuantLuma;
    for (int i = 0; i < 64; i++) {
      int v = (base[i] * scale + 50) / 100;
      if (v < 1) v = 1;
      if (v > 255) v = 255;
      qtab[t][i] = uint8_t(v);
    }
  }
  // Quant tables are stored in zigzag order per the spec (DQT below);
  // the quantizer itself runs in natural order (the fDCT's output
  // layout) with reciprocals that additionally divide out the AAN
  // scaled-DCT magnitude of each natural position — the zigzag
  // reorder happens during symbolization.
  uint8_t qzig[2][64];
  float recip_nat[2][64];
  for (int t = 0; t < 2; t++)
    for (int i = 0; i < 64; i++) {
      qzig[t][i] = qtab[t][kJpegZigzag[i]];
      recip_nat[t][i] =
          float(1.0 / (double(qtab[t][i]) * jpeg_aan_scale(i)));
    }

  const int64_t mcux = chroma420 ? (width + 15) / 16 : (width + 7) / 8;
  const int64_t mcuy = chroma420 ? (height + 15) / 16 : (height + 7) / 8;
#if defined(RAWKIT_JPEG_AVX2)
  const bool use_avx2 = rawkit_has_avx2();
#else
  const bool use_avx2 = false;
#endif

  // Restart segmentation (T.81 E.2.4): the scan splits into segments
  // of `restart_rows` MCU rows; DC prediction resets and the bit
  // stream byte-aligns at every boundary, an RSTn marker (cycling
  // 0-7) separates segments, and a DRI marker declares the interval.
  // Segments are fully independent, so they encode on `threads`
  // worker threads and the bytes are concatenated — identical output
  // for any thread count by construction. restart_rows=0 (default):
  // one segment, no DRI/RSTn, byte-identical to the pre-restart
  // encoder.
  if (restart_rows < 0) restart_rows = 0;
  const int64_t seg_rows = restart_rows > 0 ? restart_rows : mcuy;
  const int64_t nseg = (mcuy + seg_rows - 1) / seg_rows;
  const int64_t interval = seg_rows * mcux;  // MCUs between restarts
  if (nseg > 1 && interval > 65535)
    throw std::runtime_error(
        "restart interval exceeds 65535 MCUs (use fewer restart rows)");

  // Per-segment state for both passes.
  struct SegFreq {
    uint32_t dcf[2][257];
    uint32_t acf[2][257];
  };
  std::vector<SegFreq> freqs;
  std::vector<std::vector<uint8_t>> seg_scans;
  seg_scans.resize(size_t(nseg));

  // Encode (or histogram) one segment's MCU rows with private block
  // buffers and freshly-reset DC predictors.
  auto run_segment = [&](int64_t seg, JpegSymbolSink luma,
                         JpegSymbolSink chroma) {
    float px_buf[64];
    int32_t qnat_buf[64];
    auto prepare = [&](const uint8_t* plane, int64_t pw, int64_t ph,
                       int64_t bx, int64_t by, const float* recip,
                       int32_t qzz[64]) -> uint64_t {
#if defined(RAWKIT_JPEG_AVX2)
      if (use_avx2) {
        if (bx + 8 <= pw && by + 8 <= ph)
          jpeg_extract_avx2(plane, pw, bx, by, px_buf);
        else
          jpeg_block(plane, pw, ph, bx, by, px_buf);
        jpeg_fdct_quant_avx2(px_buf, recip, qnat_buf);
        return jpeg_zigzag_mask_avx2(qnat_buf, qzz);
      }
#endif
      (void)use_avx2;
      jpeg_block(plane, pw, ph, bx, by, px_buf);
      jpeg_fdct_quant_scalar(px_buf, recip, qnat_buf);
      return jpeg_zigzag_mask_scalar(qnat_buf, qzz);
    };
    int prev_dc[3] = {0, 0, 0};
    int32_t qzz[64];
    uint64_t nz;
    const int64_t my1 = std::min(mcuy, (seg + 1) * seg_rows);
    for (int64_t my = seg * seg_rows; my < my1; my++)
      for (int64_t mx = 0; mx < mcux; mx++) {
        const int ny = chroma420 ? 4 : 1;
        for (int sub = 0; sub < ny; sub++) {  // Y blocks, h2v2 order
          nz = prepare(yp, width, height,
                       chroma420 ? mx * 16 + (sub & 1) * 8 : mx * 8,
                       chroma420 ? my * 16 + (sub >> 1) * 8 : my * 8,
                       recip_nat[0], qzz);
          jpeg_code_block(qzz, nz, prev_dc[0], luma);
        }
        nz = prepare(cbp, cw, ch, mx * 8, my * 8, recip_nat[1], qzz);
        jpeg_code_block(qzz, nz, prev_dc[1], chroma);
        nz = prepare(crp, cw, ch, mx * 8, my * 8, recip_nat[1], qzz);
        jpeg_code_block(qzz, nz, prev_dc[2], chroma);
      }
  };

  // Run `body(seg)` over all segments, work-stealing across threads.
  auto for_segments = [&](const std::function<void(int64_t)>& body) {
    int nthreads = threads;
    if (nthreads <= 0) {
      unsigned hc = std::thread::hardware_concurrency();
      nthreads = hc ? int(hc) : 1;
    }
    if (int64_t(nthreads) > nseg) nthreads = int(nseg);
    if (nthreads <= 1) {
      for (int64_t s = 0; s < nseg; s++) body(s);
      return;
    }
    std::atomic<int64_t> next{0};
    std::exception_ptr eptr = nullptr;
    std::mutex emu;
    std::vector<std::thread> pool;
    pool.reserve(size_t(nthreads));
    for (int t = 0; t < nthreads; t++)
      pool.emplace_back([&]() {
        try {
          for (;;) {
            int64_t s = next.fetch_add(1);
            if (s >= nseg) break;
            body(s);
          }
        } catch (...) {
          std::lock_guard<std::mutex> g(emu);
          if (!eptr) eptr = std::current_exception();
        }
      });
    for (auto& th : pool) th.join();
    if (eptr) std::rethrow_exception(eptr);
  };

  // optimize=true: two passes over the MCU stream — histogram, then
  // emit (the DCT is recomputed in pass 2: cheaper in practice than
  // materializing ~70 MB of coefficients for a 24 MP frame, and the
  // block walk is identical by construction). optimize=false: one
  // pass with the Annex K typical tables — ~1.9x faster for ~3-5%
  // larger files (the libjpeg optimize_coding trade, inverted).
  HuffTable huff[4];  // 0: DC luma, 1: AC luma, 2: DC chroma, 3: AC chroma
  if (optimize) {
    freqs.assign(size_t(nseg), SegFreq());  // value-init zeroes counts
    for_segments([&](int64_t seg) {
      JpegSymbolSink luma, chroma;
      luma.dc_freq = freqs[seg].dcf[0];
      luma.ac_freq = freqs[seg].acf[0];
      chroma.dc_freq = freqs[seg].dcf[1];
      chroma.ac_freq = freqs[seg].acf[1];
      run_segment(seg, luma, chroma);
    });
    uint32_t dcf[2][257] = {{0}}, acf[2][257] = {{0}};
    for (const auto& f : freqs)
      for (int t = 0; t < 2; t++)
        for (int i = 0; i < 257; i++) {
          dcf[t][i] += f.dcf[t][i];
          acf[t][i] += f.acf[t][i];
        }
    for (int t = 0; t < 4; t++)
      huff[t].build(t & 1 ? acf[t >> 1] : dcf[t >> 1]);
  } else {
    huff[0].build_spec(kDcLumaBits, kDcLumaVals, sizeof kDcLumaVals);
    huff[1].build_spec(kAcLumaBits, kAcLumaVals, sizeof kAcLumaVals);
    huff[2].build_spec(kDcChromaBits, kDcChromaVals,
                       sizeof kDcChromaVals);
    huff[3].build_spec(kAcChromaBits, kAcChromaVals,
                       sizeof kAcChromaVals);
  }

  for_segments([&](int64_t seg) {
    seg_scans[seg].reserve(size_t(width) * height / 4 / nseg + 64);
    JpegBitWriter bw(seg_scans[seg]);
    JpegSymbolSink luma, chroma;
    luma.dc = &huff[0];
    luma.ac = &huff[1];
    luma.bw = &bw;
    chroma.dc = &huff[2];
    chroma.ac = &huff[3];
    chroma.bw = &bw;
    run_segment(seg, luma, chroma);
    bw.pad();  // restart boundaries are byte-aligned (F.1.2.3)
  });

  std::vector<uint8_t> scan;
  {
    size_t total = size_t(2) * (nseg - 1);
    for (const auto& s : seg_scans) total += s.size();
    scan.reserve(total);
    for (int64_t s = 0; s < nseg; s++) {
      scan.insert(scan.end(), seg_scans[s].begin(), seg_scans[s].end());
      if (s + 1 < nseg) {  // RSTn between segments, cycling 0-7
        scan.push_back(0xFF);
        scan.push_back(uint8_t(0xD0 + (s & 7)));
      }
      seg_scans[s].clear();
      seg_scans[s].shrink_to_fit();
    }
  }

  std::vector<uint8_t> out;
  out.reserve(scan.size() + 1024);
  auto push16 = [&](uint16_t v) {
    out.push_back(uint8_t(v >> 8));
    out.push_back(uint8_t(v & 0xFF));
  };
  out.push_back(0xFF);
  out.push_back(0xD8);  // SOI
  {                     // APP0 JFIF
    jpeg_marker(out, 0xE0, 14);
    const uint8_t app0[14] = {'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1,
                              0,   0};
    out.insert(out.end(), app0, app0 + 14);
  }
  for (int t = 0; t < 2; t++) {  // DQT (zigzag order per B.2.4.1)
    jpeg_marker(out, 0xDB, 65);
    out.push_back(uint8_t(t));
    out.insert(out.end(), qzig[t], qzig[t] + 64);
  }
  {  // SOF0: baseline, 3 components, Y h2v2 + Cb/Cr h1v1
    jpeg_marker(out, 0xC0, 15);
    out.push_back(8);
    push16(uint16_t(height));
    push16(uint16_t(width));
    out.push_back(3);
    const uint8_t comp420[9] = {1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1};
    const uint8_t comp444[9] = {1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1};
    const uint8_t* comp = chroma420 ? comp420 : comp444;
    out.insert(out.end(), comp, comp + 9);
  }
  for (int t = 0; t < 4; t++) {  // DHT: 00, 10, 01, 11
    const HuffTable& h = huff[t];
    jpeg_marker(out, 0xC4, 17 + h.vals.size());
    out.push_back(uint8_t(((t & 1) << 4) | (t >> 1)));
    out.insert(out.end(), h.bits + 1, h.bits + 17);
    out.insert(out.end(), h.vals.begin(), h.vals.end());
  }
  if (nseg > 1) {  // DRI: restart interval in MCUs (B.2.4.4)
    jpeg_marker(out, 0xDD, 2);
    push16(uint16_t(interval));
  }
  {  // SOS
    jpeg_marker(out, 0xDA, 10);
    const uint8_t sos[10] = {3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0};
    out.insert(out.end(), sos, sos + 10);
  }
  out.insert(out.end(), scan.begin(), scan.end());
  out.push_back(0xFF);
  out.push_back(0xD9);  // EOI
  return out;
}

// --- Canon CR3 CRX lossless plane (raw/crx.py _decode_plane) ---------------
//
// MED/LOCO-I prediction + zigzag + adaptive Golomb-Rice with the CRX
// k-adaptation rule and the 41-zero escape to a 21-bit literal. The
// scalar Python in raw/crx.py is the behavioral reference; tests
// assert array equality between the two.

inline int crx_adapt_k(int k, uint32_t code) {
  k += ((code >> k) > 2) + ((code >> k) > 5) -
       (int)(((uint64_t)code << 1) < (1ull << k));
  if (k < 0) return 0;
  return k > 15 ? 15 : k;
}

void decode_crx_plane_impl(const uint8_t* data, int64_t len, uint16_t* out,
                           int64_t width, int64_t height, int n_bits,
                           int k_init) {
  if (width <= 0 || height <= 0) throw std::runtime_error("crx: empty plane");
  if (n_bits < 8 || n_bits > 16) throw std::runtime_error("crx: bad depth");
  FastMsb rdr{data, len};
  int k = k_init;
  const int32_t mask = (1 << n_bits) - 1;
  const int32_t half = 1 << (n_bits - 1);
  for (int64_t row = 0; row < height; row++) {
    uint16_t* line = out + row * width;
    const uint16_t* above = row ? line - width : nullptr;
    for (int64_t col = 0; col < width; col++) {
      int32_t pred;
      if (row == 0) {
        pred = col ? line[col - 1] : half;
      } else if (col == 0) {
        pred = above[0];
      } else {
        int32_t w = line[col - 1], n = above[col], nw = above[col - 1];
        int32_t mx = w >= n ? w : n, mn = w >= n ? n : w;
        if (nw >= mx) pred = mn;
        else if (nw <= mn) pred = mx;
        else pred = w + n - nw;
      }
      int q = rdr.zeros41_strict();
      uint32_t u = (q >= 41) ? rdr.get(21) : ((uint32_t(q) << k) | rdr.get(k));
      k = crx_adapt_k(k, u);
      int32_t err = int32_t(u >> 1) ^ -int32_t(u & 1);
      int32_t val = pred + err;
      if (val != (val & mask))
        throw std::runtime_error("crx: sample out of range");
      line[col] = uint16_t(val);
    }
  }
}

// Wavelet-subband variant (raw/crx.py _decode_band): no spatial
// prediction, signed i32 coefficients.
void decode_crx_band_impl(const uint8_t* data, int64_t len, int32_t* out,
                          int64_t width, int64_t height, int k_init) {
  if (width <= 0 || height <= 0) throw std::runtime_error("crx: empty band");
  FastMsb rdr{data, len};
  int k = k_init;
  const int64_t n = width * height;
  for (int64_t i = 0; i < n; i++) {
    int q = rdr.zeros41_strict();
    uint32_t u = (q >= 41) ? rdr.get(21) : ((uint32_t(q) << k) | rdr.get(k));
    k = crx_adapt_k(k, u);
    out[i] = int32_t(u >> 1) ^ -int32_t(u & 1);
  }
}

struct SrwBits {
  const uint8_t* d;
  int64_t n;
  int64_t pos;
  uint64_t buf = 0;
  int nbits = 0;

  int get(int k) {
    if (k == 0) return 0;
    while (nbits < k) {
      if (pos + 4 > n)
        throw std::runtime_error("srw1: bit stream truncated");
      uint32_t w;
      std::memcpy(&w, d + pos, 4);  // little-endian host
      pos += 4;
      buf = (buf << 32) | w;
      nbits += 32;
    }
    nbits -= k;
    return int((buf >> nbits) & ((1ull << k) - 1));
  }
};

void decode_srw1_impl(const uint8_t* d, int64_t n, const uint32_t* offs,
                      uint16_t* out, int64_t width, int64_t height) {
  if (width % 16 || width <= 0)
    throw std::runtime_error("srw1: width must be a multiple of 16");
  std::vector<int32_t> img(size_t(width) * height);
  for (int64_t row = 0; row < height; row++) {
    int64_t off = offs[row];
    if (off > n) throw std::runtime_error("srw1: row offset out of range");
    SrwBits bits{d, n, off};
    int len[4];
    for (int g = 0; g < 4; g++) len[g] = row < 2 ? 7 : 4;
    for (int64_t col = 0; col < width; col += 16) {
      int dir = bits.get(1);
      int op[4];
      for (int g = 0; g < 4; g++) op[g] = bits.get(2);
      for (int g = 0; g < 4; g++) {
        switch (op[g]) {
          case 3: len[g] = bits.get(4); break;
          case 2: len[g]--; break;
          case 1: len[g]++; break;
        }
        if (len[g] < 0 || len[g] > 15)
          throw std::runtime_error("srw1: group length out of range");
      }
      for (int k = 0; k < 16; k++) {
        int c = k < 8 ? 2 * k : 2 * (k - 8) + 1;  // evens then odds
        int g = ((c & 1) << 1) | (c >> 3);
        int nb = len[g];
        int32_t diff = bits.get(nb);
        if (nb && (diff & (1 << (nb - 1)))) diff -= 1 << nb;
        int32_t pred;
        if (dir) {
          int64_t pr = (c % 2 == 0) ? row - 1 : row - 2;
          if (pr < 0)
            throw std::runtime_error(
                "srw1: vertical prediction before row 2");
          pred = img[pr * width + col + c];
        } else {
          pred = col ? img[row * width + col + c - 2] : 128;
        }
        int32_t v = pred + diff;
        if (v < 0 || v > 4095)
          throw std::runtime_error("srw1: sample out of 12-bit range");
        img[row * width + col + c] = v;
      }
    }
  }
  for (int64_t row = 0; row < height; row++)
    for (int64_t col = 0; col < width; col++)
      out[row * width + col] = uint16_t(img[row * width + col]);
  // same-CFA re-alignment swap
  for (int64_t row = 0; row + 1 < height; row += 2)
    for (int64_t col = 0; col + 1 < width; col += 2) {
      uint16_t t = out[row * width + col + 1];
      out[row * width + col + 1] = out[(row + 1) * width + col];
      out[(row + 1) * width + col] = t;
    }
}

// ---------------------------------------------------------------------------
// Category-coded Huffman packing (synthetic encoder hot path)
// ---------------------------------------------------------------------------

// For each residual emit the category's Huffman code, then `cat` raw
// magnitude bits, MSB-first (the universal lossless-JPEG/NEF scan
// layout; raw mapping d>=0 ? d : d + 2^cat - 1 per ITU T.81 H.2).
// Categories above max_raw_cat emit no raw bits (JPEG's category-16
// case). Trailing bits are zero-padded to a byte boundary, matching
// the NumPy reference packer (raw/bitpack.py). Fixture generation for
// 24 MP benchmarks needs this native: the vectorized NumPy packer is
// O(total_bits) fancy-indexing passes (~100 s/24 MP on one core).
template <typename DiffT>
std::vector<uint8_t> huffman_pack_impl(const DiffT* diffs, int64_t n,
                                       const uint64_t* code_tab,
                                       const int32_t* clen_tab, int ncat,
                                       int max_raw_cat) {
  std::vector<uint8_t> out;
  out.reserve(size_t(n) * 3 + 16);
  uint64_t acc = 0;
  int nbits = 0;
  auto put_small = [&](uint64_t v, int len) {
    acc = (acc << len) | (v & (len >= 64 ? ~0ull : (1ull << len) - 1));
    nbits += len;
    while (nbits >= 8) {
      nbits -= 8;
      out.push_back(uint8_t(acc >> nbits));
    }
  };
  auto put = [&](uint64_t v, int len) {
    // The acc holds <8 residual bits, so fields up to 56 bits fit in
    // one shift; split wider ones (the NumPy fallback supports raw
    // fields up to 63 bits — keep the native path byte-identical).
    while (len > 56) {
      put_small(v >> (len - 32), 32);
      len -= 32;
    }
    put_small(v, len);
  };
  for (int64_t i = 0; i < n; i++) {
    int64_t d = int64_t(diffs[i]);
    uint64_t mag = d >= 0 ? uint64_t(d) : uint64_t(-d);
    int cat = mag ? 64 - __builtin_clzll(mag) : 0;
    if (cat >= ncat || clen_tab[cat] <= 0)
      throw std::runtime_error("residual category not in tree");
    put(code_tab[cat], clen_tab[cat]);
    if (cat && cat <= max_raw_cat) {
      uint64_t raw = d >= 0 ? uint64_t(d)
                            : uint64_t(d + (int64_t(1) << cat) - 1);
      put(raw, cat);
    }
  }
  if (nbits) out.push_back(uint8_t(acc << (8 - nbits)));
  return out;
}

// Shared shape for the four sensor-codec bindings: decode takes
// (payload, w, h) and returns u16 bytes; encode takes (u16 mosaic
// bytes, w, h) and returns the compressed payload. Templates must
// live outside the extern "C" block.
template <void (*DecodeFn)(const uint8_t*, int64_t, uint16_t*, int64_t,
                           int64_t)>
PyObject* decode_binding(PyObject* args) {
  Py_buffer buf;
  int width, height;
  if (!PyArg_ParseTuple(args, "y*ii", &buf, &width, &height))
    return nullptr;
  std::string err;
  PyObject* out = nullptr;
  if (width <= 0 || height <= 0) {
    err = "bad dimensions";
  } else {
    out = PyBytes_FromStringAndSize(nullptr, int64_t(width) * height * 2);
    if (!out) { PyBuffer_Release(&buf); return nullptr; }
    uint16_t* dst = reinterpret_cast<uint16_t*>(PyBytes_AS_STRING(out));
    Py_BEGIN_ALLOW_THREADS
    try {
      DecodeFn(static_cast<const uint8_t*>(buf.buf), buf.len, dst, width,
               height);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&buf);
  if (!err.empty()) {
    Py_XDECREF(out);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return out;
}

template <std::vector<uint8_t> (*EncodeFn)(const uint16_t*, int64_t,
                                           int64_t)>
PyObject* encode_binding(PyObject* args) {
  Py_buffer buf;
  int width, height;
  if (!PyArg_ParseTuple(args, "y*ii", &buf, &width, &height))
    return nullptr;
  std::string err;
  std::vector<uint8_t> out;
  if (width <= 0 || height <= 0 ||
      buf.len < int64_t(width) * height * 2) {
    err = "bad dimensions";
  } else {
    Py_BEGIN_ALLOW_THREADS
    try {
      out = EncodeFn(static_cast<const uint16_t*>(buf.buf), width, height);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&buf);
  if (!err.empty()) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()), out.size());
}

}  // namespace

// ---------------------------------------------------------------------------
// Python bindings
// ---------------------------------------------------------------------------

extern "C" {

static PyObject* py_scan_jpeg_spans(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  std::vector<Span> spans;
  Py_BEGIN_ALLOW_THREADS
  spans = scan_spans(static_cast<const uint8_t*>(buf.buf), buf.len);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  PyObject* list = PyList_New(spans.size());
  if (!list) return nullptr;
  for (size_t i = 0; i < spans.size(); i++) {
    PyList_SET_ITEM(list, i,
                    Py_BuildValue("(LL)", (long long)spans[i].start,
                                  (long long)spans[i].end));
  }
  return list;
}

static PyObject* unpack_impl(Py_buffer& buf, long long width,
                             long long height, int bpp, bool big_endian) {
  if (bpp < 1 || bpp > 16 || width <= 0 || height <= 0) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "bad dimensions/bpp");
    return nullptr;
  }
  int64_t row_bytes = (bpp == 16)   ? width * 2
                      : (bpp == 8)  ? width
                                    : (width * bpp + 7) / 8;
  if (buf.len < row_bytes * height) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "packed data too short");
    return nullptr;
  }
  PyObject* out = PyBytes_FromStringAndSize(nullptr, width * height * 2);
  if (!out) { PyBuffer_Release(&buf); return nullptr; }
  uint16_t* dst = reinterpret_cast<uint16_t*>(PyBytes_AS_STRING(out));
  Py_BEGIN_ALLOW_THREADS
  unpack_rows(static_cast<const uint8_t*>(buf.buf), buf.len, dst, width,
              height, bpp, big_endian);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return out;
}

static PyObject* py_unpack_bits2(PyObject*, PyObject* args) {
  Py_buffer buf;
  long long width, height;
  int bpp, big_endian;
  if (!PyArg_ParseTuple(args, "y*LLii", &buf, &width, &height, &bpp,
                        &big_endian))
    return nullptr;
  return unpack_impl(buf, width, height, bpp, big_endian != 0);
}

static PyObject* py_unpack_bits(PyObject*, PyObject* args) {
  Py_buffer buf;
  long long width, height;
  int bpp;
  if (!PyArg_ParseTuple(args, "y*LLi", &buf, &width, &height, &bpp))
    return nullptr;
  return unpack_impl(buf, width, height, bpp, true);
}

static PyObject* py_pack_rows(PyObject* args, int bits) {
  Py_buffer buf;
  long long width, height;
  if (!PyArg_ParseTuple(args, "y*LL", &buf, &height, &width))
    return nullptr;
  const int group = bits == 12 ? 2 : 4;
  const int gbytes = bits == 12 ? 3 : 7;
  if (width <= 0 || height <= 0 || width % group ||
      buf.len < int64_t(width) * height * 2) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "bad pack dimensions");
    return nullptr;
  }
  PyObject* out = PyBytes_FromStringAndSize(
      nullptr, int64_t(width) / group * gbytes * height);
  if (!out) { PyBuffer_Release(&buf); return nullptr; }
  uint8_t* dst = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out));
  const uint16_t* src = static_cast<const uint16_t*>(buf.buf);
  Py_BEGIN_ALLOW_THREADS
  if (bits == 12) pack12_impl(src, height, width, dst);
  else pack14_impl(src, height, width, dst);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return out;
}

static PyObject* py_pack12_rows(PyObject*, PyObject* args) {
  return py_pack_rows(args, 12);
}

static PyObject* py_pack14_rows(PyObject*, PyObject* args) {
  return py_pack_rows(args, 14);
}

static PyObject* py_decode_ljpeg(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  LJpegResult res;
  std::string err;
  Py_BEGIN_ALLOW_THREADS
  try {
    res = decode_ljpeg_impl(static_cast<const uint8_t*>(buf.buf), buf.len);
  } catch (const std::exception& e) {
    err = e.what();
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (!err.empty()) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  PyObject* data = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(res.planes.data()),
      res.planes.size() * 2);
  if (!data) return nullptr;
  return Py_BuildValue("(Niiii)", data, res.nc, res.h, res.w, res.precision);
}

static PyObject* py_decode_nikon(PyObject*, PyObject* args) {
  Py_buffer strip, vpred, curve;
  int width, height, bpp, tree_index, split;
  if (!PyArg_ParseTuple(args, "y*iiiiiy*y*", &strip, &width, &height, &bpp,
                        &tree_index, &split, &vpred, &curve))
    return nullptr;
  std::string err;
  PyObject* out = nullptr;
  if (width <= 0 || height <= 0 || tree_index < 0 || tree_index > 5 ||
      vpred.len < 16 || curve.len < 2) {
    err = "bad nikon decode arguments";
  } else {
    out = PyBytes_FromStringAndSize(nullptr, int64_t(width) * height * 2);
    if (!out) {
      PyBuffer_Release(&strip);
      PyBuffer_Release(&vpred);
      PyBuffer_Release(&curve);
      return nullptr;
    }
    uint16_t* dst = reinterpret_cast<uint16_t*>(PyBytes_AS_STRING(out));
    Py_BEGIN_ALLOW_THREADS
    try {
      decode_nikon_impl(static_cast<const uint8_t*>(strip.buf), strip.len,
                        dst, width, height, tree_index, split,
                        static_cast<const int32_t*>(vpred.buf),
                        static_cast<const uint16_t*>(curve.buf),
                        int(curve.len / 2));
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&strip);
  PyBuffer_Release(&vpred);
  PyBuffer_Release(&curve);
  if (!err.empty()) {
    Py_XDECREF(out);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return out;
}

static PyObject* py_decode_arw2(PyObject*, PyObject* args) {
  Py_buffer buf;
  int width, height;
  if (!PyArg_ParseTuple(args, "y*ii", &buf, &width, &height))
    return nullptr;
  std::string err;
  PyObject* out = nullptr;
  if (width <= 0 || height <= 0) {
    err = "bad dimensions";
  } else {
    out = PyBytes_FromStringAndSize(nullptr, int64_t(width) * height * 2);
    if (!out) { PyBuffer_Release(&buf); return nullptr; }
    uint16_t* dst = reinterpret_cast<uint16_t*>(PyBytes_AS_STRING(out));
    Py_BEGIN_ALLOW_THREADS
    try {
      decode_arw2_impl(static_cast<const uint8_t*>(buf.buf), buf.len, dst,
                       width, height);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&buf);
  if (!err.empty()) {
    Py_XDECREF(out);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return out;
}

static PyObject* py_decode_olympus(PyObject*, PyObject* args) {
  return decode_binding<decode_olympus_impl>(args);
}
static PyObject* py_encode_olympus(PyObject*, PyObject* args) {
  return encode_binding<encode_olympus_impl>(args);
}
// Kodak RADC (DC40/DC50 class). Mirrors raw/kodak_radc.py exactly —
// see that module's docstring for the reconstructed scheme, the
// table provenance caveats, and the quarantine contract.
namespace radc {

// (length, value) pairs per table; tables are complete prefix codes
// (same literals as kodak_radc.py's _TABLE_SPEC).
struct Pair { int8_t len; int8_t val; };
static const Pair kSpec0[] = {{1,1},{2,3},{3,4},{4,2},{5,7},{6,5},{7,6},{7,8}};
static const Pair kSpec1[] = {{1,0},{2,1},{3,3},{4,4},{5,2},{6,7},{7,6},{8,5},{8,8}};
static const Pair kSpec2[] = {{2,1},{2,3},{3,0},{3,2},{3,4},{4,6},{5,5},{6,7},{6,8}};
static const Pair kSpec3[] = {{2,0},{2,1},{2,3},{3,2},{4,4},{5,6},{6,7},{7,5},{7,8}};
static const Pair kSpec4[] = {{2,1},{2,4},{3,0},{3,2},{3,3},{4,7},{5,5},{6,6},{6,8}};
static const Pair kSpec5[] = {{2,4},{2,5},{3,3},{3,6},{4,0},{4,2},{4,7},{5,1},{5,8}};
static const Pair kSpec6[] = {{2,5},{2,6},{3,4},{3,7},{4,0},{4,3},{4,8},{5,1},{5,2}};
static const Pair kSpec7[] = {{2,6},{2,7},{3,5},{3,8},{4,0},{4,4},{4,3},{5,1},{5,2}};
static const Pair kSpec8[] = {{1,8},{3,7},{3,6},{4,5},{4,4},{5,3},{5,2},{5,0},{5,1}};
static const Pair kSpec9[] = {{1,0},{2,1},{3,2},{4,3},{5,4},{6,5},{7,6},{8,7},{8,8}};
static const Pair kSpec10[] = {{2,0},{2,1},{2,2},{3,3},{4,4},{5,5},{6,6},{7,7},{7,8}};
static const Pair kSpec11[] = {{1,0},{2,1},{2,-1}};
static const Pair kSpec12[] = {{1,0},{3,1},{3,-1},{3,2},{3,-2}};
static const Pair kSpec13[] = {{1,0},{3,1},{3,-1},{4,2},{4,-2},{4,3},{4,-3}};
static const Pair kSpec14[] = {{1,0},{3,1},{3,-1},{4,2},{4,-2},{5,3},{5,-3},{5,4},{5,-4}};
static const Pair kSpec15[] = {{2,0},{3,1},{3,-1},{4,2},{4,-2},{4,3},{4,-3},{4,4},{4,-4},{4,5},{4,-5}};
static const Pair kSpec16[] = {{2,0},{3,1},{3,-1},{4,2},{4,-2},{4,3},{4,-3},{4,4},{4,-4},{5,5},{5,-5},{5,6},{5,-6}};
static const Pair kSpec17[] = {{2,0},{3,1},{3,-1},{4,2},{4,-2},{4,3},{4,-3},{5,4},{5,-4},{5,5},{5,-5},{5,6},{5,-6},{5,7},{5,-7}};

struct Tables {
  // packed like dcraw: (len << 8) | (value as uint8)
  uint16_t lut[19][256];
  Tables() {
    const Pair* specs[18] = {kSpec0, kSpec1, kSpec2, kSpec3, kSpec4,
                             kSpec5, kSpec6, kSpec7, kSpec8, kSpec9,
                             kSpec10, kSpec11, kSpec12, kSpec13,
                             kSpec14, kSpec15, kSpec16, kSpec17};
    const int counts[18] = {8, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9,
                            3, 5, 7, 9, 11, 13, 15};
    for (int t = 0; t < 18; t++) {
      int s = 0;
      for (int e = 0; e < counts[t]; e++)
        for (int k = 0; k < 256 >> specs[t][e].len; k++)
          lut[t][s++] = uint16_t(specs[t][e].len) << 8 |
                        uint8_t(specs[t][e].val);
    }
    const int sh = 3;  // direct samples quantized to 8s (+4)
    for (int c = 0; c < 256; c++)
      lut[18][c] = uint16_t(8 - sh) << 8 |
                   uint8_t((c >> sh << sh) | (1 << (sh - 1)));
  }
};
static const Tables kTables;

struct Curve {
  uint16_t fwd[65536];
  Curve() {
    static const int pt[12] = {0, 0, 1280, 1344, 2320, 3616,
                               3328, 8000, 4095, 16383, 65535, 16383};
    for (int i = 2; i < 12; i += 2)
      for (int c = pt[i - 2]; c <= pt[i]; c++)
        fwd[c] = uint16_t(double(c - pt[i - 2]) / (pt[i] - pt[i - 2]) *
                              (pt[i + 1] - pt[i - 1]) +
                          pt[i - 1] + 0.5);
  }
};
static const Curve kCurve;

struct Bits {
  const uint8_t* d;
  int64_t n;
  int64_t pos = 0;
  uint64_t acc = 0;
  int have = 0;
  int64_t consumed = 0;

  void fill(int k) {
    while (have < k) {
      acc = (acc << 8) | (pos < n ? d[pos] : 0);  // peek may zero-fill
      pos++;
      have += 8;
    }
  }
  int peek8() { fill(8); return int((acc >> (have - 8)) & 0xFF); }
  void drop(int k) {
    consumed += k;
    if (consumed > n * 8)
      throw std::runtime_error("radc: bit stream truncated");
    have -= k;
    acc &= (1ull << have) - 1;
  }
  int get(int k) {
    fill(k);
    consumed += k;
    if (consumed > n * 8)
      throw std::runtime_error("radc: bit stream truncated");
    have -= k;
    int v = int((acc >> have) & ((1ull << k) - 1));
    acc &= (1ull << have) - 1;
    return v;
  }
  int token(int table) {
    uint16_t e = kTables.lut[table][peek8()];
    drop(e >> 8);
    return int(int8_t(e & 0xFF));
  }
};

static inline int cdiv(int64_t a, int64_t b) {
  return int(a / b);  // C division already truncates toward zero
}

static inline int predictor(const std::vector<int>& b, int c, int y,
                            int x, int stride) {
  if (c) return cdiv(b[(y - 1) * stride + x] + b[y * stride + x + 1], 2);
  return cdiv(b[(y - 1) * stride + x + 1] + 2 * b[(y - 1) * stride + x] +
                  b[y * stride + x + 1],
              3);
}

}  // namespace radc

void decode_radc_impl(const uint8_t* d, int64_t n, uint16_t* out16,
                      int64_t width, int64_t height) {
  using namespace radc;
  if (width <= 0 || height <= 0 || width % 4 || height % 4)
    throw std::runtime_error(
        "radc: dimensions must be positive multiples of 4");
  const int64_t w2 = width / 2;
  const int stride = int(w2) + 2;
  Bits bits{d, n};
  std::vector<int32_t> raw(size_t(width) * height, 0);
  std::vector<int> bufs[3];
  for (auto& b : bufs) b.assign(size_t(3) * stride, 2048);
  int last[3] = {16, 16, 16};
  for (int64_t row = 0; row < height; row += 4) {
    int mul[3];
    for (int& m : mul) {
      m = bits.get(6);
      if (m == 0)
        throw std::runtime_error("radc: zero channel multiplier");
    }
    for (int c = 0; c < 3; c++) {
      std::vector<int>& buf = bufs[c];
      {  // rescale by the multiplier ratio
        int64_t val = ((0x1000000 / last[c] + 0x7ff) >> 12) * mul[c];
        int s = val > 65564 ? 10 : 12;
        int64_t x = ~(int64_t(-1) << (s - 1));
        val <<= 12 - s;
        for (int& b : buf) {
          int64_t v = (int64_t(b) * val + x) >> s;
          // bound the state so fixed-width arithmetic matches the
          // Python reference's unbounded ints (quarantine contract)
          if (v < -(1 << 20) || v > (1 << 20))
            throw std::runtime_error(
                "radc: prediction state out of range");
          b = int(v);
        }
        last[c] = mul[c];
      }
      for (int r = 0; r <= (c == 0 ? 1 : 0); r++) {
        buf[1 * stride + w2] = buf[2 * stride + w2] = mul[c] << 7;
        int tree = 1;
        int64_t col = w2;
        while (col > 0) {
          tree = bits.token(tree);
          if (tree) {
            col -= 2;
            if (tree == 8) {
              for (int y = 1; y < 3; y++)
                for (int64_t x = col + 1; x >= col; x--)
                  buf[y * stride + x] =
                      (bits.token(18) & 0xFF) * mul[c];
            } else {
              for (int y = 1; y < 3; y++)
                for (int64_t x = col + 1; x >= col; x--)
                  buf[y * stride + x] =
                      bits.token(tree + 10) * 16 +
                      predictor(buf, c, y, int(x), stride);
            }
          } else {
            int nreps;
            do {
              nreps = col > 2 ? bits.token(9) + 1 : 1;
              for (int rep = 0; rep < 8 && rep < nreps && col > 0;
                   rep++) {
                col -= 2;
                for (int y = 1; y < 3; y++)
                  for (int64_t x = col + 1; x >= col; x--)
                    buf[y * stride + x] =
                        predictor(buf, c, y, int(x), stride);
                if (rep & 1) {
                  int step = bits.token(10) << 4;
                  for (int y = 1; y < 3; y++)
                    for (int64_t x = col + 1; x >= col; x--)
                      buf[y * stride + x] += step;
                }
              }
            } while (nreps == 9);
          }
        }
        for (int y = 0; y < 2; y++)
          for (int64_t x = 0; x < w2; x++) {
            int val = cdiv(int64_t(buf[(y + 1) * stride + x]) << 4,
                           mul[c]);
            if (val < 0) val = 0;
            int64_t ry, rx;
            if (c) { ry = row + y * 2 + c - 1; rx = x * 2 + 2 - c; }
            else { ry = row + r * 2 + y; rx = x * 2 + y; }
            raw[ry * width + rx] = val;
          }
        // channel 0's buffer shifts one column per sub-row
        if (c) {
          std::copy(buf.begin() + 2 * stride, buf.begin() + 3 * stride,
                    buf.begin());
        } else {
          std::copy_backward(buf.begin() + 2 * stride,
                             buf.begin() + 2 * stride + stride - 1,
                             buf.begin() + stride);
        }
      }
    }
    // chroma checkerboard reconstruction from luma neighbours
    for (int64_t y = row; y < row + 4; y++)
      for (int64_t x = 0; x < width; x++)
        if ((x + y) & 1) {
          int64_t l = x ? x - 1 : x + 1;
          int64_t rr = x + 1 < width ? x + 1 : x - 1;
          int val = (raw[y * width + x] - 2048) * 2 +
                    cdiv(raw[y * width + l] + raw[y * width + rr], 2);
          raw[y * width + x] = val < 0 ? 0 : val;
        }
  }
  for (int64_t i = 0; i < width * height; i++) {
    int32_t v = raw[i];
    if (v < 0) v = 0;
    if (v > 65535) v = 65535;
    out16[i] = kCurve.fwd[v];
  }
}

// Samsung SRW v3 (compression 32772, NX1 class). Mirrors
// raw/samsung3.py exactly — see that module's docstring for the
// reconstructed scheme and its provenance caveats.
static const int kSrw3MotionOffset[7] = {-4, -2, -2, 0, 0, 2, 4};
static const int kSrw3MotionAverage[7] = {0, 0, 1, 0, 1, 0, 0};

static inline int64_t srw3_clamp_parity(int64_t col, int64_t width) {
  while (col < 0) col += 2;
  while (col >= width) col -= 2;
  return col;
}

void decode_srw3_impl(const uint8_t* d, int64_t n, uint16_t* out16,
                      int64_t width, int64_t height) {
  if (width % 16 || width <= 0)
    throw std::runtime_error("srw3: width must be a multiple of 16");
  if (n < 16) throw std::runtime_error("srw3: payload shorter than header");
  const int opt = d[9];
  const int depth = d[10] | (d[11] << 8);
  const int init = d[12] | (d[13] << 8);
  if (opt > 7) throw std::runtime_error("srw3: unknown optimization flags");
  if (depth != 12 && depth != 14)
    throw std::runtime_error("srw3: bit depth must be 12 or 14");
  const int white = (1 << depth) - 1;
  if (init > white)
    throw std::runtime_error("srw3: initial value exceeds the bit depth");
  std::vector<int32_t> img(size_t(width) * height);
  int64_t pos = 16;
  for (int64_t row = 0; row < height; row++) {
    pos = (pos + 15) & ~int64_t(15);
    if (pos >= n) throw std::runtime_error("srw3: row streams truncated");
    SrwBits bits{d, n, pos};
    int scale = 0;
    const int seed = row < 2 ? 7 : 4;
    int mode[3][2] = {{seed, seed}, {seed, seed}, {seed, seed}};
    int diff_bits[4];
    bool have_bits = false;
    for (int64_t col = 0; col < width; col += 16) {
      if (!(opt & 4) && col % 64 == 0) {
        int code = bits.get(2);
        if (code == 1) scale -= 2;
        else if (code == 2) scale += 2;
        else if (code == 3) scale = bits.get(12);
        if (scale < 0 || scale > 4095)
          throw std::runtime_error("srw3: quantization scale out of range");
      }
      int motion;
      if (opt & 2) motion = bits.get(1) ? 3 : 7;
      else if (bits.get(1) == 0) motion = bits.get(3);
      else motion = 7;
      int32_t base[16];
      if (motion == 7) {
        for (int t = 0; t < 16; t++)
          base[t] = col == 0 ? init
                             : img[row * width + col - 2 + (t & 1)];
      } else {
        if (row < 2)
          throw std::runtime_error("srw3: motion prediction before row 2");
        const int slide = kSrw3MotionOffset[motion];
        const int avg = kSrw3MotionAverage[motion];
        for (int t = 0; t < 16; t++) {
          int64_t ref_row;
          int64_t rc;
          if ((t & 1) == (row & 1)) {
            ref_row = row - 1;
            rc = col + t + slide + (1 - 2 * int(row & 1));
          } else {
            ref_row = row - 2;
            rc = col + t + slide;
          }
          rc = srw3_clamp_parity(rc, width);
          int32_t v = img[ref_row * width + rc];
          if (avg)
            v = (v + img[ref_row * width +
                         srw3_clamp_parity(rc + 2, width)] + 1) >> 1;
          base[t] = v;
        }
      }
      if ((opt & 1) || bits.get(1) == 0) {
        for (int j = 0; j < 4; j++) {
          int flag = bits.get(2);
          int ctx = (row & 1) ? (j >> 1) : ((j >> 1) + 2) % 3;
          int nb;
          if (flag == 0) nb = mode[ctx][0];
          else if (flag == 1) nb = mode[ctx][0] + 1;
          else if (flag == 2) nb = mode[ctx][0] - 1;
          else nb = bits.get(4);
          if (nb < 0 || nb > depth + 1)
            throw std::runtime_error("srw3: residual length out of range");
          mode[ctx][0] = mode[ctx][1];
          mode[ctx][1] = nb;
          diff_bits[j] = nb;
        }
        have_bits = true;
      } else if (!have_bits) {
        throw std::runtime_error(
            "srw3: length reuse before any lengths were coded");
      }
      for (int i = 0; i < 16; i++) {
        const int nb = diff_bits[i >> 2];
        int32_t diff = bits.get(nb);
        if (nb && (diff & (1 << (nb - 1)))) diff -= 1 << nb;
        diff = diff * (2 * scale + 1) + scale;
        const int t = ((i & 7) << 1) | ((i >> 3) ^ int(row & 1));
        const int32_t v = base[t] + diff;
        if (v < 0 || v > white)
          throw std::runtime_error("srw3: sample out of range");
        img[row * width + col + t] = v;
      }
    }
    pos = bits.pos;
  }
  for (int64_t i = 0; i < width * height; i++)
    out16[i] = uint16_t(img[i]);
}

static PyObject* py_decode_rw2(PyObject*, PyObject* args) {
  return decode_binding<decode_rw2_impl>(args);
}
static PyObject* py_decode_kodak65000(PyObject*, PyObject* args) {
  return decode_binding<decode_kodak65000_impl>(args);
}
static PyObject* py_decode_srw3(PyObject*, PyObject* args) {
  return decode_binding<decode_srw3_impl>(args);
}
static PyObject* py_decode_radc(PyObject*, PyObject* args) {
  return decode_binding<decode_radc_impl>(args);
}
static PyObject* py_decode_srw1(PyObject*, PyObject* args) {
  Py_buffer buf, table;
  int width, height;
  if (!PyArg_ParseTuple(args, "y*y*ii", &buf, &table, &width, &height))
    return nullptr;
  std::string err;
  PyObject* out = nullptr;
  if (width <= 0 || height <= 0) {
    err = "bad dimensions";
  } else if (table.len < int64_t(height) * 4) {
    err = "srw1: row offset table truncated";
  } else {
    out = PyBytes_FromStringAndSize(nullptr, int64_t(width) * height * 2);
    if (!out) {
      PyBuffer_Release(&buf);
      PyBuffer_Release(&table);
      return nullptr;
    }
    uint16_t* dst = reinterpret_cast<uint16_t*>(PyBytes_AS_STRING(out));
    Py_BEGIN_ALLOW_THREADS
    try {
      std::vector<uint32_t> offs(height);
      std::memcpy(offs.data(), table.buf, size_t(height) * 4);
      decode_srw1_impl(static_cast<const uint8_t*>(buf.buf), buf.len,
                       offs.data(), dst, width, height);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&buf);
  PyBuffer_Release(&table);
  if (!err.empty()) {
    Py_XDECREF(out);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return out;
}

static PyObject* py_decode_canon_crw(PyObject*, PyObject* args) {
  Py_buffer buf;
  int width, height, table;
  if (!PyArg_ParseTuple(args, "y*iii", &buf, &width, &height, &table))
    return nullptr;
  std::string err;
  PyObject* out = nullptr;
  int64_t consumed = 0;
  if (width <= 0 || height <= 0) {
    err = "bad dimensions";
  } else {
    out = PyBytes_FromStringAndSize(nullptr, int64_t(width) * height * 2);
    if (!out) { PyBuffer_Release(&buf); return nullptr; }
    uint16_t* dst = reinterpret_cast<uint16_t*>(PyBytes_AS_STRING(out));
    Py_BEGIN_ALLOW_THREADS
    try {
      decode_canon_crw_impl(static_cast<const uint8_t*>(buf.buf), buf.len,
                            dst, width, height, table, &consumed);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&buf);
  if (!err.empty()) {
    Py_XDECREF(out);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  PyObject* tup = Py_BuildValue("(NL)", out, (long long)consumed);
  return tup;
}
static PyObject* py_encode_rw2(PyObject*, PyObject* args) {
  return encode_binding<encode_rw2_impl>(args);
}

static PyObject* py_decode_crx_band(PyObject*, PyObject* args) {
  Py_buffer buf;
  int width, height, k_init;
  if (!PyArg_ParseTuple(args, "y*iii", &buf, &width, &height, &k_init))
    return nullptr;
  std::string err;
  PyObject* out = nullptr;
  if (width <= 0 || height <= 0 || k_init < 0 || k_init > 15) {
    err = "bad dimensions";
  } else {
    out = PyBytes_FromStringAndSize(nullptr, int64_t(width) * height * 4);
    if (!out) { PyBuffer_Release(&buf); return nullptr; }
    int32_t* dst = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out));
    Py_BEGIN_ALLOW_THREADS
    try {
      decode_crx_band_impl(static_cast<const uint8_t*>(buf.buf), buf.len,
                           dst, width, height, k_init);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&buf);
  if (!err.empty()) {
    Py_XDECREF(out);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return out;
}

static PyObject* py_encode_jpeg_420(PyObject*, PyObject* args) {
  Py_buffer y, cb, cr;
  int width, height, quality;
  int optimize = 1;
  int restart_rows = 0;
  int threads = 1;
  if (!PyArg_ParseTuple(args, "y*y*y*iii|pii", &y, &cb, &cr, &width,
                        &height, &quality, &optimize, &restart_rows,
                        &threads))
    return nullptr;
  std::string err;
  std::vector<uint8_t> out;
  int64_t cw = (int64_t(width) + 1) / 2, ch = (int64_t(height) + 1) / 2;
  if (width <= 0 || height <= 0) {
    err = "bad dimensions";
  } else if (y.len < int64_t(width) * height || cb.len < cw * ch ||
             cr.len < cw * ch) {
    err = "plane buffer too small";
  } else {
    Py_BEGIN_ALLOW_THREADS
    try {
      out = encode_jpeg_420_impl(static_cast<const uint8_t*>(y.buf),
                                 static_cast<const uint8_t*>(cb.buf),
                                 static_cast<const uint8_t*>(cr.buf), width,
                                 height, quality, optimize != 0,
                                 /*chroma420=*/true, restart_rows,
                                 threads);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&y);
  PyBuffer_Release(&cb);
  PyBuffer_Release(&cr);
  if (!err.empty()) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()), out.size());
}

static PyObject* py_encode_jpeg_444(PyObject*, PyObject* args) {
  Py_buffer y, cb, cr;
  int width, height, quality;
  int optimize = 1;
  int restart_rows = 0;
  int threads = 1;
  if (!PyArg_ParseTuple(args, "y*y*y*iii|pii", &y, &cb, &cr, &width,
                        &height, &quality, &optimize, &restart_rows,
                        &threads))
    return nullptr;
  std::string err;
  std::vector<uint8_t> out;
  if (width <= 0 || height <= 0) {
    err = "bad dimensions";
  } else if (y.len < int64_t(width) * height ||
             cb.len < int64_t(width) * height ||
             cr.len < int64_t(width) * height) {
    err = "plane buffer too small";
  } else {
    Py_BEGIN_ALLOW_THREADS
    try {
      out = encode_jpeg_420_impl(static_cast<const uint8_t*>(y.buf),
                                 static_cast<const uint8_t*>(cb.buf),
                                 static_cast<const uint8_t*>(cr.buf), width,
                                 height, quality, optimize != 0,
                                 /*chroma420=*/false, restart_rows,
                                 threads);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&y);
  PyBuffer_Release(&cb);
  PyBuffer_Release(&cr);
  if (!err.empty()) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()), out.size());
}

static PyObject* py_decode_crx_plane(PyObject*, PyObject* args) {
  Py_buffer buf;
  int width, height, n_bits, k_init;
  if (!PyArg_ParseTuple(args, "y*iiii", &buf, &width, &height, &n_bits,
                        &k_init))
    return nullptr;
  std::string err;
  PyObject* out = nullptr;
  if (width <= 0 || height <= 0 || k_init < 0 || k_init > 15) {
    err = "bad dimensions";
  } else {
    out = PyBytes_FromStringAndSize(nullptr, int64_t(width) * height * 2);
    if (!out) { PyBuffer_Release(&buf); return nullptr; }
    uint16_t* dst = reinterpret_cast<uint16_t*>(PyBytes_AS_STRING(out));
    Py_BEGIN_ALLOW_THREADS
    try {
      decode_crx_plane_impl(static_cast<const uint8_t*>(buf.buf), buf.len,
                            dst, width, height, n_bits, k_init);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&buf);
  if (!err.empty()) {
    Py_XDECREF(out);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return out;
}

static PyObject* py_decode_pentax(PyObject*, PyObject* args) {
  Py_buffer buf, spec;
  int width, height, bps, be_spec;
  if (!PyArg_ParseTuple(args, "y*iiiy*i", &buf, &width, &height, &bps,
                        &spec, &be_spec))
    return nullptr;
  std::string err;
  PyObject* out = nullptr;
  if (width <= 0 || height <= 0 || bps < 8 || bps > 16) {
    err = "bad dimensions/bps";
  } else {
    out = PyBytes_FromStringAndSize(nullptr, int64_t(width) * height * 2);
    if (!out) {
      PyBuffer_Release(&buf);
      PyBuffer_Release(&spec);
      return nullptr;
    }
    uint16_t* dst = reinterpret_cast<uint16_t*>(PyBytes_AS_STRING(out));
    Py_BEGIN_ALLOW_THREADS
    try {
      decode_pentax_impl(static_cast<const uint8_t*>(buf.buf), buf.len,
                         dst, width, height, bps,
                         static_cast<const uint8_t*>(spec.buf), spec.len,
                         be_spec != 0);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&buf);
  PyBuffer_Release(&spec);
  if (!err.empty()) {
    Py_XDECREF(out);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return out;
}

static PyObject* py_huffman_pack(PyObject*, PyObject* args) {
  Py_buffer diffs, codes, clens;
  int itemsize, max_raw_cat;
  if (!PyArg_ParseTuple(args, "y*iy*y*i", &diffs, &itemsize, &codes, &clens,
                        &max_raw_cat))
    return nullptr;
  std::string err;
  std::vector<uint8_t> out;
  int ncat = int(clens.len / 4);
  if (itemsize != 2 && itemsize != 4 && itemsize != 8) {
    // Must precede the division below: itemsize 0 would SIGFPE the
    // whole process instead of raising.
    err = "itemsize must be 2, 4, or 8";
  } else if (int64_t(codes.len / 8) < ncat) {
    err = "code/length tables disagree";
  } else {
    int64_t n = diffs.len / itemsize;
    const uint64_t* ct = static_cast<const uint64_t*>(codes.buf);
    const int32_t* lt = static_cast<const int32_t*>(clens.buf);
    Py_BEGIN_ALLOW_THREADS
    try {
      if (itemsize == 2)
        out = huffman_pack_impl(static_cast<const int16_t*>(diffs.buf), n,
                                ct, lt, ncat, max_raw_cat);
      else if (itemsize == 4)
        out = huffman_pack_impl(static_cast<const int32_t*>(diffs.buf), n,
                                ct, lt, ncat, max_raw_cat);
      else if (itemsize == 8)
        out = huffman_pack_impl(static_cast<const int64_t*>(diffs.buf), n,
                                ct, lt, ncat, max_raw_cat);
      else
        throw std::runtime_error("itemsize must be 2, 4, or 8");
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&diffs);
  PyBuffer_Release(&codes);
  PyBuffer_Release(&clens);
  if (!err.empty()) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()), out.size());
}

static PyObject* py_jpeg_simd(PyObject*, PyObject*) {
  // Introspection for the CLI `doctor` self-check: which JPEG encode
  // path the current host/env dispatch selects (the two paths are
  // byte-identical; this only reports speed class).
#ifdef RAWKIT_JPEG_AVX2
  return PyUnicode_FromString(rawkit_has_avx2() ? "avx2" : "scalar");
#else
  return PyUnicode_FromString("scalar");
#endif
}

static PyMethodDef RawkitMethods[] = {
    {"jpeg_simd", py_jpeg_simd, METH_NOARGS,
     "jpeg_simd() -> 'avx2' | 'scalar' (the JPEG encode path the "
     "current host/env dispatch selects)"},
    {"scan_jpeg_spans", py_scan_jpeg_spans, METH_VARARGS,
     "scan_jpeg_spans(data) -> [(start, end), ...]"},
    {"unpack_bits", py_unpack_bits, METH_VARARGS,
     "unpack_bits(data, width, height, bpp) -> native-endian u16 bytes "
     "(16-bit samples read big-endian)"},
    {"unpack_bits2", py_unpack_bits2, METH_VARARGS,
     "unpack_bits2(data, width, height, bpp, big_endian) -> u16 bytes"},
    {"decode_ljpeg", py_decode_ljpeg, METH_VARARGS,
     "decode_ljpeg(data) -> (u16_bytes, nc, h, w, precision)"},
    {"decode_nikon", py_decode_nikon, METH_VARARGS,
     "decode_nikon(strip, w, h, bpp, tree, split, vpred_i32x4, "
     "curve_u16) -> u16 bytes"},
    {"decode_arw2", py_decode_arw2, METH_VARARGS,
     "decode_arw2(data, width, height) -> u16 bytes (12-bit space)"},
    {"decode_olympus", py_decode_olympus, METH_VARARGS,
     "decode_olympus(data, width, height) -> u16 bytes"},
    {"encode_olympus", py_encode_olympus, METH_VARARGS,
     "encode_olympus(u16_mosaic_bytes, width, height) -> strip bytes"},
    {"decode_rw2", py_decode_rw2, METH_VARARGS,
     "decode_rw2(data, width, height) -> u16 bytes"},
    {"encode_rw2", py_encode_rw2, METH_VARARGS,
     "encode_rw2(u16_mosaic_bytes, width, height) -> payload bytes"},
    {"decode_kodak65000", py_decode_kodak65000, METH_VARARGS,
     "decode_kodak65000(data, width, height) -> u16 bytes"},
    {"decode_canon_crw", py_decode_canon_crw, METH_VARARGS,
     "decode_canon_crw(data, width, height, table) -> (u16 bytes, "
     "consumed)"},
    {"decode_srw1", py_decode_srw1, METH_VARARGS,
     "decode_srw1(data, offset_table, width, height) -> u16 bytes"},
    {"decode_srw3", py_decode_srw3, METH_VARARGS,
     "decode_srw3(payload, width, height) -> u16 bytes"},
    {"decode_radc", py_decode_radc, METH_VARARGS,
     "decode_radc(payload, width, height) -> u16 bytes"},
    {"decode_pentax", py_decode_pentax, METH_VARARGS,
     "decode_pentax(data, width, height, bps, spec, be_spec) "
     "-> u16 bytes"},
    {"decode_crx_plane", py_decode_crx_plane, METH_VARARGS,
     "decode_crx_plane(data, width, height, n_bits, k_init) -> u16 bytes"},
    {"decode_crx_band", py_decode_crx_band, METH_VARARGS,
     "decode_crx_band(data, width, height, k_init) -> i32 bytes"},
    {"encode_jpeg_420", py_encode_jpeg_420, METH_VARARGS,
     "encode_jpeg_420(y, cb, cr, width, height, quality, optimize=True,"
     " restart_rows=0, threads=1) -> JFIF bytes (optimize=False: Annex"
     " K fixed Huffman tables, ~1.9x faster, ~3-5% larger)."
     " restart_rows>0 emits DRI/RSTn every that many MCU rows and"
     " encodes segments on `threads` workers (0=auto); output bytes"
     " are thread-count-invariant"},
    {"encode_jpeg_444", py_encode_jpeg_444, METH_VARARGS,
     "encode_jpeg_444(y, cb, cr, width, height, quality, optimize=True,"
     " restart_rows=0, threads=1) -> JFIF bytes; cb/cr are"
     " FULL-resolution planes (no chroma subsampling)"},
    {"pack12_rows", py_pack12_rows, METH_VARARGS,
     "pack12_rows(u16_bytes, height, width) -> packed u8 bytes "
     "(2 samples -> 3 bytes; ops/staging.py H2D fast path)"},
    {"pack14_rows", py_pack14_rows, METH_VARARGS,
     "pack14_rows(u16_bytes, height, width) -> packed u8 bytes "
     "(4 samples -> 7 bytes)"},
    {"huffman_pack", py_huffman_pack, METH_VARARGS,
     "huffman_pack(diffs, itemsize, code_tab_u64, clen_tab_i32, "
     "max_raw_cat) -> packed bitstream bytes (diffs: signed ints of "
     "the given itemsize)"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef rawkit_module = {
    PyModuleDef_HEAD_INIT, "_rawkit",
    "Native RAW decode kernels (JPEG scan, bit unpack, lossless JPEG)",
    -1, RawkitMethods};

PyMODINIT_FUNC PyInit__rawkit(void) {
  return PyModule_Create(&rawkit_module);
}

}  // extern "C"
