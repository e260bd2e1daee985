// Native glyph data-loader: TTF 'glyf' decode + contour normalization
// + quadratic-segment packing, fused in one pass.
//
// The host-side hot path when packing large (CJK-scale) atlases: for
// each requested glyph index it performs the work of the Python
// pipeline Font.load_glyph -> Glyph.from_simple -> pack (semantics of
// the reference's SimpleGlyph.initFromReader ttf.zig:759-817 and
// Contour.initTTF Glyph.zig:43-74), writing straight into the caller's
// pre-allocated [B, S, 3, 2] float32 tensor.
//
// Compound glyphs and malformed entries are flagged, not parsed — the
// Python frontend handles those (they are rare and recursive).

#include <cstdint>
#include <cstring>

namespace {

constexpr int kMaxPoints = 8192;   // per glyph, generous for any real font
constexpr int kMaxContours = 256;

inline uint16_t be16(const uint8_t* p) { return (uint16_t)((p[0] << 8) | p[1]); }
inline int16_t sbe16(const uint8_t* p) { return (int16_t)be16(p); }

// truncating-toward-zero midpoint (Zig @divTrunc; geometry.zig:12-17)
inline int32_t mid_trunc(int32_t a, int32_t b) {
  const int32_t s = a + b;
  return s >= 0 ? s / 2 : -((-s) / 2);
}

struct Decoded {
  int32_t x[kMaxPoints];
  int32_t y[kMaxPoints];
  uint8_t on[kMaxPoints];
  uint16_t end_pts[kMaxContours];
  int n_points;
  int n_contours;
  int16_t box[4];
};

// returns 0 ok, 1 compound, 3 parse error
int decode_simple(const uint8_t* g, long len, Decoded* out) {
  if (len < 10) return 3;
  const int16_t n_contours = sbe16(g);
  if (n_contours < 0) return 1;
  if (n_contours > kMaxContours) return 3;
  for (int k = 0; k < 4; ++k) out->box[k] = sbe16(g + 2 + 2 * k);
  const uint8_t* p = g + 10;
  const uint8_t* end = g + len;

  if (p + 2 * n_contours > end) return 3;
  int n_points = 0;
  for (int c = 0; c < n_contours; ++c) {
    out->end_pts[c] = be16(p + 2 * c);
    if (out->end_pts[c] + 1 < n_points) return 3;  // must be monotone
    n_points = out->end_pts[c] + 1;
  }
  if (n_points > kMaxPoints) return 3;
  p += 2 * n_contours;

  if (p + 2 > end) return 3;
  const uint16_t instr_len = be16(p);
  p += 2 + instr_len;
  if (p > end) return 3;

  // flag stream (RLE)
  uint8_t flags[kMaxPoints];
  for (int i = 0; i < n_points;) {
    if (p >= end) return 3;
    const uint8_t f = *p++;
    flags[i++] = f;
    if (f & 0x08) {  // REPEAT
      if (p >= end) return 3;
      int rep = *p++;
      while (rep-- > 0 && i < n_points) flags[i++] = f;
    }
  }

  // x deltas
  int32_t v = 0;
  for (int i = 0; i < n_points; ++i) {
    const uint8_t f = flags[i];
    if (f & 0x02) {  // short
      if (p >= end) return 3;
      const int32_t d = *p++;
      v += (f & 0x10) ? d : -d;
    } else if (!(f & 0x10)) {  // long
      if (p + 2 > end) return 3;
      v += sbe16(p);
      p += 2;
    }
    out->x[i] = v;
  }
  // y deltas
  v = 0;
  for (int i = 0; i < n_points; ++i) {
    const uint8_t f = flags[i];
    if (f & 0x04) {
      if (p >= end) return 3;
      const int32_t d = *p++;
      v += (f & 0x20) ? d : -d;
    } else if (!(f & 0x20)) {
      if (p + 2 > end) return 3;
      v += sbe16(p);
      p += 2;
    }
    out->y[i] = v;
    out->on[i] = flags[i] & 0x01;
  }
  out->n_points = n_points;
  out->n_contours = n_contours;
  return 0;
}

// Normalize one contour (points [start, stop)) to the even/odd
// invariant and emit quadratic segments directly into seg_out.
// Returns the new segment count, or -1 on capacity overflow.
long emit_contour_segments(const Decoded& d, int start, int stop,
                           float* seg_base, long seg_count, long capacity) {
  // normalized points scratch: worst case 2 per input point + 2
  static thread_local int32_t nx[2 * kMaxPoints + 2];
  static thread_local int32_t ny[2 * kMaxPoints + 2];

  const int n = stop - start;
  if (n <= 0) return seg_count;
  const bool last_on = d.on[stop - 1];
  int w = last_on ? 1 : 0;  // slot 0 reserved for the closing wrap

  int32_t px = d.x[stop - 1], py = d.y[stop - 1];
  bool pon = last_on;
  for (int i = start; i < stop; ++i) {
    const bool on = d.on[i];
    if (on == pon) {
      nx[w] = mid_trunc(px, d.x[i]);
      ny[w] = mid_trunc(py, d.y[i]);
      ++w;
    }
    nx[w] = d.x[i];
    ny[w] = d.y[i];
    ++w;
    px = d.x[i];
    py = d.y[i];
    pon = on;
  }
  if (last_on) {
    nx[0] = nx[w - 1];
    ny[0] = ny[w - 1];
  } else {
    nx[w] = nx[0];
    ny[w] = ny[0];
    ++w;
  }

  const long k = (w - 1) / 2;  // segments
  if (seg_count + k > capacity) return -1;
  for (long s = 0; s < k; ++s) {
    float* dst = seg_base + (seg_count + s) * 6;
    dst[0] = (float)nx[2 * s];
    dst[1] = (float)ny[2 * s];
    dst[2] = (float)nx[2 * s + 1];
    dst[3] = (float)ny[2 * s + 1];
    dst[4] = (float)nx[2 * s + 2];
    dst[5] = (float)ny[2 * s + 2];
  }
  return seg_count + k;
}

}  // namespace

extern "C" {

// Pack simple glyphs straight from the font blob.
// flags_out per glyph: 0 ok, 1 compound (caller handles), 2 capacity
// overflow, 3 parse error.  Empty glyphs (loca[i]==loca[i+1]) are ok
// with 0 segments.  Returns number of glyphs handled natively (flag 0).
long ttf_pack_glyphs(const uint8_t* font, long font_len,
                     const uint32_t* loca, long n_loca, long glyf_offset,
                     const int32_t* glyph_ids, long n_glyphs, long capacity,
                     float* segments_out, int32_t* seg_counts_out,
                     int32_t* boxes_out, uint8_t* flags_out) {
  static thread_local Decoded dec;
  long ok = 0;
  for (long gi = 0; gi < n_glyphs; ++gi) {
    float* seg_base = segments_out + gi * capacity * 6;
    std::memset(seg_base, 0, sizeof(float) * capacity * 6);
    seg_counts_out[gi] = 0;
    boxes_out[gi * 4 + 0] = boxes_out[gi * 4 + 1] = 0;
    boxes_out[gi * 4 + 2] = boxes_out[gi * 4 + 3] = 0;
    flags_out[gi] = 3;

    const int32_t id = glyph_ids[gi];
    if (id < 0 || id + 1 >= n_loca) continue;
    const uint32_t lo = loca[id], hi = loca[id + 1];
    if (lo == hi) {  // empty glyph
      flags_out[gi] = 0;
      ++ok;
      continue;
    }
    if ((uint64_t)glyf_offset + hi > (uint64_t)font_len || hi < lo) continue;

    const int rc = decode_simple(font + glyf_offset + lo, (long)(hi - lo), &dec);
    if (rc != 0) {
      flags_out[gi] = (uint8_t)rc;
      continue;
    }
    long count = 0;
    int start = 0;
    bool overflow = false;
    for (int c = 0; c < dec.n_contours; ++c) {
      const int stop = dec.end_pts[c] + 1;
      count = emit_contour_segments(dec, start, stop, seg_base, count, capacity);
      if (count < 0) {
        overflow = true;
        break;
      }
      start = stop;
    }
    if (overflow) {
      flags_out[gi] = 2;
      std::memset(seg_base, 0, sizeof(float) * capacity * 6);
      continue;
    }
    seg_counts_out[gi] = (int32_t)count;
    for (int k = 0; k < 4; ++k) boxes_out[gi * 4 + k] = dec.box[k];
    flags_out[gi] = 0;
    ++ok;
  }
  return ok;
}

}  // extern "C"
