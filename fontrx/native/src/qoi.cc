// QOI RGB encoder — native fast path for fontrx.io.qoi.
//
// Byte-identical output to the Python encoder (and to the reference's
// Zig encoder semantics, src/tools/qoi.zig:25-88): standard QOI ops
// RUN / INDEX / DIFF / LUMA / RGB over 3-channel pixels, 64-entry
// running table hashed with (3r+5g+7b+11*255) & 63, 8-byte end marker.
//
// Exposed as a C ABI for ctypes.  The caller provides the output
// buffer (worst case: 14 + npixels*4 + 8 bytes).

#include <cstdint>
#include <cstring>

namespace {

inline uint32_t hash_rgb(uint8_t r, uint8_t g, uint8_t b) {
  return (r * 3u + g * 5u + b * 7u + 255u * 11u) & 63u;
}

inline void put_be32(uint8_t* p, uint32_t v) {
  p[0] = v >> 24;
  p[1] = v >> 16;
  p[2] = v >> 8;
  p[3] = v;
}

}  // namespace

extern "C" {

// pixels: H*W*3 bytes, row-major RGB.  out: caller-allocated buffer.
// Returns the number of bytes written, or -1 if out_cap is too small.
long qoi_encode_rgb(const uint8_t* pixels, uint32_t width, uint32_t height,
                    uint8_t* out, long out_cap) {
  const long worst = 14l + (long)width * height * 4l + 8l;
  if (out_cap < worst) return -1;

  uint8_t* o = out;
  std::memcpy(o, "qoif", 4);
  put_be32(o + 4, width);
  put_be32(o + 8, height);
  o[12] = 3;  // channels
  o[13] = 0;  // sRGB
  o += 14;

  uint8_t index[64][3] = {};
  const long total = (long)width * height;
  uint8_t pr = 0, pg = 0, pb = 0;

  long i = 0;
  while (i < total) {
    const uint8_t r = pixels[i * 3 + 0];
    const uint8_t g = pixels[i * 3 + 1];
    const uint8_t b = pixels[i * 3 + 2];

    if (r == pr && g == pg && b == pb) {
      long run = 1;
      while (run < 62 && i + run < total &&
             pixels[(i + run) * 3 + 0] == r &&
             pixels[(i + run) * 3 + 1] == g &&
             pixels[(i + run) * 3 + 2] == b) {
        ++run;
      }
      *o++ = 0xC0 | (uint8_t)(run - 1);
      const uint32_t h = hash_rgb(r, g, b);
      index[h][0] = r; index[h][1] = g; index[h][2] = b;
      i += run;
      continue;
    }

    const uint32_t h = hash_rgb(r, g, b);
    if (index[h][0] == r && index[h][1] == g && index[h][2] == b) {
      *o++ = 0x00 | (uint8_t)h;
    } else {
      const uint8_t dr = (uint8_t)(r - pr + 2);
      const uint8_t dg = (uint8_t)(g - pg + 2);
      const uint8_t db = (uint8_t)(b - pb + 2);
      if (dr < 4 && dg < 4 && db < 4) {
        *o++ = 0x40 | (dr << 4) | (dg << 2) | db;
      } else {
        const uint8_t lr = (uint8_t)(dr + 8 - dg);
        const uint8_t lb = (uint8_t)(db + 8 - dg);
        const uint8_t lg = (uint8_t)(dg + 30);
        if (lr < 16 && lg < 64 && lb < 16) {
          *o++ = 0x80 | lg;
          *o++ = (lr << 4) | lb;
        } else {
          *o++ = 0xFE;
          *o++ = r; *o++ = g; *o++ = b;
        }
      }
    }
    index[h][0] = r; index[h][1] = g; index[h][2] = b;
    pr = r; pg = g; pb = b;
    ++i;
  }

  // end marker: u64 big-endian 1
  std::memset(o, 0, 7);
  o[7] = 1;
  o += 8;
  return (long)(o - out);
}

}  // extern "C"
