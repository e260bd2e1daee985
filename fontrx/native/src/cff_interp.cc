// Native Type 2 charstring interpreter (CFF + CFF2) — the hot loop of
// OpenType-CFF glyph decoding (fontrx/font/cff.py runs ~0.35 ms/glyph
// in Python; CJK-scale .otf fonts need microseconds).
//
// Mirrors the Python interpreter OPERATION FOR OPERATION in IEEE
// double math (same op order in the cubic->quadratic subdivision, the
// same std::hypot-based error metric, the same numpy-allclose closure
// test), so outputs are bit-identical — qualified by
// tests/test_native.py::TestNativeCffInterp over every fixture glyph.
//
// ABI (see fontrx/native/__init__.py):
//   cff_glyph_outline(code, code_len,
//                     gsub_blob, gsub_offs, n_gsub,
//                     lsub_blob, lsub_offs, n_lsub,
//                     cff2, scalars, scalar_offs, n_vardata, vsindex0,
//                     out_pts, out_ends, cap_pts, cap_contours,
//                     &n_pts) -> n_contours (>=0) or -error
//
// out_pts holds interleaved (x, y) doubles; out_ends[i] = point count
// through the end of contour i (each contour has odd length: the
// even/odd quadratic invariant, closed).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kMaxCallDepth = 10;
constexpr long kMaxOps = 65536;
constexpr double kQuadTol = 0.5;
constexpr int kMaxSplitDepth = 5;

struct Pt {
  double x, y;
};

struct Builder {
  std::vector<std::vector<Pt>> contours;
  std::vector<Pt> cur;
  bool open = false;
  Pt pos{0.0, 0.0};

  // numpy.allclose default tolerances, elementwise
  static bool close_enough(double a, double b) {
    return std::abs(a - b) <= 1e-8 + 1e-5 * std::abs(b);
  }

  void close() {
    if (!open) return;
    if (cur.size() >= 3) {
      Pt start = cur.front();
      if (!(close_enough(pos.x, start.x) && close_enough(pos.y, start.y))) {
        line_to(start);
      }
      contours.push_back(cur);
    }
    cur.clear();
    open = false;
  }

  void move_to(Pt p) {
    close();
    cur.clear();
    cur.push_back(p);
    open = true;
    pos = p;
  }

  void line_to(Pt p) {
    if (!open) move_to(pos);
    cur.push_back(Pt{(pos.x + p.x) / 2.0, (pos.y + p.y) / 2.0});
    cur.push_back(p);
    pos = p;
  }

  void emit_quads(Pt p0, Pt c1, Pt c2, Pt p3, int depth) {
    double ex = p3.x - 3.0 * c2.x + 3.0 * c1.x - p0.x;
    double ey = p3.y - 3.0 * c2.y + 3.0 * c1.y - p0.y;
    // same float grouping as the Python interpreter (hypot, then
    // * sqrt(3), then / 36) — a fused constant differs by 1 ulp on
    // ~35% of inputs, flipping subdivision decisions at the threshold
    double err = std::hypot(ex, ey) * std::sqrt(3.0) / 36.0;
    if (err <= kQuadTol || depth >= kMaxSplitDepth) {
      Pt ctrl{(3.0 * (c1.x + c2.x) - p0.x - p3.x) / 4.0,
              (3.0 * (c1.y + c2.y) - p0.y - p3.y) / 4.0};
      cur.push_back(ctrl);
      cur.push_back(p3);
      return;
    }
    Pt ab{(p0.x + c1.x) / 2.0, (p0.y + c1.y) / 2.0};
    Pt bc{(c1.x + c2.x) / 2.0, (c1.y + c2.y) / 2.0};
    Pt cd{(c2.x + p3.x) / 2.0, (c2.y + p3.y) / 2.0};
    Pt abbc{(ab.x + bc.x) / 2.0, (ab.y + bc.y) / 2.0};
    Pt bccd{(bc.x + cd.x) / 2.0, (bc.y + cd.y) / 2.0};
    Pt mid{(abbc.x + bccd.x) / 2.0, (abbc.y + bccd.y) / 2.0};
    emit_quads(p0, ab, abbc, mid, depth + 1);
    emit_quads(mid, bccd, cd, p3, depth + 1);
  }

  void curve_to(Pt c1, Pt c2, Pt p3) {
    if (!open) move_to(pos);
    emit_quads(pos, c1, c2, p3, 0);
    pos = p3;
  }
};

struct Subrs {
  const uint8_t* blob;
  const int64_t* offs;  // n + 1 offsets
  long n;

  long bias() const {
    if (n < 1240) return 107;
    if (n < 33900) return 1131;
    return 32768;
  }
};

struct State {
  std::vector<double> stack;
  long hints = 0;
  bool width_done = false;
  long ops = 0;
  bool cff2 = false;
  const double* scalars = nullptr;     // flat scalar values
  const int64_t* scalar_offs = nullptr;  // n_vardata + 1
  long n_vardata = 0;
  long vsindex = 0;
};

int run(const uint8_t* code, long n, const Subrs& gs, const Subrs& ls,
        Builder& b, State& st, int depth) {
  if (depth > kMaxCallDepth) return -2;
  auto& stk = st.stack;
  long i = 0;
  while (i < n) {
    if (++st.ops > kMaxOps) return -3;
    uint8_t b0 = code[i];
    if (b0 >= 32 || b0 == 28) {
      if (b0 == 28) {
        if (i + 2 >= n) return -4;
        stk.push_back((double)(int16_t)((code[i + 1] << 8) | code[i + 2]));
        i += 3;
      } else if (b0 <= 246) {
        stk.push_back((double)((int)b0 - 139));
        i += 1;
      } else if (b0 <= 250) {
        if (i + 1 >= n) return -4;
        stk.push_back((double)(((int)b0 - 247) * 256 + code[i + 1] + 108));
        i += 2;
      } else if (b0 <= 254) {
        if (i + 1 >= n) return -4;
        stk.push_back((double)(-((int)b0 - 251) * 256 - code[i + 1] - 108));
        i += 2;
      } else {
        if (i + 4 >= n) return -4;
        int32_t v = (int32_t)(((uint32_t)code[i + 1] << 24) |
                              ((uint32_t)code[i + 2] << 16) |
                              ((uint32_t)code[i + 3] << 8) |
                              (uint32_t)code[i + 4]);
        stk.push_back((double)v / 65536.0);
        i += 5;
      }
      continue;
    }
    i += 1;

    // Type 2 width oddity (CFF1 only; CFF2 has no widths)
    auto take_width_even = [&]() {
      if (!st.width_done) {
        st.width_done = true;
        if (stk.size() % 2 == 1) stk.erase(stk.begin());
      }
    };
    auto take_width_expect = [&](size_t expect) {
      if (!st.width_done) {
        st.width_done = true;
        if (stk.size() > expect) stk.erase(stk.begin());
      }
    };

    switch (b0) {
      case 1: case 3: case 18: case 23:  // h/vstem(hm)
        take_width_even();
        st.hints += (long)stk.size() / 2;
        stk.clear();
        break;
      case 19: case 20:  // hintmask / cntrmask
        take_width_even();
        st.hints += (long)stk.size() / 2;
        stk.clear();
        i += (st.hints + 7) / 8;
        break;
      case 21: {  // rmoveto
        take_width_expect(2);
        Pt p = b.pos;
        if (stk.size() >= 2) {
          p.x += stk[stk.size() - 2];
          p.y += stk[stk.size() - 1];
        }
        b.move_to(p);
        stk.clear();
        break;
      }
      case 22: {  // hmoveto
        take_width_expect(1);
        double dx = stk.empty() ? 0.0 : stk.back();
        b.move_to(Pt{b.pos.x + dx, b.pos.y});
        stk.clear();
        break;
      }
      case 4: {  // vmoveto
        take_width_expect(1);
        double dy = stk.empty() ? 0.0 : stk.back();
        b.move_to(Pt{b.pos.x, b.pos.y + dy});
        stk.clear();
        break;
      }
      case 5:  // rlineto
        for (size_t k = 0; k + 1 < stk.size(); k += 2)
          b.line_to(Pt{b.pos.x + stk[k], b.pos.y + stk[k + 1]});
        stk.clear();
        break;
      case 6: case 7: {  // hlineto / vlineto (alternating)
        bool horiz = (b0 == 6);
        for (double v : stk) {
          if (horiz)
            b.line_to(Pt{b.pos.x + v, b.pos.y});
          else
            b.line_to(Pt{b.pos.x, b.pos.y + v});
          horiz = !horiz;
        }
        stk.clear();
        break;
      }
      case 8:  // rrcurveto
        for (size_t k = 0; k + 5 < stk.size(); k += 6) {
          Pt p = b.pos;
          Pt c1{p.x + stk[k], p.y + stk[k + 1]};
          Pt c2{c1.x + stk[k + 2], c1.y + stk[k + 3]};
          Pt p3{c2.x + stk[k + 4], c2.y + stk[k + 5]};
          b.curve_to(c1, c2, p3);
        }
        stk.clear();
        break;
      case 24: {  // rcurveline
        size_t k = 0;
        while (stk.size() - k >= 8) {
          Pt p = b.pos;
          Pt c1{p.x + stk[k], p.y + stk[k + 1]};
          Pt c2{c1.x + stk[k + 2], c1.y + stk[k + 3]};
          Pt p3{c2.x + stk[k + 4], c2.y + stk[k + 5]};
          b.curve_to(c1, c2, p3);
          k += 6;
        }
        if (stk.size() - k >= 2)
          b.line_to(Pt{b.pos.x + stk[k], b.pos.y + stk[k + 1]});
        stk.clear();
        break;
      }
      case 25: {  // rlinecurve
        size_t k = 0;
        while (stk.size() - k > 6) {
          b.line_to(Pt{b.pos.x + stk[k], b.pos.y + stk[k + 1]});
          k += 2;
        }
        if (stk.size() - k >= 6) {
          Pt p = b.pos;
          Pt c1{p.x + stk[k], p.y + stk[k + 1]};
          Pt c2{c1.x + stk[k + 2], c1.y + stk[k + 3]};
          Pt p3{c2.x + stk[k + 4], c2.y + stk[k + 5]};
          b.curve_to(c1, c2, p3);
        }
        stk.clear();
        break;
      }
      case 26: case 27: {  // vvcurveto / hhcurveto
        size_t k = 0;
        double d1 = 0.0;
        if (stk.size() % 4 == 1) {
          d1 = stk[0];
          k = 1;
        }
        while (stk.size() - k >= 4) {
          Pt p = b.pos;
          Pt c1, c2, p3;
          if (b0 == 26) {
            c1 = Pt{p.x + d1, p.y + stk[k]};
            c2 = Pt{c1.x + stk[k + 1], c1.y + stk[k + 2]};
            p3 = Pt{c2.x + 0.0, c2.y + stk[k + 3]};
          } else {
            c1 = Pt{p.x + stk[k], p.y + d1};
            c2 = Pt{c1.x + stk[k + 1], c1.y + stk[k + 2]};
            p3 = Pt{c2.x + stk[k + 3], c2.y + 0.0};
          }
          b.curve_to(c1, c2, p3);
          d1 = 0.0;
          k += 4;
        }
        stk.clear();
        break;
      }
      case 30: case 31: {  // vhcurveto / hvcurveto (alternating)
        bool horiz = (b0 == 31);
        size_t k = 0;
        while (stk.size() - k >= 4) {
          bool last5 = (stk.size() - k == 5);
          double d_last = last5 ? stk[k + 4] : 0.0;
          Pt p = b.pos;
          Pt c1, c2, p3;
          if (horiz) {
            c1 = Pt{p.x + stk[k], p.y};
            c2 = Pt{c1.x + stk[k + 1], c1.y + stk[k + 2]};
            p3 = Pt{c2.x + d_last, c2.y + stk[k + 3]};
          } else {
            c1 = Pt{p.x, p.y + stk[k]};
            c2 = Pt{c1.x + stk[k + 1], c1.y + stk[k + 2]};
            p3 = Pt{c2.x + stk[k + 3], c2.y + d_last};
          }
          b.curve_to(c1, c2, p3);
          horiz = !horiz;
          k += 4;
        }
        stk.clear();
        break;
      }
      case 10: {  // callsubr
        if (stk.empty()) return -5;
        long idx = (long)stk.back() + ls.bias();
        stk.pop_back();
        if (idx < 0 || idx >= ls.n) return -5;
        int r = run(ls.blob + ls.offs[idx], ls.offs[idx + 1] - ls.offs[idx],
                    gs, ls, b, st, depth + 1);
        if (r != 0) return r;  // 1 = endchar propagates
        break;
      }
      case 29: {  // callgsubr
        if (stk.empty()) return -5;
        long idx = (long)stk.back() + gs.bias();
        stk.pop_back();
        if (idx < 0 || idx >= gs.n) return -5;
        int r = run(gs.blob + gs.offs[idx], gs.offs[idx + 1] - gs.offs[idx],
                    gs, ls, b, st, depth + 1);
        if (r != 0) return r;
        break;
      }
      case 15:  // vsindex (CFF2)
        if (st.cff2 && !stk.empty()) {
          st.vsindex = (long)stk.back();
          stk.pop_back();
        } else {
          stk.clear();
        }
        break;
      case 16: {  // blend (CFF2)
        if (!st.cff2) {
          stk.clear();
          break;
        }
        long vs = st.vsindex;
        long k = 0;
        const double* sc = nullptr;
        if (st.scalars && vs >= 0 && vs < st.n_vardata) {
          k = st.scalar_offs[vs + 1] - st.scalar_offs[vs];
          sc = st.scalars + st.scalar_offs[vs];
        }
        if (stk.empty()) return -6;
        long n_vals = (long)stk.back();
        stk.pop_back();
        long need = n_vals * (k + 1);
        if (n_vals < 0 || (long)stk.size() < need) return -6;
        size_t base_at = stk.size() - need;
        std::vector<double> outs;
        outs.reserve(n_vals);
        for (long vi = 0; vi < n_vals; vi++) {
          double v = stk[base_at + vi];
          for (long j = 0; j < k; j++)
            v += stk[base_at + n_vals + vi * k + j] * sc[j];
          outs.push_back(v);
        }
        stk.resize(base_at);
        stk.insert(stk.end(), outs.begin(), outs.end());
        break;
      }
      case 11:  // return
        return 0;
      case 14: {  // endchar
        if (!st.width_done) {
          st.width_done = true;
          if (stk.size() == 1 || stk.size() == 5) stk.erase(stk.begin());
        }
        b.close();
        return 1;
      }
      case 12: {  // escape
        if (i >= n) return -4;
        uint8_t b1 = code[i];
        i += 1;
        auto& a = stk;
        Pt p = b.pos;
        switch (b1) {
          case 35: {  // flex (reads 12 args; the 13th, fd, is unused
                      // — matching the Python slice a[0:12])
            if (a.size() < 12) { a.clear(); break; }
            Pt c1{p.x + a[0], p.y + a[1]};
            Pt c2{c1.x + a[2], c1.y + a[3]};
            Pt j1{c2.x + a[4], c2.y + a[5]};
            b.curve_to(c1, c2, j1);
            Pt c3{j1.x + a[6], j1.y + a[7]};
            Pt c4{c3.x + a[8], c3.y + a[9]};
            Pt e{c4.x + a[10], c4.y + a[11]};
            b.curve_to(c3, c4, e);
            a.clear();
            break;
          }
          case 34: {  // hflex
            if (a.size() < 7) { a.clear(); break; }
            double y0 = p.y;
            Pt c1{p.x + a[0], p.y};
            Pt c2{c1.x + a[1], c1.y + a[2]};
            Pt j1{c2.x + a[3], c2.y};
            b.curve_to(c1, c2, j1);
            Pt c3{j1.x + a[4], j1.y};
            Pt c4{c3.x + a[5], y0};
            Pt e{c4.x + a[6], c4.y};
            b.curve_to(c3, c4, e);
            a.clear();
            break;
          }
          case 36: {  // hflex1
            if (a.size() < 9) { a.clear(); break; }
            double y0 = p.y;
            Pt c1{p.x + a[0], p.y + a[1]};
            Pt c2{c1.x + a[2], c1.y + a[3]};
            Pt j1{c2.x + a[4], c2.y};
            b.curve_to(c1, c2, j1);
            Pt c3{j1.x + a[5], j1.y};
            Pt c4{c3.x + a[6], c3.y + a[7]};
            Pt e{c4.x + a[8], y0};
            b.curve_to(c3, c4, e);
            a.clear();
            break;
          }
          case 37: {  // flex1
            if (a.size() < 11) { a.clear(); break; }
            double dsx = a[0] + a[2] + a[4] + a[6] + a[8];
            double dsy = a[1] + a[3] + a[5] + a[7] + a[9];
            Pt c1{p.x + a[0], p.y + a[1]};
            Pt c2{c1.x + a[2], c1.y + a[3]};
            Pt j1{c2.x + a[4], c2.y + a[5]};
            b.curve_to(c1, c2, j1);
            Pt c3{j1.x + a[6], j1.y + a[7]};
            Pt c4{c3.x + a[8], c3.y + a[9]};
            Pt e;
            if (std::abs(dsx) > std::abs(dsy))
              e = Pt{c4.x + a[10], p.y};
            else
              e = Pt{p.x, c4.y + a[10]};
            b.curve_to(c3, c4, e);
            a.clear();
            break;
          }
          case 12:  // div
            if (a.size() >= 2) {
              double d = a.back();
              a.pop_back();
              double v = a.back();
              a.pop_back();
              a.push_back(d != 0.0 ? v / d : 0.0);
            }
            break;
          case 10:  // add
            if (a.size() >= 2) {
              double d = a.back();
              a.pop_back();
              a.back() += d;
            }
            break;
          case 11:  // sub
            if (a.size() >= 2) {
              double d = a.back();
              a.pop_back();
              a.back() -= d;
            }
            break;
          case 9:  // abs
            if (!a.empty()) a.back() = std::abs(a.back());
            break;
          case 14:  // neg
            if (!a.empty()) a.back() = -a.back();
            break;
          default:
            a.clear();
            break;
        }
        break;
      }
      default:
        stk.clear();
        break;
    }
  }
  return 0;
}

}  // namespace

extern "C" long cff_glyph_outline(
    const uint8_t* code, long code_len,
    const uint8_t* gsub_blob, const int64_t* gsub_offs, long n_gsub,
    const uint8_t* lsub_blob, const int64_t* lsub_offs, long n_lsub,
    long cff2,
    const double* scalars, const int64_t* scalar_offs, long n_vardata,
    long vsindex0,
    double* out_pts, int64_t* out_ends, long cap_pts, long cap_contours,
    long* n_pts_out) {
  Builder b;
  State st;
  st.cff2 = cff2 != 0;
  st.width_done = st.cff2;  // CFF2 charstrings carry no width
  st.scalars = scalars;
  st.scalar_offs = scalar_offs;
  st.n_vardata = n_vardata;
  st.vsindex = vsindex0;
  Subrs gs{gsub_blob, gsub_offs, n_gsub};
  Subrs ls{lsub_blob, lsub_offs, n_lsub};
  int r = run(code, code_len, gs, ls, b, st, 0);
  if (r < 0) return (long)r;
  b.close();
  long np = 0;
  if ((long)b.contours.size() > cap_contours) return -10;
  for (size_t c = 0; c < b.contours.size(); c++) {
    const auto& pts = b.contours[c];
    if (np + (long)pts.size() > cap_pts) return -10;
    for (const Pt& p : pts) {
      out_pts[2 * np] = p.x;
      out_pts[2 * np + 1] = p.y;
      np++;
    }
    out_ends[c] = np;
  }
  *n_pts_out = np;
  return (long)b.contours.size();
}
