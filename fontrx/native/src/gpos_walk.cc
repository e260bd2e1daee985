// Native GPOS lookup walk — the host-side layout fast path.
//
// The Python positioning engine (fontrx/font/gpos_shape.py) applies
// GPOS lookups with a per-glyph Python walk; at 10k chars the walk is
// dict-lookup-bound (docs/RESULTS.md "Layout-engine throughput").
// This file runs the SAME walk over flattened table images for the
// static-positioning case (no variation store, no hint context —
// where every ValueRecord/anchor resolves to its bare design-unit
// integers, see _PosState.add/_PosState.anchor), producing
// byte-identical position streams; anything it cannot represent
// (cursive, contextual, variable/hinted deltas) stays on the Python
// path per lookup.
//
// Blob layouts are produced by fontrx/native/gpos_walk.py (the only
// other reader/writer); every word is int32.
//
// Coverage:  n, start[n], end[n], cov_base[n]       (sorted ranges)
// ClassDef:  fmt(0 absent/1 dense/2 ranges),
//            fmt1: start, n, vals[n]
//            fmt2: n, start[n], end[n], cls[n]
// GDEF blob: ClassDef glyph_classes, ClassDef mark_attach,
//            n_mark_sets, Coverage per set
// Lookup blob: flags, mark_filter_set(-1 none), n_subtables, then per
//   subtable: kind, n_payload_words, payload —
//   kind 1  (single):       Coverage, shared, n_values, values[4n]
//   kind 21 (pair glyphs):  Coverage, n_sets, offs[n_sets+1],
//                           pairs[(gid2, v1[4], v2[4]) x total]
//   kind 22 (pair classes): Coverage, ClassDef cd1, ClassDef cd2,
//                           n_c2, n_matrix, matrix[(v1[4], v2[4]) x n]
//   kind 4/6 (mark attach): Coverage mark, n_marks, class[n], ax[n],
//                           ay[n], Coverage base, n_base, n_class,
//                           anchors[(has, x, y) x n_base*n_class]
//   kind 5  (mark->lig):    Coverage mark, n_marks, class[n], ax[n],
//                           ay[n], Coverage lig, n_lig,
//                           comp_off[n_lig+1], n_class,
//                           anchors[(has, x, y) x total_comps*n_class]

#include <cstdint>

#include "walk_common.h"

namespace {

using namespace fontrx_walk;
using i32 = int32_t;

struct Sub {
    i32 kind;
    Cov cov;             // single / pair first / mark coverage
    // single
    i32 shared, n_values;
    const i32 *values;
    // pair glyphs
    i32 n_sets;
    const i32 *offs, *pairs;
    // pair classes
    CDef cd1, cd2;
    i32 n_c2, n_matrix;
    const i32 *matrix;
    // mark attach / mark lig
    i32 n_marks;
    const i32 *m_class, *m_ax, *m_ay;
    Cov base_cov;
    i32 n_base, n_class;
    const i32 *anchors;
    // mark lig
    i32 n_lig;
    const i32 *comp_off;
};

struct Out {
    i32 *xp, *yp, *xa, *ya;
    i32 *att_p, *att_dx, *att_dy;  // att_p: -2 untouched
};

static bool value_nonzero(const i32 *v) {
    return v[0] | v[1] | v[2] | v[3];
}

static void add_value(Out &o, long i, const i32 *v) {
    o.xp[i] += v[0];
    o.yp[i] += v[1];
    o.xa[i] += v[2];
    o.ya[i] += v[3];
}

}  // namespace

extern "C" long gpos_apply_lookup(
    const i32 *gdef_blob,    // may be null
    const i32 *lookup_blob,
    const i32 *buf, long n,
    const i32 *lig_comps,    // may be null
    i32 *xp, i32 *yp, i32 *xa, i32 *ya,
    i32 *att_p, i32 *att_dx, i32 *att_dy) {
    Gdef gd{};
    if (!gd.parse(gdef_blob)) return -1;  // flattener caps; paranoia

    Cursor c{lookup_blob};
    const i32 flags = c.word();
    const i32 mfs = c.word();
    const i32 n_sub = c.word();
    if (n_sub < 0 || n_sub > 4096) return -1;

    Sub subs[64];
    if (n_sub > 64) return -1;
    for (i32 k = 0; k < n_sub; ++k) {
        Sub &s = subs[k];
        s.kind = c.word();
        i32 n_words = c.word();
        const i32 *payload_end = c.p + n_words;
        s.cov = c.cov();
        switch (s.kind) {
            case 1:
                s.shared = c.word();
                s.n_values = c.word();
                s.values = c.p; c.p += 4L * s.n_values;
                break;
            case 21:
                s.n_sets = c.word();
                s.offs = c.p; c.p += s.n_sets + 1;
                s.pairs = c.p; c.p += 9L * s.offs[s.n_sets];
                break;
            case 22:
                s.cd1 = c.cdef();
                s.cd2 = c.cdef();
                s.n_c2 = c.word();
                s.n_matrix = c.word();
                s.matrix = c.p; c.p += 8L * s.n_matrix;
                break;
            case 4:
            case 6:
                s.n_marks = c.word();
                s.m_class = c.p; c.p += s.n_marks;
                s.m_ax = c.p; c.p += s.n_marks;
                s.m_ay = c.p; c.p += s.n_marks;
                s.base_cov = c.cov();
                s.n_base = c.word();
                s.n_class = c.word();
                s.anchors = c.p; c.p += 3L * s.n_base * s.n_class;
                break;
            case 5:
                s.n_marks = c.word();
                s.m_class = c.p; c.p += s.n_marks;
                s.m_ax = c.p; c.p += s.n_marks;
                s.m_ay = c.p; c.p += s.n_marks;
                s.base_cov = c.cov();   // ligature coverage
                s.n_lig = c.word();
                s.comp_off = c.p; c.p += s.n_lig + 1;
                s.n_class = c.word();
                s.anchors = c.p; c.p += 3L * s.comp_off[s.n_lig] * s.n_class;
                break;
            default:
                return -1;
        }
        if (c.p != payload_end) return -1;  // flattener/parser mismatch
    }

    Out o{xp, yp, xa, ya, att_p, att_dx, att_dy};

    // GsubShaper._next / ._prev / GposShaper._prev_base
    auto next_i = [&](long j) -> long {
        for (++j; j < n; ++j)
            if (!skips(gd, buf[j], flags, mfs)) return j;
        return -1;
    };
    auto prev_i = [&](long j) -> long {
        for (--j; j >= 0; --j)
            if (!skips(gd, buf[j], flags, mfs)) return j;
        return -1;
    };
    auto prev_base = [&](long j) -> long {
        for (--j; j >= 0; --j)
            if (!gd.present || glyph_class(gd, buf[j]) != 3) return j;
        return -1;
    };

    long i = 0;
    while (i < n) {
        const i32 gid = buf[i];
        if (skips(gd, gid, flags, mfs)) { ++i; continue; }
        long nxt = -1;
        long j_pair = -2;   // lazy: next non-skipped (types 2)
        long p_base = -2;   // lazy: previous base (types 4/5)
        long p_prev = -2;   // lazy: previous non-skipped (type 6)
        for (i32 k = 0; k < n_sub && nxt < 0; ++k) {
            const Sub &s = subs[k];
            switch (s.kind) {
                case 1: {
                    long ci = cov_rank(s.cov, gid);
                    if (ci < 0) break;
                    const i32 *v = nullptr;
                    if (s.shared) v = s.values;
                    else if (ci < s.n_values) v = s.values + 4 * ci;
                    if (v) { add_value(o, i, v); nxt = i + 1; }
                    break;
                }
                case 21: case 22: {
                    if (j_pair == -2) j_pair = next_i(i);
                    if (j_pair < 0) break;
                    const i32 *v1 = nullptr, *v2 = nullptr;
                    if (s.kind == 21) {
                        long ci = cov_rank(s.cov, gid);
                        if (ci < 0 || ci >= s.n_sets) break;
                        const i32 second = buf[j_pair];
                        for (i32 t = s.offs[ci]; t < s.offs[ci + 1]; ++t) {
                            const i32 *rec = s.pairs + 9L * t;
                            if (rec[0] == second) {
                                v1 = rec + 1; v2 = rec + 5;
                                break;
                            }
                        }
                    } else {
                        if (cov_rank(s.cov, gid) < 0) break;
                        i32 c1 = class_of(s.cd1, gid);
                        i32 c2 = class_of(s.cd2, buf[j_pair]);
                        long idx = (long)c1 * s.n_c2 + c2;
                        if (idx < 0 || idx >= s.n_matrix) break;
                        v1 = s.matrix + 8 * idx;
                        v2 = v1 + 4;
                    }
                    if (v1) {
                        add_value(o, i, v1);
                        add_value(o, j_pair, v2);
                        nxt = value_nonzero(v2) ? j_pair + 1 : j_pair;
                    }
                    break;
                }
                case 4: case 5: {
                    if (p_base == -2) p_base = prev_base(i);
                    if (p_base < 0) break;
                    long mi = cov_rank(s.cov, gid);
                    long bi = cov_rank(s.base_cov, buf[p_base]);
                    if (mi < 0 || bi < 0 || mi >= s.n_marks) break;
                    i32 klass = s.m_class[mi];
                    if (klass < 0 || klass >= s.n_class) break;
                    const i32 *row = nullptr;
                    if (s.kind == 4) {
                        row = s.anchors + 3L * (bi * s.n_class + klass);
                        if (!row[0]) break;
                    } else {
                        // mark-to-ligature: GSUB-threaded component,
                        // else LAST component with a usable anchor
                        i32 comp = lig_comps ? lig_comps[i] : 0;
                        i32 c0 = s.comp_off[bi], c1 = s.comp_off[bi + 1];
                        if (comp >= 1 && c0 + comp - 1 < c1) {
                            const i32 *r = s.anchors
                                + 3L * ((long)(c0 + comp - 1) * s.n_class
                                        + klass);
                            if (r[0]) row = r;
                        }
                        if (!row) {
                            for (i32 ct = c1 - 1; ct >= c0 && !row; --ct) {
                                const i32 *r = s.anchors
                                    + 3L * ((long)ct * s.n_class + klass);
                                if (r[0]) row = r;
                            }
                        }
                        if (!row) break;
                    }
                    o.att_p[i] = (i32)p_base;
                    o.att_dx[i] = row[1] - s.m_ax[mi];
                    o.att_dy[i] = row[2] - s.m_ay[mi];
                    nxt = i + 1;
                    break;
                }
                case 6: {
                    if (p_prev == -2) p_prev = prev_i(i);
                    if (p_prev < 0) break;
                    long mi = cov_rank(s.cov, gid);
                    long bi = cov_rank(s.base_cov, buf[p_prev]);
                    if (mi < 0 || bi < 0 || mi >= s.n_marks) break;
                    i32 klass = s.m_class[mi];
                    if (klass < 0 || klass >= s.n_class) break;
                    const i32 *row =
                        s.anchors + 3L * (bi * s.n_class + klass);
                    if (!row[0]) break;
                    o.att_p[i] = (i32)p_prev;
                    o.att_dx[i] = row[1] - s.m_ax[mi];
                    o.att_dy[i] = row[2] - s.m_ay[mi];
                    nxt = i + 1;
                    break;
                }
            }
        }
        i = nxt >= 0 ? nxt : i + 1;
    }
    return 0;
}
