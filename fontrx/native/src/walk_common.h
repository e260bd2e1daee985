// Shared flattened-table machinery for the native GSUB/GPOS walks.
// Blob formats are produced by fontrx/native/gpos_walk.py /
// gsub_walk.py (the only writers); every word is int32.
//
// Coverage:  n, start[n], end[n], cov_base[n]       (sorted ranges)
// ClassDef:  fmt(0 absent/1 dense/2 ranges),
//            fmt1: start, n, vals[n]
//            fmt2: n, start[n], end[n], cls[n]
// GDEF blob: ClassDef glyph_classes, ClassDef mark_attach,
//            n_mark_sets, Coverage per set

#pragma once

#include <cstdint>

namespace fontrx_walk {

using i32 = int32_t;

struct Cov {
    i32 n;
    const i32 *start, *end, *base;
};

struct CDef {
    i32 fmt;      // 0 absent, 1 dense, 2 ranges
    i32 d_start;  // fmt1
    i32 n;
    const i32 *a, *b, *c;  // fmt1: vals in a; fmt2: start/end/cls
};

struct Cursor {
    const i32 *p;
    Cov cov() {
        Cov c;
        c.n = *p++;
        c.start = p; p += c.n;
        c.end = p; p += c.n;
        c.base = p; p += c.n;
        return c;
    }
    CDef cdef() {
        CDef d{};
        d.fmt = *p++;
        if (d.fmt == 1) {
            d.d_start = *p++;
            d.n = *p++;
            d.a = p; p += d.n;
        } else if (d.fmt == 2) {
            d.n = *p++;
            d.a = p; p += d.n;
            d.b = p; p += d.n;
            d.c = p; p += d.n;
        }
        return d;
    }
    i32 word() { return *p++; }
};

// first index with a[i] >= g (lower_bound), matching
// np.searchsorted(end, g) in Coverage._rank_vec
inline long lower_bound_i32(const i32 *a, long n, i32 g) {
    long lo = 0, hi = n;
    while (lo < hi) {
        long mid = (lo + hi) >> 1;
        if (a[mid] < g) lo = mid + 1; else hi = mid;
    }
    return lo;
}

inline long cov_rank(const Cov &c, i32 g) {
    if (c.n == 0) return -1;
    long i = lower_bound_i32(c.end, c.n, g);
    if (i >= c.n) i = c.n - 1;
    if (c.start[i] <= g && g <= c.end[i]) return c.base[i] + (g - c.start[i]);
    return -1;
}

inline i32 class_of(const CDef &d, i32 g) {
    if (d.fmt == 0) return 0;
    if (d.fmt == 1) {
        i32 off = g - d.d_start;
        return (off >= 0 && off < d.n) ? d.a[off] : 0;
    }
    if (d.n == 0) return 0;
    long i = lower_bound_i32(d.b, d.n, g);
    if (i >= d.n) i = d.n - 1;
    if (d.a[i] <= g && g <= d.b[i]) return d.c[i];
    return 0;
}

struct Gdef {
    bool present;
    CDef classes, mark_attach;
    i32 n_sets;
    Cov sets[64];

    // returns false on malformed blob
    bool parse(const i32 *blob) {
        present = blob != nullptr;
        if (!present) return true;
        Cursor c{blob};
        classes = c.cdef();
        mark_attach = c.cdef();
        n_sets = c.word();
        if (n_sets < 0 || n_sets > 64) return false;
        for (i32 k = 0; k < n_sets; ++k) sets[k] = c.cov();
        return true;
    }
};

// GDEF glyph class (0 when absent — matching GdefTable.glyph_class)
inline i32 glyph_class(const Gdef &g, i32 gid) {
    if (!g.present) return 0;
    return class_of(g.classes, gid);
}

// GdefTable.skips, bit-for-bit
inline bool skips(const Gdef &g, i32 gid, i32 flags, i32 mfs) {
    if (!g.present) return false;
    i32 gc = glyph_class(g, gid);
    if (gc == 1 && (flags & 0x0002)) return true;   // ignore base
    if (gc == 2 && (flags & 0x0004)) return true;   // ignore ligatures
    if (gc == 3) {
        if (flags & 0x0008) return true;            // ignore marks
        if (flags & 0x0010) {                       // mark filtering set
            if (mfs < 0 || mfs >= g.n_sets) return false;
            return cov_rank(g.sets[mfs], gid) < 0;
        }
        i32 attach = (flags >> 8) & 0xFF;
        if (attach && g.mark_attach.fmt != 0)
            return class_of(g.mark_attach, gid) != attach;
    }
    return false;
}

}  // namespace fontrx_walk
