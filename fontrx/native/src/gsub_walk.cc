// Native GSUB lookup walk — the substitution half of the host-side
// layout fast path (the GPOS half is gpos_walk.cc).
//
// Runs GsubShaper._apply_lookup for the buffer-shrinking lookup
// types — 1 (single, delta or mapped), 3 (alternate), 4 (ligature
// with skipped-glyph component recording) — over flattened table
// images, mutating the glyph buffer and the ligature-component side
// channel in place, byte-identical to the Python walk.  Multiple
// (type 2, buffer-growing), contextual (5/6/7) and reverse-chain (8)
// lookups stay on the Python walk per lookup.
//
// Lookup blob (fontrx/native/gsub_walk.py): flags, mark_filter_set
// (-1 none), n_subtables, then per subtable: kind, n_payload_words,
// payload —
//   kind 11 (single):   Coverage, has_delta, delta, n_subs, subs[n]
//   kind 13 (alternate):Coverage, n_sets, off[n_sets+1], alts[total]
//   kind 14 (ligature): Coverage, n_sets, set_off[n_sets+1] (RECORD
//                       indices), rec_off[n_recs+1] (word offsets),
//                       recs: (out_glyph, n_comp, comps...) x n_recs

#include <cstdint>

#include "walk_common.h"

namespace {

using namespace fontrx_walk;
using i32 = int32_t;

struct Sub {
    i32 kind;
    Cov cov;
    // single
    i32 has_delta, delta, n_subs;
    const i32 *subs;
    // alternate
    i32 n_sets;
    const i32 *offs, *alts;
    // ligature
    const i32 *set_off, *rec_off, *recs;
    i32 n_recs;
};

}  // namespace

// Applies one lookup in place.  buf/comp have length *n_io (comp may
// be null); on return *n_io holds the (possibly smaller) new length.
// Returns 0 on success, nonzero when the blob is malformed (caller
// falls back BEFORE any mutation — parsing happens first).
extern "C" long gsub_apply_lookup(
    const i32 *gdef_blob,    // may be null
    const i32 *lookup_blob,
    i32 *buf, i32 *comp, long *n_io, long alt_index) {
    Gdef gd{};
    if (!gd.parse(gdef_blob)) return -1;

    Cursor c{lookup_blob};
    const i32 flags = c.word();
    const i32 mfs = c.word();
    const i32 n_sub = c.word();
    if (n_sub < 0 || n_sub > 64) return -1;

    Sub subs[64];
    for (i32 k = 0; k < n_sub; ++k) {
        Sub &s = subs[k];
        s.kind = c.word();
        i32 n_words = c.word();
        const i32 *payload_end = c.p + n_words;
        s.cov = c.cov();
        switch (s.kind) {
            case 11:
                s.has_delta = c.word();
                s.delta = c.word();
                s.n_subs = c.word();
                s.subs = c.p; c.p += s.n_subs;
                break;
            case 13:
                s.n_sets = c.word();
                s.offs = c.p; c.p += s.n_sets + 1;
                s.alts = c.p; c.p += s.offs[s.n_sets];
                break;
            case 14:
                s.n_sets = c.word();
                s.set_off = c.p; c.p += s.n_sets + 1;
                s.n_recs = c.word();
                s.rec_off = c.p; c.p += s.n_recs + 1;
                s.recs = c.p; c.p += s.rec_off[s.n_recs];
                break;
            default:
                return -1;
        }
        if (c.p != payload_end) return -1;
    }

    long n = *n_io;

    auto next_i = [&](long j) -> long {
        for (++j; j < n; ++j)
            if (!skips(gd, buf[j], flags, mfs)) return j;
        return -1;
    };

    // scratch for ligature component-match positions (components are
    // u16-counted; 64 is far past any real ligature)
    long pos[64];

    long i = 0;
    while (i < n) {
        const i32 gid = buf[i];
        if (skips(gd, gid, flags, mfs)) { ++i; continue; }
        long nxt = -1;
        for (i32 k = 0; k < n_sub && nxt < 0; ++k) {
            const Sub &s = subs[k];
            long ci = cov_rank(s.cov, gid);
            if (ci < 0) continue;
            switch (s.kind) {
                case 11: {
                    if (s.has_delta) {
                        buf[i] = (i32)((gid + s.delta) & 0xFFFF);
                        nxt = i + 1;
                    } else if (ci < s.n_subs) {
                        buf[i] = s.subs[ci];
                        nxt = i + 1;
                    }
                    break;
                }
                case 13: {
                    if (ci >= s.n_sets) break;
                    i32 a0 = s.offs[ci], a1 = s.offs[ci + 1];
                    if (a0 >= a1) break;
                    long idx = alt_index;
                    if (idx < 0) idx = 0;
                    if (idx > a1 - a0 - 1) idx = a1 - a0 - 1;
                    buf[i] = s.alts[a0 + idx];
                    nxt = i + 1;
                    break;
                }
                case 14: {
                    if (ci >= s.n_sets) break;
                    // ligatures in set (preference) order; components
                    // match at successive non-skipped positions
                    for (i32 r = s.set_off[ci];
                         r < s.set_off[ci + 1] && nxt < 0; ++r) {
                        const i32 *rec = s.recs + s.rec_off[r];
                        const i32 out_glyph = rec[0];
                        const i32 n_comp = rec[1];
                        if (n_comp > 64) continue;  // flattener caps
                        long j = i;
                        bool ok = true;
                        for (i32 q = 0; q < n_comp; ++q) {
                            j = next_i(j);
                            if (j < 0 || buf[j] != rec[2 + q]) {
                                ok = false;
                                break;
                            }
                            pos[q] = j;
                        }
                        if (!ok) continue;
                        buf[i] = out_glyph;
                        if (comp) {
                            // skipped glyphs between matched
                            // components record which component they
                            // followed (1-based), matching
                            // GsubShaper._apply_ligature
                            comp[i] = 0;
                            long prev = i;
                            for (i32 q = 0; q < n_comp; ++q) {
                                for (long t = prev + 1; t < pos[q]; ++t)
                                    comp[t] = q + 1;
                                prev = pos[q];
                            }
                        }
                        // delete matched components back-to-front
                        for (i32 q = n_comp - 1; q >= 0; --q) {
                            long p = pos[q];
                            for (long t = p; t + 1 < n; ++t) {
                                buf[t] = buf[t + 1];
                                if (comp) comp[t] = comp[t + 1];
                            }
                            --n;
                        }
                        nxt = i + 1;
                    }
                    break;
                }
            }
        }
        i = nxt >= 0 ? nxt : i + 1;
    }
    *n_io = n;
    return 0;
}
