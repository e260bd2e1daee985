"""GPOS pair positioning (kerning) — a capability extension.

The reference does no kerning at all (its pen just advances by
``advance_width``, ``src/Appli.zig:343-351``); fontrx already supports
the legacy ``kern`` table (format 0, ``fontrx.font.ttf.KernTable``).
This module reads the modern OpenType equivalent: ``GPOS`` lookup
type 2 (PairPos) reached through features tagged ``kern``, in both
subtable formats —

- **format 1**: per-first-glyph pair sets, flattened here into the same
  sorted ``(left << 16) | right`` key array the ``kern`` table uses;
- **format 2**: class matrices, kept structural (two ``ClassDef``
  lookups + a value matrix) because enumerating class pairs would
  explode combinatorially.

Only the first glyph's ``xAdvance`` value (valueFormat bit 0x0004) is
extracted — that IS horizontal kerning; other value-record fields
(placement, device tables) are skipped by size.  Extension lookups
(type 9) wrapping type 2 are followed.  ``lookup(left, right)`` is
vectorized and mirrors ``KernTable.lookup`` so the layout engine can
use either interchangeably.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from fontrx.utils.reader import BigEndianReader


def _popcount16(x: int) -> int:
    return bin(x & 0xFFFF).count("1")


@dataclass(frozen=True, slots=True)
class Coverage:
    """Coverage table: sorted glyph ranges -> coverage index."""

    start: np.ndarray  # int64[n]
    end: np.ndarray    # int64[n] inclusive
    cov_base: np.ndarray  # int64[n] coverage index of range start
    # scalar-lookup memo: the shaping engines call rank() per glyph
    # and text repeats few unique gids (profiled 8x layout win)
    memo: dict = field(default_factory=dict, compare=False)

    @classmethod
    def parse(cls, r: BigEndianReader) -> "Coverage":
        fmt = r.u16()
        if fmt == 1:
            n = r.u16()
            glyphs = r.u16_array(n).astype(np.int64)
            return cls(glyphs, glyphs, np.arange(n, dtype=np.int64))
        if fmt == 2:
            n = r.u16()
            raw = np.frombuffer(r.data, dtype=">u2", count=3 * n, offset=r.pos)
            raw = raw.astype(np.int64).reshape(-1, 3)
            return cls(raw[:, 0].copy(), raw[:, 1].copy(), raw[:, 2].copy())
        raise ValueError(f"coverage format {fmt}")

    def rank(self, glyphs: np.ndarray) -> np.ndarray:
        """Coverage index per glyph, -1 when not covered (vectorized;
        scalar inputs take a memoized fast path)."""
        if isinstance(glyphs, (int, np.integer)):
            gid = int(glyphs)
        elif (isinstance(glyphs, (list, tuple)) and len(glyphs) == 1
              and isinstance(glyphs[0], (int, np.integer))):
            gid = int(glyphs[0])
            v = self.memo.get(gid)
            if v is None:
                v = int(self._rank_vec(np.array([gid], np.int64))[0])
                self.memo[gid] = v
            return (v,)   # supports the callers' [0] indexing
        else:
            return self._rank_vec(np.asarray(glyphs, np.int64))
        v = self.memo.get(gid)
        if v is None:
            v = int(self._rank_vec(np.array([gid], np.int64))[0])
            self.memo[gid] = v
        return v

    def _rank_vec(self, g: np.ndarray) -> np.ndarray:
        if len(self.end) == 0:
            return np.full(g.shape, -1, np.int64)
        i = np.clip(np.searchsorted(self.end, g), 0, len(self.end) - 1)
        inside = (self.start[i] <= g) & (g <= self.end[i])
        return np.where(inside, self.cov_base[i] + (g - self.start[i]), -1)


@dataclass(frozen=True, slots=True)
class ClassDef:
    """ClassDef table: glyph -> class id (0 when unlisted)."""

    start: np.ndarray
    end: np.ndarray  # inclusive
    cls_value: np.ndarray  # class of every glyph in [start, end] (fmt 2)
    per_glyph: np.ndarray | None  # fmt 1 dense array (class per glyph)
    memo: dict = field(default_factory=dict, compare=False)

    @classmethod
    def parse(cls, r: BigEndianReader) -> "ClassDef":
        fmt = r.u16()
        if fmt == 1:
            start_glyph, n = r.unpack("HH")
            vals = r.u16_array(n).astype(np.int64)
            return cls(np.array([start_glyph], np.int64),
                       np.array([start_glyph + n - 1], np.int64),
                       np.empty(0, np.int64), vals)
        if fmt == 2:
            n = r.u16()
            raw = np.frombuffer(r.data, dtype=">u2", count=3 * n, offset=r.pos)
            raw = raw.astype(np.int64).reshape(-1, 3)
            return cls(raw[:, 0].copy(), raw[:, 1].copy(), raw[:, 2].copy(), None)
        raise ValueError(f"classdef format {fmt}")

    def class_of(self, glyphs: np.ndarray) -> np.ndarray:
        if isinstance(glyphs, (int, np.integer)):
            gid = int(glyphs)
        elif (isinstance(glyphs, (list, tuple)) and len(glyphs) == 1
              and isinstance(glyphs[0], (int, np.integer))):
            gid = int(glyphs[0])
            v = self.memo.get(gid)
            if v is None:
                v = int(self._class_vec(
                    np.array([gid], np.int64))[0])
                self.memo[gid] = v
            return (v,)
        else:
            return self._class_vec(np.asarray(glyphs, np.int64))
        v = self.memo.get(gid)
        if v is None:
            v = int(self._class_vec(np.array([gid], np.int64))[0])
            self.memo[gid] = v
        return v

    def _class_vec(self, g: np.ndarray) -> np.ndarray:
        if self.per_glyph is not None:
            off = g - self.start[0]
            inside = (off >= 0) & (off < len(self.per_glyph))
            return np.where(inside, self.per_glyph[np.clip(off, 0, len(self.per_glyph) - 1)], 0)
        if len(self.end) == 0:
            return np.zeros(g.shape, np.int64)
        i = np.clip(np.searchsorted(self.end, g), 0, len(self.end) - 1)
        inside = (self.start[i] <= g) & (g <= self.end[i])
        return np.where(inside, self.cls_value[i], 0)


@dataclass(frozen=True, slots=True)
class _PairsSub:
    """Format-1 subtable flattened to sorted pair keys."""

    coverage: Coverage
    keys: np.ndarray    # uint32[(left<<16)|right], sorted
    values: np.ndarray  # int32

    def adjust(self, left, right):
        key = (np.asarray(left, np.uint32) << np.uint32(16)) | np.asarray(right, np.uint32)
        covered = self.coverage.rank(left) >= 0
        if len(self.keys) == 0:
            return np.zeros(key.shape, np.int32), covered
        i = np.clip(np.searchsorted(self.keys, key), 0, len(self.keys) - 1)
        hit = self.keys[i] == key
        return np.where(hit, self.values[i], 0).astype(np.int32), covered


@dataclass(frozen=True, slots=True)
class _ClassSub:
    """Format-2 subtable kept structural."""

    coverage: Coverage
    class1: ClassDef
    class2: ClassDef
    matrix: np.ndarray  # int32 [c1, c2] xAdvance of first glyph

    def adjust(self, left, right):
        covered = self.coverage.rank(left) >= 0
        c1 = np.clip(self.class1.class_of(left), 0, self.matrix.shape[0] - 1)
        c2 = np.clip(self.class2.class_of(right), 0, self.matrix.shape[1] - 1)
        return np.where(covered, self.matrix[c1, c2], 0).astype(np.int32), covered


@dataclass(frozen=True, slots=True)
class GposKernTable:
    """All PairPos subtables of all ``kern``-tagged GPOS lookups, in
    lookup order.  Per pair, the first subtable whose coverage contains
    the left glyph applies (OpenType subtable precedence)."""

    subtables: tuple

    @classmethod
    def parse(cls, r: BigEndianReader) -> "GposKernTable | None":
        subtables = []
        for s_pos in _feature_subtables(r, b"kern", 2):
            sub = cls._parse_pairpos(BigEndianReader(r.data, s_pos))
            if sub is not None:
                subtables.append(sub)
        return cls(tuple(subtables)) if subtables else None

    @staticmethod
    def _parse_pairpos(r: BigEndianReader):
        base = r.pos
        fmt, cov_off, vf1, vf2 = r.unpack("HHHH")
        rec1 = 2 * _popcount16(vf1)
        rec2 = 2 * _popcount16(vf2)
        if not vf1 & 0x0004:  # no first-glyph xAdvance -> nothing to kern
            return None
        # byte offset of xAdvance inside value record 1 (fields are
        # 2 bytes each, ordered by bit position)
        xadv_off = 2 * _popcount16(vf1 & 0x0003)
        coverage = Coverage.parse(BigEndianReader(r.data, base + cov_off))

        if fmt == 1:
            n_sets = r.u16()
            set_offsets = r.u16_array(n_sets)
            # pair set i belongs to the first glyph with coverage
            # index i: scatter glyph ids into coverage-index order
            if len(coverage.start):
                glyphs = np.concatenate([
                    np.arange(s, e + 1, dtype=np.int64)
                    for s, e in zip(coverage.start, coverage.end)
                ])
                cov_idx = np.concatenate([
                    np.arange(cb, cb + (e - s + 1), dtype=np.int64)
                    for s, e, cb in zip(coverage.start, coverage.end,
                                        coverage.cov_base)
                ])
                firsts = np.zeros(int(cov_idx.max()) + 1, np.int64)
                firsts[cov_idx] = glyphs
            else:
                firsts = np.empty(0, np.int64)
            keys, values = [], []
            step = 2 + rec1 + rec2
            for ci in range(min(n_sets, len(firsts))):
                sr = BigEndianReader(r.data, base + int(set_offsets[ci]))
                n_pairs = sr.u16()
                rec_base = sr.pos
                for p in range(n_pairs):
                    pr = BigEndianReader(r.data, rec_base + p * step)
                    second = pr.u16()
                    xr = BigEndianReader(r.data, rec_base + p * step + 2 + xadv_off)
                    xadv = xr.i16()
                    if xadv:
                        keys.append((int(firsts[ci]) << 16) | second)
                        values.append(xadv)
            keys = np.asarray(keys, np.uint32)
            order = np.argsort(keys, kind="stable")
            return _PairsSub(coverage, keys[order],
                             np.asarray(values, np.int32)[order])

        if fmt == 2:
            cd1_off, cd2_off, c1n, c2n = r.unpack("HHHH")
            class1 = ClassDef.parse(BigEndianReader(r.data, base + cd1_off))
            class2 = ClassDef.parse(BigEndianReader(r.data, base + cd2_off))
            step = rec1 + rec2
            rec_base = r.pos
            mat = np.zeros((c1n, c2n), np.int32)
            # bulk-decode the xAdvance i16 at its offset in each record
            total = c1n * c2n
            if total:
                raw = np.frombuffer(
                    r.data, dtype=np.uint8,
                    count=total * step, offset=rec_base,
                ).reshape(total, step)
                hi = raw[:, xadv_off].astype(np.int32)
                lo = raw[:, xadv_off + 1].astype(np.int32)
                vals = (hi << 8) | lo
                vals = np.where(vals >= 0x8000, vals - 0x10000, vals)
                mat = vals.reshape(c1n, c2n).astype(np.int32)
            return _ClassSub(coverage, class1, class2, mat)

        return None

    def lookup(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        """Vectorized kerning (first-glyph xAdvance, font units) for
        glyph-index pairs; 0 when no subtable covers the pair.
        Interface-compatible with ``ttf.KernTable.lookup``."""
        left = np.atleast_1d(np.asarray(left, np.int64))
        right = np.atleast_1d(np.asarray(right, np.int64))
        out = np.zeros(left.shape, np.int32)
        decided = np.zeros(left.shape, bool)
        for sub in self.subtables:
            val, covered = sub.adjust(left, right)
            take = covered & ~decided
            out = np.where(take, val, out)
            decided |= covered
        return out


def _feature_subtables(r: BigEndianReader, tag: bytes, want_type: int):
    """Walk a GPOS/GSUB-shaped table: yield absolute byte positions of
    every ``want_type`` subtable reachable through features tagged
    ``tag``, following extension lookups (type 9)."""
    base = r.pos
    major, _minor = r.unpack("HH")
    if major != 1:
        return
    _script_off, feature_off, lookup_off = r.unpack("HHH")
    fr = BigEndianReader(r.data, base + feature_off)
    f_base = fr.pos
    n_feat = fr.u16()
    lookup_indices: list[int] = []
    for _ in range(n_feat):
        t = fr.tag()
        off = fr.u16()
        if t == tag:
            tr = BigEndianReader(r.data, f_base + off)
            tr.skip(2)  # featureParamsOffset
            n_lk = tr.u16()
            lookup_indices.extend(tr.u16_array(n_lk).tolist())
    if not lookup_indices:
        return
    lr = BigEndianReader(r.data, base + lookup_off)
    l_base = lr.pos
    n_lookups = lr.u16()
    lookup_offsets = lr.u16_array(n_lookups)
    for li in sorted(set(lookup_indices)):
        if li >= n_lookups:
            continue
        tb = BigEndianReader(r.data, l_base + int(lookup_offsets[li]))
        t_base = tb.pos
        lookup_type, _flags, n_sub = tb.unpack("HHH")
        for so in tb.u16_array(n_sub):
            s_pos = t_base + int(so)
            s_type = lookup_type
            if s_type == 9:  # extension positioning
                er = BigEndianReader(r.data, s_pos)
                _fmt, ext_type = er.unpack("HH")
                ext_off = er.u32()
                s_pos, s_type = s_pos + ext_off, ext_type
            if s_type == want_type:
                yield s_pos


def _parse_anchor(r: BigEndianReader) -> tuple[int, int]:
    """Anchor table: (x, y) design units.  Formats 2 (contour point)
    and 3 (device tables) degrade to the bare coordinates here — the
    full positioning engine (:mod:`fontrx.font.gpos_shape`) resolves
    them against the hinted outline / per-ppem device deltas."""
    _fmt, x, y = r.unpack("Hhh")
    return int(x), int(y)


@dataclass(frozen=True, slots=True)
class DeviceTable:
    """A plain (hinting) Device table: per-ppem pixel deltas.

    OpenType ``DeviceTable``: ``startSize``/``endSize`` (ppem range,
    inclusive) and packed signed deltas — deltaFormat 1/2/3 = 2/4/8
    bits per value, packed big-endian MSB-first into uint16 words.
    ``delta(ppem)`` is the pixel adjustment at that size (0 outside
    the range).  The reference has no positioning at all; fontrx pairs
    these with the TrueType hinting interpreter (the deltas exist to
    touch up grid-fitted spacing at specific sizes)."""

    start_size: int
    end_size: int
    deltas: np.ndarray  # int16 per ppem in [start_size, end_size]

    @classmethod
    def parse(cls, data: bytes, pos: int) -> "DeviceTable | None":
        """Parse at ``pos``; None for a VariationIndex (0x8000) or an
        unknown/corrupt format."""
        try:
            r = BigEndianReader(data, pos)
            start, end, fmt = r.unpack("HHH")
        except Exception:
            return None
        if fmt not in (1, 2, 3) or end < start:
            return None
        n = end - start + 1
        bits = {1: 2, 2: 4, 3: 8}[fmt]
        per_word = 16 // bits
        n_words = (n + per_word - 1) // per_word
        try:
            words = r.u16_array(n_words).astype(np.uint32)
        except Exception:
            return None
        # unpack MSB-first bit fields, then sign-extend
        shifts = np.arange(per_word - 1, -1, -1) * bits
        vals = (words[:, None] >> shifts[None, :]) & ((1 << bits) - 1)
        vals = vals.reshape(-1)[:n].astype(np.int32)
        sign_bit = 1 << (bits - 1)
        vals = np.where(vals >= sign_bit, vals - (1 << bits), vals)
        return cls(int(start), int(end), vals.astype(np.int16))

    def delta(self, ppem: int) -> int:
        """Pixel delta at ``ppem`` (0 outside [start_size, end_size])."""
        if self.start_size <= ppem <= self.end_size:
            return int(self.deltas[ppem - self.start_size])
        return 0


@dataclass(frozen=True, slots=True)
class _MarkBaseSub:
    mark_cov: Coverage
    base_cov: Coverage
    mark_class: np.ndarray   # int64[n_marks] per mark coverage index
    mark_anchor: np.ndarray  # int64[n_marks, 2]
    base_anchor: np.ndarray  # int64[n_bases, n_classes, 2]
    base_valid: np.ndarray   # bool[n_bases, n_classes]


@dataclass(frozen=True, slots=True)
class MarkBaseTable:
    """GPOS lookup type 4 (MarkToBase attachment) — combining
    diacritics.  A further capability extension (the reference has no
    positioning at all): a mark glyph following a base glyph is placed
    so the mark's anchor coincides with the base's anchor for the
    mark's class:

        mark_offset = base_pen + (base_anchor - mark_anchor)

    and the pen does not advance for the mark.  Subtables from every
    ``mark``-tagged lookup apply first-match, like PairPos.

    The same class also carries MarkToMark (lookup type 6, ``mkmk``
    features — stacked diacritics): the wire layout of MarkMarkPos
    format 1 is field-for-field identical with "base" meaning the
    earlier mark; parse with ``tag=b"mkmk", lookup_type=6``."""

    subtables: tuple

    @classmethod
    def parse(
        cls, r: BigEndianReader, tag: bytes = b"mark", lookup_type: int = 4
    ) -> "MarkBaseTable | None":
        data = r.data
        subs = []
        for s_pos in _feature_subtables(r, tag, lookup_type):
            sr = BigEndianReader(data, s_pos)
            fmt, mark_cov_off, base_cov_off, n_classes, mark_arr_off, \
                base_arr_off = sr.unpack("HHHHHH")
            if fmt != 1:
                continue
            mark_cov = Coverage.parse(
                BigEndianReader(data, s_pos + mark_cov_off))
            base_cov = Coverage.parse(
                BigEndianReader(data, s_pos + base_cov_off))
            ma = BigEndianReader(data, s_pos + mark_arr_off)
            ma_base = ma.pos
            n_marks = ma.u16()
            mark_class = np.zeros(n_marks, np.int64)
            mark_anchor = np.zeros((n_marks, 2), np.int64)
            for i in range(n_marks):
                mcls, a_off = ma.unpack("HH")
                mark_class[i] = mcls
                if a_off:
                    mark_anchor[i] = _parse_anchor(
                        BigEndianReader(data, ma_base + a_off))
            ba = BigEndianReader(data, s_pos + base_arr_off)
            ba_base = ba.pos
            n_bases = ba.u16()
            base_anchor = np.zeros((n_bases, n_classes, 2), np.int64)
            base_valid = np.zeros((n_bases, n_classes), bool)
            for i in range(n_bases):
                for c in range(n_classes):
                    a_off = ba.u16()
                    if a_off:
                        base_anchor[i, c] = _parse_anchor(
                            BigEndianReader(data, ba_base + a_off))
                        base_valid[i, c] = True
            subs.append(_MarkBaseSub(
                mark_cov, base_cov, mark_class, mark_anchor,
                base_anchor, base_valid,
            ))
        return cls(tuple(subs)) if subs else None

    def attach(self, base_gid: int, mark_gid: int) -> tuple[int, int] | None:
        """``(dx, dy)`` to add to the base's pen position to place the
        mark, or ``None`` when this pair does not attach."""
        for sub in self.subtables:
            mi = int(sub.mark_cov.rank([int(mark_gid)])[0])
            if mi < 0 or mi >= len(sub.mark_class):
                continue
            bi = int(sub.base_cov.rank([int(base_gid)])[0])
            if bi < 0 or bi >= len(sub.base_anchor):
                continue
            c = int(sub.mark_class[mi])
            # corrupt fonts may declare a MarkRecord class beyond
            # markClassCount: degrade to no-attach, don't crash
            if not (0 <= c < sub.base_valid.shape[1]):
                continue
            if not sub.base_valid[bi, c]:
                continue
            bx, by = sub.base_anchor[bi, c]
            mx, my = sub.mark_anchor[mi]
            return int(bx - mx), int(by - my)
        return None

    def is_mark(self, gid: int) -> bool:
        """Covered by any mark coverage — the layout's cue that the
        glyph is a combining mark (zero pen advance when attached)."""
        return any(
            int(sub.mark_cov.rank([int(gid)])[0]) >= 0
            for sub in self.subtables
        )
