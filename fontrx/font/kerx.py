"""AAT extended kerning (``kerx``): the Apple pair-kerning table.

Capability extension — Apple-ecosystem fonts often carry ``kerx``
instead of the legacy ``kern`` or GPOS.  Horizontal non-cross-stream
subtables accumulate (the same convention as the legacy table):

- **format 0**: sorted pair list ({left, right} u16 pairs -> FWORD),
  vectorized into the same ``(left << 16) | right`` searchsorted
  lookup the legacy table uses;
- **format 2**: two-ClassTable matrix (AAT lookups yielding
  premultiplied byte offsets; value at ``subtable[left + right]``);
- **format 6**: row/column index form (AAT lookups yielding indices
  into a kerning vector; 16- or 32-bit flavors);
- **format 1**: contextual state-machine kerning (push/pop value
  lists, odd-bit termination) surfaced as per-position pen deltas;
- **format 4**: anchor attachment — the machine aligns the current
  glyph's ``ankr`` anchor (or direct coordinates) to a marked
  glyph's, a pure position offset (``attach_offsets``); outline
  control-point actions are skipped with a notice.

The shaping oracle is HarfBuzz (``tests/test_kerx.py``): hb_shape's
advances on the hand-assembled fixtures must match the layout
engine's pen positions exactly.

Wire format: Apple TrueType Reference Manual, "The 'kerx' table".
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from fontrx.font.morx import _Stx, aat_lookup
from fontrx.font.ttf import BigEndianReader, CorruptedFont
from fontrx.utils.log import get_logger

log = get_logger("Kerx")


def _u16(d: bytes, o: int) -> int:
    return (d[o] << 8) | d[o + 1]


def _u32(d: bytes, o: int) -> int:
    return struct.unpack_from(">I", d, o)[0]


def _s16(v: int) -> int:
    return v - 0x10000 if v & 0x8000 else v


@dataclass(frozen=True, slots=True)
class _Pairs:
    keys: np.ndarray
    values: np.ndarray

    def lookup(self, left, right):
        key = (np.asarray(left, np.uint32) << 16) | np.asarray(
            right, np.uint32)
        if not len(self.keys):
            return np.zeros(np.shape(key), np.int32)
        idx = np.searchsorted(self.keys, key)
        idx = np.clip(idx, 0, len(self.keys) - 1)
        hit = self.keys[idx] == key
        return np.where(hit, self.values[idx], 0).astype(np.int32)


@dataclass(frozen=True, slots=True)
class _ClassMatrix:
    """kerx format 2: class values are ARRAY INDICES (the left lookup
    yields ``row * columnCount``, the right a column index; the value
    is ``array[l + r]``) — unlike the legacy ``kern`` format 2's byte
    offsets.  Pinned against hb_shape on the fixtures."""

    left: dict
    right: dict
    array: np.ndarray

    def lookup(self, left, right):
        left = np.atleast_1d(np.asarray(left, np.int64))
        right = np.atleast_1d(np.asarray(right, np.int64))
        out = np.zeros(left.shape, np.int32)
        for i in range(left.size):
            lv = self.left.get(int(left.flat[i]))
            rv = self.right.get(int(right.flat[i]))
            if lv is None or rv is None:
                continue
            idx = lv + rv
            if 0 <= idx < len(self.array):
                out.flat[i] = int(self.array[idx])
        return out


@dataclass(frozen=True, slots=True)
class _IndexForm:
    """kerx format 6: row values come PREMULTIPLIED by the column
    count (the hb-pinned convention), so the value is simply
    ``vector[row + col]``."""

    rows: dict     # gid -> premultiplied row index
    cols: dict     # gid -> column index
    vector: np.ndarray

    def lookup(self, left, right):
        left = np.atleast_1d(np.asarray(left, np.int64))
        right = np.atleast_1d(np.asarray(right, np.int64))
        out = np.zeros(left.shape, np.int32)
        for i in range(left.size):
            r = self.rows.get(int(left.flat[i]))
            c = self.cols.get(int(right.flat[i]))
            if r is None or c is None:
                continue
            idx = r + c
            if 0 <= idx < len(self.vector):
                out.flat[i] = int(self.vector[idx])
        return out


@dataclass(frozen=True, slots=True)
class _StateKern:
    """kerx format 1: contextual state-machine kerning.  Entries carry
    a value index; ``push`` (0x8000) stacks the current position and
    an action pops positions applying successive FWORDs until one with
    the low bit set terminates the list (the applied value is
    ``v & ~1``).  The hb-pinned pen semantics: each popped position's
    kern inserts into the pen BEFORE that glyph (hb applies it to both
    x_offset and x_advance, which is the same displacement)."""

    stx: object
    value_off: int

    def deltas(self, gids) -> np.ndarray:
        """Per-position pen deltas for one glyph stream."""
        out = np.zeros(len(gids), np.int32)
        d = self.stx.data
        stack: list[int] = []

        def handler(i, entry):
            _new, flags, value_index = entry
            if flags & 0x8000 and i < len(gids):  # push
                stack.append(i)
            if value_index != 0xFFFF:
                p = self.value_off + 2 * value_index
                for _ in range(16):
                    if p + 2 > len(d) or not stack:
                        break
                    v = _s16(_u16(d, p))
                    p += 2
                    pos = stack.pop()
                    out[pos] += v & ~1
                    if v & 1:
                        break

        try:
            self.stx.run(list(gids), 1, handler)
        except (CorruptedFont, IndexError) as e:
            log.warning("kerx state machine unusable: %s", e)
        return out

    def lookup(self, left, right):
        # pairwise interface: contextual kerning contributes through
        # ``deltas`` instead
        return np.zeros(np.shape(np.asarray(left)), np.int32)


def parse_ankr(data: bytes, base: int = 0) -> dict:
    """AAT anchor-point table -> {gid: [(x, y), ...]} (consumed by
    kerx format 4)."""
    if base + 12 > len(data):
        raise CorruptedFont("ankr header truncated")
    lookup_off = _u32(data, base + 4)
    glyph_data_off = _u32(data, base + 8)
    lut = aat_lookup(data, base + lookup_off)
    out: dict = {}
    for gid, off in lut.items():
        p = base + glyph_data_off + off
        if p + 4 > len(data):
            continue
        n = _u32(data, p)
        if n > 64:
            continue
        pts = []
        for k in range(n):
            q = p + 4 + 4 * k
            if q + 4 > len(data):
                break
            pts.append((_s16(_u16(data, q)), _s16(_u16(data, q + 2))))
        out[gid] = pts
    return out


@dataclass(frozen=True, slots=True)
class _AnchorAttach:
    """kerx format 4: anchor attachment.  The machine marks a glyph;
    an action aligns the CURRENT glyph's anchor to the marked glyph's
    (a pure position offset — the pen advances normally, the
    hb-pinned semantics).  Action types: 1 = ankr anchor indices,
    2 = direct FWORD coordinate pairs; type 0 (outline control
    points) is skipped with a notice."""

    stx: object
    action_type: int
    action_off: int
    anchors: dict     # from ankr (type 1)

    def offsets(self, gids, pens):
        """Per-position (dx, dy) placement offsets; ``pens`` are the
        layout's ACTUAL pen positions per glyph (pair kerning /
        tracking included — hb attaches after its kerning passes)."""
        n = len(gids)
        dx = np.zeros(n, np.int32)
        dy = np.zeros(n, np.int32)
        if self.action_type in (0, 3):
            log.info("kerx format 4 action type %d skipped",
                     self.action_type)
            return dx, dy
        d = self.stx.data
        pens = np.asarray(pens, np.int64)
        marked = {"i": None}

        def anchor(gid, idx):
            pts = self.anchors.get(gid)
            if pts and 0 <= idx < len(pts):
                return pts[idx]
            return None

        def handler(i, entry):
            _new, flags, action_index = entry
            if action_index != 0xFFFF and marked["i"] is not None \
                    and i < n:
                mi = marked["i"]
                if self.action_type == 1:
                    p = self.action_off + 4 * action_index
                    if p + 4 <= len(d):
                        ma = anchor(gids[mi], _u16(d, p))
                        ca = anchor(gids[i], _u16(d, p + 2))
                        if ma and ca:
                            dx[i] = (pens[mi] + dx[mi] + ma[0]
                                     - pens[i] - ca[0])
                            dy[i] = dy[mi] + ma[1] - ca[1]
                else:  # coordinates: markedX markedY currentX currentY
                    p = self.action_off + 8 * action_index
                    if p + 8 <= len(d):
                        mx = _s16(_u16(d, p))
                        my = _s16(_u16(d, p + 2))
                        cx = _s16(_u16(d, p + 4))
                        cy = _s16(_u16(d, p + 6))
                        dx[i] = (pens[mi] + dx[mi] + mx
                                 - pens[i] - cx)
                        dy[i] = dy[mi] + my - cy
            if flags & 0x8000:  # mark
                marked["i"] = i

        try:
            self.stx.run(list(gids), 1, handler)
        except (CorruptedFont, IndexError) as e:
            log.warning("kerx anchor machine unusable: %s", e)
        return dx, dy

    def lookup(self, left, right):
        return np.zeros(np.shape(np.asarray(left)), np.int32)


@dataclass(frozen=True, slots=True)
class KerxTable:
    """Parsed horizontal ``kerx`` kerning; ``lookup`` matches the
    legacy :class:`fontrx.font.ttf.KernTable` interface so the layout
    engine consumes either transparently."""

    forms: tuple

    @classmethod
    def parse(cls, r: BigEndianReader,
              ankr: "BigEndianReader | None" = None) -> "KerxTable | None":
        anchors: dict = {}
        if ankr is not None:
            try:
                anchors = parse_ankr(ankr.data, ankr.pos)
            except (CorruptedFont, IndexError, struct.error) as e:
                log.warning("ankr table unusable: %s", e)
        d = r.data
        base = r.pos
        if base + 8 > len(d):
            raise CorruptedFont("kerx header truncated")
        n_tables = _u32(d, base + 4)
        if n_tables > 64:
            raise CorruptedFont(f"kerx table count {n_tables}")
        forms = []
        p = base + 8
        for _ in range(n_tables):
            if p + 12 > len(d):
                break
            length = _u32(d, p)
            coverage = _u32(d, p + 4)
            # tupleCount at p+8 (variation kerning: unsupported, the
            # subtable still frames correctly)
            if length < 12 or p + length > len(d):
                raise CorruptedFont("kerx subtable out of bounds")
            fmt = coverage & 0xFF
            vertical = bool(coverage & 0x80000000)
            cross = bool(coverage & 0x40000000)
            sub = bytes(d[p + 12:p + length])
            p += length
            if vertical or cross:
                continue
            try:
                form = cls._parse_subtable(fmt, sub, anchors)
            except (CorruptedFont, IndexError, struct.error) as e:
                log.warning("kerx subtable unusable: %s", e)
                continue
            if form is not None:
                forms.append(form)
        if not forms:
            return None
        return cls(tuple(forms))

    @staticmethod
    def _parse_subtable(fmt: int, sub: bytes, anchors: dict):
        if fmt == 0:
            n = _u32(sub, 0)
            if 16 + 6 * n > len(sub):
                raise CorruptedFont("kerx pairs truncated")
            raw = np.frombuffer(
                sub, dtype=">u2", count=3 * n, offset=16
            ).astype(np.int64).reshape(-1, 3)
            keys = (raw[:, 0].astype(np.uint32) << 16) | raw[:, 1].astype(
                np.uint32)
            values = raw[:, 2].astype(np.uint16).astype(np.int16)
            order = np.argsort(keys, kind="stable")
            return _Pairs(keys[order], values[order].astype(np.int16))
        if fmt == 2:
            left_off = _u32(sub, 4)
            right_off = _u32(sub, 8)
            arr_off = _u32(sub, 12)
            # offsets are from the START of the subtable (including
            # its 12-byte header, which `sub` excludes)
            left = aat_lookup(sub, left_off - 12)
            right = aat_lookup(sub, right_off - 12)
            start = arr_off - 12
            count = (len(sub) - start) // 2
            arr = np.frombuffer(sub, dtype=">i2", count=count,
                                offset=start).astype(np.int32)
            return _ClassMatrix(left, right, arr)
        if fmt == 6:
            flags = _u32(sub, 0)
            row_off = _u32(sub, 8)
            col_off = _u32(sub, 12)
            arr_off = _u32(sub, 16)
            rows = aat_lookup(sub, row_off - 12)
            cols = aat_lookup(sub, col_off - 12)
            start = arr_off - 12
            if flags & 1:
                count = (len(sub) - start) // 4
                vec = np.frombuffer(sub, dtype=">i4", count=count,
                                    offset=start).astype(np.int32)
            else:
                count = (len(sub) - start) // 2
                vec = np.frombuffer(sub, dtype=">i2", count=count,
                                    offset=start).astype(np.int32)
            return _IndexForm(rows, cols, vec)
        if fmt == 1:
            stx = _Stx.parse(sub, 1)
            return _StateKern(stx, stx.extra[0])
        if fmt == 4:
            stx = _Stx.parse(sub, 1)
            flags_word = stx.extra[0]
            action_type = (flags_word >> 30) & 0x3
            action_off = flags_word & 0x00FFFFFF
            return _AnchorAttach(stx, action_type, action_off, anchors)
        raise CorruptedFont(f"kerx format {fmt}")

    def lookup(self, left, right):
        out = None
        for f in self.forms:
            v = f.lookup(left, right)
            out = v if out is None else out + v
        return out

    def attach_offsets(self, gids, pens):
        """Per-position (dx, dy) placement offsets from format-4
        anchor machines (zeros when the table has none).  ``pens``:
        the actual per-glyph pen positions from the layout walk."""
        dx = np.zeros(len(gids), np.int32)
        dy = np.zeros(len(gids), np.int32)
        for f in self.forms:
            if isinstance(f, _AnchorAttach):
                a, b = f.offsets(gids, pens)
                dx, dy = dx + a, dy + b
        return dx, dy

    def contextual_deltas(self, gids) -> np.ndarray:
        """Per-position pen deltas from format-1 state machines (zero
        when the table has none); the layout engine adds ``delta[i]``
        to the pen BEFORE placing glyph ``i``."""
        out = np.zeros(len(gids), np.int32)
        for f in self.forms:
            if isinstance(f, _StateKern):
                out = out + f.deltas(gids)
        return out
