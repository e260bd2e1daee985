"""AAT extended glyph metamorphosis (``morx``): the Apple shaping
system's substitution table.

Capability extension (the reference has no text shaping at all;
``src/main.zig`` maps codepoints 1:1).  Apple-ecosystem fonts carry
``morx`` instead of (or alongside) GSUB; the engine here implements
the five extended-state-table subtable types over the same glyph
streams the GSUB engine shapes:

- **type 0** rearrangement: the 16 span-rearrangement verbs;
- **type 1** contextual: marked/current per-glyph substitution
  lookups driven by the state machine;
- **type 2** ligature: the component-stack machine (sign-extended
  glyph-index deltas -> component table -> accumulated ligature
  index), chained ligatures included;
- **type 4** noncontextual: a plain AAT lookup mapping;
- **type 5** insertion: marked/current glyph insertion with the
  before/after flags.

Subtables apply in chain order when their ``subFeatureFlags``
intersect the chain's default flags (the default-feature rendering
path — the caller does not select AAT features); glyphs deleted by
the machines (0xFFFF) drop at the end of each chain.  Vertical-only
subtables are skipped in horizontal layout and vice versa;
descending-order subtables process the stream reversed.

The differential oracle is HarfBuzz (``fontrx/native/hb.py``): every
fixture in ``tests/test_morx.py`` pins fontrx's output against
``hb_shape`` on the same bytes.

Wire format: Apple TrueType Reference Manual, "The 'morx' table".
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from fontrx.font.ttf import BigEndianReader, CorruptedFont
from fontrx.utils.log import get_logger

log = get_logger("Morx")

DELETED = 0xFFFF

# extended state table fixed classes
_CLS_EOT, _CLS_OOB, _CLS_DELETED, _CLS_EOL = 0, 1, 2, 3


def _u16(d: bytes, o: int) -> int:
    return (d[o] << 8) | d[o + 1]


def _u32(d: bytes, o: int) -> int:
    return struct.unpack_from(">I", d, o)[0]


def aat_lookup(data: bytes, off: int, value_size: int = 2):
    """Parse an AAT lookup table at ``off`` -> {gid: value} dict.
    Formats 0 is unbounded (no glyph count in the table), so format-0
    callers pass a bounded ``data`` slice; values are u16."""
    fmt = _u16(data, off)
    out: dict[int, int] = {}
    if fmt == 0:
        # simple array: one value per glyph id to the end of data
        n = (len(data) - off - 2) // 2
        for g in range(n):
            out[g] = _u16(data, off + 2 + 2 * g)
        return out
    if fmt == 2:
        unit = _u16(data, off + 2)
        n = _u16(data, off + 4)
        p = off + 12
        for _ in range(n):
            last, first = _u16(data, p), _u16(data, p + 2)
            val = _u16(data, p + 4)
            if first <= last != 0xFFFF:
                for g in range(first, last + 1):
                    out[g] = val
            p += unit
        return out
    if fmt == 4:
        unit = _u16(data, off + 2)
        n = _u16(data, off + 4)
        p = off + 12
        for _ in range(n):
            last, first = _u16(data, p), _u16(data, p + 2)
            voff = _u16(data, p + 4)
            if first <= last != 0xFFFF:
                for k, g in enumerate(range(first, last + 1)):
                    # per the spec the offset is from the START of the
                    # lookup table
                    out[g] = _u16(data, off + voff + 2 * k)
            p += unit
        return out
    if fmt == 6:
        unit = _u16(data, off + 2)
        n = _u16(data, off + 4)
        p = off + 12
        for _ in range(n):
            g = _u16(data, p)
            if g != 0xFFFF:
                out[g] = _u16(data, p + 2)
            p += unit
        return out
    if fmt == 8:
        first = _u16(data, off + 2)
        n = _u16(data, off + 4)
        for k in range(n):
            out[first + k] = _u16(data, off + 6 + 2 * k)
        return out
    if fmt == 10:
        unit = _u16(data, off + 2)
        first = _u16(data, off + 4)
        n = _u16(data, off + 6)
        for k in range(n):
            if unit == 2:
                out[first + k] = _u16(data, off + 8 + unit * k)
            elif unit == 4:
                out[first + k] = _u32(data, off + 8 + unit * k)
            else:
                out[first + k] = data[off + 8 + unit * k]
        return out
    raise CorruptedFont(f"AAT lookup format {fmt}")


@dataclass(frozen=True, slots=True)
class _Stx:
    """Extended state table header + generic driver."""

    data: bytes          # the SUBTABLE's data (offsets are relative)
    n_classes: int
    classes: dict
    state_off: int
    entry_off: int
    extra: tuple         # per-type trailing u32 offsets

    @classmethod
    def parse(cls, data: bytes, n_extra: int) -> "_Stx":
        if len(data) < 16 + 4 * n_extra:
            raise CorruptedFont("morx state table truncated")
        n_classes = _u32(data, 0)
        class_off = _u32(data, 4)
        state_off = _u32(data, 8)
        entry_off = _u32(data, 12)
        extra = tuple(_u32(data, 16 + 4 * k) for k in range(n_extra))
        if not 4 <= n_classes <= 0xFFFF:
            raise CorruptedFont(f"morx class count {n_classes}")
        classes = aat_lookup(data, class_off)
        return cls(data, n_classes, classes, state_off, entry_off, extra)

    def class_of(self, gid: int) -> int:
        if gid == DELETED:
            return _CLS_DELETED
        c = self.classes.get(gid, _CLS_OOB)
        return c if c < self.n_classes else _CLS_OOB

    def entry(self, state: int, klass: int, n_fields: int):
        """(new_state, flags, extra u16 fields...) for one transition.
        Entries are ``2 + n_fields`` u16s in the extended format."""
        d = self.data
        so = self.state_off + (state * self.n_classes + klass) * 2
        if so + 2 > len(d):
            raise CorruptedFont("morx state array out of bounds")
        ei = _u16(d, so)
        eo = self.entry_off + ei * 2 * (2 + n_fields)
        if eo + 2 * (2 + n_fields) > len(d):
            raise CorruptedFont("morx entry table out of bounds")
        return tuple(_u16(d, eo + 2 * k) for k in range(2 + n_fields))

    def run(self, gids: list[int], n_fields: int, handler) -> None:
        """Drive the machine over ``gids`` (mutated in place by the
        handler).  ``handler(i, entry) -> None``; the END-OF-TEXT
        position is passed as ``i == len(gids)``.  ``dontAdvance``
        (flag 0x4000) honors a bounded number of re-entries per
        position (the HarfBuzz safety convention)."""
        state = 0
        i = 0
        stuck = 0
        while i <= len(gids):
            klass = (_CLS_EOT if i == len(gids)
                     else self.class_of(gids[i]))
            entry = self.entry(state, klass, n_fields)
            handler(i, entry)
            state = entry[0]
            if entry[1] & 0x4000 and stuck < 16:  # dontAdvance
                stuck += 1
                continue
            stuck = 0
            i += 1


def _sign16(v: int) -> int:
    return v - 0x10000 if v & 0x8000 else v


@dataclass(frozen=True, slots=True)
class _Subtable:
    kind: int
    coverage: int
    flags: int
    data: bytes
    # parsed-structure memo (state tables / lookups are immutable and
    # re-parsed per apply() otherwise — a per-line cost in layout)
    cache: dict = field(default_factory=dict, compare=False)

    @property
    def vertical_only(self) -> bool:
        return bool(self.coverage & 0x80000000)

    @property
    def both_directions(self) -> bool:
        return bool(self.coverage & 0x20000000)

    @property
    def descending(self) -> bool:
        return bool(self.coverage & 0x40000000)

    def apply(self, gids: list[int]) -> list[int]:
        if self.descending:
            gids = gids[::-1]
        if self.kind == 4:
            lut = self.cache.get("lut")
            if lut is None:
                lut = self.cache["lut"] = aat_lookup(self.data, 0)
            gids = [lut.get(g, g) for g in gids]
        elif self.kind == 0:
            gids = self._rearrangement(gids)
        elif self.kind == 1:
            gids = self._contextual(gids)
        elif self.kind == 2:
            gids = self._ligature(gids)
        elif self.kind == 5:
            gids = self._insertion(gids)
        else:
            log.info("morx subtable type %d unsupported; skipped",
                     self.kind)
        if self.descending:
            gids = gids[::-1]
        return gids

    # -- type 0: rearrangement ------------------------------------------

    def _stx(self, n_extra: int) -> "_Stx":
        stx = self.cache.get("stx")
        if stx is None:
            stx = self.cache["stx"] = _Stx.parse(self.data, n_extra)
        return stx

    def _rearrangement(self, gids: list[int]) -> list[int]:
        stx = self._stx(0)
        first = last = None
        out = list(gids)

        def handler(i, entry):
            nonlocal first, last
            _new, flags = entry
            if flags & 0x8000:      # markFirst
                first = i
            if flags & 0x2000:      # markLast
                last = i
            verb = flags & 0x000F
            if verb and first is not None:
                end = (last if last is not None else i - 1) + 1
                _rearrange(out, first, end, verb)
                first = last = None

        stx.run(out, 0, handler)
        return out

    # -- type 1: contextual ---------------------------------------------

    def _contextual(self, gids: list[int]) -> list[int]:
        stx = self._stx(1)
        sub_base = stx.extra[0]
        out = list(gids)
        mark = 0
        mark_set = False
        luts = self.cache.setdefault("ctx_luts", {})

        def lut(idx: int) -> dict:
            if idx not in luts:
                off = sub_base + _u32(self.data, sub_base + 4 * idx)
                luts[idx] = aat_lookup(self.data, off)
            return luts[idx]

        def handler(i, entry):
            nonlocal mark, mark_set
            _new, flags, mark_index, cur_index = entry
            # a marked substitution before any setMark fired is a
            # no-op (the HarfBuzz mark_set guard)
            if mark_index != 0xFFFF and mark_set and mark < len(out):
                g = lut(mark_index).get(out[mark])
                if g is not None:
                    out[mark] = g
            if cur_index != 0xFFFF and i < len(out):
                g = lut(cur_index).get(out[i])
                if g is not None:
                    out[i] = g
            if flags & 0x8000:      # setMark
                mark = i
                mark_set = True

        stx.run(out, 2, handler)
        return out

    # -- type 2: ligature -------------------------------------------------

    def _ligature(self, gids: list[int]) -> list[int]:
        stx = self._stx(3)
        action_off, comp_off, lig_off = stx.extra
        out = list(gids)
        stack: list[int] = []

        def handler(i, entry):
            _new, flags, action_index = entry
            if flags & 0x8000 and i < len(out):   # setComponent
                stack.append(i)
            if flags & 0x2000:                    # performAction
                self._run_lig_actions(
                    out, stack, action_off, comp_off, lig_off,
                    action_index)

        stx.run(out, 1, handler)
        # DELETED glyphs stay in the stream until the END of the
        # chain (later subtables see them as class 2, like hb)
        return out

    def _run_lig_actions(self, out, stack, action_off, comp_off,
                         lig_off, action_index):
        d = self.data
        accumulated = 0
        p = action_off + 4 * action_index
        for _ in range(64):  # ligatures are short; bound the walk
            if p + 4 > len(d) or not stack:
                return
            action = _u32(d, p)
            p += 4
            pos = stack.pop()
            offset = action & 0x3FFFFFFF
            if offset & 0x20000000:
                offset -= 0x40000000  # sign-extend 30 bits
            idx = out[pos] + offset
            co = comp_off + 2 * idx
            if not 0 <= co <= len(d) - 2:
                return
            accumulated += _sign16(_u16(d, co))
            if action & 0xC0000000:  # store or last
                lo = lig_off + 2 * accumulated
                if 0 <= lo <= len(d) - 2:
                    out[pos] = _u16(d, lo)
                    # the ligature position goes back on the stack so
                    # chained ligatures (ffi = f + fi) keep forming —
                    # the HarfBuzz convention, pinned by the oracle
                    stack.append(pos)
                accumulated = 0
            else:
                out[pos] = DELETED
            if action & 0x80000000:  # last
                return

    # -- type 5: insertion -------------------------------------------------

    def _insertion(self, gids: list[int]) -> list[int]:
        stx = self._stx(1)
        ins_off = stx.extra[0]
        d = self.data
        out = list(gids)
        mark = 0

        def insert(pos: int, index: int, count: int, before: bool):
            if index == 0xFFFF or count == 0:
                return 0
            glyphs = []
            for k in range(count):
                o = ins_off + 2 * (index + k)
                if o + 2 > len(d):
                    break
                glyphs.append(_u16(d, o))
            at = pos if before else pos + 1
            out[at:at] = glyphs
            return len(glyphs)

        # positions shift as glyphs insert; ``shift`` maps the
        # machine's index over the ORIGINAL stream to the mutating
        # output list (inserted glyphs are not reprocessed; every
        # semantic here is pinned against hb_shape on the fixtures)
        shift = 0

        def handler(mi, entry):
            nonlocal mark, shift
            i = mi + shift           # current glyph's position in out
            _new, flags, cur_index, marked_index = entry
            if marked_index != 0xFFFF and out and mark < len(out):
                before = bool(flags & 0x0400)
                n = insert(mark, marked_index, flags & 0x001F, before)
                if n:
                    shift += n       # future positions sit after mark
                    if before:
                        if mark <= i:
                            i += n
                        mark += n
                    elif mark < i:
                        i += n
            if cur_index != 0xFFFF and i < len(out):
                before = bool(flags & 0x0800)
                n2 = insert(i, cur_index, (flags >> 5) & 0x001F,
                            before)
                if n2:
                    shift += n2
                    if before:
                        i += n2
            if flags & 0x8000:
                mark = i

        stx.run(list(gids), 2, handler)
        return out


def _rearrange(buf: list, start: int, end: int, verb: int) -> None:
    """Apply one of the 16 rearrangement verbs to ``buf[start:end]``
    in place (Apple morx spec table; A/B = leading, C/D = trailing)."""
    seg = buf[start:end]
    n = len(seg)
    if n < 2:
        return
    v = verb
    if v == 1 and n >= 1:          # Ax -> xA
        seg = seg[1:] + seg[:1]
    elif v == 2:                   # xD -> Dx
        seg = seg[-1:] + seg[:-1]
    elif v == 3:                   # AxD -> DxA
        seg = seg[-1:] + seg[1:-1] + seg[:1]
    elif v == 4 and n >= 2:        # ABx -> xAB
        seg = seg[2:] + seg[:2]
    elif v == 5 and n >= 2:        # ABx -> xBA
        seg = seg[2:] + [seg[1], seg[0]]
    elif v == 6 and n >= 2:        # xCD -> CDx
        seg = seg[-2:] + seg[:-2]
    elif v == 7 and n >= 2:        # xCD -> DCx
        seg = [seg[-1], seg[-2]] + seg[:-2]
    elif v == 8 and n >= 3:        # AxCD -> CDxA
        seg = seg[-2:] + seg[1:-2] + seg[:1]
    elif v == 9 and n >= 3:        # AxCD -> DCxA
        seg = [seg[-1], seg[-2]] + seg[1:-2] + seg[:1]
    elif v == 10 and n >= 3:       # ABxD -> DxAB
        seg = seg[-1:] + seg[2:-1] + seg[:2]
    elif v == 11 and n >= 3:       # ABxD -> DxBA
        seg = seg[-1:] + seg[2:-1] + [seg[1], seg[0]]
    elif v == 12 and n >= 4:       # ABxCD -> CDxAB
        seg = seg[-2:] + seg[2:-2] + seg[:2]
    elif v == 13 and n >= 4:       # ABxCD -> CDxBA
        seg = seg[-2:] + seg[2:-2] + [seg[1], seg[0]]
    elif v == 14 and n >= 4:       # ABxCD -> DCxAB
        seg = [seg[-1], seg[-2]] + seg[2:-2] + seg[:2]
    elif v == 15 and n >= 4:       # ABxCD -> DCxBA
        seg = [seg[-1], seg[-2]] + seg[2:-2] + [seg[1], seg[0]]
    else:
        return
    buf[start:end] = seg


@dataclass(frozen=True, slots=True)
class MorxTable:
    """Parsed ``morx``: chains of subtables, applied with each chain's
    default feature flags (AAT feature selection is not exposed —
    the default-on rendering path, which is what hb_shape does with
    no features either)."""

    chains: tuple  # ((default_flags, feature_entries, (subtables...)), ...)
    # feature_entries: ((type, setting, enable_mask, disable_mask), ...)

    @classmethod
    def parse(cls, r: BigEndianReader) -> "MorxTable":
        base = r.pos
        d = r.data
        version = _u16(d, base)
        n_chains = _u32(d, base + 4)
        if version < 2 or n_chains > 64:
            raise CorruptedFont(
                f"morx version {version} / {n_chains} chains")
        chains = []
        p = base + 8
        for _ in range(n_chains):
            if p + 16 > len(d):
                raise CorruptedFont("morx chain truncated")
            default_flags = _u32(d, p)
            chain_len = _u32(d, p + 4)
            n_feats = _u32(d, p + 8)
            n_subs = _u32(d, p + 12)
            if chain_len < 16 or p + chain_len > len(d):
                raise CorruptedFont("morx chain length out of bounds")
            feats = []
            for k in range(min(n_feats, 512)):
                fp = p + 16 + 12 * k
                if fp + 12 > len(d):
                    break
                feats.append((_u16(d, fp), _u16(d, fp + 2),
                              _u32(d, fp + 4), _u32(d, fp + 8)))
            q = p + 16 + 12 * n_feats
            subs = []
            for _ in range(min(n_subs, 512)):
                if q + 12 > p + chain_len:
                    break
                sub_len = _u32(d, q)
                coverage = _u32(d, q + 4)
                sub_flags = _u32(d, q + 8)
                if sub_len < 12 or q + sub_len > p + chain_len:
                    raise CorruptedFont("morx subtable out of bounds")
                subs.append(_Subtable(
                    kind=coverage & 0xFF,
                    coverage=coverage,
                    flags=sub_flags,
                    data=bytes(d[q + 12:q + sub_len]),
                ))
                q += sub_len
            chains.append((default_flags, tuple(feats), tuple(subs)))
            p += chain_len
        return cls(tuple(chains))

    def apply(self, gids: list[int], vertical: bool = False,
              features=()) -> list[int]:
        """Run every enabled subtable over the glyph stream; deleted
        glyphs drop after each chain.

        ``features``: AAT ``(featureType, featureSetting)`` selectors
        layered over the chain defaults — each matching feature entry
        rewrites the enable mask per the spec
        (``flags = (flags & disable) | enable``, in table order)."""
        out = list(gids)
        for default_flags, feats, subs in self.chains:
            flags = default_flags
            if features:
                want = set(features)
                for ftype, fsetting, enable, disable in feats:
                    if (ftype, fsetting) in want:
                        flags = (flags & disable) | enable
            for sub in subs:
                if not (sub.flags & flags):
                    continue
                if sub.vertical_only and not vertical and \
                        not sub.both_directions:
                    continue
                if vertical and not sub.vertical_only and \
                        not sub.both_directions:
                    continue
                try:
                    out = sub.apply(out)
                except (CorruptedFont, IndexError, KeyError,
                        struct.error) as e:
                    # corrupt subtables degrade to identity — the
                    # fuzz contract (SURVEY §5.3)
                    log.warning("morx subtable unusable: %s", e)
            out = [g for g in out if g != DELETED]
        return out
