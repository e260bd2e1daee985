"""General GSUB shaping engine — substitution lookup types 1–7.

A capability extension (the reference has no shaping at all; each
codepoint maps straight to one glyph, ``src/Appli.zig:318-341``).
Where :mod:`fontrx.font.gsub` flattens only LigatureSubst subtables
into one preference dict, this module implements the full OpenType
GSUB application model:

- lookups selected by feature tag are applied **in LookupList order**,
  each scanning the whole glyph buffer before the next starts;
- lookup types: 1 single, 2 multiple, 3 alternate (first alternate),
  4 ligature, 5 contextual, 6 chained contextual (all three formats
  of 5/6), 7 extension (unwrapped at parse), 8 reverse chaining
  single substitution (applied in reverse buffer order);
- ``lookupFlag`` glyph skipping (ignoreBase/ignoreLigatures/
  ignoreMarks, markAttachmentType filter, useMarkFilteringSet) via
  :mod:`fontrx.font.gdef` — so e.g. an ``f`` + combining-accent + ``i``
  stream still forms the ``fi`` ligature under an ignore-marks lookup,
  with the mark kept in the buffer after the ligature glyph;
- contextual SubstLookupRecords apply nested lookups at the matched
  positions, with position bookkeeping across length changes and a
  recursion depth cap against cyclic fonts.

Script/language-system selection (round 3): the ScriptList parses
into per-script/per-LangSys feature sets; ``apply(script=...)``
selects lookups through the script entry (required feature included,
DFLT/latn fallbacks) and the layout engine itemizes text into script
runs, while plain ``apply()`` keeps the tag-global scan for
ScriptList-less fonts.  Alternate substitution (type 3) picks
``alt_index`` (shaper field, default 0) — the salt/aalt selection
knob, surfaced as ``layout_text(alternate=)`` / ``--alternate``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from fontrx.font.gdef import GdefTable
from fontrx.font.gpos import ClassDef, Coverage
from fontrx.utils.reader import BigEndianReader

_MAX_NESTING = 6          # contextual recursion cap (malicious fonts)
_GSUB_EXTENSION = 7


def parse_layout_header(
    r: BigEndianReader, tags: tuple[bytes, ...]
) -> tuple[
    dict[bytes, tuple[int, ...]], set[int], list[int], int,
    tuple[tuple[bytes, tuple[int, ...]], ...],
    dict[bytes, dict[bytes, tuple[int | None, tuple[int, ...]]]],
] | None:
    """Parse the shared GSUB/GPOS header + ScriptList + FeatureList +
    LookupList index (the two tables have byte-identical framing; only
    subtable contents differ).  Returns ``(features,
    selected_lookup_indices, lookup_offsets, lookup_list_base,
    feature_records, scripts)`` or ``None`` for an unsupported major
    version:

    - ``features``: tag -> merged lookup indices (the tag-global view);
    - ``feature_records``: the ordered FeatureList — ``(tag, lookup
      indices)`` per feature index, as LangSys tables reference them;
    - ``scripts``: script tag -> {langsys tag (b"dflt" for the default
      LangSys) -> (required feature index or None, feature indices)}.
    """
    base = r.pos
    major, _minor = r.unpack("HH")
    if major != 1:
        return None
    script_off, feature_off, lookup_off = r.unpack("HHH")

    fr = BigEndianReader(r.data, base + feature_off)
    f_base = fr.pos
    n_feat = fr.u16()
    features: dict[bytes, list[int]] = {}
    selected: set[int] = set()
    records: list[tuple[bytes, tuple[int, ...]]] = []
    heads = [(fr.tag(), fr.u16()) for _ in range(n_feat)]
    for tag, off in heads:
        tr = BigEndianReader(r.data, f_base + off)
        tr.skip(2)  # featureParamsOffset
        n_lk = tr.u16()
        idx = tuple(int(i) for i in tr.u16_array(n_lk))
        records.append((tag, idx))
        features.setdefault(tag, []).extend(idx)
        if tag in tags:
            selected.update(idx)

    # ScriptList -> per-script/per-langsys feature selection (the
    # reference has no shaping; harfbuzz semantics: default LangSys
    # under b"dflt")
    scripts: dict[bytes, dict[bytes, tuple[int | None, tuple[int, ...]]]]
    scripts = {}
    sr = BigEndianReader(r.data, base + script_off)
    s_base = sr.pos
    n_scripts = sr.u16()
    s_heads = [(sr.tag(), sr.u16()) for _ in range(n_scripts)]

    def parse_langsys(pos: int):
        lsr = BigEndianReader(r.data, pos)
        lsr.skip(2)  # lookupOrderOffset (reserved)
        req = lsr.u16()
        n_fi = lsr.u16()
        fi = tuple(int(i) for i in lsr.u16_array(n_fi))
        return (None if req == 0xFFFF else req, fi)

    for s_tag, s_off in s_heads:
        tr = BigEndianReader(r.data, s_base + s_off)
        t_base = tr.pos
        dflt_off = tr.u16()
        n_ls = tr.u16()
        entry: dict[bytes, tuple[int | None, tuple[int, ...]]] = {}
        if dflt_off:
            entry[b"dflt"] = parse_langsys(t_base + dflt_off)
        for _ in range(n_ls):
            ls_tag = tr.tag()
            ls_off = tr.u16()
            entry[ls_tag] = parse_langsys(t_base + ls_off)
        scripts[s_tag] = entry

    lr = BigEndianReader(r.data, base + lookup_off)
    l_base = lr.pos
    n_lookups = lr.u16()
    lookup_offsets = [int(o) for o in lr.u16_array(n_lookups)]
    return (
        {k: tuple(v) for k, v in features.items()},
        {i for i in selected if i < n_lookups},
        lookup_offsets,
        l_base,
        tuple(records),
        scripts,
    )


@dataclass(frozen=True, slots=True)
class _Single:
    """Type 1: format 1 is a delta over the coverage, format 2 an
    explicit substitute per coverage index."""

    coverage: Coverage
    delta: int | None
    substitutes: tuple[int, ...] | None

    def sub_for(self, gid: int) -> int | None:
        ci = int(self.coverage.rank([gid])[0])
        if ci < 0:
            return None
        if self.delta is not None:
            return (gid + self.delta) & 0xFFFF
        if self.substitutes is not None and ci < len(self.substitutes):
            return self.substitutes[ci]
        return None


@dataclass(frozen=True, slots=True)
class _Multiple:
    """Type 2: one glyph -> a sequence."""

    coverage: Coverage
    sequences: tuple[tuple[int, ...], ...]

    def seq_for(self, gid: int) -> tuple[int, ...] | None:
        ci = int(self.coverage.rank([gid])[0])
        if 0 <= ci < len(self.sequences):
            return self.sequences[ci]
        return None


@dataclass(frozen=True, slots=True)
class _Alternate:
    """Type 3: alternate sets; ``index`` selects which alternate
    (clamped into the set; default 0 — the common salt/ss01 case)."""

    coverage: Coverage
    alternates: tuple[tuple[int, ...], ...]

    def sub_for(self, gid: int, index: int = 0) -> int | None:
        ci = int(self.coverage.rank([gid])[0])
        if 0 <= ci < len(self.alternates) and self.alternates[ci]:
            alts = self.alternates[ci]
            return alts[min(max(index, 0), len(alts) - 1)]
        return None


@dataclass(frozen=True, slots=True)
class _Ligature:
    glyph: int
    components: tuple[int, ...]  # following glyphs (first excluded)


@dataclass(frozen=True, slots=True)
class _LigatureSubst:
    """Type 4: per-first-glyph ligature lists in set (preference) order."""

    coverage: Coverage
    sets: tuple[tuple[_Ligature, ...], ...]  # by coverage index

    def ligs_for(self, gid: int) -> tuple[_Ligature, ...]:
        ci = int(self.coverage.rank([gid])[0])
        if 0 <= ci < len(self.sets):
            return self.sets[ci]
        return ()


@dataclass(frozen=True, slots=True)
class _ReverseChain:
    """Type 8: reverse chaining contextual single substitution
    (format 1) — the Nastaliq-style lookup.  Applied over the buffer
    in REVERSE glyph order, one 1:1 substitution per position, with
    backtrack/lookahead coverage contexts and no nested lookups."""

    coverage: Coverage
    backtrack: tuple          # Coverage, nearest-first (buf[i-1], ...)
    lookahead: tuple          # Coverage, nearest-first (buf[i+1], ...)
    substitutes: tuple[int, ...]


@dataclass(frozen=True, slots=True)
class _Rule:
    """One (chain) context rule: matcher item sequences + nested
    substitutions.  Items are glyph ids (fmt 1), class ids (fmt 2) or
    Coverage tables (fmt 3); ``input_`` excludes the first glyph for
    formats 1/2 and includes it for format 3."""

    backtrack: tuple
    input_: tuple
    lookahead: tuple
    records: tuple[tuple[int, int], ...]  # (sequence_index, lookup_index)


@dataclass(frozen=True, slots=True)
class _ContextSubst:
    """Types 5/6, all formats, normalized to rule lists.

    - fmt 1: ``coverage`` ranks the first glyph into ``rule_sets``;
      items match by glyph id.
    - fmt 2: like fmt 1 but items are class ids under ``class_defs``
      (input/backtrack/lookahead ClassDefs; type 5 uses one for all).
    - fmt 3: ``rule_sets`` holds exactly one rule whose items are
      Coverage tables; ``coverage`` is that rule's first input coverage.
    """

    fmt: int
    coverage: Coverage
    rule_sets: tuple[tuple[_Rule, ...], ...]
    class_defs: tuple  # (input,) or (backtrack, input, lookahead) for fmt 2

    def rules_for(self, gid: int) -> tuple[_Rule, ...]:
        ci = int(self.coverage.rank([gid])[0])
        if self.fmt == 3:
            return self.rule_sets[0] if ci >= 0 else ()
        if self.fmt == 2 and ci >= 0:
            # rule set is selected by the first glyph's INPUT class
            cls = int(self.class_defs[-2 if len(self.class_defs) == 3
                                      else 0].class_of([gid])[0])
            if 0 <= cls < len(self.rule_sets):
                return self.rule_sets[cls]
            return ()
        if 0 <= ci < len(self.rule_sets):
            return self.rule_sets[ci]
        return ()


@dataclass(frozen=True, slots=True)
class Lookup:
    """One GSUB LookupTable with parsed subtables."""

    type: int
    flags: int
    mark_filter_set: int | None
    subtables: tuple


@dataclass(slots=True)
class GsubShaper:
    """Feature-selected GSUB lookups, applied in LookupList order."""

    lookups: dict[int, Lookup]          # every parsed lookup by index
    order: tuple[int, ...]              # feature-selected, ascending
    gdef: GdefTable | None
    features: dict[bytes, tuple[int, ...]] = field(default_factory=dict)
    # ordered FeatureList (tag, lookup indices) — LangSys tables
    # reference features by index into this
    feature_records: tuple = ()
    # script tag -> {langsys tag | b"dflt" -> (required?, feat indices)}
    scripts: dict = field(default_factory=dict)
    tags: tuple[bytes, ...] = ()
    # which alternate type-3 (AlternateSubst) lookups pick — a
    # user-selection knob (salt/aalt variants); clamped per set
    alt_index: int = 0

    # -- parsing -----------------------------------------------------------

    @classmethod
    def parse(
        cls,
        r: BigEndianReader,
        tags: tuple[bytes, ...],
        gdef: GdefTable | None = None,
    ) -> "GsubShaper | None":
        """Parse the GSUB table, selecting lookups from features whose
        tag is in ``tags``.  Nested lookups referenced by contextual
        rules are parsed on demand during :meth:`apply`."""
        hdr = parse_layout_header(r, tags)
        if hdr is None:
            return None
        features, selected, lookup_offsets, l_base, records, scripts = hdr
        if not selected:
            return None

        shaper = cls(
            lookups={},
            order=tuple(sorted(selected)),
            gdef=gdef,
            features=features,
            feature_records=records,
            scripts=scripts,
            tags=tuple(tags),
        )
        shaper._data = r.data
        shaper._l_base = l_base
        shaper._lookup_offsets = lookup_offsets
        for li in shaper.order:
            shaper._lookup(li)
        return shaper if shaper.order else None

    # extension-lookup type: 7 in GSUB, 9 in GPOS (the one wire-format
    # difference in the otherwise-shared LookupList walk)
    _EXTENSION_TYPE = _GSUB_EXTENSION

    # lazily-parsed lookup storage (nested contextual targets)
    _data: bytes = b""
    _l_base: int = 0
    _lookup_offsets: list[int] = field(default_factory=list)
    # ligature-component side channel (see apply)
    _comp: list | None = None
    last_lig_comps: list | None = None
    # normalized variation coords for GPOS VariationIndex resolution
    # (set by layout from the font's current design location)
    var_coords: "object | None" = None
    # native-walk caches (fontrx/native/gpos_walk.py): flattened int32
    # blob per lookup index (None = ineligible), and the GDEF blob
    # (False = not yet built)
    _native_blobs: dict = field(default_factory=dict)
    _native_gdef: "object" = False

    def _lookup(self, li: int) -> Lookup | None:
        if li in self.lookups:
            return self.lookups[li]
        if not (0 <= li < len(self._lookup_offsets)):
            return None
        self.lookups[li] = None  # cycle guard while parsing
        try:
            tb = BigEndianReader(
                self._data, self._l_base + self._lookup_offsets[li]
            )
            t_base = tb.pos
            lookup_type, flags, n_sub = tb.unpack("HHH")
            sub_offs = [t_base + int(o) for o in tb.u16_array(n_sub)]
            mark_filter = None
            if flags & 0x0010:  # useMarkFilteringSet: trailing u16
                mark_filter = tb.u16()
            subtables = []
            for s_pos in sub_offs:
                s_type = lookup_type
                if s_type == self._EXTENSION_TYPE:
                    er = BigEndianReader(self._data, s_pos)
                    _fmt, ext_type = er.unpack("HH")
                    s_pos, s_type = s_pos + er.u32(), ext_type
                sub = self._parse_subtable(s_type, s_pos)
                if sub is not None:
                    subtables.append((s_type, sub))
        except Exception:
            # a nested lookup reached lazily from a contextual rule may
            # sit in a corrupt region: degrade that lookup to absent
            # (the font-level parse errors are handled by Font.shaper)
            return None
        lk = Lookup(lookup_type, flags, mark_filter, tuple(subtables))
        self.lookups[li] = lk
        return lk

    def _parse_subtable(self, s_type: int, s_pos: int):
        r = BigEndianReader(self._data, s_pos)
        base = r.pos
        if s_type == 1:
            fmt, cov_off = r.unpack("HH")
            cov = Coverage.parse(BigEndianReader(r.data, base + cov_off))
            if fmt == 1:
                delta = r.i16()
                return _Single(cov, delta, None)
            if fmt == 2:
                n = r.u16()
                subs = tuple(int(g) for g in r.u16_array(n))
                return _Single(cov, None, subs)
            return None
        if s_type == 2:
            fmt, cov_off, n = r.unpack("HHH")
            if fmt != 1:
                return None
            cov = Coverage.parse(BigEndianReader(r.data, base + cov_off))
            seqs = []
            for off in r.u16_array(n):
                sr = BigEndianReader(r.data, base + int(off))
                cnt = sr.u16()
                seqs.append(tuple(int(g) for g in sr.u16_array(cnt)))
            return _Multiple(cov, tuple(seqs))
        if s_type == 3:
            fmt, cov_off, n = r.unpack("HHH")
            if fmt != 1:
                return None
            cov = Coverage.parse(BigEndianReader(r.data, base + cov_off))
            alts = []
            for off in r.u16_array(n):
                ar = BigEndianReader(r.data, base + int(off))
                cnt = ar.u16()
                alts.append(tuple(int(g) for g in ar.u16_array(cnt)))
            return _Alternate(cov, tuple(alts))
        if s_type == 4:
            fmt, cov_off, n_sets = r.unpack("HHH")
            if fmt != 1:
                return None
            cov = Coverage.parse(BigEndianReader(r.data, base + cov_off))
            sets = []
            for so in r.u16_array(n_sets):
                sr = BigEndianReader(r.data, base + int(so))
                set_base = sr.pos
                n_ligs = sr.u16()
                ligs = []
                for lo in sr.u16_array(n_ligs):
                    gr = BigEndianReader(r.data, set_base + int(lo))
                    lig_glyph, comp_count = gr.unpack("HH")
                    comps = tuple(
                        int(x) for x in gr.u16_array(max(comp_count - 1, 0))
                    )
                    ligs.append(_Ligature(lig_glyph, comps))
                sets.append(tuple(ligs))
            return _LigatureSubst(cov, tuple(sets))
        if s_type == 5:
            return parse_context_subtable(r, base, chained=False)
        if s_type == 6:
            return parse_context_subtable(r, base, chained=True)
        if s_type == 8:
            fmt, cov_off = r.unpack("HH")
            if fmt != 1:
                return None
            cov = Coverage.parse(BigEndianReader(r.data, base + cov_off))
            n_bt = r.u16()
            bt = tuple(
                Coverage.parse(BigEndianReader(r.data, base + int(o)))
                for o in r.u16_array(n_bt)
            )
            n_la = r.u16()
            la = tuple(
                Coverage.parse(BigEndianReader(r.data, base + int(o)))
                for o in r.u16_array(n_la)
            )
            n_sub = r.u16()
            subs = tuple(int(g) for g in r.u16_array(n_sub))
            return _ReverseChain(cov, bt, la, subs)
        return None

    # -- application -------------------------------------------------------

    def _skips(self, gid: int, lookup: Lookup) -> bool:
        if self.gdef is None:
            return False
        return self.gdef.skips(gid, lookup.flags, lookup.mark_filter_set)

    def _next(self, buf: list[int], j: int, lookup: Lookup) -> int | None:
        j += 1
        while j < len(buf):
            if not self._skips(buf[j], lookup):
                return j
            j += 1
        return None

    def _prev(self, buf: list[int], j: int, lookup: Lookup) -> int | None:
        j -= 1
        while j >= 0:
            if not self._skips(buf[j], lookup):
                return j
            j -= 1
        return None

    @staticmethod
    def _item_matches(gid: int, item, class_def: ClassDef | None) -> bool:
        if isinstance(item, Coverage):
            return int(item.rank([gid])[0]) >= 0
        if class_def is not None:
            return int(class_def.class_of([gid])[0]) == item
        return gid == item

    def _match_forward(
        self, buf, start, items, lookup, class_def
    ) -> list[int] | None:
        """Positions of ``items`` matched at successive non-skipped
        glyphs from ``start`` (exclusive)."""
        out: list[int] = []
        j = start
        for item in items:
            j = self._next(buf, j, lookup)
            if j is None or not self._item_matches(buf[j], item, class_def):
                return None
            out.append(j)
        return out

    def _match_backward(self, buf, start, items, lookup, class_def) -> bool:
        j = start
        for item in items:
            j = self._prev(buf, j, lookup)
            if j is None or not self._item_matches(buf[j], item, class_def):
                return False
        return True

    def _context_rules(self, sub: _ContextSubst, gid: int):
        """(rules, class_def triple) applicable at a first glyph —
        shared by the GSUB and GPOS contextual appliers."""
        in_cd = la_cd = bt_cd = None
        if sub.fmt == 2:
            if len(sub.class_defs) == 3:
                bt_cd, in_cd, la_cd = sub.class_defs
            else:
                in_cd = la_cd = bt_cd = sub.class_defs[0]
        return sub.rules_for(gid), bt_cd, in_cd, la_cd


    # -- script/language-system selection (VERDICT r2 item 3) --------------

    def langsys_features(
        self, script: bytes | None, lang: bytes | None = None
    ) -> tuple[int | None, tuple[int, ...]] | None:
        """The (required feature index, feature indices) of the given
        script+langsys, with OpenType fallbacks: explicit langsys ->
        script's default LangSys; explicit script -> DFLT -> latn.
        ``None`` when the ScriptList offers nothing for the script
        (callers then fall back to the tag-global scan)."""
        if not self.scripts:
            return None
        entry = None
        for s in (script, b"DFLT", b"latn"):
            if s is not None and s in self.scripts:
                entry = self.scripts[s]
                break
        if entry is None:
            return None
        ls = None
        if lang is not None and lang in entry:
            ls = entry[lang]
        elif b"dflt" in entry:
            ls = entry[b"dflt"]
        elif entry:
            ls = next(iter(entry.values()))
        return ls

    def lookup_indices_for(
        self,
        tags: tuple[bytes, ...],
        script: bytes | None = None,
        lang: bytes | None = None,
    ) -> list[int]:
        """Lookup indices (ascending) for the feature tags as selected
        by the script/language system: only features the LangSys
        references participate, and its required feature (whatever its
        tag) always does.  Falls back to the tag-global scan when the
        font's ScriptList has no entry to consult (or ``script`` is
        None, preserving the round-2 behavior)."""
        ls = self.langsys_features(script, lang) if script else None
        if ls is None:
            return sorted({
                li for t in tags for li in self.features.get(t, ())
            })
        req, fis = ls
        out: set[int] = set()
        n = len(self.feature_records)
        if req is not None and req < n:
            out.update(self.feature_records[req][1])
        for fi in fis:
            if fi < n:
                tag, lks = self.feature_records[fi]
                if tag in tags:
                    out.update(lks)
        return sorted(out)

    def apply(
        self,
        glyphs: list[int],
        script: bytes | None = None,
        lang: bytes | None = None,
    ) -> list[int]:
        """Run the selected lookups, in LookupList order, over a copy
        of the glyph-id stream.  With ``script`` given, the lookup set
        comes from that script's language system (plus its required
        feature) instead of the tag-global scan."""
        if script is not None:
            order = self.lookup_indices_for(self.tags, script, lang)
        else:
            order = self.order
        buf = list(glyphs)
        # ligature-component tracking: comp[k] > 0 marks a glyph
        # (typically a combining mark) that rode INSIDE a formed
        # ligature, recording which component it followed — consumed
        # by GPOS mark-to-ligature attachment (type 5)
        self._comp = [0] * len(buf)
        self._apply_sub_order(buf, order)
        self.last_lig_comps = self._comp
        self._comp = None
        return buf

    def apply_features(
        self, glyphs: list[int], tags: tuple[bytes, ...]
    ) -> list[int]:
        """Like :meth:`apply` but with an ad-hoc feature-tag subset of
        this shaper's table (tags outside the parsed set are ignored)."""
        order = sorted({
            li for t in tags for li in self.features.get(t, ())
        })
        buf = list(glyphs)
        self._comp = [0] * len(buf)
        self._apply_sub_order(buf, order)
        self.last_lig_comps = self._comp
        self._comp = None
        return buf

    def _apply_sub_order(self, buf: list[int], order) -> None:
        """Apply lookups in LookupList order, each through the native
        walk (fontrx/native/gsub_walk.py — byte-identical for the
        single/alternate/ligature types) when eligible, else the
        Python walk.  The buffer/comp arrays live in one SubRun across
        consecutive native lookups."""
        from fontrx.native import gsub_walk

        run = None
        tried = False
        for li in order:
            lk = self._lookup(li)
            if not lk:
                continue
            if not tried:
                tried = True
                run = gsub_walk.start_run(self)
            if run is not None and gsub_walk.apply_lookup(
                    self, li, lk, run, buf, self._comp):
                continue
            if run is not None:
                run.push(buf, self._comp)
            self._apply_lookup(buf, lk, depth=0)
        if run is not None:
            run.push(buf, self._comp)

    def _apply_lookup(self, buf: list[int], lookup: Lookup, depth: int) -> None:
        if any(st == 8 for st, _ in lookup.subtables):
            # type 8 applies in REVERSE buffer order (spec: the
            # substitution at each position must see the ALREADY
            # SUBSTITUTED glyphs to its right, as Nastaliq chains
            # require); substitutions are 1:1 so positions are stable
            for i in range(len(buf) - 1, -1, -1):
                if self._skips(buf[i], lookup):
                    continue
                for st, sub in lookup.subtables:
                    if st != 8:
                        continue
                    ci = int(sub.coverage.rank([buf[i]])[0])
                    if not (0 <= ci < len(sub.substitutes)):
                        continue
                    if sub.backtrack and not self._match_backward(
                            buf, i, sub.backtrack, lookup, None):
                        continue
                    if sub.lookahead and self._match_forward(
                            buf, i, sub.lookahead, lookup, None) is None:
                        continue
                    buf[i] = sub.substitutes[ci]
                    break
            return
        i = 0
        while i < len(buf):
            if self._skips(buf[i], lookup):
                i += 1
                continue
            nxt = self._apply_at(buf, i, lookup, depth)
            i = nxt if nxt is not None else i + 1

    def _apply_at(
        self, buf: list[int], i: int, lookup: Lookup, depth: int
    ) -> int | None:
        """Try the lookup's subtables (first match wins) at position
        ``i``; mutate ``buf`` and return the next scan position, or
        ``None`` when nothing applied."""
        gid = buf[i]
        for s_type, sub in lookup.subtables:
            if s_type == 1:
                new = sub.sub_for(gid)
                if new is not None:
                    buf[i] = new
                    return i + 1
            elif s_type == 2:
                seq = sub.seq_for(gid)
                if seq is not None:
                    buf[i : i + 1] = list(seq)
                    if getattr(self, "_comp", None) is not None:
                        self._comp[i : i + 1] = [0] * len(seq)
                    # an empty sequence deletes the glyph; either way
                    # scanning resumes after the inserted run
                    return i + len(seq) if seq else i
            elif s_type == 3:
                new = sub.sub_for(gid, self.alt_index)
                if new is not None:
                    buf[i] = new
                    return i + 1
            elif s_type == 4:
                nxt = self._apply_ligature(buf, i, lookup, sub)
                if nxt is not None:
                    return nxt
            elif s_type in (5, 6):
                nxt = self._apply_context(buf, i, lookup, sub, depth)
                if nxt is not None:
                    return nxt
        return None

    def _apply_ligature(
        self, buf: list[int], i: int, lookup: Lookup, sub: _LigatureSubst
    ) -> int | None:
        for lig in sub.ligs_for(buf[i]):
            pos = self._match_forward(buf, i, lig.components, lookup, None)
            if pos is None:
                continue
            buf[i] = lig.glyph
            comp = getattr(self, "_comp", None)
            if comp is not None:
                # glyphs SKIPPED between matched components (marks
                # under ignoreMarks) record which component they
                # followed: positions in (i, pos[0]) followed the
                # first, (pos[k-1], pos[k]) the (k+1)-th
                comp[i] = 0
                bounds = [i] + pos
                for k in range(len(bounds) - 1):
                    for q in range(bounds[k] + 1, bounds[k + 1]):
                        comp[q] = k + 1
            # delete matched components back-to-front; skipped glyphs
            # (e.g. marks under ignoreMarks) remain, ending up after
            # the ligature glyph
            for p in reversed(pos):
                del buf[p]
                if comp is not None:
                    del comp[p]
            return i + 1
        return None

    def _apply_context(
        self, buf: list[int], i: int, lookup: Lookup,
        sub: _ContextSubst, depth: int,
    ) -> int | None:
        if depth >= _MAX_NESTING:
            return None
        rules, bt_cd, in_cd, la_cd = self._context_rules(sub, buf[i])
        for rule in rules:
            if sub.fmt == 3:
                # input items include the first glyph (already known to
                # be covered through rules_for); match the rest
                items = rule.input_[1:]
            else:
                items = rule.input_
            pos = self._match_forward(buf, i, items, lookup, in_cd)
            if pos is None:
                continue
            all_pos = [i] + pos
            if rule.lookahead and self._match_forward(
                buf, all_pos[-1], rule.lookahead, lookup, la_cd
            ) is None:
                continue
            if rule.backtrack and not self._match_backward(
                buf, i, rule.backtrack, lookup, bt_cd
            ):
                continue
            # matched: apply nested substitutions at the matched input
            # positions, shifting later positions as lengths change
            end = all_pos[-1] + 1
            for seq_idx, lk_idx in rule.records:
                if not (0 <= seq_idx < len(all_pos)):
                    continue
                nested = self._lookup(lk_idx)
                if nested is None:
                    continue
                p = all_pos[seq_idx]
                before = len(buf)
                self._apply_at(buf, p, nested, depth + 1)
                delta = len(buf) - before
                if delta:
                    for k in range(len(all_pos)):
                        if all_pos[k] > p:
                            all_pos[k] += delta
                    end += delta
            return max(end, i + 1)
        return None


def parse_context_subtable(r: BigEndianReader, base: int, chained: bool):
    """Parse a (Chain)Context subtable — identical wire format in GSUB
    (types 5/6) and GPOS (types 7/8); the nested records are
    ``(sequence_index, lookup_index)`` pairs in both."""
    fmt = r.u16()
    data = r.data

    def records(rr: BigEndianReader, n: int):
        return tuple(
            (int(a), int(b))
            for a, b in zip(*[iter(rr.u16_array(2 * n).tolist())] * 2)
        )

    if fmt in (1, 2):
        cov_off = r.u16()
        cov = Coverage.parse(BigEndianReader(data, base + cov_off))
        class_defs: tuple = ()
        if fmt == 2:
            if chained:
                bt_off, in_off, la_off = r.unpack("HHH")
                class_defs = tuple(
                    ClassDef.parse(BigEndianReader(data, base + off))
                    if off else ClassDef.parse(
                        BigEndianReader(b"\x00\x02\x00\x00", 0))
                    for off in (bt_off, in_off, la_off)
                )
            else:
                cd_off = r.u16()
                class_defs = (
                    ClassDef.parse(BigEndianReader(data, base + cd_off)),
                )
        n_sets = r.u16()
        rule_sets = []
        for so in r.u16_array(n_sets):
            if not so:
                rule_sets.append(())
                continue
            sr = BigEndianReader(data, base + int(so))
            set_base = sr.pos
            n_rules = sr.u16()
            rules = []
            for ro in sr.u16_array(n_rules):
                rr = BigEndianReader(data, set_base + int(ro))
                if chained:
                    n_bt = rr.u16()
                    bt = tuple(int(x) for x in rr.u16_array(n_bt))
                    n_in = rr.u16()
                    inp = tuple(
                        int(x) for x in rr.u16_array(max(n_in - 1, 0))
                    )
                    n_la = rr.u16()
                    la = tuple(int(x) for x in rr.u16_array(n_la))
                    n_rec = rr.u16()
                else:
                    n_in, n_rec = rr.unpack("HH")
                    bt, la = (), ()
                    inp = tuple(
                        int(x) for x in rr.u16_array(max(n_in - 1, 0))
                    )
                rules.append(_Rule(bt, inp, la, records(rr, n_rec)))
            rule_sets.append(tuple(rules))
        return _ContextSubst(fmt, cov, tuple(rule_sets), class_defs)

    if fmt == 3:
        def covs(n: int) -> tuple[Coverage, ...]:
            offs = r.u16_array(n)
            return tuple(
                Coverage.parse(BigEndianReader(data, base + int(o)))
                for o in offs
            )

        if chained:
            n_bt = r.u16()
            bt = covs(n_bt)
            n_in = r.u16()
            inp = covs(n_in)
            n_la = r.u16()
            la = covs(n_la)
            n_rec = r.u16()
        else:
            n_in, n_rec = r.unpack("HH")
            inp = covs(n_in)
            bt, la = (), ()
        if not inp:
            return None
        rule = _Rule(bt, inp, la, records(r, n_rec))
        return _ContextSubst(3, inp[0], ((rule,),), ())
    return None

